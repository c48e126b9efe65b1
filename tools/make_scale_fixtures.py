#!/usr/bin/env python
"""Rebuild the synthetic scale-up fixtures SCALE.md measures against.

Usage:  python tools/make_scale_fixtures.py [out_root]

Writes (under out_root, default /tmp):
  <out>/scale10/documents.parquet   10× sf0.1 documents, ids shifted by
  <out>/scale10/embeddings.parquet  1M per replica (every doc gains 9
                                    exact copies — pathological dup
                                    density for the dedup family)
  <out>/sf1/{lineitem,orders,events}.parquet
                                    10× sf0.1 with shifted keys (the
                                    relational slope fixture; ~6M
                                    lineitem) — dims and doc tables are
                                    symlinked unchanged

All replicas are deterministic (pure key shifts, no randomness), so
re-running reproduces byte-identical content and the SCALE.md numbers
are re-measurable."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elusion_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def _replicate(df, key_cols, shift, n=10):
    reps = []
    for r in range(n):
        x = df
        for c in key_cols:
            x = x.withColumn(c, F.col(c) + F.lit(r * shift))
        reps.append(x)
    out = reps[0]
    for x in reps[1:]:
        out = out.unionByName(x)
    return out


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    spark = get_spark()

    s10 = os.path.join(root, "scale10")
    os.makedirs(s10, exist_ok=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    _replicate(docs, ["doc_id"], 1_000_000).repartition(32) \
        .write.mode("overwrite").parquet(f"{s10}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _replicate(emb, ["vec_id"], 1_000_000).repartition(32) \
        .write.mode("overwrite").parquet(f"{s10}/embeddings.parquet")

    sf1 = os.path.join(root, "sf1")
    os.makedirs(sf1, exist_ok=True)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    _replicate(li, ["l_orderkey"], 100_000_000).repartition(32) \
        .write.mode("overwrite").parquet(f"{sf1}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    _replicate(o, ["o_orderkey"], 100_000_000).repartition(32) \
        .write.mode("overwrite").parquet(f"{sf1}/orders.parquet")
    e = spark.read.parquet(f"{SF}/events.parquet")
    _replicate(e, ["user_id", "event_id"], 10_000_000).repartition(32) \
        .write.mode("overwrite").parquet(f"{sf1}/events.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"]:
        dst = f"{sf1}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF}/{t}.parquet", dst)

    # 100x embeddings (200k 64-dim vectors) — the ANN/PQ scale fixture
    # SCALE.md's "random projection + product quantization" section
    # measures against
    _replicate(emb, ["vec_id"], 1_000_000, n=100).repartition(32) \
        .write.mode("overwrite").parquet(os.path.join(root, "scale100_emb"))

    # rich-vocabulary corpus (SCALE.md "sparse TF-IDF cosine pairs"):
    # zipf-1.3 over a 30k-word vocab, 120-token docs, 1,000 planted
    # near-dups (3 token edits each) — the realistic operating point
    # where prefix filtering prunes 1,500x
    import numpy as np

    rng = np.random.default_rng(7)
    V, N, L = 30000, 20000, 120
    zipf = rng.zipf(1.3, size=(N, L)) % V
    docs_rows = [(i, " ".join(f"w{t}" for t in row))
                 for i, row in enumerate(zipf)]
    extra = []
    for i in range(1000):
        toks = docs_rows[i][1].split()
        for j in range(3):
            toks[(j * 37) % len(toks)] = f"w{(i + j) % V}"
        extra.append((1000000 + i, " ".join(toks)))
    spark.createDataFrame(docs_rows + extra, "doc_id long, text string")         .repartition(32).write.mode("overwrite")         .parquet(os.path.join(root, "rich_corpus"))

    for t, p in [("scale10/documents", f"{s10}/documents.parquet"),
                 ("sf1/lineitem", f"{sf1}/lineitem.parquet"),
                 ("sf1/events", f"{sf1}/events.parquet"),
                 ("scale100_emb", os.path.join(root, "scale100_emb"))]:
        print(t, spark.read.parquet(p).count())


if __name__ == "__main__":
    main()
