"""Structured Streaming layer: every streaming result is cross-checked
against the equivalent batch computation on the same files — the
streaming engine must converge to the batch answer once the backlog is
fully processed (availableNow)."""

import shutil

import pytest
from pyspark.sql import functions as F

from elusion_spark import streaming as ST


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-written by Spark (micros timestamps) so the streaming
    file source can read them with a plain schema."""
    src = "/root/testdata/sf0.001/events.parquet"
    from elusion_spark.sources.loaders import load_parquet

    out = str(tmp_path_factory.mktemp("stream_src") / "events")
    load_parquet(src, "e", spark).df.coalesce(2).write.parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="module")
def events_schema(spark, events_dir):
    return spark.read.parquet(events_dir).schema


def test_windowed_agg_matches_batch(spark, events_dir, events_schema):
    stream = ST.read_file_stream(spark, events_dir, events_schema)
    agg = ST.windowed_agg(
        stream, "ts", "1 hour",
        aggs={"n": "count(*)", "total": "sum(value)"},
        keys=["event_type"], watermark_delay="1 minute",
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in ST.run_available_now_to_memory(agg).collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_session_agg_runs(spark, events_dir, events_schema):
    stream = ST.read_file_stream(spark, events_dir, events_schema)
    ses = ST.session_agg(
        stream, "ts", "30 minutes", keys=["user_id"],
        aggs={"n": "count(*)"}, watermark_delay="1 minute",
    )
    out = ST.run_available_now_to_memory(ses)
    assert out.count() > 0
    row = out.first()
    assert row["session_end"] > row["session_start"]


def test_dedup_stream_matches_batch(spark, events_dir, events_schema):
    # duplicate the source: every event twice -> stream dedup must halve it
    dup_df = spark.read.parquet(events_dir)
    dup_dir = events_dir + "_dup"
    dup_df.union(dup_df).write.mode("overwrite").parquet(dup_dir)
    try:
        stream = ST.read_file_stream(spark, dup_dir, events_schema)
        deduped = ST.dedup_stream(stream, ["event_id"], "ts", "1 minute")
        out = ST.run_available_now_update_to_memory(deduped)
        assert out.count() == dup_df.count()
    finally:
        shutil.rmtree(dup_dir, ignore_errors=True)


def test_stateful_running_totals(spark, events_dir, events_schema):
    stream = ST.read_file_stream(spark, events_dir, events_schema)
    totals = ST.running_totals_stateful(stream, "user_id", "value")
    out = ST.run_available_now_update_to_memory(totals)
    # update-mode memory sink may emit a row per micro-batch per key;
    # the LAST emission per key must equal the batch totals
    final = (
        out.groupBy("key").agg(F.max("n").alias("n"), F.max("total").alias("total"))
    )
    got = {r["key"]: (r["n"], round(r["total"], 6)) for r in final.collect()}
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.col("user_id").cast("string").alias("key"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    want = {r["key"]: (r["n"], round(r["total"], 6)) for r in batch.collect()}
    assert got == want


def test_stream_write_files_roundtrip(spark, events_dir, events_schema, tmp_path):
    stream = ST.read_file_stream(spark, events_dir, events_schema)
    out_dir = str(tmp_path / "out")
    q = ST.stream_write_files(stream, out_dir, "parquet")
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == spark.read.parquet(events_dir).count()


def test_enrich_stream_with_static_dim(spark, events_dir, events_schema):
    dim = spark.createDataFrame(
        [("click", "interactive"), ("view", "passive"), ("purchase", "transactional")],
        ["event_type", "category"],
    )
    stream = ST.read_file_stream(spark, events_dir, events_schema)
    enriched = ST.enrich_stream(stream, dim, "event_type")
    agg = ST.windowed_agg(enriched, "ts", "6 hours", aggs={"n": "count(*)"},
                          keys=["category"], watermark_delay="1 minute")
    out = ST.run_available_now_to_memory(agg)
    cats = {r["category"] for r in out.collect()}
    assert cats and cats <= {"interactive", "passive", "transactional", None}


def test_foreach_batch_upsert(spark, events_dir, events_schema, tmp_path):
    target = str(tmp_path / "upsert_target")
    stream = ST.read_file_stream(spark, events_dir, events_schema)
    q = ST.foreach_batch_upsert(stream, target, keys=["event_id"])
    q.awaitTermination(120)
    first = spark.read.parquet(target)
    n = first.count()
    assert n == first.select("event_id").distinct().count()
    # re-run over the same source with a fresh checkpoint: counts stay
    # stable (idempotent upsert, no duplicate accumulation)
    q2 = ST.foreach_batch_upsert(stream, target, keys=["event_id"],
                                 checkpoint=str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert spark.read.parquet(target).count() == n


def test_stream_stream_join_matches_batch(spark, events_dir, events_schema):
    """Watermarked stream-stream interval join converges to the batch
    interval join once the backlog drains: clicks joined to purchases by
    the same user within 2 hours after the click."""
    clicks_s = (ST.read_file_stream(spark, events_dir, events_schema)
                .filter("event_type = 'click'")
                .selectExpr("user_id", "ts AS click_ts",
                            "event_id AS click_id"))
    buys_s = (ST.read_file_stream(spark, events_dir, events_schema)
              .filter("event_type = 'purchase'")
              .selectExpr("user_id AS buyer_id", "ts AS buy_ts",
                          "event_id AS buy_id"))
    joined = ST.stream_stream_join(
        clicks_s, buys_s.withColumnRenamed("buyer_id", "user_id"),
        on="user_id", left_ts="click_ts", right_ts="buy_ts",
        left_watermark="1 minute", right_watermark="1 minute",
        max_lag="2 hours")
    out = ST.run_available_now_to_memory(joined.select(
        "l.user_id", "click_id", "buy_id"))
    got = {(r["user_id"], r["click_id"], r["buy_id"]) for r in out.collect()}

    ev = spark.read.parquet(events_dir)
    clicks_b = (ev.filter("event_type = 'click'")
                .selectExpr("user_id", "ts AS click_ts",
                            "event_id AS click_id"))
    buys_b = (ev.filter("event_type = 'purchase'")
              .selectExpr("user_id AS buyer_id", "ts AS buy_ts",
                          "event_id AS buy_id"))
    batch = clicks_b.join(
        buys_b,
        (clicks_b.user_id == buys_b.buyer_id)
        & (buys_b.buy_ts >= clicks_b.click_ts)
        & (buys_b.buy_ts <= clicks_b.click_ts + F.expr("INTERVAL 2 hours")),
    )
    want = {(r["user_id"], r["click_id"], r["buy_id"])
            for r in batch.select("user_id", "click_id", "buy_id").collect()}
    assert want, "fixture produced no click->purchase pairs"
    assert got == want


def test_foreach_batch_upsert_crash_recovery(spark, events_dir, events_schema,
                                             tmp_path):
    """Simulate a crash between rename-aside and rename-into-place: the
    complete snapshot sits at target.__old with no target.  The next
    batch must restore it and merge — not rebuild from the batch alone
    (ADVICE r1: rmtree-then-rename lost the dataset)."""
    import os
    import shutil

    target = str(tmp_path / "crash_target")
    stream = ST.read_file_stream(spark, events_dir, events_schema)
    q = ST.foreach_batch_upsert(stream, target, keys=["event_id"])
    q.awaitTermination(120)
    n = spark.read.parquet(target).count()
    assert n > 0

    # crash state: snapshot renamed aside, target missing
    os.rename(target, target + ".__old")
    q2 = ST.foreach_batch_upsert(stream, target, keys=["event_id"],
                                 checkpoint=str(tmp_path / "ckpt_crash"))
    q2.awaitTermination(120)
    assert spark.read.parquet(target).count() == n
    assert not os.path.isdir(target + ".__old")

    # stale-old state (crash after swap, before cleanup) is cleaned up
    shutil.copytree(target, target + ".__old")
    q3 = ST.foreach_batch_upsert(stream, target, keys=["event_id"],
                                 checkpoint=str(tmp_path / "ckpt_stale"))
    q3.awaitTermination(120)
    assert spark.read.parquet(target).count() == n
    assert not os.path.isdir(target + ".__old")


def test_ingest_corpus_stream_matches_batch(spark, tmp_path):
    """Streaming corpus ingestion == the batch curation decision: only
    first-seen, above-quality, not-in-history documents come out, and
    the stream-static anti join keys on the same fingerprint the batch
    pipeline uses."""
    from pyspark.sql import types as T

    from elusion_spark.operators.text import fingerprint, quality_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # historical corpus: docs 0..99; stream: docs 50..199 plus exact
    # duplicates of 150..159 under new ids (within-stream dups)
    hist = docs.filter("doc_id < 100")
    incoming = docs.filter("doc_id >= 50 AND doc_id < 200")
    dups = (docs.filter("doc_id >= 150 AND doc_id < 160")
            .withColumn("doc_id", F.col("doc_id") + 100000))
    stream_docs = (
        incoming.unionByName(dups)
        .withColumn("ts", F.to_timestamp(
            F.expr("timestampadd(SECOND, CAST(doc_id % 1000 AS INT), "
                   "timestamp'2024-01-01 00:00:00')")))
    )
    src = str(tmp_path / "docs_stream")
    stream_docs.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = ST.read_file_stream(spark, src, schema)
    out = ST.ingest_corpus_stream(
        stream, corpus_df=hist, ts_col="ts", min_quality=0.0,
        watermark_delay="1 hour", keep_fingerprint=True,
    )
    got = {r["__fp"] for r in ST.run_available_now_to_memory(out).collect()}

    # batch equivalent: same quality filter, one row per new fingerprint
    batch_src = spark.read.parquet(src).filter(quality_score("text") >= 0.0)
    hist_fp = {r["__fp"] for r in
               hist.select(fingerprint("text").alias("__fp")).collect()}
    batch_fp = {r["__fp"] for r in
                batch_src.select(fingerprint("text").alias("__fp")).collect()}
    want = batch_fp - hist_fp
    assert got == want and len(got) > 0
    # the within-stream duplicates collapsed: one row per fingerprint
    rows = ST.run_available_now_to_memory(
        ST.ingest_corpus_stream(
            ST.read_file_stream(spark, src, schema), corpus_df=hist,
            ts_col="ts", watermark_delay="1 hour", keep_fingerprint=True,
        )
    ).collect()
    fps = [r["__fp"] for r in rows]
    assert len(fps) == len(set(fps))


def test_near_dup_candidates_stream_matches_batch_star_pairs(spark, tmp_path):
    """Streaming MinHash-LSH candidates == the batch pipeline's band
    star-pairs (bucket-min anchor -> member), with documents split
    across TWO micro-batches (maxFilesPerTrigger=1) so bucket state
    genuinely carries across batches.  Ids arrive in increasing order,
    so every emission's anchor is the bucket's global min — exactly the
    batch construction."""
    import pandas as pd

    from elusion_spark.operators.dedup import (
        minhash_signature_from_hashes,
        shingle_hash_expr,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = []
    for i in range(40):
        if i % 4 == 0:
            docs.append((i, base + f" tail{i % 8}"))   # near-dup family
        else:
            docs.append((i, f"unique document number {i} with words "
                            f"entirely its own {i * 7} {i * 13}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    src = str(tmp_path / "docs_src")
    # two files, ids ascending across them, named so listing order == id order
    df.filter("doc_id < 20").coalesce(1).write.parquet(src + "/batch=a")
    df.filter("doc_id >= 20").coalesce(1).write.parquet(src + "/batch=b")

    num_hashes, bands, k = 32, 16, 3
    rows = num_hashes // bands

    # batch star-pairs with the IDENTICAL signature/banding expressions
    banded = (
        df.select(
            F.col("doc_id").alias("__id"),
            shingle_hash_expr("text", k).alias("__h"),
        )
        .select("__id", minhash_signature_from_hashes("__h", num_hashes).alias("__sig"))
        .select(
            "__id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}), b -> "
                    f"hash(slice(__sig, b * {rows} + 1, {rows})))"
                )
            ).alias("band_idx", "band_hash"),
        )
    )
    anchors = banded.groupBy("band_idx", "band_hash").agg(
        F.min("__id").alias("anchor_id")
    )
    expected = {
        (r["anchor_id"], r["__id"])
        for r in banded.join(anchors, ["band_idx", "band_hash"])
        .filter(F.col("__id") != F.col("anchor_id"))
        .collect()
    }
    assert expected, "construction must produce collisions"

    schema = spark.read.parquet(src + "/batch=a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cand = ST.near_dup_candidates_stream(
        stream, "doc_id", "text",
        num_hashes=num_hashes, bands=bands, shingle_k=k,
    )
    got_df = ST.run_available_now_update_to_memory(cand)
    got = {(r["anchor_id"], r["doc_id"]) for r in got_df.collect()}
    assert got == expected


def test_near_dup_candidates_stream_string_ids(spark, tmp_path):
    """Same stream==batch parity with STRING (UUID-style) document ids.
    Regression for the silent-garbage bug where the stream cast ids to
    long: string ids became NULL, collapsing every document into one
    __id=NULL state group.  Ids are zero-padded so lexicographic order
    == numeric order; the anchor rule (bucket min) is identical on both
    paths because both use the native string ordering."""
    from elusion_spark.operators.dedup import (
        minhash_signature_from_hashes,
        shingle_hash_expr,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = []
    for i in range(40):
        sid = f"doc-{i:04d}-beef"
        if i % 4 == 0:
            docs.append((sid, base + f" tail{i % 8}"))
        else:
            docs.append((sid, f"unique document number {i} with words "
                              f"entirely its own {i * 7} {i * 13}"))
    df = spark.createDataFrame(docs, "doc_id string, text string")

    src = str(tmp_path / "docs_src_str")
    df.filter("doc_id < 'doc-0020'").coalesce(1).write.parquet(src + "/batch=a")
    df.filter("doc_id >= 'doc-0020'").coalesce(1).write.parquet(src + "/batch=b")

    num_hashes, bands, k = 32, 16, 3
    rows = num_hashes // bands
    banded = (
        df.select(
            F.col("doc_id").alias("__id"),
            shingle_hash_expr("text", k).alias("__h"),
        )
        .select("__id",
                minhash_signature_from_hashes("__h", num_hashes).alias("__sig"))
        .select(
            "__id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}), b -> "
                    f"hash(slice(__sig, b * {rows} + 1, {rows})))"
                )
            ).alias("band_idx", "band_hash"),
        )
    )
    anchors = banded.groupBy("band_idx", "band_hash").agg(
        F.min("__id").alias("anchor_id")
    )
    expected = {
        (r["anchor_id"], r["__id"])
        for r in banded.join(anchors, ["band_idx", "band_hash"])
        .filter(F.col("__id") != F.col("anchor_id"))
        .collect()
    }
    assert expected, "construction must produce collisions"

    schema = spark.read.parquet(src + "/batch=a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cand = ST.near_dup_candidates_stream(
        stream, "doc_id", "text",
        num_hashes=num_hashes, bands=bands, shingle_k=k,
    )
    assert dict(cand.dtypes)["anchor_id"] == "string"
    got_df = ST.run_available_now_update_to_memory(cand)
    got = {(r["anchor_id"], r["doc_id"]) for r in got_df.collect()}
    assert got == expected


def test_near_dup_candidates_stream_ttl_plumbing(spark, tmp_path):
    """state_ttl_ms wires ProcessingTimeTimeout + per-arrival lease
    renewal; with a 1h TTL no bucket can expire inside the run, so the
    candidate set must EQUAL the untimed contract — this pins the
    timeout plumbing (a wrong timeoutConf or a missing
    setTimeoutDuration raises; a hasTimedOut mishandle changes the
    output) without a sleep-based expiry assertion.  The TTL leg runs
    on a LIVE trigger driven by the committed file-log offset:
    ProcessingTimeTimeout makes the stateful operator request a batch
    every trigger, so an availableNow run never self-terminates (it
    would burn the whole awaitTermination budget spinning empty
    batches)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from ttl_recall_study import _await_file_log_offset

    docs = [(i, "the quick brown fox jumps over the lazy dog " +
             ("" if i % 2 == 0 else f"unique {i} " * 3))
            for i in range(16)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = str(tmp_path / "ttl_src")
    df.filter("doc_id < 8").coalesce(1).write.parquet(src + "/b=a")
    df.filter("doc_id >= 8").coalesce(1).write.parquet(src + "/b=b")
    schema = spark.read.parquet(src + "/b=a").schema

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src))

    base_cand = ST.near_dup_candidates_stream(
        stream(), "doc_id", "text", num_hashes=16, bands=8, shingle_k=3)
    base_df = ST.run_available_now_update_to_memory(base_cand)
    base = {(r["anchor_id"], r["doc_id"]) for r in base_df.collect()}

    ttl_cand = ST.near_dup_candidates_stream(
        stream(), "doc_id", "text", num_hashes=16, bands=8, shingle_k=3,
        state_ttl_ms=3_600_000)
    q, rows = ST.start_update_collect(ttl_cand, str(tmp_path / "ttl_ckpt"))
    try:
        _await_file_log_offset(q, 1)  # both files committed (0-based)
    finally:
        q.stop()
    with_ttl = {(r["anchor_id"], r["doc_id"]) for r in rows}
    assert base and with_ttl == base


def test_near_dup_stream_ttl_recall_trade(spark, tmp_path):
    """Pins the DOCUMENTED recall trade of state_ttl_ms on a long
    stream (VERDICT r6 ask #3, measured in tools/ttl_recall_study.py
    and tabled in SCALE.md): true near-dup pairs that straddle a quiet
    period LONGER than the TTL are lost (the anchor's bucket was
    evicted by the intervening traffic's batch), while (a) pairs inside
    one period always survive and (b) the post-gap duplicates of the
    straddling family still find EACH OTHER — eviction degrades
    cross-period linking to per-period dedup, it never corrupts pairs.
    A TTL longer than the quiet period recovers everything, matching
    the TTL=None contract."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    import ttl_recall_study as S

    waves, truth = S.build_waves(n_cross=3, n_within=2, n_filler=4)
    gap_s = 4.0
    # TTL = gap/8 (ADVICE r7: was gap/3, too tight under CI
    # contention — a wave-0 batch processed late could leave < TTL of
    # wall before wave-1's files landed): the wave-1 batch now runs
    # FAR past every wave-0 bucket's lease; TTL = 1h: nothing can
    # expire inside this test.
    lossy = S.score(
        S.run_config(spark, waves, str(tmp_path), int(gap_s * 1000 / 8),
                     gap_s, num_hashes=16, bands=8), truth)
    safe = S.score(
        S.run_config(spark, waves, str(tmp_path), 3_600_000,
                     gap_s, num_hashes=16, bands=8), truth)
    assert safe["within_recall"] == 1.0
    assert safe["cross_recall"] == 1.0
    assert safe["post_gap_cohesion"] == 1.0
    assert lossy["within_recall"] == 1.0   # same-period pairs unharmed
    # the documented loss: eviction must strictly degrade cross-period
    # linking (asserting an inequality, not an exact 0.0 — a single
    # late timer firing on a contended host may leave one straddling
    # pair alive without invalidating the documented trade)
    assert lossy["cross_recall"] < safe["cross_recall"]
    assert lossy["post_gap_cohesion"] == 1.0  # re-seeded bucket dedups


def test_stream_to_rollup_matches_batch(spark, tmp_path):
    """Streaming rollup maintenance == batch aggregation over the same
    files, with the stream split into multiple micro-batches; replaying
    an already-applied batch id is a no-op (the idempotency marker)."""
    from pyspark.sql import functions as F

    from elusion_spark.sinks.maintenance import read_rollup

    df = spark.range(0, 6000).selectExpr(
        "CAST(id % 4 AS STRING) AS g", "id AS v",
        "CAST(pmod(xxhash64(id), 300) AS STRING) AS u",
    )
    src = str(tmp_path / "src")
    df.filter("id < 3000").coalesce(1).write.parquet(src + "/f=a")
    df.filter("id >= 3000").coalesce(1).write.parquet(src + "/f=b")

    spec = {"n": ("count", None), "total": ("sum", "v"), "users": ("hll", "u")}
    store = str(tmp_path / "store")
    schema = spark.read.parquet(src + "/f=a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = ST.stream_to_rollup(stream, store, ["g"], spec)
    q.awaitTermination(120)

    got = {
        r["g"]: (r["n"], r["total"])
        for r in read_rollup(spark, store, spec).collect()
    }
    want = {
        r["g"]: (r["n"], r["total"])
        for r in df.groupBy("g").agg(
            F.count("*").alias("n"), F.sum("v").alias("total")
        ).collect()
    }
    assert got == want
    est = {r["g"]: r["users_estimate"]
           for r in read_rollup(spark, store, spec).collect()}
    truth = {r["g"]: r["du"] for r in df.groupBy("g").agg(
        F.countDistinct("u").alias("du")).collect()}
    for g in truth:
        assert abs(est[g] - truth[g]) <= max(2, 0.05 * truth[g])

    # the applied-batch marker is a bounded high-water mark, not an
    # ever-growing id list (long-lived streams)
    import json

    from elusion_spark.sinks.maintenance import read_rollup_sidecar

    marker = json.loads(read_rollup_sidecar(store, "_applied_batches.json"))
    assert isinstance(marker, dict) and set(marker) == {"max"}
    assert marker["max"] >= 1


def test_near_dup_stream_out_of_order_ids_lose_no_pairs(spark, tmp_path):
    """When a later micro-batch brings an id SMALLER than a bucket's
    stored anchor, the displaced old anchor must be emitted against the
    new anchor — otherwise the old anchor's whole star disconnects from
    the new root.  Checked by comparing connected components of the
    emitted pair graph against the batch star-pair graph."""
    from elusion_spark.operators.dedup import (
        minhash_signature_from_hashes,
        shingle_hash_expr,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = []
    for i in range(40):
        if i % 4 == 0:
            docs.append((i, base + f" tail{i % 8}"))
        else:
            docs.append((i, f"unique document number {i} with words "
                            f"entirely its own {i * 7} {i * 13}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    src = str(tmp_path / "docs_ooo")
    # HIGH ids land in the lexically-FIRST file -> arrive first; the
    # second micro-batch then brings smaller ids into live buckets.
    df.filter("doc_id >= 20").coalesce(1).write.parquet(src + "/batch=a")
    df.filter("doc_id < 20").coalesce(1).write.parquet(src + "/batch=b")

    num_hashes, bands, k = 32, 16, 3
    rows = num_hashes // bands
    banded = (
        df.select(
            F.col("doc_id").alias("__id"),
            shingle_hash_expr("text", k).alias("__h"),
        )
        .select("__id",
                minhash_signature_from_hashes("__h", num_hashes).alias("__sig"))
        .select(
            "__id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}), b -> "
                    f"hash(slice(__sig, b * {rows} + 1, {rows})))"
                )
            ).alias("band_idx", "band_hash"),
        )
    )
    anchors = banded.groupBy("band_idx", "band_hash").agg(
        F.min("__id").alias("anchor_id")
    )
    batch_pairs = {
        (r["anchor_id"], r["__id"])
        for r in banded.join(anchors, ["band_idx", "band_hash"])
        .filter(F.col("__id") != F.col("anchor_id"))
        .collect()
    }
    assert batch_pairs, "construction must produce collisions"

    schema = spark.read.parquet(src + "/batch=a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cand = ST.near_dup_candidates_stream(
        stream, "doc_id", "text",
        num_hashes=num_hashes, bands=bands, shingle_k=k,
    )
    got_df = ST.run_available_now_update_to_memory(cand)
    got = {(r["anchor_id"], r["doc_id"]) for r in got_df.collect()}

    def components(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        groups = {}
        for x in parent:
            groups.setdefault(find(x), set()).add(x)
        return {frozenset(g) for g in groups.values()}

    # the star may re-root, but the candidate graph's components —
    # what the downstream verifier/union-find actually consumes — match
    assert components(got) == components(batch_pairs)


def test_stream_event_rate_anomaly_matches_batch(spark, tmp_path):
    """Streaming rate-anomaly (incremental rollup-store counts + the
    SHARED scoring code) == the batch event_rate_anomaly over the same
    events, with the stream split across micro-batches."""
    import datetime as dt

    from elusion_spark.operators.events import event_rate_anomaly

    rows = []
    for h in range(30):
        for i in range(4 + (h % 3)):
            rows.append(("a", dt.datetime(2024, 1, 1)
                         + dt.timedelta(hours=h, minutes=i)))
    for i in range(40):
        rows.append(("a", dt.datetime(2024, 1, 2, 6)
                     + dt.timedelta(minutes=i % 60)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")

    src = str(tmp_path / "ev_src")
    df.filter("ts < '2024-01-01 15:00:00'").coalesce(1) \
        .write.parquet(src + "/f=a")
    df.filter("ts >= '2024-01-01 15:00:00'").coalesce(1) \
        .write.parquet(src + "/f=b")

    schema = spark.read.parquet(src + "/f=a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    store = str(tmp_path / "rate_store")
    q = ST.stream_event_rate_anomaly(stream, store)
    q.awaitTermination(120)

    got = {
        (r["event_type"], r["bucket_hour"]): (r["c"], r["z"])
        for r in ST.score_event_rate_store(spark, store).collect()
    }
    want = {
        (r["event_type"], r["bucket_hour"]): (r["c"], r["z"])
        for r in event_rate_anomaly(df).collect()
    }
    assert got == want and want, "stream store must reproduce batch z-scores"


def test_funnel_stream_matches_batch_with_out_of_order_batches(spark, tmp_path):
    """Streaming funnel == batch funnel per step, with the LATER
    micro-batch carrying EARLIER timestamps (a late-arriving view must
    retroactively qualify a click that was previously ineligible) — the
    case the replayable event-history state exists for."""
    import datetime as dt

    from elusion_spark.operators.events import funnel

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)
    early = [
        (1, "view", T(0)), (1, "click", T(5)), (1, "purchase", T(9)),
        (2, "purchase", T(1)), (2, "click", T(2)),     # no view yet
        (3, "click", T(3)),                            # click before view
        (4, "view", T(0)), (4, "click", T(2)),
        (5, "noise", T(1)),
    ]
    late = [
        (2, "view", T(0)),    # late view BEFORE 2's click -> qualifies it
        (3, "view", T(4)),    # view AFTER 3's click -> click stays dead
        (4, "purchase", T(7)),
        (5, "view", T(2)),
    ]
    all_rows = early + late
    df = spark.createDataFrame(
        all_rows, "user_id long, event_type string, ts timestamp"
    )

    src = str(tmp_path / "funnel_src")
    spark.createDataFrame(early, "user_id long, event_type string, ts timestamp") \
        .coalesce(1).write.parquet(src + "/b=a")
    spark.createDataFrame(late, "user_id long, event_type string, ts timestamp") \
        .coalesce(1).write.parquet(src + "/b=b")

    schema = spark.read.parquet(src + "/b=a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    steps = ["view", "click", "purchase"]
    got_df = ST.run_available_now_update_to_memory(
        ST.funnel_stream(stream, steps)
    )
    final = {
        r["user_id"]: r["mx"]
        for r in got_df.groupBy("user_id")
        .agg(F.max("n_completed").alias("mx")).collect()
    }
    got_counts = [
        sum(1 for v in final.values() if v >= i + 1) for i in range(3)
    ]
    want = funnel(df, steps).collect()[0]
    assert got_counts == [want["step_view"], want["step_click"],
                          want["step_purchase"]]
    # the late view retro-qualified user 2's click (purchase@T1 still
    # precedes the click, so no third step); view-after-click did not
    assert final["2"] == 2 and final["3"] == 1 and final["5"] == 1

    import pytest

    with pytest.raises(ValueError, match="duplicate step"):
        ST.funnel_stream(stream, ["view", "click", "view"])


def test_funnel_stream_string_user_ids(spark, tmp_path):
    """String/UUID user ids must keep distinct state groups (a numeric
    cast would NULL them all into one merged user) — ADVICE r4."""
    import datetime as dt

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        ("u-aaa", "view", T(0)), ("u-aaa", "click", T(2)),
        ("u-bbb", "view", T(1)),
        ("u-ccc", "click", T(3)),          # click with no view: 0 steps
    ]
    src = str(tmp_path / "funnel_str_src")
    spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp"
    ).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    got = ST.run_available_now_update_to_memory(
        ST.funnel_stream(stream, ["view", "click"])
    )
    final = {r["user_id"]: r["n_completed"] for r in got.collect()}
    assert final == {"u-aaa": 2, "u-bbb": 1, "u-ccc": 0}


def test_bpe_encode_on_stream_matches_batch(spark, tmp_path):
    """The learned-vocab tokenizer rides a stream unchanged: bpe_encode
    is a stateless codegen expression, so streaming token counts equal
    the batch encode row-for-row (train once offline, apply to the
    firehose — the production tokenization shape)."""
    from elusion_spark.operators.bpe import bpe_encode, bpe_fit

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(200))
    merges = bpe_fit(docs, "text", num_merges=3)

    src = str(tmp_path / "docs_bpe_stream")
    docs.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = ST.read_file_stream(spark, src, schema)
    enc = bpe_encode(stream, "text", merges=merges).select(
        "doc_id", "n_tokens", F.md5(F.array_join("tokens", " ")).alias("h"))
    got = {(r["doc_id"], r["n_tokens"], r["h"])
           for r in ST.run_available_now_to_memory(enc).collect()}
    exp = {(r["doc_id"], r["n_tokens"], r["h"])
           for r in bpe_encode(docs, "text", merges=merges).select(
               "doc_id", "n_tokens",
               F.md5(F.array_join("tokens", " ")).alias("h")).collect()}
    assert got == exp and len(got) == 200


def test_dsir_score_stream_matches_batch(spark, tmp_path):
    """Streaming DSIR scoring == batch dsir_importance with the same
    fitted model, bit-for-bit: the scorer is a stateless row expression
    folding the same rounded decimal ratios, so stream==batch holds
    exactly (not approximately) and no state survives the batch."""
    from elusion_spark.pipeline import dsir_fit, dsir_importance

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = dsir_fit(docs, "doc_id", "text", "lang = 'en'",
                     n_buckets=128, hash_fn="md5")
    rows = [(r["bucket"], r["ratio"]) for r in model.collect()]
    batch = {r["doc_id"]: r["logw"] for r in
             dsir_importance(docs, "doc_id", "text", "lang = 'en'",
                             n_buckets=128, hash_fn="md5",
                             model=model).collect()}

    src = str(tmp_path / "dsir_stream")
    docs.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = ST.read_file_stream(spark, src, schema)
    out = ST.dsir_score_stream(stream, rows, "text", n_buckets=128,
                               hash_fn="md5")
    got = {r["doc_id"]: r["logw"] for r in
           ST.run_available_now_to_memory(
               out.select("doc_id", "logw")).collect()}
    assert set(got) == set(batch)
    assert all(got[k] == batch[k] for k in batch)


def test_hf_tokenizer_encode_streaming_parity(spark, tmp_path):
    """The imported-HF encode is a pure mapInPandas stage, so it runs
    UNCHANGED on a file stream (round 10): readStream → 
    hf_tokenizer_encode(with_ids) → availableNow memory sink equals
    the batch encode row-for-row — the 100 TB ingestion shape
    (tokenize documents as they land, no separate batch pass)."""
    import json

    from pyspark.sql import functions as F

    from elusion_spark.operators.tokenizer_io import (
        hf_tokenizer_encode, import_hf_tokenizer_json)

    d = {"version": "1.0", "normalizer": {"type": "Lowercase"},
         "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
                           "prepend_scheme": "always"},
         "added_tokens": [],
         "model": {"type": "BPE", "unk_token": None,
                   "vocab": {s: i for i, s in enumerate(
                       ["▁", "a", "b", "c", "▁a", "▁ab"])},
                   "merges": ["▁ a", "▁a b"]}}
    p = str(tmp_path / "s.json")
    json.dump(d, open(p, "w"))
    model = import_hf_tokenizer_json(p)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["ab abc c", "a AB", "", "cab ab a"])],
        "doc_id long, text string")
    src = str(tmp_path / "docs")
    docs.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = ST.read_file_stream(spark, src, schema)
    enc_s = hf_tokenizer_encode(stream, "text", model, with_ids=True)
    got = {r["doc_id"]: (r["tokens"], r["token_ids"], r["n_tokens"])
           for r in ST.run_available_now_to_memory(
               enc_s.select("doc_id", "tokens", "token_ids",
                            "n_tokens")).collect()}
    want = {r["doc_id"]: (r["tokens"], r["token_ids"], r["n_tokens"])
            for r in hf_tokenizer_encode(
                spark.read.parquet(src), "text", model,
                with_ids=True).select(
                "doc_id", "tokens", "token_ids", "n_tokens").collect()}
    assert got == want and len(got) == 4
