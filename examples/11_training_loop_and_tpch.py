"""Round-4 surface (cont.): the in-engine classifier training loop and
the completed TPC-H shape suite.

- ``hashed_tf_features`` turns raw text into fixed-dim vectors with NO
  external tokenizer/model (hashing trick, all built-in expressions —
  document bodies never shuffle).
- ``train_logreg`` fits the quality head ON the cluster: one
  aggregation job per iteration, O(dim) driver state, DECIMAL-exact
  gradients so the weights are bit-identical under any partitioning.
- ``classifier_score`` (via ``model.score``) applies it — the full
  fastText/DCLM-style curation loop (featurize → train → filter)
  without leaving Spark.
- The relational suite now covers all 22 classic TPC-H query shapes
  (suite.py q01/q82-q86/q109-q123); two are reproduced here through
  the raw-SQL surface.

Run: python examples/11_training_loop_and_tpch.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from elusion_spark import (
    CustomDataFrame,
    evaluate_classifier,
    execute_raw_sql,
    get_spark,
    hashed_tf_features,
    kmeans_fit,
    train_logreg,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()

docs = spark.read.parquet(f"{sf}/documents.parquet")

# ------------------------------------------- featurize -> train -> filter
# planted signal: a third of the docs get a marker token appended (the
# testdata's lang column is deliberately independent of the text, so a
# natural label would cap at base rate — the planted marker shows the
# loop actually learns)
marked = docs.withColumn("y", (F.col("doc_id") % 3 == 0).cast("int")) \
    .withColumn("text", F.when(F.col("y") == 1,
                               F.concat(F.col("text"), F.lit(" lowqual")))
                .otherwise(F.col("text")))
feats = hashed_tf_features(marked, dim=64, log_tf=True, l2_normalize=True)
labeled = feats.join(marked.select("doc_id", "y"), "doc_id")
model = train_logreg(labeled, "features", "y", dim=64, iters=30,
                     lr=2.0, standardize=True)
print(f"-- trained on {model.n_rows} docs; "
      f"loss {model.loss_history[0]:.4f} -> {model.loss_history[-1]:.4f} --")

kept = model.score(labeled, "features", threshold=0.5)
report = evaluate_classifier(
    model.score(labeled, "features"), "score", "y").collect()[0]
print(f"-- eval: acc {report['accuracy']:.3f} "
      f"precision {report['precision']:.3f} recall {report['recall']:.3f} "
      f"auc {report['auc']:.3f}; kept {kept.count()} docs above 0.5 --")

# reproducibility: same data, different partitioning, identical model
model2 = train_logreg(labeled.repartition(13), "features", "y",
                      dim=64, iters=30, lr=2.0, standardize=True)
assert model2.weights == model.weights and model2.bias == model.bias
print("-- retrain under different partitioning: bit-identical weights --")

# ------------------------------------------------ distributed k-means
# topic-balance the corpus: cluster the hashed features over ALL rows
# (one grouped aggregation job per Lloyd iteration, bit-reproducible
# centroids), then inspect the cluster populations
km = kmeans_fit(feats, "features", dim=64, k=4, iters=5, seed=11)
print(f"-- k-means sizes {km.sizes}; inertia "
      f"{km.inertia_history[0]:.1f} -> {km.inertia_history[-1]:.1f} --")

# ------------------------------------------------- TPC-H shapes, raw SQL
li = CustomDataFrame.new(f"{sf}/lineitem.parquet", "lineitem", spark)
# Q6: pure scan-filter-aggregate (every predicate reaches the scan)
rev = execute_raw_sql(
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,9)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    "q6", {"lineitem": li}, spark,
).df
print("-- Q6 forecast revenue --")
rev.show()

# Q15: CTE referenced twice (join probe + scalar MAX)
s = CustomDataFrame.new(f"{sf}/supplier.parquet", "supplier", spark)
top = execute_raw_sql(
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,9))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "q15", {"lineitem": li, "supplier": s}, spark,
).df
print("-- Q15 top supplier --")
top.show()
