"""Similarity search over embedding columns (array<float>).

Beyond-parity module (SURVEY §7.2 step 10).

100 TB design notes
-------------------
- *Brute-force top-k* is the correctness baseline: one linear scan, no
  shuffle (the query vector is a literal folded into codegen), then a
  global top-k which Spark executes as per-partition top-k + merge
  (TakeOrderedAndProject) — no full sort.
- *Random-hyperplane LSH* is the scale path for pair search: 16 sign bits
  → 65k buckets → bucket-join candidates → exact cosine verify.  One
  shuffle on the bucket key.
- *IVF* is the scale path for query search: k-means centroids fitted on a
  driver-side SAMPLE (fit is O(sample); assignment is a broadcast of
  nlist·dim floats), stored as a cluster-id column; queries probe only
  ``nprobe`` nearest clusters — partition-prunable when the table is
  written partitioned by cluster id.

All hot-path math is built-in higher-order functions (zip_with/aggregate)
— JVM-side, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _vec_literal(vec: list[float]) -> str:
    return "array(" + ", ".join(repr(float(x)) for x in vec) + ")"


def dot_expr(vec_col: str, query: list[float]) -> Column:
    """Dot product against a literal query vector via zip_with+aggregate
    (sequential fold — deterministic element order)."""
    q = _vec_literal(query)
    return F.expr(
        f"aggregate(zip_with({vec_col}, {q}, (x, y) -> CAST(x AS DOUBLE) * y), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_expr(vec_col: str) -> Column:
    return F.expr(
        f"sqrt(aggregate(transform({vec_col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )


def cosine_expr(vec_col: str, query: list[float]) -> Column:
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    return (dot_expr(vec_col, query) / (norm_expr(vec_col) * F.lit(qnorm))).alias(
        "cosine"
    )


def _arrow_list_matrix(arr, what: str, dim: int | None = None):
    """Zero-copy (n × dim) float64 view of an Arrow list-of-float column
    — the shared reader for every Arrow-batched vector stage (mapInArrow
    / applyInArrow / arrow_udf).  The values buffer of a list array is
    contiguous, so the read is one ``flatten()`` + ``reshape`` instead
    of boxing a fresh ndarray per row (the boundary cost the r10
    rewrites removed: 33.3 ms → 0.63 ms per 10k×64 batch side).

    Diagnostics are EXACT, not the total-size heuristic (ADVICE r10):
    nulls are rejected by ``null_count`` before any buffer math
    (``flatten()`` silently drops null rows, which would shift every
    subsequent row's alignment), and raggedness is caught per row via
    the list lengths — one null plus one double-length row can pass a
    ``flat.size == n*dim`` check and reshape into garbage.  ``dim=None``
    infers the width from the first row (cogroup GEMMs, where the
    operator does not carry a declared dim)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if arr.null_count:
        raise ValueError(
            f"{what}: {arr.null_count} null vector rows (of {n}); "
            "null embeddings are not supported — filter them first")
    widths = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    if dim is None:
        dim = int(widths[0]) if n else 0
    if n:
        bad = np.flatnonzero(widths != dim)
        if bad.size:
            b = int(bad[0])
            raise ValueError(
                f"{what}: expected fixed-length {dim} vectors, row {b} "
                f"has {int(widths[b])} values (ragged vectors are not "
                "supported)")
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, dim).astype(np.float64, copy=False)


def _check_sample_dims(vecs, dim: int, what: str) -> None:
    """Guard for the driver-side sample fits (ADVICE r10): they read
    their sample through ``np.fromiter(count=n*dim)``, which trusts the
    declared dim — vectors LONGER than dim would silently misalign the
    flat read into garbage rows (fromiter raises only when the iterator
    runs short).  O(n) list ``len`` checks — microseconds next to the
    conversion they protect."""
    for i, v in enumerate(vecs):
        if v is None or len(v) != dim:
            got = "null" if v is None else str(len(v))
            raise ValueError(
                f"{what}: expected {dim}-dim vectors, sampled row {i} "
                f"has {got} values")


def classifier_score(
    df: DataFrame,
    vec_col: str,
    weights: list[float],
    bias: float = 0.0,
    out_col: str = "score",
    threshold: float | None = None,
) -> DataFrame:
    """Linear classifier head over an embedding column:
    ``sigmoid(w·x + b)`` — the quality-filter shape used by fastText /
    DCLM / FineWeb-Edu style curation (score every document with a
    trained linear probe, keep above a threshold).

    Plan shape: pure projection — no shuffle, no join; with
    ``threshold`` the filter composes into the same scan stage.  Small
    heads use a codegen-friendly ``zip_with``/``aggregate`` expression;
    wide heads (dim > 512) switch to one numpy dot per Arrow batch via
    arrow_udf (zero-copy list-buffer read — see
    ``_classifier_score_arrow_col``), the same size-adaptive pattern as
    ``assign_clusters``."""
    dim = len(weights)
    if dim <= 512:
        dot = dot_expr(vec_col, [float(w) for w in weights])
        score = F.lit(1.0) / (F.lit(1.0)
                              + F.exp(-(dot + F.lit(float(bias)))))
    else:
        score = _classifier_score_arrow_col(vec_col, weights, bias)
    out = df.withColumn(out_col, score)
    if threshold is not None:
        out = out.filter(F.col(out_col) >= float(threshold))
    return out


def _classifier_score_arrow_col(vec_col: str, weights: list[float],
                                bias: float) -> Column:
    """Wide-head ``sigmoid(w·x + b)`` as one numpy GEMV per Arrow batch
    (arrow_udf).  The r10 boundary discipline applied to the Column
    surface (guide §4.2): the vector column is read as ONE contiguous
    buffer view (``_arrow_list_matrix``) instead of the pandas path's
    per-row ndarray boxing — same float64 ``V @ W + b`` / sigmoid
    arithmetic, bit-identical scores
    (``test_classifier_score_arrow_parity``)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udf

    W = np.asarray(weights, dtype=np.float64)
    b = float(bias)
    dim = len(weights)

    def _score(vs: "pa.Array") -> "pa.Array":
        if len(vs) == 0:
            return pa.array([], type=pa.float64())
        V = _arrow_list_matrix(vs, "classifier_score", dim)
        return pa.array(1.0 / (1.0 + np.exp(-(V @ W + b))),
                        type=pa.float64())

    _score.__annotations__ = {"vs": pa.Array, "return": pa.Array}
    return arrow_udf(_score, "double")(F.col(vec_col))


def _classifier_score_pandas_col(vec_col: str, weights: list[float],
                                 bias: float) -> Column:
    """The pre-r11 pandas_udf wide head — kept as the parity reference
    for ``test_classifier_score_arrow_parity``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    W = np.asarray(weights, dtype=np.float64)
    b = float(bias)

    def _score(vs):
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if V.size == 0:
            return pd.Series([], dtype="float64")
        return pd.Series(1.0 / (1.0 + np.exp(-(V @ W + b))))

    _score.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(_score, "double")(F.col(vec_col))


def l2_normalize_expr(vec_col: str) -> Column:
    """Unit-normalize an ``array`` vector column (zero vectors pass
    through unchanged rather than dividing by zero).  Normalize ONCE at
    ingest and L2/ADC ranking becomes cosine ranking — the standard
    trick that lets one compressed index serve both metrics.  Pure
    expression; composes into the scan."""
    nrm = (f"sqrt(aggregate(transform({vec_col}, x -> CAST(x AS DOUBLE) "
           f"* CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, b) -> a + b))")
    return F.expr(
        f"CASE WHEN {nrm} = 0.0 THEN transform({vec_col}, "
        f"x -> CAST(x AS DOUBLE)) "
        f"ELSE transform({vec_col}, x -> CAST(x AS DOUBLE) / {nrm}) END"
    )


def cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k — the exact baseline. Executes as a single
    scan + TakeOrderedAndProject (per-partition heap + driver merge)."""
    return (
        df.select(F.col(id_col), cosine_expr(vec_col, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------- lsh pairs

def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy dependency in the
    hot path; generated once driver-side and folded into the plan)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_bucket_expr(vec_col: str, dim: int, n_planes: int = 16,
                           seed: int = 42) -> Column:
    """Sign-bit LSH bucket id (int): bit i = sign of <v, plane_i>."""
    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    for i, p in enumerate(planes):
        d = dot_expr(vec_col, p)
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _norm_buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """Vectorized (norm, per-table bucket ids) in ONE numpy pass: the
    (n_tables·n_planes × dim) plane matrix is closed over and the whole
    Arrow batch goes through a single GEMM — measured ~4× faster than
    the equivalent interpreted higher-order-function expression at
    dim=64, and the gap widens with dim·planes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            _hyperplanes(dim, n_planes, seed + 7919 * t)
            for t in range(n_tables)
        ],
        dtype=np.float64,
    ).reshape(n_tables * n_planes, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def _nb(v):
        m = np.array(v.tolist(), dtype=np.float64)
        signs = (m @ planes.T) >= 0  # n × (tables·planes)
        bks = np.stack(
            [
                signs[:, t * n_planes : (t + 1) * n_planes] @ weights
                for t in range(n_tables)
            ],
            axis=1,
        ).astype(np.int32)
        return pd.DataFrame(
            {"norm": np.linalg.norm(m, axis=1), "buckets": list(bks)}
        )

    # `from __future__ import annotations` stringifies inline hints, which
    # pandas_udf's type-hint inference can't resolve — set them directly
    _nb.__annotations__ = {"v": pd.Series, "return": pd.DataFrame}
    return pandas_udf(_nb, "struct<norm: double, buckets: array<int>>")


def _norm_buckets_arrow_fn(dim: int, n_planes: int, n_tables: int,
                           seed: int):
    """Arrow-native (norm, buckets) computation for
    ``embedding_near_dup_pairs`` — the mapInArrow replacement for the
    ``_norm_buckets_udf`` pandas path (guide §4.2).

    Reads the Arrow list buffer directly (``ListArray.flatten`` →
    one contiguous float buffer → reshape) instead of paying the
    pandas conversion (measured ~21 ms per 10k×64 batch for the
    ``Series.tolist`` path vs ~0.01 ms for the buffer view — the
    boundary cost, not the GEMM, dominated the python stage).  The id
    and vector columns pass through as the SAME Arrow arrays (no
    python-side copy; one extra socket memcpy on the way back, which
    is why the function emits ONE row per input row and leaves the
    per-table explode to the JVM — emitting the exploded form here
    would ship every vector ``n_tables``× across the boundary).
    Per-row arithmetic (float64 GEMM against the same plane matrix,
    same sign/pack rule, same ``linalg.norm``) is unchanged, so
    buckets and norms are bit-identical to the pandas_udf path —
    pinned by ``test_norm_buckets_arrow_parity``.

    Input batches must carry exactly (__id, __v); output rows are
    (__id, __v, __norm, __buckets[n_tables])."""
    import numpy as np

    planes = np.array(
        [
            _hyperplanes(dim, n_planes, seed + 7919 * t)
            for t in range(n_tables)
        ],
        dtype=np.float64,
    ).reshape(n_tables * n_planes, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def _fn(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            idc = batch.column(0)
            vec = batch.column(1)
            # exact null/ragged diagnostics (ADVICE r10), zero-copy read
            m = _arrow_list_matrix(vec, "_norm_buckets_arrow_fn", dim)
            signs = (m @ planes.T) >= 0
            bks = np.stack(
                [
                    signs[:, t * n_planes:(t + 1) * n_planes] @ weights
                    for t in range(n_tables)
                ],
                axis=1,
            ).astype(np.int32)
            norm = np.linalg.norm(m, axis=1)
            buckets = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * n_tables, n_tables,
                                   dtype=np.int32)),
                pa.array(bks.reshape(-1)),
            )
            yield pa.RecordBatch.from_arrays(
                [idc, vec, pa.array(norm, type=pa.float64()), buckets],
                names=["__id", "__v", "__norm", "__buckets"],
            )

    return _fn


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Small single-file inputs arrive as one partition; CPU-bound vector
    stages must spread across cores.  No-op when the scan already has
    enough splits (the 100 TB case) and on streaming frames (no static
    partitioning to probe — micro-batch parallelism is the source's)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    cosine_threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate embedding pairs: bucket on hyperplane signatures,
    verify exact cosine within buckets.

    Recall is OR-amplified across ``n_tables`` independent hash tables
    (a pair is a candidate if it collides in ANY table): with per-plane
    collision probability p = 1 - θ/π, candidate probability is
    1 - (1 - p^n_planes)^n_tables.  The band explode carries only
    (id, vec, norm) × n_tables; candidates are deduped on (id_a, id_b)
    BEFORE the cosine verify so multi-table collisions are scored once.
    One shuffle on the (table, bucket) key, one on the pair dedup."""
    # norms+buckets in one Arrow-native numpy pass per batch
    # (mapInArrow: zero-copy list-buffer read, vectors pass through —
    # see _norm_buckets_arrow_fn); the frame feeds BOTH sides of the
    # pair join, so persist the (cheap: id, vec, norm, bucket × tables)
    # result rather than recompute
    from pyspark import StorageLevel
    from pyspark.sql import types as T

    from .dedup import _id_out

    oc = _id_out(df, id_col)
    src = _ensure_parallelism(df).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    out_schema = T.StructType([
        src.schema["__id"],
        src.schema["__v"],
        T.StructField("__norm", T.DoubleType()),
        T.StructField("__buckets", T.ArrayType(T.IntegerType())),
    ])
    b = (
        src.mapInArrow(
            _norm_buckets_arrow_fn(dim, n_planes, n_tables, seed),
            out_schema)
        .select("__id", "__v", "__norm",
                F.posexplode("__buckets").alias("__t", "__bucket"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    l = b.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("va"),
        F.col("__norm").alias("na"), "__t", "__bucket",
    )
    r = b.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("vb"),
        F.col("__norm").alias("nb"), "__t", "__bucket",
    )
    return (
        l.join(r, ["__t", "__bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "cosine",
            F.expr(
                "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                "CAST(0 AS DOUBLE), (a, v) -> a + v) / (na * nb)"
            ),
        )
        .filter(F.col("cosine") >= cosine_threshold)
        .select(oc("id_a"), oc("id_b"), "cosine")
    )


# --------------------------------------------------------------------- ivf

class KMeansModel:
    """Distributed-k-means result: centroids + cluster sizes + the
    inertia trace.  ``assign`` scores new data with the same broadcast
    argmin expression the fit used (no shuffle)."""

    def __init__(self, centroids: list[list[float]], sizes: list[int],
                 inertia_history: list[float]):
        self.centroids = centroids
        self.sizes = sizes
        self.inertia_history = inertia_history

    def assign(self, df: DataFrame, vec_col: str,
               out_col: str = "cluster_id") -> DataFrame:
        return df.withColumn(
            out_col, assign_clusters_col(vec_col, self.centroids))


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int,
    iters: int = 10,
    init_centroids: list[list[float]] | None = None,
    sample_fraction: float = 0.1,
    sample_iters: int = 5,
    seed: int = 42,
    track_inertia: bool = True,
) -> KMeansModel:
    """FULL-data distributed Lloyd iterations — the scale path past
    ``ivf_build``'s sample-only fit (sample-fit is right when every
    cluster is well-represented in a 100k sample; refining over ALL
    rows is right when clusters are thin, skewed, or k is large
    relative to the sample).

    Each iteration is ONE aggregation job: the broadcast argmin
    expression assigns every row, then a grouped pass computes per-
    cluster counts + per-dimension DECIMAL(38,9)-exact coordinate sums
    (k·(dim+1) numbers to the driver — O(k·dim) driver state, like
    train_logreg's O(dim)).  Exact decimal accumulation + first-min
    tie-breaking make the fitted centroids bit-identical under any
    partitioning, so a re-fit on a resized cluster reproduces the model.

    ``init_centroids`` pins initialization (tests/oracles); otherwise
    init comes from ``ivf_build``'s vectorized sample Lloyd (cheap,
    good starting point).  Empty clusters keep their previous centroid.
    ``sizes`` are the cluster populations at the LAST assignment (the
    returned centroids are the means of exactly those members —
    standard Lloyd bookkeeping; ``assign`` with the returned centroids
    can move boundary points once more).
    """
    if k <= 0 or iters <= 0 or dim <= 0:
        raise ValueError("k, dim and iters must be positive")
    if init_centroids is not None:
        if len(init_centroids) != k or any(len(c) != dim
                                           for c in init_centroids):
            raise ValueError(f"init_centroids must be {k} x {dim}")
        C = [[float(v) for v in c] for c in init_centroids]
    else:
        _, C = ivf_build(df, vec_col, dim, nlist=k,
                         sample_fraction=sample_fraction,
                         iters=sample_iters, seed=seed)
    proj = df.select(F.col(vec_col).alias("__v")).filter(
        F.col("__v").isNotNull()).persist()
    try:
        sizes = [0] * k
        history: list[float] = []
        for _ in range(iters):
            # vectorized at ANY k: iterating re-literalizes the
            # centroids, so the expression path would recompile its
            # whole unrolled distance tree every round
            assigned = proj.withColumn(
                "__c", _assign_vectorized_col("__v", C))
            aggs = [F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")]
            aggs += [
                F.expr(
                    f"CAST(SUM(CAST(CAST(element_at(__v, {j + 1}) AS "
                    f"DOUBLE) AS DECIMAL(38,9))) AS DOUBLE)"
                ).alias(f"s{j}")
                for j in range(dim)
            ]
            if track_inertia:
                assigned = assigned.withColumn(
                    "__d", _min_sq_dist_col("__v", C, vectorized=True))
                aggs.append(F.expr(
                    f"CAST(SUM(CAST(__d AS DECIMAL(38,9))) AS DOUBLE)"
                ).alias("inert"))
            rows = assigned.groupBy("__c").agg(*aggs).collect()
            sizes = [0] * k
            newC = [list(c) for c in C]
            inerts = [0.0] * k
            for r in rows:
                ci = r["__c"]
                sizes[ci] = r["n"]
                if r["n"] > 0:
                    newC[ci] = [r[f"s{j}"] / r["n"] for j in range(dim)]
                if track_inertia:
                    inerts[ci] = r["inert"]
            C = newC
            if track_inertia:
                # index-ordered fold so the trace is partition-invariant
                history.append(sum(inerts))
        return KMeansModel(C, sizes, history)
    finally:
        proj.unpersist()


def ivf_build(
    df: DataFrame,
    vec_col: str,
    dim: int,
    nlist: int = 16,
    sample_fraction: float = 0.1,
    iters: int = 5,
    seed: int = 42,
    refine_iters: int = 0,
) -> tuple[DataFrame, list[list[float]]]:
    """Fit IVF centroids on a sample (driver-side Lloyd iterations over at
    most ~100k sampled vectors), then assign every row a cluster id via a
    broadcast argmin expression.  Returns (df+cluster_id, centroids).

    At 100 TB: sample-fit cost is constant; assignment is one scan; write
    the result partitioned by cluster_id so probes prune partitions.
    ``refine_iters > 0`` follows the sample fit with that many FULL-data
    distributed Lloyd rounds (``kmeans_fit`` seeded from the sample
    centroids — one grouped aggregation job each): use it when nlist is
    large relative to the sample or the embedding distribution is
    skewed, so thin clusters get balanced by data the sample missed."""
    rows = (
        df.select(vec_col)
        .sample(fraction=min(sample_fraction, 1.0), seed=seed)
        .limit(100_000)
        .collect()
    )
    import random
    from itertools import chain

    import numpy as np

    rng = random.Random(seed)
    vecs = [r[0] for r in rows if r[0] is not None]
    n = len(vecs)
    if n < nlist:
        raise ValueError(f"not enough sample points ({n}) for nlist={nlist}")
    # vectorized Lloyd: one (chunk, nlist) distance block at a time via
    # the ||p||² - 2p·c + ||c||² expansion — seconds at 100k×768 where a
    # Python triple loop took minutes (VERDICT r1).  Conversion goes
    # through np.fromiter over a flat iterator (0.18 s at 100k×64)
    # instead of np.asarray over nested lists (7.4 s: the nested path
    # pays a per-element sequence-protocol walk PLUS a ~50 MB fresh
    # allocation whose first-touch page faults dominate on this host),
    # and the distance matrix is computed in 16k-row chunks so the
    # temporaries stay small and get reused by the allocator rather
    # than re-faulted (measured r10: 18.9 s -> 2.4 s for the 100k×64
    # fit; per-row arithmetic is unchanged, so centroids are
    # bit-identical to the unchunked form).
    _check_sample_dims(vecs, dim, "ivf_build")
    P = np.fromiter(chain.from_iterable(vecs), dtype=np.float64,
                    count=n * dim).reshape(n, dim)
    # random.sample draws the same index sequence for any equal-length
    # population, so sampling indices keeps the r1-era seeding exactly
    C = P[rng.sample(range(n), nlist)].copy()
    _CH = 16384
    p_sq = np.empty(n, dtype=np.float64)
    for s in range(0, n, _CH):
        blk = P[s:s + _CH]
        p_sq[s:s + _CH] = (blk * blk).sum(axis=1)
    best = np.empty(n, dtype=np.intp)
    for _ in range(iters):
        c_sq = (C * C).sum(axis=1)[None, :]
        for s in range(0, n, _CH):
            blk = P[s:s + _CH]
            d2 = p_sq[s:s + _CH, None] - 2.0 * (blk @ C.T) + c_sq
            best[s:s + _CH] = d2.argmin(axis=1)
        for ci in range(nlist):
            members = P[best == ci]
            if len(members):
                C[ci] = members.mean(axis=0)
    centroids = [list(map(float, c)) for c in C]
    if refine_iters > 0:
        centroids = kmeans_fit(
            df, vec_col, dim, nlist, iters=refine_iters,
            init_centroids=centroids, track_inertia=False,
        ).centroids
    assigned = df.withColumn(
        "cluster_id", assign_clusters_col(vec_col, centroids)
    )
    return assigned, centroids


def _min_sq_dist_col(vec_col: str, centroids: list[list[float]],
                     vectorized: bool = False):
    """Min squared distance to any centroid — same small/large codebook
    split as ``assign_clusters_col`` (unrolled HOF expressions are
    interpreted, so past ~32 centroids one numpy GEMM per Arrow batch
    is the only plan that scales).  ``vectorized=True`` forces the
    Arrow path at any size (iterative fitting — see
    ``_assign_vectorized_col``)."""
    if not vectorized and len(centroids) <= 32:
        dists = ", ".join(
            f"aggregate(zip_with({vec_col}, {_vec_literal(c)}, "
            f"(x, y) -> (CAST(x AS DOUBLE) - y) * "
            f"(CAST(x AS DOUBLE) - y)), "
            f"CAST(0 AS DOUBLE), (a, v) -> a + v)"
            for c in centroids
        )
        return F.expr(f"array_min(array({dists}))")

    import numpy as np
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udf

    Cm = np.asarray(centroids, dtype=np.float64)
    c_sq = (Cm * Cm).sum(axis=1)
    dim = Cm.shape[1]

    def _mind(vs: "pa.Array") -> "pa.Array":
        if len(vs) == 0:
            return pa.array([], type=pa.float64())
        V = _arrow_list_matrix(vs, "_min_sq_dist_col", dim)
        d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ Cm.T) + c_sq
        return pa.array(np.maximum(d2.min(axis=1), 0.0),
                        type=pa.float64())

    _mind.__annotations__ = {"vs": pa.Array, "return": pa.Array}
    return arrow_udf(_mind, "double")(F.col(vec_col))


def _min_sq_dist_pandas_col(vec_col: str, centroids: list[list[float]]):
    """The pre-r11 pandas_udf large-codebook min-distance — kept as the
    parity reference for ``test_min_sq_dist_arrow_parity``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    Cm = np.asarray(centroids, dtype=np.float64)
    c_sq = (Cm * Cm).sum(axis=1)

    def _mind(vs):
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if V.size == 0:
            return pd.Series([], dtype="float64")
        d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ Cm.T) + c_sq
        return pd.Series(np.maximum(d2.min(axis=1), 0.0))

    _mind.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(_mind, "double")(F.col(vec_col))


def _assign_vectorized_col(vec_col: str, centroids: list[list[float]]):
    """Arrow-batched argmin assignment (numpy GEMM per batch) — used
    for large codebooks AND for every ``kmeans_fit`` iteration at any
    k: iterative fitting changes the centroid literals each round, so
    the expression path pays a full codegen compile per iteration
    (measured 14 s vs 5.8 s for a 5-iteration k=16 fit at sf0.1) on
    top of its interpreted per-row O(k·dim) cost.

    arrow_udf since r11 (guide §4.2): the vector column is read as ONE
    contiguous buffer view (``_arrow_list_matrix``) instead of the
    pandas path's per-row ndarray boxing — an O(rows) constant removed
    from every assignment batch at the 100 TB shapes (nlist ≥ 256,
    dim 768) where this path runs.  float64 GEMM / argmin arithmetic
    unchanged → assignments bit-identical to the pandas reference
    (``test_assign_vectorized_arrow_parity``)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udf

    Cm = np.asarray(centroids, dtype=np.float64)
    c_sq = (Cm * Cm).sum(axis=1)
    dim = Cm.shape[1]

    def _assign(vs: "pa.Array") -> "pa.Array":
        if len(vs) == 0:
            return pa.array([], type=pa.int32())
        V = _arrow_list_matrix(vs, "_assign_vectorized_col", dim)
        d2 = c_sq - 2.0 * (V @ Cm.T)
        return pa.array(d2.argmin(axis=1).astype(np.int32),
                        type=pa.int32())

    _assign.__annotations__ = {"vs": pa.Array, "return": pa.Array}
    return arrow_udf(_assign, "int")(F.col(vec_col))


def _assign_vectorized_pandas_col(vec_col: str,
                                  centroids: list[list[float]]):
    """The pre-r11 pandas_udf assignment — kept as the parity reference
    for ``test_assign_vectorized_arrow_parity``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    Cm = np.asarray(centroids, dtype=np.float64)
    c_sq = (Cm * Cm).sum(axis=1)

    def _assign(vs):
        V = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if V.size == 0:
            return pd.Series([], dtype="int32")
        d2 = c_sq - 2.0 * (V @ Cm.T)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    _assign.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(_assign, "int")(F.col(vec_col))


def assign_clusters_col(vec_col: str, centroids: list[list[float]]):
    """Argmin-distance cluster assignment as a Column — a broadcast
    scan, never a shuffle.  Two physical strategies:

    - small codebooks (nlist ≤ 32): an unrolled per-centroid
      ``aggregate(zip_with(...))`` expression — no Python in the path;
    - larger codebooks: one numpy GEMM per Arrow batch via
      ``pandas_udf`` against the closure-captured centroid matrix
      (broadcast with the task).  The interpreted-HOF expression is
      O(nlist·dim) *per row* and its expression tree grows with nlist —
      at IVF-realistic nlist (≥256) the vectorized form is the only
      plan that survives; ``argmin(||p||² − 2p·c + ||c||²)`` drops the
      row-constant ||p||² term."""
    nlist = len(centroids)
    if nlist <= 32:
        dists = [
            f"aggregate(zip_with({vec_col}, {_vec_literal(c)}, "
            f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            f"CAST(0 AS DOUBLE), (a, v) -> a + v)"
            for c in centroids
        ]
        arr = "array(" + ", ".join(dists) + ")"
        return F.expr(f"array_position({arr}, array_min({arr})) - 1").cast("int")
    return _assign_vectorized_col(vec_col, centroids)


def ivf_write_index(
    assigned: DataFrame,
    centroids: list[list[float]],
    path: str,
) -> None:
    """Persist the IVF index: data parquet PARTITIONED BY cluster_id
    (probing nprobe clusters then prunes (nlist-nprobe)/nlist of the
    scan at the file level — check PartitionFilters in the plan) plus a
    centroids sidecar."""
    import json

    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(path)
    with open(f"{path}/_ivf_centroids.json", "w") as f:
        json.dump(centroids, f)


def ivf_read_index(spark, path: str) -> tuple[DataFrame, list[list[float]]]:
    import json

    with open(f"{path}/_ivf_centroids.json") as f:
        centroids = json.load(f)
    return spark.read.parquet(path), centroids


def pq_write_index(
    encoded: DataFrame,
    model: "PQModel",
    path: str,
    cluster_col: str | None = None,
) -> None:
    """Persist a PQ (or IVF-PQ) index: the code table as parquet —
    partitioned by ``cluster_col`` when given, so ``ivf_pq_search``
    probes prune at the file level — plus a codebook sidecar.  The
    sidecar is tiny (``m·k·dsub`` floats) and the code table is 16-64×
    smaller than the float vectors it replaces: at 100 TB this is the
    difference between an index living in hot storage and not."""
    import json

    w = encoded.write.mode("overwrite")
    if cluster_col:
        w = w.partitionBy(cluster_col)
    w.parquet(path)
    with open(f"{path}/_pq_codebooks.json", "w") as f:
        json.dump({"dim": model.dim, "codebooks": model.codebooks}, f)


def pq_read_index(spark, path: str) -> tuple[DataFrame, "PQModel"]:
    import json

    with open(f"{path}/_pq_codebooks.json") as f:
        d = json.load(f)
    return spark.read.parquet(path), PQModel(d["codebooks"], d["dim"])


def ivf_search(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe the nprobe closest clusters only, then exact cosine top-k
    within them.  With cluster-partitioned storage this prunes ~(1 -
    nprobe/nlist) of the scan."""
    order = sorted(
        range(len(centroids)),
        key=lambda ci: sum(
            (float(a) - b) ** 2 for a, b in zip(query, centroids[ci])
        ),
    )
    probe = order[:nprobe]
    return (
        assigned.filter(F.col("cluster_id").isin(probe))
        .select(F.col(id_col), cosine_expr(vec_col, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_pq_search(
    encoded: DataFrame,
    centroids: list[list[float]],
    model: "PQModel",
    id_col: str,
    codes_col: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    cluster_col: str = "cluster_id",
    metric: str = "l2",
    residuals_of: list[list[float]] | None = None,
) -> DataFrame:
    """The full FAISS IVF-PQ architecture on Spark storage: the coarse
    quantizer (``ivf_build`` cluster ids) prunes to the ``nprobe``
    nearest cells — partition pruning when the table is written
    partitioned by ``cluster_col`` — and the scan inside the surviving
    cells runs on PQ codes via ``pq_adc_topk``'s lookup tables.

    Combined effect at 100 TB: read ``nprobe/nlist`` of the partitions
    × ``1/16th`` the bytes per row (m=8 codes vs 64 float64s) — two
    multiplicative IO reductions before a single row is scored, and
    the scoring itself is TakeOrderedAndProject with zero shuffles.

    ``encoded`` needs ``(id_col, codes_col, cluster_col)`` — the
    output of ``ivf_build`` + ``pq_encode_expr``, typically persisted
    once, partitioned by cluster.

    ``metric='ip'`` scores inner product (MIPS): cells probe by
    descending ``<query, centroid>`` and the ADC inside ranks
    descending, mirroring FAISS ``METRIC_INNER_PRODUCT``.

    ``residuals_of`` (FAISS IVFPQ's defining trick): when the codes
    were trained/encoded on RESIDUALS ``v - centroid[cluster]``
    (see ``ivf_residual_expr``), pass the same coarse centroids here
    and each probed cell ADC-scans with its OWN lookup table built
    from the shifted query ``q - centroid[cell]`` — exact because
    ``||v - q||² = ||r_v - (q - c)||²`` within a cell.

    MEASURED honestly (SCALE.md round 7): on 64-dim fixtures the
    recall ceiling is PROBE recall — the fraction of true neighbors
    whose cell gets probed (0.725 at nprobe=16 on the isotropic
    fixture, 0.985 clustered) — and ``pq_refine_topk``'s exact rerank
    already reaches that ceiling exactly, so residual codes are
    recall-NEUTRAL there (isotropic coarse centroids sit near the
    origin; the residual ≈ the raw vector) while costing ~nprobe×
    per query (one LUT branch per probed cell vs one shared-LUT
    scan).  Reach for residuals only when no rerank stage is possible
    AND the coarse quantizer captures real structure (strongly
    clustered data, nlist ≫ intrinsic cluster count); to lift recall
    itself, raise ``nprobe`` — the only lever that moves the ceiling
    (0.725 → 0.915 at nprobe=32 on the isotropic fixture).
    The plan stays 0-shuffle: one filtered ADC scan per probed cell
    (``nprobe`` branch unions of TakeOrdered heads) merged by one
    global top-k.  L2 only — for MIPS the per-cell constant
    ``<q, c>`` would have to be folded in pre-rounding; unsupported
    until needed."""
    if metric not in ("l2", "ip"):
        raise ValueError(f"metric must be 'l2' or 'ip', got {metric!r}")
    if residuals_of is not None and metric != "l2":
        raise ValueError(
            "residuals_of requires metric='l2' (IP needs the per-cell "
            "<query, centroid> constant folded into the ADC score)")
    if metric == "ip":
        order = sorted(
            range(len(centroids)),
            key=lambda ci: -sum(
                float(a) * b for a, b in zip(query, centroids[ci])
            ),
        )
    else:
        order = sorted(
            range(len(centroids)),
            key=lambda ci: sum(
                (float(a) - b) * (float(a) - b)
                for a, b in zip(query, centroids[ci])
            ),
        )
    probe = order[:nprobe]
    if residuals_of is None:
        return pq_adc_topk(
            encoded.filter(F.col(cluster_col).isin(probe)),
            id_col, codes_col, query, model, k=k, metric=metric,
        )
    # residual path: per-cell query shift -> per-cell LUTs; each branch
    # is its own TakeOrderedAndProject head, the union is nprobe*k rows
    parts = []
    for ci in probe:
        qr = [float(a) - float(b) for a, b in zip(query, residuals_of[ci])]
        parts.append(
            pq_adc_topk(
                encoded.filter(F.col(cluster_col) == ci),
                id_col, codes_col, qr, model, k=k,
            )
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionAll(p)
    return merged.orderBy(F.col("adc").asc(), F.col(id_col)).limit(k)


def ivf_residual_expr(
    vec_col: str,
    cluster_col: str,
    centroids: list[list[float]],
) -> Column:
    """The residual ``v - centroid[cluster]`` as an ``array<double>``
    column — what FAISS IVFPQ feeds its product quantizer instead of
    the raw vector (`faiss/IndexIVFPQ` ``by_residual``, the default).
    Compose: ``ivf_build`` assigns cells, this produces the residual,
    ``pq_fit``/``pq_encode_expr`` run UNCHANGED on it, and
    ``ivf_pq_search(..., residuals_of=centroids)`` searches with
    per-cell shifted-query LUTs.

    Pure codegen (one literal ``array<array<double>>`` lookup + a
    ``zip_with`` subtract): encoding a 100 TB corpus stays a
    zero-shuffle narrow map."""
    cells = ("array(" + ", ".join(
        "array(" + ", ".join(f"{float(v)!r}D" for v in c) + ")"
        for c in centroids
    ) + ")")
    return F.expr(
        f"zip_with(transform({vec_col}, x -> CAST(x AS DOUBLE)), "
        f"element_at({cells}, CAST({cluster_col} AS INT) + 1), "
        f"(x, c) -> x - c)"
    )


# ---------------------------------------------------------------- knn join

def _probe_clusters_udf(centroids: list[list[float]], nprobe: int):
    """pandas_udf: the ``nprobe`` nearest centroid ids per vector
    (stable argsort — deterministic under distance ties).  Replaced in
    ``knn_join`` by ``_probe_clusters_arrow_fn`` (r10, guide §4.2);
    kept as the parity reference for
    ``test_probe_clusters_arrow_parity``."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    n = min(nprobe, len(centroids))

    @pandas_udf("array<int>")
    def _probe(vs):
        import pandas as pd

        V = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if V.size == 0:
            return pd.Series([], dtype=object)
        # ||v||^2 is constant per row — argmin order unaffected, dropped
        d2 = c_sq - 2.0 * (V @ C.T)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :n].astype("int32")
        return pd.Series(list(idx))

    return _probe


def _probe_clusters_arrow_fn(centroids: list[list[float]], nprobe: int):
    """Arrow-native probe assignment for ``knn_join`` IVF mode — the
    mapInArrow replacement for ``_probe_clusters_udf`` (guide §4.2,
    same template as ``_norm_buckets_arrow_fn``): the query vector
    column is read as ONE contiguous buffer view instead of boxing a
    fresh ndarray per row, the (__qid, __qv, __qn) columns pass
    through as the same Arrow arrays, and the function emits ONE row
    per input row (the ``nprobe`` probe ids as a list), leaving the
    explode to the JVM.  float64 distance / stable-argsort arithmetic
    is unchanged → probes bit-identical to the pandas path (pinned by
    ``test_probe_clusters_arrow_parity``).

    Input batches must carry exactly (__qid, __qv, __qn); output rows
    are (__qid, __qv, __qn, __probes[min(nprobe, nlist)])."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    nsel = min(nprobe, len(centroids))
    dim = C.shape[1]

    def _fn(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            vec = batch.column(1)
            # exact null/ragged diagnostics (ADVICE r10), zero-copy read
            m = _arrow_list_matrix(vec, "_probe_clusters_arrow_fn", dim)
            # ||v||^2 is constant per row — argmin order unaffected
            d2 = c_sq - 2.0 * (m @ C.T)
            idx = np.argsort(d2, axis=1, kind="stable")[:, :nsel].astype(
                np.int32)
            probes = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * nsel, nsel,
                                   dtype=np.int32)),
                pa.array(idx.reshape(-1)),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), vec, batch.column(2), probes],
                names=["__qid", "__qv", "__qn", "__probes"],
            )

    return _fn


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    centroids: list[list[float]] | None = None,
    nprobe: int = 4,
    n_blocks: int | None = None,
    round_digits: int = 4,
    exclude_self: bool = False,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Batched k-nearest-neighbour join: for EVERY query row, the top-k
    corpus rows by cosine — the retrieval-eval / hard-negative-mining /
    RAG-indexing primitive (``cosine_topk`` answers one query; this
    answers |Q| of them in one distributed pass).

    Two partitioning modes:

    - **IVF mode** (``centroids`` given): corpus rows key on their argmin
      cluster; each query replicates to its ``nprobe`` nearest clusters.
      Cost ≈ ``nprobe/nlist`` of the exact join; recall < 1 unless
      ``nprobe == nlist`` (then exact, the q73 oracle setting).
    - **Exact block mode** (no centroids): corpus rows key on
      ``hash(id) % n_blocks``; each query replicates to every block.
      ``n_blocks=None`` (default) adapts to the corpus: ~8k rows per
      block, capped at 64 — pass an explicit count for a fixed layout.
      Exact at |Q|·|C| GEMM flops, spread across ``n_blocks`` cogroups —
      the brute-force baseline, viable when one side is small.

    Each cogroup computes ONE numpy GEMM (Arrow-batched, no per-row
    Python) and emits a per-query local top-k; the global top-k is a
    window over the unioned candidates — correct because every
    (query, neighbour) pair appears in exactly one group, and a global
    winner is necessarily a local winner in its own group.

    Cross-engine determinism: cosines are rounded to ``round_digits``
    and ranked by ``(cosine DESC, neighbour id)`` — a total order any
    engine reproduces (near-ties collapse to equal rounded values and
    fall back to the id).  Output: ``query_id, neighbor_id, cosine,
    rank``.

    ``max_cluster_size`` (IVF mode) row-caps the corpus side of a
    cluster before the cogroup — the same skew guard as the LSH bucket
    caps: one boilerplate mega-cluster would otherwise concentrate a
    |Q_c|×|C_c| GEMM on one task.  Capped members drop out of the
    candidate pool (recall loss, bounded memory); block mode needs no
    cap because its keys are hash-uniform by construction."""
    import numpy as np

    qn = queries.select(
        F.col(q_id).alias("__qid"),
        F.col(q_vec).alias("__qv"),
        norm_expr(q_vec).alias("__qn"),
    )
    cn = corpus.select(
        F.col(c_id).alias("__cid"),
        F.col(c_vec).alias("__cv"),
        norm_expr(c_vec).alias("__cn"),
    )
    if centroids is not None:
        from pyspark.sql import types as T

        probe_schema = T.StructType(list(qn.schema.fields) + [
            T.StructField("__probes", T.ArrayType(T.IntegerType()))])
        qk = (
            qn.mapInArrow(
                _probe_clusters_arrow_fn(centroids, nprobe), probe_schema)
            .select("__qid", "__qv", "__qn",
                    F.explode("__probes").alias("__key"))
        )
        ck = cn.withColumn(
            "__key", assign_clusters_col("__cv", centroids).cast("int")
        )
        if max_cluster_size is not None:
            from pyspark.sql import Window

            wcap = Window.partitionBy("__key").orderBy("__cid")
            ck = (
                ck.withColumn("__rn", F.row_number().over(wcap))
                .filter(F.col("__rn") <= max_cluster_size)
                .drop("__rn")
            )
    else:
        spark = corpus.sparkSession
        if n_blocks is None:
            # adaptive: target ~8k corpus rows per block — enough work to
            # amortize each cogroup's Arrow+Python overhead, small enough
            # to bound per-task GEMM memory; one cheap count() job.  A
            # small corpus collapses to few blocks (a 2k-row corpus in 32
            # fixed blocks pays 32 task setups for trivial GEMMs).
            cnt = corpus.count()
            n_blocks = max(1, min(64, -(-cnt // 8192)))
        blocks = spark.range(n_blocks).select(
            F.col("id").cast("int").alias("__key")
        )
        qk = qn.crossJoin(F.broadcast(blocks))
        ck = cn.withColumn(
            "__key", F.pmod(F.xxhash64("__cid"), F.lit(n_blocks)).cast("int")
        )

    local_k = k + 1 if exclude_self else k

    def _topk(qt, ct):
        # Arrow-native cogroup (guide §4.2): each side's vector column
        # is read as ONE contiguous buffer view (ListArray.flatten →
        # reshape) instead of the per-row ndarray boxing the pandas
        # path paid before the GEMM.  float64 GEMM / round / lexsort
        # arithmetic is unchanged → output bit-identical (pinned by
        # test_knn_cogroup_arrow_parity).
        import pyarrow as pa

        def _mat(tbl, col):
            # exact null/ragged diagnostics (ADVICE r10): the old
            # flat.size % n heuristic passed when ragged rows happened
            # to compensate (one null + one double-length vector)
            return _arrow_list_matrix(tbl.column(col), col, None)

        if qt.num_rows == 0 or ct.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())})
        Q = _mat(qt, "__qv")
        Cv = _mat(ct, "__cv")
        sims = (Q @ Cv.T) / np.outer(
            qt.column("__qn").to_numpy(zero_copy_only=False),
            ct.column("__cn").to_numpy(zero_copy_only=False),
        )
        sims = np.round(sims, round_digits)
        qids = qt.column("__qid").to_numpy(zero_copy_only=False)
        cids = ct.column("__cid").to_numpy(zero_copy_only=False)
        cut = min(local_k, sims.shape[1])
        out_q, out_c, out_s = [], [], []
        for i in range(sims.shape[0]):
            # total order (cosine desc, neighbour id asc); lexsort keys
            # are least-significant first
            order = np.lexsort((cids, -sims[i]))[:cut]
            out_q.append(np.full(len(order), qids[i]))
            out_c.append(cids[order])
            out_s.append(sims[i][order])
        return pa.table(
            {"query_id": pa.array(
                np.concatenate(out_q).astype(np.int64, copy=False)),
             "neighbor_id": pa.array(
                np.concatenate(out_c).astype(np.int64, copy=False)),
             "cosine": pa.array(
                np.concatenate(out_s).astype(np.float64, copy=False))})

    cand = (
        qk.groupBy("__key")
        .cogroup(ck.groupBy("__key"))
        .applyInArrow(_topk, "query_id long, neighbor_id long, cosine double")
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------- semdedup

def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    cosine_threshold: float = 0.95,
    n_clusters: int = 16,
    iters: int = 3,
    sample_fraction: float = 1.0,
    seed: int = 42,
    max_cluster_size: int | None = None,
    return_removed: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    cluster the embeddings, find intra-cluster cosine near-duplicate
    pairs, and drop every member of a near-dup connected component except
    its minimum id (the paper keeps a representative per group too, but
    chooses by centroid distance; min-id is used here so the output is
    deterministic and cross-engine checkable).

    Candidate generation is cluster-bounded — no all-pairs: the pair join
    keys on ``cluster_id``, so per-cluster cost is O((N/k)²) and total
    cost N²/k, tunable by ``n_clusters``.  ``max_cluster_size`` (optional)
    row_number-caps pathological clusters exactly like the LSH bucket
    caps in ``dedup.py`` — capped members keep their rows (dedup recall
    loss, never correctness loss on survivors).  Exact copies always
    share a cluster (identical vectors → identical argmin centroid), so
    recall for TRUE duplicates is 1.0 regardless of the k-means fit;
    near-but-not-identical pairs can straddle a cluster boundary — that
    is SemDeDup's documented approximation, not a bug here.

    Shuffle budget: assignment is a broadcast argmin scan (no shuffle);
    one shuffle keys the pair join on cluster_id; connected components
    adds 2 shuffles per label-propagation round on (id, label) longs.
    Embedding vectors cross the wire only into the cluster-keyed join —
    at 100 TB, write the assigned table partitioned by cluster_id first
    and this becomes a co-located self-join.

    Returns the surviving rows of ``df`` (or the removed ids with their
    component root when ``return_removed``)."""
    from .dedup import _integral_id, connected_components

    if not _integral_id(df, id_col):
        # the intra-cluster pair stage and connected components both key
        # on longs; a silent coercion would NULL string ids — fail loudly
        # with the standard escapes instead
        raise ValueError(
            f"semantic_dedup requires an integral id column (got "
            f"{df.schema[id_col].dataType.simpleString()}); map ids to "
            "longs first (F.xxhash64(id) or a row_number catalog) and "
            "join the survivors back."
        )

    _, cents = ivf_build(
        df, vec_col, dim, nlist=n_clusters,
        sample_fraction=sample_fraction, iters=iters, seed=seed,
    )
    # assign over the parallelism-ensured frame, NOT ivf_build's
    # `assigned` (r11): the sf0.1 embeddings scan has 2 splits, so the
    # whole norm+argmin map ran on 2 of 32 cores (profiled: 0.97 s of
    # the 2.26 s executor CPU in one 2-task stage).  The fit above
    # still samples the ORIGINAL df — repartitioning before the sample
    # would reorder it and change the (oracle-replayed) centroids;
    # repartitioning only the assignment input keeps every per-row
    # value identical.  No-op at scale where the scan has splits.
    assigned = _ensure_parallelism(df).withColumn(
        "cluster_id", assign_clusters_col(vec_col, cents)
    )
    b = assigned.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        norm_expr(vec_col).alias("__norm"),
        "cluster_id",
    )
    if max_cluster_size is not None:
        from pyspark.sql import Window

        b = (
            b.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("cluster_id").orderBy("__id")
                ),
            )
            .filter(F.col("__rn") <= max_cluster_size)
            .drop("__rn")
        )
    # Intra-cluster pairs via ONE blocked GEMM per cluster (applyInArrow):
    # each cluster's members arrive as one Arrow group, the pairwise
    # cosine matrix is a single numpy matmul, and only the (id_a, id_b)
    # index pairs above threshold are emitted.  This replaces a self-join
    # whose per-pair interpreted zip_with cosine was the bottleneck
    # (measured ~6.5 s -> sub-second at sf0.1); the Arrow form (guide
    # §4.2) additionally reads the vector column as one contiguous
    # buffer view instead of boxing a fresh ndarray per row — same
    # float64 GEMM, bit-identical pairs (test_semdedup_pairs_arrow_parity).
    # A whole cluster must fit in one executor's memory — that is
    # SemDeDup's own operating point (the paper runs ~50k clusters over
    # 100M+ points precisely so each cluster is small); size n_clusters
    # for ~N/k of a few hundred thousand rows max, and cap stragglers
    # with max_cluster_size.
    def _pairs(tbl):
        import numpy as np
        import pyarrow as pa

        ids = tbl.column("__id").to_numpy(zero_copy_only=False)
        # exact null/ragged diagnostics (ADVICE r10), zero-copy read
        V = _arrow_list_matrix(tbl.column("__v"), "__v", None)
        norms = tbl.column("__norm").to_numpy(zero_copy_only=False)
        sims = (V @ V.T) / np.outer(norms, norms)
        ia, ib = np.nonzero(np.triu(sims >= cosine_threshold, k=1))
        a, b_ = ids[ia], ids[ib]
        lo = np.minimum(a, b_)
        hi = np.maximum(a, b_)
        return pa.table(
            {"id_a": pa.array(lo.astype(np.int64, copy=False)),
             "id_b": pa.array(hi.astype(np.int64, copy=False))})

    edges = (
        b.groupBy("cluster_id")
        .applyInArrow(_pairs, "id_a long, id_b long")
    )
    comps = connected_components(edges)
    removed = comps.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("__removed_id"),
        F.col("cluster_id").alias("kept_id"),
    )
    if return_removed:
        return removed.select(
            F.col("__removed_id").cast("bigint").alias("removed_id"),
            F.col("kept_id").cast("bigint").alias("kept_id"),
        )
    return df.join(
        removed.select("__removed_id"),
        df[id_col] == F.col("__removed_id"),
        "left_anti",
    )


# ------------------------------------------------- scalar quantization (SQ8)

def _arr_lit(vals: list[float]) -> str:
    return "array(" + ", ".join(repr(float(v)) for v in vals) + ")"


def sq_fit(df: DataFrame, vec_col: str, dim: int) -> tuple[list[float], list[float]]:
    """Fit a per-dimension 8-bit scalar quantizer (FAISS ``SQ8``): returns
    ``(mins, spans)`` where ``spans[j] = max_j - min_j`` over the corpus.

    One posexplode shuffle carrying ``(pos, val)`` pairs — fixed-width,
    independent of row width — then a ``dim``-row collect.  (A wide
    2·dim-column single aggregation was measured 5x SLOWER at dim 64:
    the 128-buffer generated aggregate loses to the explode's tight
    loop — don't "optimize" this back.)  At 100 TB the fit can run on a
    sample instead (min/max are order statistics; a small margin on the
    span covers sampling error), but unlike k-means the exact fit is
    itself a single cheap aggregation, so full-corpus fits stay viable
    far longer than PQ/IVF training would."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.min(F.col("val").cast("double")).alias("mn"),
            F.max(F.col("val").cast("double")).alias("mx"),
        )
        .collect()
    )
    mins = [0.0] * dim
    spans = [0.0] * dim
    for r in rows:
        mins[r["pos"]] = float(r["mn"])
        spans[r["pos"]] = float(r["mx"]) - float(r["mn"])
    return mins, spans


def sq_encode_expr(vec_col: str, mins: list[float], spans: list[float]) -> Column:
    """8-bit codes as ``array<int>``:
    ``code_j = floor(clip((v_j - min_j) / span_j * 255, 0, 255) + 0.5)``
    (zero-span dimensions encode to 0).  Pure higher-order-function
    expression — JVM-side, zero shuffle, composes into the scan stage.

    Memory story: float32 embeddings shrink 4x (768-dim: 3 KB -> 768 B),
    float64 8x — at 100 TB of vectors this is the difference between an
    index that fits hot storage and one that doesn't; candidate scans
    become IO-bound on a quarter of the bytes."""
    diff = (
        f"zip_with({vec_col}, {_arr_lit(mins)}, "
        f"(x, m) -> CAST(x AS DOUBLE) - m)"
    )
    return F.expr(
        f"transform(zip_with({diff}, {_arr_lit(spans)}, "
        f"(d, s) -> CASE WHEN s > 0 THEN "
        f"FLOOR(LEAST(GREATEST(d / s * 255.0, 0.0), 255.0) + 0.5) "
        f"ELSE 0.0 END), c -> CAST(c AS INT))"
    )


def sq_decode_expr(code_col: str, mins: list[float], spans: list[float]) -> Column:
    """Dequantized vector (``array<double>``):
    ``dv_j = min_j + code_j * (span_j / 255)``.  Reconstruction error is
    bounded per dimension by ``span_j / 510`` (half a quantization step)."""
    scaled = (
        f"zip_with({code_col}, {_arr_lit(spans)}, "
        f"(c, s) -> CAST(c AS DOUBLE) * (s / 255.0))"
    )
    return F.expr(
        f"zip_with({scaled}, {_arr_lit(mins)}, (t, m) -> m + t)"
    )


def sq_topk(
    df: DataFrame,
    id_col: str,
    code_col: str,
    mins: list[float],
    spans: list[float],
    query: list[float],
    k: int = 10,
    round_digits: int = 9,
) -> DataFrame:
    """Top-k by cosine between the *dequantized* codes and a query vector
    — asymmetric distance computation (query stays full precision, corpus
    is 8-bit).  Single scan over the code column + TakeOrderedAndProject:
    no shuffle, no Python.  Cosines round to ``round_digits`` with an id
    tiebreak so the ranking is a cross-engine total order."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    # decode, dot and norm fuse into ONE zip_with + aggregate pass over
    # the raw codes: HOFs are CodegenFallback (no codegen subexpression
    # elimination), so the naive decode-then-two-aggregates shape
    # re-evaluates the whole decode chain per reference.  Per element:
    # dv = m + c·(s/255) with s/255 prefolded as a driver-side literal
    # (IEEE division — bit-identical to dividing in-engine), then the
    # (dv·q, dv²) pair folds left-to-right, the same operand order as
    # the separate dot_expr/norm_expr — so the cosine values stay
    # bit-identical and the cross-engine hash-parity contract survives.
    trip = ", ".join(
        f"named_struct('m', {float(m)!r}D, 's', {float(s) / 255.0!r}D, "
        f"'q', {float(qj)!r}D)"
        for m, s, qj in zip(mins, spans, query)
    )
    fused = (
        f"aggregate(zip_with({code_col}, array({trip}), "
        f"(c, t) -> struct("
        f"(t.m + CAST(c AS DOUBLE) * t.s) * t.q AS d, "
        f"(t.m + CAST(c AS DOUBLE) * t.s) * (t.m + CAST(c AS DOUBLE) * t.s)"
        f" AS n)), "
        f"struct(CAST(0 AS DOUBLE) AS d, CAST(0 AS DOUBLE) AS n), "
        f"(acc, v) -> struct(acc.d + v.d AS d, acc.n + v.n AS n))"
    )
    out = (
        df.withColumn("__dn", F.expr(fused))
        .select(
            F.col(id_col),
            F.round(
                F.expr("__dn.d") / (F.expr("sqrt(__dn.n)") * F.lit(qnorm)),
                round_digits,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
    return out


def sq_adc_topk(
    df: DataFrame,
    id_col: str,
    code_col: str,
    norm_col: str,
    mins: list[float],
    spans: list[float],
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """The scale-path form of ``sq_topk``: the dot product against
    dequantized codes refactors algebraically to

        dot = sum_j q_j*min_j  +  sum_j (q_j * span_j / 255) * code_j

    i.e. a constant plus a dot product of *raw int codes* against a
    query-transformed weight vector — one fused multiply-add chain over
    tinyint-range ints, never materializing the decoded array.  Requires
    a precomputed dequantized-norm column (standard practice: store the
    norm once at encode time; it is one double per row).

    Floating-point caveat: the refactored sum associates differently
    from ``sq_topk``'s decode-then-dot, so results agree to ~1e-9, not
    bit-exactly — use ``sq_topk`` when cross-engine hash parity matters
    and this form when scanning billions of codes."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    c0 = sum(float(q) * float(m) for q, m in zip(query, mins))
    w = [float(q) * (float(s) / 255.0) for q, s in zip(query, spans)]
    dot = F.expr(
        f"aggregate(zip_with({code_col}, {_arr_lit(w)}, "
        f"(c, wj) -> CAST(c AS DOUBLE) * wj), CAST(0 AS DOUBLE), "
        f"(acc, v) -> acc + v)"
    ) + F.lit(c0)
    return (
        df.select(
            F.col(id_col),
            (dot / (F.col(norm_col) * F.lit(qnorm))).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def sq_norm_expr(code_col: str, mins: list[float], spans: list[float]) -> Column:
    """Norm of the dequantized vector, for storing alongside the codes at
    encode time (feeds ``sq_adc_topk``)."""
    dv = (
        f"zip_with(zip_with({code_col}, {_arr_lit(spans)}, "
        f"(c, s) -> CAST(c AS DOUBLE) * (s / 255.0)), "
        f"{_arr_lit(mins)}, (t, m) -> m + t)"
    )
    return F.expr(
        f"sqrt(aggregate(transform({dv}, x -> x * x), CAST(0 AS DOUBLE), "
        f"(acc, v) -> acc + v))"
    )


# ---------------------------------------------------------------------
# Random projection (Johnson-Lindenstrauss) dimensionality reduction
# ---------------------------------------------------------------------


def rp_signs(in_dim: int, out_dim: int, seed: int = 0) -> list[list[float]]:
    """The deterministic ±1 projection matrix (``in_dim × out_dim``),
    derived from md5 so ANY engine can replay it: ``sign(i, j) = +1``
    iff the first hex digit of ``md5("{seed}:{i}:{j}")`` is even
    (1-based i, j).  md5 is uniform per nibble, so entries are iid
    Rademacher — the Achlioptas construction, which satisfies the JL
    lemma with the same guarantees as Gaussian matrices."""
    import hashlib

    even = set("02468ace")
    return [
        [
            1.0
            if hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[0] in even
            else -1.0
            for j in range(1, out_dim + 1)
        ]
        for i in range(1, in_dim + 1)
    ]


def rp_project(
    df: DataFrame,
    vec_col: str,
    in_dim: int,
    out_dim: int,
    seed: int = 0,
    out_col: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: ``in_dim``-dim vectors
    → ``out_dim``-dim sketches via a deterministic ±1 matrix, scaled by
    ``1/sqrt(out_dim)`` so pairwise distances are preserved in
    expectation (JL: distortion ≤ ε needs out_dim ≈ 8·ln(n)/ε²,
    *independent of in_dim* — 768-dim embeddings sketch to 64 dims for
    million-row corpora).

    Scale shape: the signs fold into the plan as fixed +/- terms, so
    the projection is a zero-shuffle whole-stage-codegen map — no HOF
    lambda (those run interpreted), no Python, no matrix broadcast; it
    rides the scan.  Use it in front of ``knn_join``/
    ``embedding_near_dup_pairs`` to cut GEMM flops ``in_dim/out_dim``×,
    or as the coarse pass of a two-stage retrieval (sketch-rank, then
    exact-rerank the survivors).

    Determinism contract: ``rp_signs`` is pure md5 arithmetic, so an
    auditing engine (DuckDB, Trino) can rebuild the identical matrix
    from ``(seed, in_dim, out_dim)`` alone — no artifact to ship."""
    if in_dim <= 0 or out_dim <= 0:
        raise ValueError("in_dim and out_dim must be positive")
    import math

    signs = rp_signs(in_dim, out_dim, seed)
    inv = 1.0 / math.sqrt(out_dim)
    outs = []
    for j in range(out_dim):
        terms = " ".join(
            f"{'+' if signs[i][j] > 0 else '-'} "
            f"CAST(element_at({vec_col}, {i + 1}) AS DOUBLE)"
            for i in range(in_dim)
        )
        outs.append(F.expr(f"(CAST(0 AS DOUBLE) {terms}) * {inv!r}"))
    return df.withColumn(out_col, F.array(*outs))


# ---------------------------------------------------------------------
# PCA / whitening (embedding-space preprocessing)
# ---------------------------------------------------------------------


class PCAModel:
    """Principal components of an embedding corpus: ``k × dim`` axes
    (rows orthonormal, ordered by descending eigenvalue), the corpus
    mean, and the per-axis eigenvalues of the population covariance.
    ``whiten`` scales each projected coordinate by ``1/sqrt(λ+eps)`` so
    the output has identity covariance — what the SemDeDup/retrieval
    literature preconditions cosine spaces with (whitening decorrelates
    the dominant directions that otherwise drown near-dup contrast)."""

    def __init__(self, mean: list[float], components: list[list[float]],
                 eigenvalues: list[float], whiten: bool = False,
                 eps: float = 1e-9, total_variance: float | None = None):
        self.mean = [float(x) for x in mean]
        self.components = [[float(x) for x in c] for c in components]
        self.eigenvalues = [float(x) for x in eigenvalues]
        self.whiten = bool(whiten)
        self.eps = float(eps)
        self.dim = len(self.mean)
        self.k = len(self.components)
        # trace of the covariance (sum over ALL dim eigenvalues), so the
        # ratio is sklearn-comparable even when k < dim
        self.total_variance = float(
            total_variance if total_variance is not None
            else sum(self.eigenvalues))

    @property
    def explained_variance_ratio(self) -> list[float]:
        tot = self.total_variance or 1.0
        return [v / tot for v in self.eigenvalues]


def pca_fit(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int,
    whiten: bool = False,
    sample_cap: int = 100_000,
    sample_fraction: float | None = None,
    seed: int = 42,
    eps: float = 1e-9,
    full_data: bool = False,
) -> PCAModel:
    """Fit PCA (optionally whitening) on an embedding column.

    Default path (``full_data=False``): ONE sample collect of at most
    ``sample_cap`` rows, then driver-side numpy eigendecomposition —
    covariance estimation saturates around 1e5 rows regardless of
    corpus size (the same argument as ``pq_fit``'s codebook sampling),
    so at 100 TB the fit cost is constant and the only corpus-sized
    pass is the PROJECTION, which is a zero-shuffle codegen map
    (``pca_project_expr``).

    Sampling (ADVICE r7, revised per ADVICE r8 #4):
    ``sample_fraction=None`` (default) draws a UNIFORM
    exactly-min(n, cap) sample in ONE corpus pass — bottom-k by a
    seeded ``rand()`` key (TakeOrderedAndProject: each task keeps a
    cap-sized heap, the driver merges; no count job, no shuffle, no
    second scan).  The r7 fix ran a full ``count()`` first to derive
    a fraction — statistically the same sample, but TWO corpus scans
    at exactly the 100 TB scale the fit targets.  Pass an explicit
    fraction to use ``.sample(fraction)`` + cap instead (``pq_fit``'s
    contract — cheaper per row than the heap when the fraction is
    tiny and a count is already on hand), or exactly ``1.0`` to
    deliberately collect the unsampled head (only sound when the
    input is known unordered).

    ``full_data=True`` computes EXACT full-corpus moments instead: one
    ``mapInPandas`` pass emits per-partition ``(n, Σx, ΣxxT)`` partials
    (float64 GEMM per Arrow batch, d+d² doubles per partition — never
    row-sized) and the driver reduces them.  Caveat stated honestly:
    partials add in partition order, so last-ulp float differences are
    possible across different partitionings (unlike ``kmeans_fit``'s
    decimal sums); eigenvector SIGNS are pinned either way (largest-
    magnitude coordinate made positive), and cross-engine exactness
    comes from pinning the MODEL, not the fit — the oracle pattern
    q155 uses.

    Eigenvalues are of the population covariance (divide by n)."""
    import numpy as np

    if k <= 0 or k > dim:
        raise ValueError(f"k must be in [1, dim]; got k={k} dim={dim}")
    proj = df.select(F.col(vec_col).alias("__v")).filter(
        F.col("__v").isNotNull())
    if full_data:
        import pandas as pd

        def _partials(it):
            n, s, g = 0, np.zeros(dim), np.zeros((dim, dim))
            for pdf in it:
                if not len(pdf):
                    continue
                V = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
                n += V.shape[0]
                s += V.sum(axis=0)
                g += V.T @ V
            yield pd.DataFrame({
                "n": [n], "s": [s.tolist()],
                "g": [g.reshape(-1).tolist()],
            })

        parts = proj.mapInPandas(
            _partials, "n long, s array<double>, g array<double>"
        ).collect()
        n = sum(r["n"] for r in parts)
        if n < 2:
            raise ValueError("pca_fit needs at least 2 vectors")
        s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
        g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in parts],
                   axis=0)
        mean = s / n
        cov = g / n - np.outer(mean, mean)
    else:
        if sample_fraction is None:
            # one-pass uniform bottom-k: rand key + global top-cap
            rows = (proj.withColumn("__r", F.rand(seed))
                        .orderBy("__r").limit(sample_cap)
                        .select("__v").collect())
        else:
            samp = proj
            if sample_fraction < 1.0:
                samp = samp.sample(fraction=sample_fraction, seed=seed)
            rows = samp.limit(sample_cap).collect()
        if len(rows) < 2:
            raise ValueError("pca_fit needs at least 2 vectors")
        # fromiter over a flat iterator, not asarray over nested lists:
        # bit-identical values, ~40x cheaper conversion at the 100k cap
        # (same allocation finding as ivf_build, r10)
        from itertools import chain

        _check_sample_dims([r[0] for r in rows], dim, "pca_fit")
        X = np.fromiter(chain.from_iterable(r[0] for r in rows),
                        dtype=np.float64,
                        count=len(rows) * dim).reshape(len(rows), dim)
        mean = X.mean(axis=0)
        Xc = X - mean
        cov = (Xc.T @ Xc) / X.shape[0]
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps, eig = [], []
    for idx in order:
        v = vecs[:, idx]
        # deterministic sign: the largest-|coordinate| entry is positive
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
        eig.append(float(max(vals[idx], 0.0)))
    return PCAModel([float(x) for x in mean], comps, eig,
                    whiten=whiten, eps=eps,
                    total_variance=float(np.trace(cov)))


def pca_project_expr(vec_col: str, model: PCAModel) -> Column:
    """The projection ``(x - mean) @ componentsᵀ`` (times
    ``1/sqrt(λ+eps)`` per axis when the model whitens) as ONE unrolled
    whole-stage-codegen expression — a left-associated ``+`` chain per
    output coordinate, so an external SQL replay (DuckDB, the q155
    oracle) reproduces every coordinate bit-for-bit from the model
    literals.  Zero shuffles, no UDF, no broadcast: the matrix folds
    into the plan like ``rp_project``'s sign matrix, and projecting a
    100 TB corpus rides the parquet scan."""
    import math

    outs = []
    for ci, comp in enumerate(model.components):
        const = sum(m * c for m, c in zip(model.mean, comp))
        terms = " + ".join(
            f"{float(c)!r} * CAST(element_at({vec_col}, {i + 1}) AS DOUBLE)"
            for i, c in enumerate(comp)
        )
        e = f"({terms}) - {float(const)!r}"
        if model.whiten:
            w = 1.0 / math.sqrt(model.eigenvalues[ci] + model.eps)
            e = f"({e}) * {float(w)!r}"
        outs.append(F.expr(e))
    return F.array(*outs)


def pca_project(
    df: DataFrame, vec_col: str, model: PCAModel, out_col: str = "pca"
) -> DataFrame:
    """Attach the (optionally whitened) PCA projection — see
    ``pca_project_expr`` for the scale shape."""
    return df.withColumn(out_col, pca_project_expr(vec_col, model))


def pca_save(model: PCAModel, path: str) -> None:
    """Persist a PCAModel as one JSON file (driver-sized: k·dim floats)."""
    import json

    with open(path, "w") as f:
        json.dump({
            "format": "elusion_pca_v1", "mean": model.mean,
            "components": model.components,
            "eigenvalues": model.eigenvalues, "whiten": model.whiten,
            "eps": model.eps, "total_variance": model.total_variance,
        }, f)


def pca_load(path: str) -> PCAModel:
    import json

    with open(path) as f:
        d = json.load(f)
    if d.get("format") != "elusion_pca_v1":
        raise ValueError(f"not a PCA model file: {path}")
    return PCAModel(d["mean"], d["components"], d["eigenvalues"],
                    whiten=d["whiten"], eps=d["eps"],
                    total_variance=d["total_variance"])


# ---------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half)
# ---------------------------------------------------------------------


class PQModel:
    """Product-quantizer codebooks: ``m`` subspaces × ``k`` centroids ×
    ``dim/m`` dims.  Compression: a float32 vector stores as ``m``
    small ints — 768-dim float32 @ m=96, k=256 is 3 KB → 96 B (32×),
    the difference between an ANN index that fits executor memory at
    100 TB and one that thrashes."""

    def __init__(self, codebooks: list[list[list[float]]], dim: int):
        self.codebooks = codebooks
        self.dim = dim
        self.m = len(codebooks)
        self.k = len(codebooks[0]) if codebooks else 0
        self.dsub = dim // self.m if self.m else 0


def pq_fit(
    df: DataFrame,
    vec_col: str,
    dim: int,
    m: int,
    k: int,
    iters: int = 5,
    init_centroids: list[list[list[float]]] | None = None,
    sample_fraction: float = 0.1,
    seed: int = 42,
) -> PQModel:
    """Train PQ codebooks: Lloyd over all ``m`` subspaces SIMULTANEOUSLY
    — each iteration is ONE aggregation job for the whole codebook set,
    not ``m`` separate fits (at FAISS-realistic m=96 the per-subspace
    approach is 96× the jobs — hundreds of cluster round-trips — for
    identical math).  Per iteration every row assigns its ``m`` codes
    (expression argmin for small codebooks, Arrow GEMM above that),
    explodes to ``(subspace, code, subvector)`` entries, and a single
    grouped pass computes DECIMAL(38,9)-exact per-dimension sums —
    map-side partial aggregation collapses the explode to ``m·k``
    groups per partition, so the shuffle is codebook-sized, never
    corpus-sized.  Decimal accumulation + first-min argmin keep the
    codebooks bit-identical under any partitioning (same contract as
    ``kmeans_fit``).

    ``init_centroids`` (``m × k × dsub``) pins initialization for
    tests/oracles; otherwise ONE sample collect (≤100k rows) seeds all
    ``m`` subspaces with driver-side vectorized Lloyd.  At 100 TB, fit
    on a sample (codebook training needs ~100k rows regardless of
    corpus size — FAISS practice) and ``pq_encode`` the full corpus;
    the encode is the only corpus-sized pass and it is a zero-shuffle
    map."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if k <= 0 or iters < 0:
        raise ValueError("k must be positive and iters non-negative")
    dsub = dim // m
    proj = df.select(F.col(vec_col).alias("__v")).filter(
        F.col("__v").isNotNull()).persist()
    try:
        if init_centroids is not None:
            if len(init_centroids) != m or any(
                len(b) != k or any(len(c) != dsub for c in b)
                for b in init_centroids
            ):
                raise ValueError(f"init_centroids must be {m} x {k} x {dsub}")
            books = [[[float(v) for v in c] for c in b]
                     for b in init_centroids]
        else:
            import random
            from itertools import chain

            import numpy as np

            rows = (
                proj.sample(fraction=min(sample_fraction, 1.0), seed=seed)
                .limit(100_000)
                .collect()
            )
            vecs = [r[0] for r in rows]
            n = len(vecs)
            if n < k:
                raise ValueError(
                    f"not enough sample points ({n}) for k={k}")
            # same allocation discipline as ivf_build (r10): fromiter
            # over a flat iterator instead of asarray over nested lists,
            # and chunked distance blocks so the temporaries stay small
            # and allocator-reused (first-touch page faults on fresh
            # ~100 MB temporaries dominate the fit wall on slow-fault
            # hosts).  Per-row arithmetic unchanged -> codebooks are
            # bit-identical to the unchunked form.
            _check_sample_dims(vecs, dim, "pq_fit")
            P = np.fromiter(chain.from_iterable(vecs), dtype=np.float64,
                            count=n * dim).reshape(n, dim)
            _CH = 16384
            books = []
            for s in range(m):
                Ps = P[:, s * dsub:(s + 1) * dsub]
                rng = random.Random(seed + s)
                C = Ps[rng.sample(range(n), k)].copy()
                p_sq = np.empty(n, dtype=np.float64)
                for s0 in range(0, n, _CH):
                    blk = Ps[s0:s0 + _CH]
                    p_sq[s0:s0 + _CH] = (blk * blk).sum(axis=1)
                best = np.empty(n, dtype=np.intp)
                for _ in range(5):
                    c_sq = (C * C).sum(axis=1)[None, :]
                    for s0 in range(0, n, _CH):
                        blk = Ps[s0:s0 + _CH]
                        d2 = (p_sq[s0:s0 + _CH, None]
                              - 2.0 * (blk @ C.T) + c_sq)
                        best[s0:s0 + _CH] = d2.argmin(axis=1)
                    for ci in range(k):
                        mem = Ps[best == ci]
                        if len(mem):
                            C[ci] = mem.mean(axis=0)
                books.append([list(map(float, c)) for c in C])
        for _ in range(iters):
            model = PQModel(books, dim)
            entries = F.explode(F.array(*[
                F.struct(
                    F.lit(s).alias("s"),
                    F.element_at("__codes", s + 1).alias("c"),
                    F.expr(
                        f"transform(slice(__v, {s * dsub + 1}, {dsub}), "
                        f"x -> CAST(x AS DOUBLE))"
                    ).alias("x"),
                )
                for s in range(m)
            ])).alias("p")
            # always the Arrow path in the LOOP: each iteration re-
            # literalizes the codebooks, so the expression path would
            # recompile its whole distance tree every round (the same
            # trap kmeans_fit documents; measured 58 s vs 8.7 s per
            # iteration at 200k x m=16·k=64)
            rows = (
                proj.withColumn(
                    "__codes", _pq_assign_vectorized("__v", model))
                .select(entries)
                .groupBy(F.col("p.s").alias("s"), F.col("p.c").alias("c"))
                .agg(
                    F.count("*").alias("n"),
                    *[
                        F.expr(
                            f"CAST(SUM(CAST(element_at(p.x, {j + 1}) AS "
                            f"DECIMAL(38,9))) AS DOUBLE)"
                        ).alias(f"s{j}")
                        for j in range(dsub)
                    ],
                )
                .collect()
            )
            newb = [[list(c) for c in b] for b in books]
            for r in rows:
                if r["n"] > 0:
                    newb[r["s"]][r["c"]] = [
                        r[f"s{j}"] / r["n"] for j in range(dsub)
                    ]
            books = newb
        return PQModel(books, dim)
    finally:
        proj.unpersist()


def pq_encode_expr(vec_col: str, model: PQModel) -> Column:
    """PQ codes as ``array<int>`` (``m`` entries): per subspace, the
    first-min argmin over its ``k`` centroids.  Two physical
    strategies, mirroring ``assign_clusters_col``: small codebooks
    unroll into the distance expression (pure codegen, fuses into the
    scan); past ~1024 total centroid floats one numpy GEMM per Arrow
    batch takes over (the unrolled tree grows ``m·k·dsub`` — measured
    58 s vs 8.7 s for one 200k-row pass at 4096 floats).  Either way
    encoding a 100 TB corpus is a narrow map: no shuffle, and the
    numpy path is Arrow-batched, never row-at-a-time."""
    if model.m * model.k * model.dsub > 1024:
        return _pq_assign_vectorized(vec_col, model)
    codes = []
    for s in range(model.m):
        o = s * model.dsub
        dists = []
        for c in model.codebooks[s]:
            terms = " + ".join(
                f"(CAST(element_at({vec_col}, {o + j + 1}) AS DOUBLE) - "
                f"{float(c[j])!r}) * "
                f"(CAST(element_at({vec_col}, {o + j + 1}) AS DOUBLE) - "
                f"{float(c[j])!r})"
                for j in range(model.dsub)
            )
            dists.append(f"({terms})")
        arr = "array(" + ", ".join(dists) + ")"
        codes.append(
            F.expr(f"array_position({arr}, array_min({arr})) - 1").cast("int")
        )
    return F.array(*codes)


def _pq_assign_vectorized(vec_col: str, model: PQModel) -> Column:
    """All-subspace PQ assignment as one numpy GEMM pass per Arrow
    batch — the codebook tensor ships with the task closure (``m·k·
    dsub`` floats, broadcast-sized).

    arrow_udf since r11 (guide §4.2): the vector column arrives as ONE
    contiguous buffer view (``_arrow_list_matrix``) instead of the
    pandas path's ``Series.tolist`` boxing, and the code lists go back
    as one flat int32 buffer + a uniform offsets array — no per-row
    python objects in either direction.  float64 subspace GEMM / argmin
    arithmetic unchanged → codes bit-identical to the pandas reference
    (``test_pq_assign_arrow_parity``)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udf

    B = [np.asarray(b, dtype=np.float64) for b in model.codebooks]
    m, dsub = model.m, model.dsub
    dim = model.dim

    def _enc(vs: "pa.Array") -> "pa.Array":
        n = len(vs)
        if n == 0:
            return pa.ListArray.from_arrays(
                pa.array([0], type=pa.int32()),
                pa.array([], type=pa.int32()))
        P = _arrow_list_matrix(vs, "_pq_assign_vectorized", dim)
        out = np.empty((n, m), dtype=np.int32)
        for s in range(m):
            Ps = P[:, s * dsub:(s + 1) * dsub]
            C = B[s]
            d2 = ((Ps * Ps).sum(axis=1)[:, None]
                  - 2.0 * (Ps @ C.T)
                  + (C * C).sum(axis=1)[None, :])
            out[:, s] = d2.argmin(axis=1)
        return pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32)),
            pa.array(out.reshape(-1)))

    # module-wide `from __future__ import annotations` stringifies
    # decorator-style type hints, which udf inference can't resolve —
    # attach the real objects (same workaround as _assign_vectorized_col)
    _enc.__annotations__ = {"vs": pa.Array, "return": pa.Array}
    return arrow_udf(_enc, "array<int>")(F.col(vec_col))


def _pq_assign_pandas(vec_col: str, model: PQModel) -> Column:
    """The pre-r11 pandas_udf PQ assignment — kept as the parity
    reference for ``test_pq_assign_arrow_parity``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    B = [np.asarray(b, dtype=np.float64) for b in model.codebooks]
    m, dsub = model.m, model.dsub

    def _enc(vs):
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        P = np.asarray(vs.tolist(), dtype=np.float64)
        out = np.empty((len(P), m), dtype=np.int32)
        for s in range(m):
            Ps = P[:, s * dsub:(s + 1) * dsub]
            C = B[s]
            d2 = ((Ps * Ps).sum(axis=1)[:, None]
                  - 2.0 * (Ps @ C.T)
                  + (C * C).sum(axis=1)[None, :])
            out[:, s] = d2.argmin(axis=1)
        return pd.Series(list(out))

    _enc.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(_enc, "array<int>")(F.col(vec_col))


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    codes_col: str,
    query: list[float],
    model: PQModel,
    k: int = 10,
    round_digits: int = 7,
    metric: str = "l2",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query builds an
    ``m × k`` lookup table of subspace scores driver-side, the per-row
    score is ``m`` literal-array lookups summed — integer indexing +
    ``m`` adds per row, never touching a float vector — and the global
    top-k is TakeOrderedAndProject (per-partition heads + merge, no
    sort, no shuffle).  THE billion-vector scan shape: a 1000-executor
    cluster ADC-scans compressed codes at memory bandwidth.

    ``metric='l2'`` (default) returns ``(id_col, adc)`` ascending by
    squared distance; ``metric='ip'`` scores inner product descending
    (MIPS — retrieval over unnormalized embedding scores; on
    L2-normalized vectors both rank identically to cosine).  Rounded
    with an id tiebreak for a cross-engine total order."""
    if metric not in ("l2", "ip"):
        raise ValueError(f"metric must be 'l2' or 'ip', got {metric!r}")
    luts = []
    for s in range(model.m):
        o = s * model.dsub
        qs = [float(query[o + j]) for j in range(model.dsub)]
        # (d * d, left-associated sum) — NOT `** 2`, whose libm pow()
        # is not guaranteed bit-equal to the multiply a SQL replay does
        if metric == "l2":
            luts.append([
                sum((qj - float(c[j])) * (qj - float(c[j]))
                    for j, qj in enumerate(qs))
                for c in model.codebooks[s]
            ])
        else:
            luts.append([
                sum(qj * float(c[j]) for j, qj in enumerate(qs))
                for c in model.codebooks[s]
            ])
    if model.m * model.k > 1024:
        # Large codebooks: the literal-LUT expression tree carries
        # m*k literal doubles and evaluates interpreted — measured
        # SLOWER than a brute-force dot at m=32 k=256 (1.16 s vs
        # 0.27 s per query over 200k rows).  Same cutover as
        # pq_encode_expr: one numpy gather per Arrow batch.
        score = _pq_adc_vectorized(codes_col, luts)
    else:
        score = None
        for s, lut in enumerate(luts):
            # D-suffixed literals: bare numerics in SQL text parse as
            # DECIMAL, which would silently switch the score arithmetic
            arr = "array(" + ", ".join(f"{float(v)!r}D" for v in lut) + ")"
            term = F.expr(
                f"element_at({arr}, element_at({codes_col}, {s + 1}) + 1)"
            )
            score = term if score is None else score + term
    direction = (F.col("adc").asc() if metric == "l2"
                 else F.col("adc").desc())
    return (
        df.select(
            F.col(id_col),
            F.round(score, round_digits).alias("adc"),
        )
        .orderBy(direction, F.col(id_col))
        .limit(k)
    )


def pq_refine_topk(
    encoded: DataFrame,
    raw: DataFrame,
    id_col: str,
    codes_col: str,
    vec_col: str,
    query: list[float],
    model: "PQModel",
    k: int = 10,
    candidates: int = 100,
    metric: str = "l2",
    centroids: list[list[float]] | None = None,
    nprobe: int = 4,
    cluster_col: str = "cluster_id",
    round_digits: int = 7,
    residuals_of: list[list[float]] | None = None,
) -> DataFrame:
    """Two-stage compressed ANN (the FAISS ``IndexRefineFlat`` /
    DiskANN pattern): ADC-scan the PQ codes for a ``candidates``-sized
    shortlist, then re-rank JUST those ids with exact math over the raw
    vectors and return the top ``k``.

    Why this exists: pure ADC ranking pays the full quantization error
    at the final cut — on structureless (isotropic random) vectors at
    aggressive code budgets, recall@10 sits at 0.2-0.35 (measured,
    SCALE.md round 6).  Reranking restores almost all of it for the
    price of reading ``candidates`` raw vectors per query: the scan
    stays compressed (8-21x fewer bytes), and the exact stage touches
    ~100 rows instead of the corpus — recall is then bounded only by
    whether the true top-k made the shortlist.  Measured at 200k x
    64-dim: m=16 k=64 goes 0.225 -> 0.685 (C=100) -> 0.875 (C=400) on
    the adversarial random fixture and 0.34 -> 0.935 -> 0.99 on the
    clustered one; m=32 k=256 + C=100 reaches recall 1.0 on both.

    ``centroids`` switches the shortlist stage to ``ivf_pq_search``
    (coarse-cell probe + ADC inside; ``metric`` is plumbed through, so
    MIPS probes by descending ``<q, c>`` and ranks descending),
    composing both IO reductions with the recall restore.
    ``residuals_of`` additionally tells the shortlist stage the codes
    encode residuals (see ``ivf_residual_expr``) — the highest-recall
    compressed configuration.  The rerank is a BROADCAST semi-join on
    the candidate ids — at 100 TB the raw table is id-keyed storage
    and only ``candidates`` rows cross the wire; no shuffle of the
    corpus.

    Returns ``(id_col, score)`` — ``score`` is exact (squared L2
    ascending, or inner product descending for ``metric='ip'``),
    rounded with an id tiebreak for a cross-engine total order."""
    if metric not in ("l2", "ip"):
        raise ValueError(f"metric must be 'l2' or 'ip', got {metric!r}")
    if centroids is not None:
        shortlist = ivf_pq_search(encoded, centroids, model, id_col,
                                  codes_col, query, k=candidates,
                                  nprobe=nprobe, cluster_col=cluster_col,
                                  metric=metric,
                                  residuals_of=residuals_of)
    else:
        shortlist = pq_adc_topk(encoded, id_col, codes_col, query, model,
                                k=candidates, metric=metric)
    ids = shortlist.select(id_col)
    if metric == "l2":
        # sequential-fold Σ(x−q)² — NOT ||v||²−2⟨v,q⟩+||q||²: the
        # elementwise left-associated chain is what an external SQL
        # replay writes as an unrolled `+` chain, so scores are
        # bit-identical cross-engine (the q152 oracle relies on this);
        # it only ever evaluates on the `candidates` surviving rows
        q = _vec_literal(query)
        score = F.expr(
            f"aggregate(zip_with({vec_col}, {q}, "
            f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        direction = F.col("score").asc()
    else:
        score = dot_expr(vec_col, query)
        direction = F.col("score").desc()
    return (
        raw.join(F.broadcast(ids), id_col, "left_semi")
        .select(F.col(id_col), F.round(score, round_digits).alias("score"))
        .orderBy(direction, F.col(id_col))
        .limit(k)
    )


def _pq_adc_vectorized(codes_col: str, luts: list[list[float]]) -> Column:
    """ADC score as one numpy gather+sum per Arrow batch — the large-
    codebook path of ``pq_adc_topk``.  Accumulates LEFT-ASSOCIATED in
    float64, subspace by subspace, exactly like the expression path's
    chained double adds, so both strategies are bit-identical and the
    cutover can never flip an oracle-checked ranking.

    arrow_udf since r11 (guide §4.2): the code column (array<int>, m
    entries per row) is read as ONE contiguous int buffer view
    (``_arrow_list_matrix`` discipline) instead of the pandas path's
    ``Series.tolist`` boxing — the ADC scan is THE billion-row shape,
    and the per-row boxing constant was the python stage at scale.
    Gather/sum arithmetic unchanged → scores bit-identical to the
    pandas reference (``test_pq_adc_arrow_parity``)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    L = [np.asarray(t, dtype=np.float64) for t in luts]
    m = len(luts)

    def _score(cs: "pa.Array") -> "pa.Array":
        n = len(cs)
        if n == 0:
            return pa.array([], type=pa.float64())
        if isinstance(cs, pa.ChunkedArray):
            cs = cs.combine_chunks()
        if cs.null_count:
            raise ValueError(
                f"_pq_adc_vectorized: {cs.null_count} null code rows")
        widths = pc.list_value_length(cs).to_numpy(zero_copy_only=False)
        bad = np.flatnonzero(widths != m)
        if bad.size:
            b = int(bad[0])
            raise ValueError(
                f"_pq_adc_vectorized: expected {m} codes per row, row "
                f"{b} has {int(widths[b])}")
        C = cs.flatten().to_numpy(zero_copy_only=False).reshape(n, m)
        out = L[0][C[:, 0]]
        for s in range(1, m):
            out = out + L[s][C[:, s]]
        return pa.array(out, type=pa.float64())

    _score.__annotations__ = {"cs": pa.Array, "return": pa.Array}
    return arrow_udf(_score, "double")(F.col(codes_col))


def _pq_adc_pandas(codes_col: str, luts: list[list[float]]) -> Column:
    """The pre-r11 pandas_udf ADC score — kept as the parity reference
    for ``test_pq_adc_arrow_parity``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    L = [np.asarray(t, dtype=np.float64) for t in luts]

    def _score(cs):
        if len(cs) == 0:
            return pd.Series([], dtype="float64")
        C = np.asarray(cs.tolist(), dtype=np.int64)
        out = L[0][C[:, 0]]
        for s in range(1, len(L)):
            out = out + L[s][C[:, s]]
        return pd.Series(out)

    _score.__annotations__ = {"cs": pd.Series, "return": pd.Series}
    return pandas_udf(_score, "double")(F.col(codes_col))


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """ANN evaluation: per-query recall of an approximate neighbor table
    against the exact one (both in ``knn_join`` output shape: one row
    per (query, neighbor)).  Joins on (query, neighbor) — one semi-join
    + one aggregate, no collect; at 100 TB of eval pairs the cost is
    two key-shuffles of id pairs.

    The denominator is each query's exact-neighbor count — pass both
    tables already truncated to their top-k (``knn_join(k=...)`` output
    is) and this IS recall@k.  Returns ``(query_col, recall)``; mean
    recall is one ``F.avg`` away (see ``mean_recall``)."""
    e = exact.select(
        F.col(query_col).alias("__q"), F.col(neighbor_col).alias("__n")
    )
    a = approx.select(
        F.col(query_col).alias("__q"), F.col(neighbor_col).alias("__n")
    )
    hits = e.join(a, ["__q", "__n"], "left_semi").groupBy("__q").agg(
        F.count("*").alias("__hit")
    )
    denom = e.groupBy("__q").agg(F.count("*").alias("__tot"))
    return (
        denom.join(hits, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            (F.coalesce(F.col("__hit"), F.lit(0)) /
             F.col("__tot").cast("double")).alias("recall"),
        )
    )


def mean_recall(per_query: DataFrame) -> float:
    """Collapse a ``recall_at_k`` frame to its mean (driver sees one
    number)."""
    return float(per_query.agg(F.avg("recall")).first()[0])


def rrf_fuse(
    rankings: list[tuple[DataFrame, str, str]],
    rrf_k: int = 60,
    round_digits: int = 9,
    query_col: str | None = None,
    max_list_rows: int | None = 100_000,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (the standard
    hybrid-search combiner: BM25 + dense ANN, or multiple ANN probes):
    ``score(d) = sum_r 1 / (rrf_k + rank_r(d))`` over the rankings that
    contain ``d``.

    Each entry is ``(df, id_col, score_col)``; ranks derive from
    ``(score DESC, id)`` — a total order, so fusion is deterministic.
    Contributions round to ``round_digits`` and fold as DECIMAL: the
    sum is order-independent and cross-engine reproducible.

    ``query_col`` is the batched form — real hybrid search fuses |Q|
    queries at once (the shape ``knn_join`` / ``bm25_score_batched``
    emit).  Every input df must carry the column; rank windows
    partition by it, fusion groups by ``(query, id)``, and the output
    keeps the query column.  Without it, rankings are single lists and
    the rank window is GLOBAL (single partition) — fine for one
    query's top-k lists, a scale bug for anything larger, which is
    exactly why the batched form exists.  To keep that degradation from
    being SILENT, the single-query path probes each ranking with a
    ``limit(max_list_rows + 1)`` count (early-stopping, never a full
    scan) and raises if any list exceeds ``max_list_rows`` — pass
    ``query_col`` for batched data, or ``max_list_rows=None`` to accept
    the global window knowingly.

    Scale: each ranking pays one window shuffle to rank (skip by
    passing pre-ranked lists of k rows/query); the fusion itself is a
    union + one (query, id)-keyed aggregation over int rows."""
    from pyspark.sql import Window

    if query_col is None and max_list_rows is not None:
        for i, (df, _id, _sc) in enumerate(rankings):
            if df.limit(max_list_rows + 1).count() > max_list_rows:
                raise ValueError(
                    f"rrf_fuse ranking #{i} exceeds max_list_rows="
                    f"{max_list_rows} with no query_col: the rank "
                    "window would be a single global partition. Pass "
                    "query_col for batched multi-query fusion, or "
                    "max_list_rows=None to accept the global window."
                )
    parts = []
    for df, id_col, score_col in rankings:
        order = [F.col(score_col).desc(), F.col(id_col)]
        if query_col is not None:
            w = Window.partitionBy(F.col(query_col)).orderBy(*order)
            parts.append(
                df.select(
                    F.col(query_col).alias("__q"),
                    F.col(id_col).alias("__id"),
                    F.row_number().over(w).alias("__rank"),
                )
            )
        else:
            w = Window.orderBy(*order)
            parts.append(
                df.select(
                    F.col(id_col).alias("__id"),
                    F.row_number().over(w).alias("__rank"),
                )
            )
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    contrib = (
        f"CAST(ROUND(1.0 / ({rrf_k} + CAST(__rank AS DOUBLE)), "
        f"{round_digits}) AS DECIMAL(28,{round_digits}))"
    )
    keys = ["__q", "__id"] if query_col is not None else ["__id"]
    fused = (
        allr.withColumn("__c", F.expr(contrib))
        .groupBy(*keys)
        .agg(
            F.expr("CAST(SUM(__c) AS DOUBLE)").alias("rrf_score"),
            F.count("*").cast("bigint").alias("n_lists"),
        )
    )
    if query_col is not None:
        return fused.select(
            F.col("__q").alias(query_col),
            F.col("__id").alias("id"),
            "rrf_score",
            "n_lists",
        )
    return fused.select(F.col("__id").alias("id"), "rrf_score", "n_lists")


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str | None = "score",
    rank_col: str | None = None,
    rel_col: str | None = None,
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval quality — precision@k, recall@k, MRR@k,
    nDCG@k — for a ranked result set against a relevance set: the
    evaluate side of the knn_join / bm25 / rrf_fuse retrieval stack
    (hard-negative mining and embedding-model regression checks both
    start here).

    ``results``: (query, doc, score) or (query, doc, rank).  When
    ``rank_col`` is None, ranks derive from ``score_col`` descending
    with the doc id as the deterministic tiebreak.  ``qrels``: (query,
    doc[, graded rel]); ``rel_col=None`` means binary relevance.
    Queries present in ``qrels`` but retrieving nothing score 0;
    queries absent from ``qrels`` are dropped (trec_eval convention).

    Every shuffle is keyed by the query (rank windows, joins, aggs) —
    no global window, cost scales with |results| + |qrels| at any
    query count.  nDCG uses the standard (2^rel − 1)/log2(rank+1)
    gain; IDCG ranks each query's relevance set by rel desc (doc-id
    tiebreak) so graded and binary inputs share one path."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    q, d = query_col, doc_col
    rel = (F.col(rel_col).cast("double") if rel_col is not None
           else F.lit(1.0))
    qr = qrels.select(F.col(q).alias("__q"), F.col(d).alias("__d"),
                      rel.alias("__rel"))
    if rank_col is not None:
        res = results.select(F.col(q).alias("__q"), F.col(d).alias("__d"),
                             F.col(rank_col).cast("bigint").alias("__rk"))
    else:
        if score_col is None:
            raise ValueError("need score_col or rank_col")
        wr = Window.partitionBy(F.col(q)).orderBy(
            F.col(score_col).desc(), F.col(d).asc())
        res = results.select(
            F.col(q).alias("__q"), F.col(d).alias("__d"),
            F.row_number().over(wr).alias("__rk"))
    topk = res.filter(F.col("__rk") <= k)

    gain = "(pow(2.0, __rel) - 1.0)"
    matched = topk.join(qr, ["__q", "__d"]).groupBy("__q").agg(
        F.count("*").cast("bigint").alias("hits"),
        F.min("__rk").alias("__first"),
        F.expr(f"SUM({gain} / log2(__rk + 1))").alias("__dcg"),
    )
    wi = Window.partitionBy("__q").orderBy(
        F.col("__rel").desc(), F.col("__d").asc())
    rel_stats = (
        qr.withColumn("__irk", F.row_number().over(wi))
        .groupBy("__q")
        .agg(
            F.count("*").cast("bigint").alias("n_rel"),
            F.expr(
                f"SUM(CASE WHEN __irk <= {k} THEN {gain} / log2(__irk + 1) "
                f"ELSE 0.0 END)"
            ).alias("__idcg"),
        )
    )
    out = (
        rel_stats.join(matched, "__q", "left")
        .select(
            F.col("__q").alias(q),
            "n_rel",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            (F.coalesce("hits", F.lit(0)) / F.lit(float(k))
             ).alias(f"precision_{k}"),
            (F.coalesce("hits", F.lit(0)) / F.col("n_rel")
             ).alias(f"recall_{k}"),
            F.coalesce(1.0 / F.col("__first"), F.lit(0.0)).alias("mrr"),
            F.when(F.col("__idcg") > 0,
                   F.coalesce("__dcg", F.lit(0.0)) / F.col("__idcg"))
            .otherwise(F.lit(0.0)).alias("ndcg"),
        )
    )
    return out
