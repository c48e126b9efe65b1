"""Benchmark decontamination: flag or drop corpus documents whose token
n-grams overlap an evaluation/benchmark set.

The reference engine (DataBora/elusion) has no decontamination operator;
this is a training-data-pipeline extension (SURVEY.md LLM-ops section),
following the standard published recipe: a corpus document is contaminated
when it shares at least one (or ``min_hits``) token n-grams with any
benchmark document (GPT-3 appendix C uses 13-grams; PaLM and Llama use
similar n-gram overlap checks).

Scale shape (the load-bearing part):
- Document BODIES never cross a shuffle.  Corpus text is reduced to
  distinct n-gram *hashes* per document (``shingle_hash_expr`` — xxhash64
  composition over token hashes, no n-gram strings materialized), then
  exploded to fixed-width ``(id, total, hash)`` rows — a narrow map.
- The benchmark side is tiny by nature (eval sets are thousands of docs,
  not billions), so its distinct hash set is BROADCAST; the overlap check
  is a broadcast left-mark join — zero shuffle on the corpus side.
- The only shuffle is the per-document aggregate of ``(id, total,
  matched)`` — map-side combine reduces each partition to one row per
  document before anything moves.
- At 100 TB: corpus-side cost is one linear scan + one hash-keyed
  aggregate of 16-byte rows; benchmark hashes (~1e6 grams = 8 MB)
  broadcast comfortably.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hash_expr

__all__ = [
    "ngram_hash_table",
    "contamination_report",
    "decontaminate",
]


def ngram_hash_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 13
) -> DataFrame:
    """Exploded distinct n-gram hashes: one ``(id, total, gram_hash)`` row
    per distinct token-n-gram per document.

    ``total`` repeats the document's distinct-gram count on every row so a
    downstream aggregate needs no join back to the corpus.  Documents
    shorter than ``n`` tokens contribute one gram: the whole normalized
    text (mirrors ``shingle_hash_expr``'s short-text case)."""
    return (
        df.select(
            F.col(id_col).alias("__id"),
            shingle_hash_expr(text_col, n).alias("__grams"),
        )
        .select(
            "__id",
            F.size("__grams").alias("__total"),
            F.explode("__grams").alias("__gram"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-corpus-document contamination stats vs a benchmark set.

    Returns ``(id_col, n_ngrams, n_matched, contamination)`` where
    ``n_ngrams`` is the document's distinct n-gram count, ``n_matched``
    how many of those appear anywhere in the benchmark, and
    ``contamination = n_matched / n_ngrams``.

    The benchmark's distinct gram-hash set is broadcast — it must be the
    small side (eval sets always are).  Equality is on 64-bit xxhash
    composition, exact up to hash collisions (~2^-64 per gram pair)."""
    bench_grams = (
        ngram_hash_table(benchmark, id_col, bench_text_col or text_col, n)
        .select(F.col("__gram").alias("__bgram"))
        .distinct()
        .withColumn("__mark", F.lit(1))
    )
    exploded = ngram_hash_table(corpus, id_col, text_col, n)
    return (
        exploded.join(
            F.broadcast(bench_grams),
            exploded["__gram"] == bench_grams["__bgram"],
            "left",
        )
        .groupBy("__id")
        .agg(
            F.first("__total").alias("n_ngrams"),
            F.count("__mark").alias("n_matched"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
            F.col("n_matched").cast("bigint").alias("n_matched"),
            (
                F.col("n_matched").cast("double")
                / F.col("n_ngrams").cast("double")
            ).alias("contamination"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    min_hits: int = 1,
    max_fraction: float | None = None,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Drop corpus documents that overlap the benchmark.

    A document is removed when ``n_matched >= min_hits`` (default: any
    single shared n-gram, the published-conservative rule) or — if
    ``max_fraction`` is given — when ``contamination > max_fraction``.
    Returns the surviving corpus rows with their original columns: the
    contaminated-id set (one bigint per dropped doc) is the only thing
    joined back, as a broadcast-friendly anti-join keyed on ``id_col``."""
    report = contamination_report(
        corpus, benchmark, id_col, text_col, n, bench_text_col
    )
    if max_fraction is not None:
        bad = report.filter(F.col("contamination") > max_fraction)
    else:
        bad = report.filter(F.col("n_matched") >= min_hits)
    return corpus.join(
        bad.select(F.col(id_col).alias("__bad_id")),
        corpus[id_col] == F.col("__bad_id"),
        "left_anti",
    )
