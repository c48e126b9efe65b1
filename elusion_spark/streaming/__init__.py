"""Structured Streaming capability layer (see core.py docstring)."""

from .core import (  # noqa: F401
    dedup_stream,
    dsir_score_stream,
    enrich_stream,
    foreach_batch_upsert,
    funnel_stream,
    ingest_corpus_stream,
    near_dup_candidates_stream,
    read_file_stream,
    read_rate_stream,
    run_available_now_to_memory,
    run_available_now_update_to_memory,
    start_update_collect,
    running_totals_stateful,
    score_event_rate_store,
    session_agg,
    stream_event_rate_anomaly,
    stream_stream_join,
    stream_to_rollup,
    stream_write_files,
    windowed_agg,
)
