"""elusion_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of DataBora/elusion (reference read-only at
/root/reference), re-designed Spark-first for 100 TB scale.

Public surface mirrors the reference's ``CustomDataFrame`` builder
(SURVEY.md §2) plus LLM-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) the reference lacks.
"""

from .dataframe import CustomDataFrame
from .errors import (
    ElusionError,
    FeatureNotAvailable,
    GroupByAllError,
    InvalidOperation,
    LoaderError,
    SchemaMismatchError,
    WriterError,
)
from .session import get_spark
from .sources.loaders import (
    execute_raw_sql,
    load,
    load_csv,
    load_delta,
    load_excel,
    load_folder,
    load_json,
    load_parquet,
    load_xml,
)
from .cache import (
    cache_config,
    cache_stats,
    clear_cache,
    configure_cache,
    create_view,
    drop_view,
    from_view,
    invalidate_cache,
    list_views,
    refresh_view,
)
from .functions.extract import extract_row_from_df, extract_value_from_df
from .operators.temporal import asof_join, range_join, time_rollup
from .operators.decontaminate import (
    contamination_report,
    decontaminate,
)
from .operators.dedup import (
    append_to_signature_store,
    build_signature_store,
    incremental_minhash_pairs,
    minhash_dedup,
    minhash_dedup_pairs,
)
from .operators.scale import (
    join_salted,
    plan_report,
    repartition_for_join,
    write_bucketed,
)
from .operators.similarity import (
    classifier_score,
    knn_join,
    semantic_dedup,
)
from .operators.text import (
    chunk_documents,
    lm_fit,
    lm_load,
    lm_save,
    lm_score,
    lm_score_bigram,
    repetition_signals,
)
from .pipeline import (
    corpus_stats,
    pack_sequences,
    cap_per_group,
    hash_sample,
    prepare_training_corpus,
    sample_to_token_budget,
    stratified_sample,
    train_val_test_split,
    write_corpus,
)
from .scheduler import PipelineScheduler
from .sinks.copydata import (
    CopyConfig,
    copy_data,
    copy_file_to_csv,
    copy_file_to_fabric,
    copy_file_to_parquet,
)
from .sinks.maintenance import compact_files, upsert_partitioned
from .sinks.writers import write_to_excel
from .sources.connectors import (
    ElusionApi,
    from_api_to_df,
    from_azure_with_sas_token,
    from_fabric,
    from_ftp,
    from_ftp_folder,
    from_ftp_folder_with_filename_column,
    from_ftp_with_directory,
    from_ftp_with_port,
    from_ftps,
    from_ftps_folder,
    from_ftps_folder_with_filename_column,
    from_mysql,
    from_postgres,
    ftp_list_files,
    load_from_sharepoint,
    write_to_ftp,
)
from .sources.schema import FileSchema, SchemaBuilder, schema_from_json

__version__ = "0.1.0"

__all__ = [
    "CustomDataFrame",
    "contamination_report",
    "decontaminate",
    "pack_sequences",
    "repetition_signals",
    "semantic_dedup",
    "get_spark",
    "load",
    "load_csv",
    "load_json",
    "load_parquet",
    "load_delta",
    "load_folder",
    "load_excel",
    "load_xml",
    "execute_raw_sql",
    "create_view",
    "from_view",
    "refresh_view",
    "drop_view",
    "list_views",
    "cache_stats",
    "cache_config",
    "configure_cache",
    "clear_cache",
    "invalidate_cache",
    "ElusionError",
    "InvalidOperation",
    "GroupByAllError",
    "SchemaMismatchError",
    "LoaderError",
    "WriterError",
    "FeatureNotAvailable",
    "FileSchema",
    "SchemaBuilder",
    "schema_from_json",
    "PipelineScheduler",
    "prepare_training_corpus",
    "corpus_stats",
    "write_corpus",
    "stratified_sample",
    "sample_to_token_budget",
    "hash_sample",
    "cap_per_group",
    "train_val_test_split",
    "classifier_score",
    "build_signature_store",
    "append_to_signature_store",
    "incremental_minhash_pairs",
    "minhash_dedup",
    "minhash_dedup_pairs",
    "knn_join",
    "lm_fit",
    "lm_load",
    "lm_save",
    "lm_score",
    "lm_score_bigram",
    "chunk_documents",
    "CopyConfig",
    "copy_data",
    "copy_file_to_parquet",
    "copy_file_to_csv",
    "copy_file_to_fabric",
    "compact_files",
    "upsert_partitioned",
    "asof_join",
    "range_join",
    "time_rollup",
    "join_salted",
    "write_bucketed",
    "repartition_for_join",
    "plan_report",
    "extract_value_from_df",
    "extract_row_from_df",
    "ElusionApi",
    "from_api_to_df",
    "from_postgres",
    "from_mysql",
    "from_ftp",
    "from_ftp_folder",
    "from_ftp_folder_with_filename_column",
    "from_ftp_with_directory",
    "from_ftp_with_port",
    "from_ftps",
    "from_ftps_folder",
    "from_ftps_folder_with_filename_column",
    "write_to_excel",
    "write_to_ftp",
    "from_azure_with_sas_token",
    "from_fabric",
    "ftp_list_files",
    "load_from_sharepoint",
]
