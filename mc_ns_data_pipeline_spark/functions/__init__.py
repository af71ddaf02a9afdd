"""Expression library: scalar (F1-F14), text analysis, hashing, vectors."""

from mc_ns_data_pipeline_spark.functions.scalar import (  # noqa: F401
    conditional_concat,
    eastern_local,
    format_eastern,
    md5_row_hash,
    parse_report_ts,
    sanitize_commas,
    sentinel_fill_int,
    strip_suffix,
    trim_all_strings,
    window_start_6h,
)
