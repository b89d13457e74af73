from deluge_spark.plans.admin import (  # noqa: F401
    compact_segments,
    index_summary,
    reindex,
    summarize_source,
    format_bytes,
)
