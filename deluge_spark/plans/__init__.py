from deluge_spark.plans.admin import (  # noqa: F401
    index_summary,
    reindex,
    summarize_source,
    format_bytes,
)
