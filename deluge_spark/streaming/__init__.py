from deluge_spark.streaming.ingest import (  # noqa: F401
    stream_ingest_corpus,
    stream_events_windowed,
)
