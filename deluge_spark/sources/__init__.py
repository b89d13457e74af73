from deluge_spark.sources.readers import (  # noqa: F401
    read_delimited,
    read_json_lines,
    read_lines,
    exclude_paths,
    typed_field,
)
