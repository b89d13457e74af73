from deluge_spark.functions.tokenizer import (  # noqa: F401
    term_counts,
    tokenize_py,
    duckdb_tokens_expr,
)
