from deluge_spark.operators.doc_ids import assign_doc_ids  # noqa: F401
