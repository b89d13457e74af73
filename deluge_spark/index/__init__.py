from deluge_spark.index.stats import corpus_stats, doc_lengths, term_doc_freq  # noqa: F401
from deluge_spark.index.score import bm25_score_query, K1, B  # noqa: F401
