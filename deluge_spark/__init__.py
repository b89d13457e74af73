"""deluge_spark — a PySpark-native full-text indexing + BM25 search engine.

A from-scratch re-expression of the capabilities of the reference
``kbirk/deluge`` (an Elasticsearch bulk-ingestion library) as an idiomatic
Spark engine: the ingestion dataflow (sources, parsing, projection,
error-budget thresholding, batching — see /root/reference/ingestor.go) is
expressed as DataFrame transformations, and the Elasticsearch-side contract
(analysis, inverted index, BM25, top-k) is implemented natively:

- ``deluge_spark.functions.tokenizer`` — vectorized code-aware analysis
- ``deluge_spark.index`` — posting-list codec, sharded segment build,
  corpus stats, BM25 scoring, block-max WAND top-k execution
- ``deluge_spark.operators`` — dedup (exact/MinHash-LSH/SimHash/Jaccard),
  similarity search, doc-id assignment, error-threshold gate
- ``deluge_spark.sources`` — CSV/TSV/JSON readers with the reference's
  lenient null semantics, path excludes, multimodal binary plumbing
- ``deluge_spark.streaming`` — incremental ingest via Structured Streaming
"""

__version__ = "0.1.0"
