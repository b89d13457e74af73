"""Source readers with the reference's ingestion semantics (SURVEY §2A 1-11).

The reference walks directories, frames lines, and parses CSV/TSV/JSON rows
with deliberately lenient semantics. Spark's native readers replace the Go
worker pool — this module pins down the *semantics*, each mapped to the
reference behavior it reproduces:

- record framing: one line = one record (/root/reference/ingestor.go:339-375)
  → ``spark.read.text`` with ``recursiveFileLookup``; compressed inputs
  (gzip et al., ingestor.go:256-270) are decoded transparently by Spark.
- max-line guard: the reference's 2 MB scanner buffer (ingestor.go:31)
  → explicit length filter (count surfaced via the threshold gate).
- path excludes: exact-basename exclusion and empty-file skip
  (/root/reference/util/exclude.go:8-28) → filename filter on
  ``input_file_name()`` / metadata.
- CSV/TSV split: quote-aware, no escape handling, embedded newline = error
  (/root/reference/util/parse.go:8-34) → Spark CSV reader with escape
  disabled, multiLine off.
- null semantics: a field is absent if out of range, empty, or the literal
  string "null" (/root/reference/document/csv.go:33-42) → nullValue="null"
  + empty→NULL normalization.
- typed accessors: lenient coercion, parse failure → (zero, false), never
  an error (/root/reference/document/csv.go:45-129) → ``try_cast`` (NULL on
  failure); timestamps via ``try_to_timestamp`` with a layout.
- projection contract: empty id / empty type / nil source ⇒ row silently
  skipped (/root/reference/ingestor.go:301-322) → ``project_documents``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MAX_LINE_BYTES = 2 * 1024 * 1024  # reference default scan buffer


def read_lines(spark: SparkSession, paths: str | list[str],
               excludes: list[str] | None = None,
               max_line_bytes: int = DEFAULT_MAX_LINE_BYTES) -> DataFrame:
    """Line-framed scan of text files (optionally .gz/.bz2 — Spark decodes
    by extension) → (path, line). Oversized lines are dropped (the
    reference's scanner would error the whole file; we surface the count
    through the threshold gate instead)."""
    df = (spark.read.option("recursiveFileLookup", "true").text(paths)
          .withColumn("path", F.input_file_name())
          .withColumnRenamed("value", "line"))
    df = exclude_paths(df, excludes)
    return df.filter(F.length("line") <= max_line_bytes)


def exclude_paths(df: DataFrame, excludes: list[str] | None,
                  path_col: str = "path") -> DataFrame:
    """Drop rows whose file *basename* exactly matches an exclude — the
    reference's ShouldExclude is exact-name equality, not substring."""
    if not excludes:
        return df
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    return df.filter(~base.isin(excludes))


def _normalize_nulls(df: DataFrame) -> DataFrame:
    """Empty string and literal 'null' → NULL for every string column."""
    for f in df.schema.fields:
        if f.dataType.simpleString() == "string":
            df = df.withColumn(
                f.name,
                F.when((F.col(f.name) == "") | (F.col(f.name) == "null"),
                       F.lit(None)).otherwise(F.col(f.name)))
    return df


def read_delimited(spark: SparkSession, paths: str | list[str],
                   sep: str = ",", schema: str | None = None,
                   header: bool = False,
                   excludes: list[str] | None = None) -> DataFrame:
    """CSV/TSV with the reference's split semantics: quote='\"', escape
    disabled (ParseFields has none), multiLine off (embedded newline is a
    row error there; here it simply terminates the record), empty/'null'
    fields → NULL."""
    reader = (spark.read
              .option("sep", sep)
              .option("quote", '"')
              .option("escape", "")
              .option("multiLine", "false")
              .option("mode", "PERMISSIVE")
              .option("nullValue", "null")
              .option("header", str(header).lower())
              .option("recursiveFileLookup", "true"))
    df = reader.schema(schema).csv(paths) if schema else reader.csv(paths)
    if excludes:
        df = exclude_paths(df.withColumn("path", F.input_file_name()),
                           excludes).drop("path")
    return _normalize_nulls(df)


def read_json_lines(spark: SparkSession, paths: str | list[str],
                    schema: str | None = None,
                    excludes: list[str] | None = None) -> DataFrame:
    """Newline-delimited JSON (the reference's JSON document mode,
    /root/reference/document/json.go:14-28). PERMISSIVE with a corrupt-
    record column so malformed lines feed the error-threshold gate instead
    of failing the job."""
    if schema:
        # line-framed scan + from_json: `_corrupt` is then an ordinary
        # computed column — no datasource corrupt-column query restriction,
        # and crucially NO .cache() of the raw input (a 100 TB corpus must
        # stream through the gate, not pin in cluster memory).
        df = (spark.read.option("recursiveFileLookup", "true").text(paths)
              .withColumn("path", F.input_file_name()))
        df = exclude_paths(df, excludes).drop("path") if excludes else df
        # the native JSON datasource skips blank lines; spark.read.text
        # yields them as empty rows, which from_json would turn into phantom
        # corrupt records that skew the error-threshold gate
        df = df.filter(F.length(F.trim(F.col("value"))) > 0)
        parsed = df.select(F.from_json(
            "value", schema + ", _corrupt string",
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt"}).alias("_r"))
        return parsed.select("_r.*")
    df = (spark.read.option("mode", "PERMISSIVE")
          .option("recursiveFileLookup", "true").json(paths))
    if excludes:
        df = exclude_paths(df.withColumn("path", F.input_file_name()),
                           excludes).drop("path")
    return df


def decompress_bytes(codec: str = "gzip"):
    """Arrow-batched pandas UDF: binary column of compressed blobs → binary.

    Covers the reference's full codec set — gzip / bzip2 / flate (raw
    DEFLATE) / zlib (/root/reference/ingestor.go:255-269). Spark's text
    readers only decode gzip/bzip2 by file EXTENSION; bare flate/zlib
    streams (or compressed blobs stored in a table column) need this."""
    import bz2
    import gzip
    import zlib

    from pyspark.sql.functions import pandas_udf

    if codec == "gzip":
        fn = gzip.decompress
    elif codec == "bzip2":
        fn = bz2.decompress
    elif codec == "flate":                      # raw DEFLATE, no header
        fn = lambda b: zlib.decompress(b, wbits=-15)  # noqa: E731
    elif codec == "zlib":
        fn = zlib.decompress
    elif codec == "none":
        fn = bytes
    else:
        raise ValueError(f"unknown codec: {codec}")

    @pandas_udf("binary")
    def _inflate(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else fn(bytes(b)))

    return _inflate


def read_raw_compressed_lines(spark: SparkSession, paths: str | list[str],
                              codec: str,
                              excludes: list[str] | None = None,
                              max_line_bytes: int = DEFAULT_MAX_LINE_BYTES
                              ) -> DataFrame:
    """Line-framed scan of files in codecs Spark does NOT auto-decode (bare
    flate/zlib streams) → (path, line). binaryFile loads each file whole —
    appropriate for the bulk-of-small-compressed-files shape this exists
    for; extension-decodable .gz/.bz2 should use ``read_lines``."""
    df = (spark.read.format("binaryFile")
          .option("recursiveFileLookup", "true").load(paths)
          .select(F.col("path"), F.col("content")))
    df = exclude_paths(df, excludes)
    inflate = decompress_bytes(codec)
    # frame like bufio.Scanner/ScanLines (ingestor.go:339-375): \r?\n
    # separators, no phantom empty record after a trailing newline
    text = F.regexp_replace(inflate(F.col("content")).cast("string"),
                            "\r?\n$", "")
    lines = (df.select("path", F.split(text, "\r?\n").alias("_lines"))
             .select("path", F.explode("_lines").alias("line")))
    return lines.filter(F.length("line") <= max_line_bytes)


def typed_field(col: str, dtype: str, ts_format: str | None = None):
    """Lenient typed accessor: parse failure → NULL (the (zero, false)
    contract of /root/reference/document/csv.go:45-129).

    bool follows the reference exactly: the case-sensitive literals 'true'
    or '1' → true, anything else present → false (csv.go:108-117 compares
    ``col == "true" || col == "1"`` — no case folding)."""
    c = F.col(col)
    if dtype == "bool":
        return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(
            c.isin("true", "1"))
    if dtype == "timestamp":
        if ts_format:
            return F.try_to_timestamp(c, F.lit(ts_format))
        return F.try_to_timestamp(c)
    return c.try_cast(dtype)


def project_documents(df: DataFrame, id_col, type_col, source_col) -> DataFrame:
    """The (id, type, source) bulk projection with silent empty/null skip
    (/root/reference/ingestor.go:285-327)."""
    out = df.select(F.col(id_col).cast("string").alias("id"),
                    F.col(type_col).cast("string").alias("type"),
                    F.col(source_col).alias("source"))
    return out.filter(
        F.col("id").isNotNull() & (F.col("id") != "")
        & F.col("type").isNotNull() & (F.col("type") != "")
        & F.col("source").isNotNull())
