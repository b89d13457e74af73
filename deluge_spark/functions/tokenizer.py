"""Code-aware text analysis (tokenization) — vectorized, three-way mirrored.

The reference delegates all analysis to the Elasticsearch server (the mapping
declares analyzed ``string`` fields, /root/reference/README.md:67-76, and
documents leave the process as opaque JSON, /root/reference/elastic/v7/
bulk.go:41-59). This module implements it natively, in three exactly-agreeing
forms so every downstream result is oracle-checkable:

1. ``term_counts`` / ``_tokenize_pandas`` — the engine path: Arrow-batched
   pandas inside ``mapInPandas`` (no per-row Python UDFs).
2. ``tokenize_py`` — a pure-Python reference used by the pytest BM25 oracle.
3. ``duckdb_tokens_expr`` — the same analysis as a DuckDB SQL expression,
   used by ``__spark_entry__.oracle_sql``.

Modes:

- ``simple``: lowercase, tokens are maximal ``[a-z0-9]+`` runs.
- ``code``: camelCase / acronym boundaries become separators first
  (``getHTTPResponse2`` → ``get http response2``; ``snake_case`` splits on
  ``_`` since ``_`` matches no token), then lowercase, then tokens are
  ``[a-z][a-z0-9]*`` or ``[0-9]+`` runs — Lucene word_delimiter-style
  sub-token analysis for source code identifiers.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# camelCase boundary: lower/digit followed by upper → split
_CAMEL_1 = (r"([a-z0-9])([A-Z])", r"\1 \2")
# acronym boundary: UPPER run followed by Upper+lower word → split (HTTPResponse)
_CAMEL_2 = (r"([A-Z]+)([A-Z][a-z])", r"\1 \2")
# token shapes after lowering
_SIMPLE_TOKEN = r"[a-z0-9]+"
_CODE_TOKEN = r"[a-z][a-z0-9]*|[0-9]+"

_RX_C1 = re.compile(_CAMEL_1[0])
_RX_C2 = re.compile(_CAMEL_2[0])
_RX_SIMPLE = re.compile(_SIMPLE_TOKEN)
_RX_CODE = re.compile(_CODE_TOKEN)

MODES = ("simple", "code")


def tokenize_py(text: str | None, mode: str = "code") -> list[str]:
    """Pure-Python reference tokenizer (test oracle). Must match
    ``_tokenize_pandas`` and ``duckdb_tokens_expr`` token-for-token."""
    if text is None or text == "":
        return []
    if mode == "simple":
        return _RX_SIMPLE.findall(text.lower())
    if mode == "code":
        s = _RX_C1.sub(_CAMEL_1[1], text)
        s = _RX_C2.sub(_CAMEL_2[1], s)
        return _RX_CODE.findall(s.lower())
    raise ValueError(f"unknown tokenizer mode: {mode}")


def _tokenize_pandas(texts: pd.Series, mode: str = "code") -> pd.Series:
    """Vectorized tokenization of a pandas string Series → Series of lists."""
    s = texts.fillna("")
    if mode == "simple":
        return s.str.lower().str.findall(_SIMPLE_TOKEN)
    if mode == "code":
        s = s.str.replace(_CAMEL_1[0], _CAMEL_1[1], regex=True)
        s = s.str.replace(_CAMEL_2[0], _CAMEL_2[1], regex=True)
        return s.str.lower().str.findall(_CODE_TOKEN)
    raise ValueError(f"unknown tokenizer mode: {mode}")


def duckdb_tokens_expr(col: str, mode: str = "code") -> str:
    """DuckDB SQL expression producing the token list for column ``col``.

    Yields a VARCHAR[] identical to ``tokenize_py(col, mode)``; used to make
    every engine query oracle-checkable in ANSI-ish SQL.
    """
    if mode == "simple":
        return f"regexp_extract_all(lower({col}), '{_SIMPLE_TOKEN}')"
    if mode == "code":
        inner = (
            f"regexp_replace(regexp_replace({col}, "
            f"'{_CAMEL_1[0]}', '\\1 \\2', 'g'), "
            f"'{_CAMEL_2[0]}', '\\1 \\2', 'g')"
        )
        return f"regexp_extract_all(lower({inner}), '{_CODE_TOKEN}')"
    raise ValueError(f"unknown tokenizer mode: {mode}")


TERM_COUNTS_SCHEMA = "doc_id long, term string, tf int, dl int"

# digit-run-at-token-start followed by letters splits ("2fast" → 2, fast);
# digits inside a letter-started token do not ("x2y" stays one token) —
# mirrors the code-token alternation [a-z][a-z0-9]*|[0-9]+ for a
# split-on-separator formulation (RE2 has no lookbehind)
_DIGIT_START_FIX = (r"(^|[^a-z0-9])([0-9]+)([a-z])", r"\1\2 \3")
_SEPARATORS = "[^a-z0-9]+"


def _tokenize_arrow(arr: pa.Array, mode: str = "code") -> pa.ListArray:
    """Arrow-native tokenization (RE2 kernels, zero Python objects).

    Token-for-token identical to ``tokenize_py`` (property-tested). This is
    the engine's hot path: the pandas/findall formulation allocates one
    Python str per raw token (~10^8 objects per million docs), which is
    memory-bandwidth-bound and caps multi-core scaling; these kernels stay
    in Arrow C++ end to end."""
    s = pc.fill_null(arr, "")
    if mode == "code":
        s = pc.replace_substring_regex(s, pattern=_CAMEL_1[0],
                                       replacement=r"\1 \2")
        s = pc.replace_substring_regex(s, pattern=_CAMEL_2[0],
                                       replacement=r"\1 \2")
        s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, pattern=_DIGIT_START_FIX[0],
                                       replacement=_DIGIT_START_FIX[1])
    elif mode == "simple":
        s = pc.utf8_lower(s)
    else:
        raise ValueError(f"unknown tokenizer mode: {mode}")
    return pc.split_pattern_regex(s, _SEPARATORS)


def term_counts(df, doc_id_col: str = "doc_id", text_col: str = "content",
                mode: str = "code"):
    """DataFrame[(doc_id, text)] → DataFrame[(doc_id, term, tf, dl)].

    The engine's analysis stage: Arrow batches in, per-batch pandas
    explode+groupby (C-level), long-form term frequencies out. This replaces
    the reference's per-line ``Document.SetData`` parse + projection hot loop
    (/root/reference/ingestor.go:285-327) with one narrow vectorized stage —
    no shuffle; the downstream groupBy supplies the only wide exchange.

    ``dl`` (the document's total token count, needed by BM25) is computed
    batch-locally and carried on every posting row — a doc's tokens all live
    in one input row, so no doc-level join or extra shuffle is ever needed
    downstream (the join this replaces was the build's second-largest
    exchange).

    Documents with zero tokens (empty/NULL text) emit no rows, mirroring the
    reference's silent skip of empty documents (/root/reference/
    ingestor.go:301-322).
    """
    src = df.select(doc_id_col, text_col)
    empty = pa.RecordBatch.from_pydict({
        "doc_id": pa.array([], pa.int64()),
        "term": pa.array([], pa.string()),
        "tf": pa.array([], pa.int32()),
        "dl": pa.array([], pa.int32()),
    })

    def _batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            res = batch_term_counts(batch, doc_id_col, text_col, mode)
            if res is None:
                yield empty
                continue
            doc_ids, terms, tf, dl = res
            yield pa.RecordBatch.from_pydict({
                "doc_id": pa.array(doc_ids, pa.int64()),
                "term": terms,
                "tf": pa.array(tf.astype(np.int32), pa.int32()),
                "dl": pa.array(dl.astype(np.int32), pa.int32()),
            })

    return src.mapInArrow(_batches, schema=TERM_COUNTS_SCHEMA)


def batch_term_counts(batch: pa.RecordBatch, doc_id_col: str, text_col: str,
                      mode: str):
    """One Arrow batch → (doc_ids np.int64, terms pa.StringArray,
    tf np.int64, dl np.int64) term frequencies, or None if no tokens.
    Shared by ``term_counts`` and the map-side partial-postings encoder."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = _tokenize_arrow(col, mode)
    parents = pc.list_parent_indices(toks)
    flat = pc.list_flatten(toks)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    parents = parents.filter(mask)
    if len(flat) == 0:
        return None
    pn = parents.to_numpy(zero_copy_only=False)
    dl_per_row = np.bincount(pn, minlength=batch.num_rows)
    grouped = (pa.table({"i": parents, "term": flat})
               .group_by(["i", "term"], use_threads=False)
               .aggregate([([], "count_all")]))
    gi = grouped.column("i").to_numpy(zero_copy_only=False)
    doc_ids = batch.column(doc_id_col).to_numpy(zero_copy_only=False)
    return (doc_ids[gi].astype(np.int64),
            grouped.column("term").combine_chunks(),
            grouped.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64),
            dl_per_row[gi].astype(np.int64))
