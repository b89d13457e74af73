"""Text-analysis functions for training-data pipelines.

All pure JVM-side column expressions (codegen'd, no Python workers), each
with an exactly-matching DuckDB SQL twin (the ``*_SQL`` templates) so every
output is oracle-checkable. Operations: language ID (marker-word heuristic),
quality scoring (length/alpha/stopword ratios), token counting (whitespace +
BPE-ish), and document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deluge_spark.operators.parallel import spread_input

# marker vocabularies for the n-gram/stopword language-ID heuristic;
# fixed priority order breaks ties deterministically
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "and", "of", "to", "is", "that"],
    "es": ["el", "la", "los", "que", "y", "es"],
    "fr": ["le", "la", "les", "et", "est", "que"],
    "zh": ["de", "shi", "le", "zai", "he", "you"],
}
LANG_ORDER = ["de", "en", "es", "fr", "zh"]

STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]

SIMPLE_TOKENS_SQL = "regexp_extract_all(lower({col}), '[a-z0-9]+')"
WS_TOKENS_RE = r"\S+"
BPE_ISH_RE = "[a-z]+|[0-9]|[^a-z0-9\\s]"


def _simple_tokens(col: str):
    return F.expr(f"regexp_extract_all(lower({col}), '[a-z0-9]+', 0)")


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, text) → (doc_id, lang_pred): argmax marker-word count, ties →
    first language in LANG_ORDER."""
    toks = _simple_tokens(text_col)
    counts = {
        lang: F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang])))
        for lang in LANG_ORDER
    }
    m = F.greatest(*counts.values())
    pred = F.lit(None).cast("string")
    # build reversed CASE chain so the FIRST lang in order wins ties
    for lang in reversed(LANG_ORDER):
        pred = F.when(counts[lang] == m, F.lit(lang)).otherwise(pred)
    return spread_input(df).select(F.col(id_col).alias("doc_id"),
                                   pred.alias("lang_pred"))


def lang_id_sql(text_col: str = "text") -> str:
    """DuckDB twin of lang_id's prediction expression."""
    toks = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+')"
    cnt = {
        lang: ("len(list_filter(" + toks + ", t -> t IN ("
               + ",".join(f"'{w}'" for w in LANG_MARKERS[lang]) + ")))")
        for lang in LANG_ORDER
    }
    m = "greatest(" + ",".join(cnt.values()) + ")"
    case = "CASE " + " ".join(
        f"WHEN {cnt[lang]} = {m} THEN '{lang}'" for lang in LANG_ORDER
    ) + " END"
    return case


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, text) → per-doc quality features + composite score.

    Features: n_tokens (simple), n_chars, alpha_ratio (a-z chars / chars),
    stopword_ratio, mean token length. Score = heuristic in [0, 1]:
    clamp(n_tokens/100)·0.4 + alpha_ratio·0.3 + (1−stopword_ratio)·0.3.
    """
    toks = _simple_tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    alpha = F.length(F.regexp_replace(F.lower(text_col), "[^a-z]", ""))
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(0.0)
    mean_len = F.when(n_tok > 0,
                      F.aggregate(toks, F.lit(0),
                                  lambda a, t: a + F.length(t)) / n_tok
                      ).otherwise(0.0)
    score = (F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
             + alpha_ratio * 0.3 + (1.0 - stop_ratio) * 0.3)
    return spread_input(df).select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality"),
    )


def quality_score_sql(text_col: str = "text") -> dict[str, str]:
    """DuckDB twins of each quality_score output column (expr strings)."""
    toks = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+')"
    n_tok = f"len({toks})"
    n_chars = f"length({text_col})"
    alpha = f"length(regexp_replace(lower({text_col}), '[^a-z]', '', 'g'))"
    stop = ("len(list_filter(" + toks + ", t -> t IN ("
            + ",".join(f"'{w}'" for w in STOPWORDS) + ")))")
    alpha_ratio = f"CASE WHEN {n_chars} > 0 THEN {alpha} / {n_chars} ELSE 0.0 END"
    stop_ratio = f"CASE WHEN {n_tok} > 0 THEN {stop} / CAST({n_tok} AS DOUBLE) ELSE 0.0 END"
    mean_len = (f"CASE WHEN {n_tok} > 0 THEN "
                f"list_reduce(list_transform({toks}, t -> length(t)), (a,b) -> a+b) "
                f"/ CAST({n_tok} AS DOUBLE) ELSE 0.0 END")
    score = (f"least({n_tok} / 100.0, 1.0) * 0.4 + ({alpha_ratio}) * 0.3 "
             f"+ (1.0 - ({stop_ratio})) * 0.3")
    return {
        "n_tokens": f"CAST({n_tok} AS BIGINT)",
        "n_chars": f"CAST({n_chars} AS BIGINT)",
        "alpha_ratio": f"ROUND({alpha_ratio}, 6)",
        "stopword_ratio": f"ROUND({stop_ratio}, 6)",
        "mean_token_len": f"ROUND({mean_len}, 6)",
        "quality": f"ROUND({score}, 6)",
    }


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, text) → (doc_id, ws_tokens, bpe_ish_tokens).

    ws = whitespace-delimited; bpe_ish = letter runs + single digits +
    single punctuation marks (a crude byte-pair-style unit count)."""
    # F.lit patterns: avoids SQL string-literal backslash escaping entirely
    ws = F.size(F.regexp_extract_all(F.col(text_col), F.lit(WS_TOKENS_RE), F.lit(0)))
    bpe = F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                      F.lit(BPE_ISH_RE), F.lit(0)))
    return spread_input(df).select(F.col(id_col).alias("doc_id"),
                                   ws.cast("long").alias("ws_tokens"),
                                   bpe.cast("long").alias("bpe_ish_tokens"))


def token_counts_sql(text_col: str = "text") -> dict[str, str]:
    return {
        "ws_tokens": f"CAST(len(regexp_extract_all({text_col}, '{WS_TOKENS_RE}')) AS BIGINT)",
        "bpe_ish_tokens": (f"CAST(len(regexp_extract_all(lower({text_col}), "
                           f"'{BPE_ISH_RE}')) AS BIGINT)"),
    }


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, text) → (doc_id, fp): md5 of the normalized token stream —
    whitespace/punctuation-insensitive content identity (the exact-dedup
    key that survives reformatting)."""
    toks = _simple_tokens(text_col)
    return spread_input(df).select(F.col(id_col).alias("doc_id"),
                                   F.md5(F.concat_ws(" ", toks)).alias("fp"))


def fingerprint_sql(text_col: str = "text") -> str:
    toks = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+')"
    return f"md5(array_to_string({toks}, ' '))"
