"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 query end-to-end on sf0.001.
``queries()`` exposes one callable per implemented operator (SURVEY.md §2 +
the training-data pipeline ops); ``oracle_sql()`` gives the DuckDB-runnable
ANSI SQL twin for every SQL-expressible one. Hash-based ops (MinHash, SimHash,
RP-LSH) have no SQL twin → rows-only check, by design.

All BM25 queries here run through the engine's JVM-side tokenizer twin
(deluge_spark.operators.dedup.tokens_col — token-identical to the pandas-UDF
path, proven by tests/test_tokenizer.py) so the contract has zero dependence
on executor PYTHONPATH; the pandas/Arrow tokenize path is exercised by the
pytest suite and bench.py.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deluge_spark.functions import text as dtext  # noqa: E402
from deluge_spark.functions.tokenizer import duckdb_tokens_expr, tokenize_py  # noqa: E402
from deluge_spark.operators.dedup import (  # noqa: E402
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    tokens_col,
)
from deluge_spark.operators.similarity import (  # noqa: E402
    ann_index_top_k,
    build_ann_index,
    cosine_near_pairs,
    cosine_near_pairs_lsh,
    cosine_top_k,
    rp_lsh_top_k,
)

K1, B = 1.2, 0.75
SCORE_DP = 4  # rounded-score ordering: deterministic ranks across engines


# ---------------------------------------------------------------------------
# engine-side building blocks (JVM tokenizer twin; one shuffle per stage)
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tf(docs: DataFrame) -> DataFrame:
    return (docs
            .select("doc_id", F.explode(tokens_col("text", "code")).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf")))


# per-(session, sf_dir) cached tf/dl/stats: the five DataFrame-twin BM25
# queries share one tokenize pass instead of re-deriving it per query
_TF_CACHE: dict[tuple[int, str], tuple[DataFrame, DataFrame, int, float]] = {}


def _tf_dl_stats(spark: SparkSession, sf_dir: str):
    key = (id(spark.sparkContext), sf_dir)
    if key not in _TF_CACHE:
        tf = _tf(_docs(spark, sf_dir)).cache()
        dl = tf.groupBy("doc_id").agg(
            F.sum("tf").cast("long").alias("dl")).cache()
        stats = dl.agg(F.count(F.lit(1)).alias("n"),
                       F.avg("dl").alias("avgdl")).collect()[0]
        _TF_CACHE[key] = (tf, dl, int(stats["n"]), float(stats["avgdl"]))
    return _TF_CACHE[key]


def _bm25(spark: SparkSession, sf_dir: str, query: str, k: int,
          lang: str | None = None) -> DataFrame:
    docs = _docs(spark, sf_dir)
    terms = list(dict.fromkeys(tokenize_py(query, "code")))
    tf, dl, n, avgdl = _tf_dl_stats(spark, sf_dir)
    m = tf.filter(F.col("term").isin(terms))
    idf = (m.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
           .select("term", F.log(1.0 + (F.lit(float(n)) - F.col("df") + 0.5)
                                 / (F.col("df") + 0.5)).alias("idf")))
    scored = (m.join(F.broadcast(idf), "term").join(dl, "doc_id")
              .withColumn("ps", F.col("idf") * (F.col("tf") * (K1 + 1.0))
                          / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / avgdl)))
              .groupBy("doc_id").agg(F.sum("ps").alias("s")))
    if lang is not None:
        scored = scored.join(docs.filter(F.col("lang") == lang)
                             .select("doc_id"), "doc_id", "left_semi")
    return (scored.select("doc_id", F.round("s", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k))


# ---------------------------------------------------------------------------
# the real engine behind the driver's oracle: packed-segment build + WAND
# ---------------------------------------------------------------------------

_SHIPPED: set[int] = set()
_SEARCHERS: dict[tuple[int, str], object] = {}
_ANN_INDEXES: dict[tuple[int, str], str] = {}


def _get_ann_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the persisted ANN sign-sketch index ONCE per (session, sf_dir)
    into a temp dir; ann_indexed_topk then serves from bucket lookups."""
    key = (id(spark.sparkContext), sf_dir)
    if key not in _ANN_INDEXES:
        _ensure_shipped(spark)
        idx = tempfile.mkdtemp(prefix="deluge_entry_ann_")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        build_ann_index(emb, idx, n_planes=16, bands=8)
        _ANN_INDEXES[key] = idx
    return _ANN_INDEXES[key]


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship deluge_spark to executors (spark-submit --py-files stand-in) —
    the driver harness imports this module with sys.path tricks only, so
    Python workers need the package via addPyFile."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    repo = os.path.dirname(os.path.abspath(__file__))
    z = os.path.join(tempfile.mkdtemp(prefix="deluge_pkg_"),
                     "deluge_spark_pkg.zip")
    with zipfile.ZipFile(z, "w") as zf:
        pkg = os.path.join(repo, "deluge_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, repo))
    spark.sparkContext.addPyFile(z)
    _SHIPPED.add(key)


def _get_searcher(spark: SparkSession, sf_dir: str):
    """Build the packed index ONCE per (session, sf_dir) into a temp dir and
    return a cached Searcher — every bm25_wand_* query then answers through
    the real engine (index/build.py + index/wand.py), which is what the
    driver's oracle verifies."""
    key = (id(spark.sparkContext), sf_dir)
    if key in _SEARCHERS:
        return _SEARCHERS[key]
    _ensure_shipped(spark)
    from deluge_spark.corpus import documents_as_corpus
    from deluge_spark.index.build import BuildConfig, build_index
    from deluge_spark.index.search import Searcher

    idx = tempfile.mkdtemp(prefix="deluge_entry_idx_")
    build_index(spark, documents_as_corpus(spark, sf_dir), idx,
                BuildConfig(num_shards=8, tokenize_groups=1, shard_batches=1,
                            store_content=False))
    s = Searcher(spark, idx, cache_stats=True)
    _SEARCHERS[key] = s
    return s


def _bm25_wand(spark: SparkSession, sf_dir: str, query: str, k: int,
               lang: str | None = None,
               filters: dict | None = None) -> DataFrame:
    """Engine path: distributed per-shard block-max WAND over the packed
    segments (executor-side filter cogroup when filters are set).
    ``filters`` takes the full Searcher spec grammar (term / terms-IN /
    range dicts); ``lang`` is shorthand for a term filter."""
    s = _get_searcher(spark, sf_dir)
    flt = dict(filters or {})
    if lang:
        flt["lang"] = lang
    out = s.search(query, k, filters=flt or None, mode="distributed",
                   round_dp=SCORE_DP)
    return (out.select("doc_id", F.round("score", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


BATCH_QUERIES = {"multi": ("spark join table", 10),
                 "hot": ("data", 20),
                 "rare_pair": ("window order fast", 15)}
#: per-query-filtered batch: name -> (query, k, lang filter or None) —
#: a MIXED batch (filtered + unfiltered) through search_many(filters=)
BATCH_FILTERED = {"f_en": ("spark join table", 10, "en"),
                  "f_go": ("batch value", 10, "go"),
                  "plain": ("window order fast", 10, None)}


def _bm25_wand_batch(spark: SparkSession, sf_dir: str,
                     spec: dict | None = None) -> DataFrame:
    """Batch engine path: a query SET answered by ONE distributed job
    (Searcher.search_many — union'd segment scan, per-shard per-query
    cost-based TAAT/WAND, single per-query global merge). ``spec`` maps
    name -> (query, k[, lang-filter]); filters resolve via the executor-
    side per-shard cogroup (B7), per query."""
    s = _get_searcher(spark, sf_dir)
    spec = {name: (v + (None,))[:3]
            for name, v in (spec or BATCH_QUERIES).items()}
    filters = {name: {"lang": lang}
               for name, (_, _, lang) in spec.items() if lang}
    out = s.search_many({name: q for name, (q, _, _) in spec.items()},
                        k=max(k for _, k, _ in spec.values()),
                        round_dp=SCORE_DP, filters=filters or None)
    # per-query k differs: apply each query's own k on the merged frame
    from pyspark.sql import Window
    w = Window.partitionBy("query").orderBy(
        F.round("score", SCORE_DP).desc(), F.col("doc_id").asc())
    ks = F.create_map(*[x for name, (_, k, _) in spec.items()
                        for x in (F.lit(name), F.lit(k))])
    return (out.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= ks[F.col("query")]).drop("rn")
            .select("query", "doc_id",
                    F.round("score", SCORE_DP).alias("score"))
            .orderBy("query", F.col("score").desc(), F.col("doc_id").asc()))


#: ES query-DSL parity specs (round 5): bool / phrase / prefix
BOOL_SPEC = dict(must="spark", should="join table", must_not="vector", k=10)
PHRASE_SPEC = ("hash value", 10)
PREFIX_SPEC = ("s", 4, 10)  # (prefix, max_expansions, k)


def _bm25_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean engine path (Searcher.search_bool): must-conjunction +
    should-scoring + must_not-exclusion resolved per shard from the
    decoded postings, scored by the same WAND/TAAT kernels."""
    s = _get_searcher(spark, sf_dir)
    out = s.search_bool(must=BOOL_SPEC["must"], should=BOOL_SPEC["should"],
                        must_not=BOOL_SPEC["must_not"], k=BOOL_SPEC["k"],
                        mode="distributed", round_dp=SCORE_DP)
    return (out.select("doc_id", F.round("score", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


def _bm25_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase engine path (Searcher.search_phrase): conjunctive candidates
    from the postings, adjacency verified JVM-side against the corpus
    content via the SQL tokenizer twin (the shared index stores no
    content, so the corpus table is passed as content_df)."""
    s = _get_searcher(spark, sf_dir)
    content = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").alias("content"))
    phrase, k = PHRASE_SPEC
    out = s.search_phrase(phrase, k=k, round_dp=SCORE_DP,
                          content_df=content)
    return (out.select("doc_id", F.round("score", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


def _bm25_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix engine path (Searcher.search_prefix): capped dictionary
    expansion (df desc, term asc) scored as a disjunction."""
    s = _get_searcher(spark, sf_dir)
    prefix, max_exp, k = PREFIX_SPEC
    out = s.search_prefix(prefix, k=k, max_expansions=max_exp,
                          mode="distributed", round_dp=SCORE_DP)
    return (out.select("doc_id", F.round("score", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


WILDCARD_SPEC = ("*oi*", 6, 10)  # (pattern, max_expansions, k)
BOOST_SPEC = {"spark": 2.5, "join": 0.5}
SUGGEST_SPEC = ("improt tabel respnse", 5)  # (misspelled text, size/token)


def _term_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``term`` suggester (Searcher.suggest_terms): per absent token,
    dictionary terms within ES-AUTO edit distance ranked (distance asc,
    df desc, term asc), prefix_length=1, suggest_mode=missing — the
    did-you-mean surface over the index's term dictionary."""
    s = _get_searcher(spark, sf_dir)
    text, size = SUGGEST_SPEC
    return s.suggest_terms(text, size=size)


def _bm25_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard engine path (Searcher.search_wildcard): dictionary
    expansion of the * / ? pattern (df desc, term asc, capped) scored as
    a disjunction — a leading wildcard costs one dictionary pass, not a
    Lucene index walk."""
    s = _get_searcher(spark, sf_dir)
    pat, max_exp, k = WILDCARD_SPEC
    out = s.search_wildcard(pat, k=k, max_expansions=max_exp,
                            mode="distributed", round_dp=SCORE_DP)
    return (out.select("doc_id", F.round("score", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


def _bm25_boosted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term query boosts (ES term^boost, Searcher.search_bool
    boosts=): each term's idf — and therefore its WAND upper bound —
    scales by the boost, so pruning stays exact under boosting."""
    s = _get_searcher(spark, sf_dir)
    out = s.search_bool(should=FACET_QUERY, k=10, boosts=BOOST_SPEC,
                        mode="distributed", round_dp=SCORE_DP)
    return (out.select("doc_id", F.round("score", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


#: facet aggregation specs (round 5): ES aggs parity over the match set
FACET_QUERY = "spark join table"
FACET_HIST_INTERVAL = 64


def _facet_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine facet path (Searcher.facet_terms): matching-doc counts per
    stored keyword value over the WHOLE match set (any analyzed query term
    present), not the top-k — pushed term-predicate segment decode →
    distinct doc_ids → semi-join stored fields → hash aggregate."""
    s = _get_searcher(spark, sf_dir)
    return s.facet_terms(FACET_QUERY, by="lang", size=10)


def _facet_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """facet_terms over the repo (= documents.source) stored field for a
    hot single-term query — exercises a wider-cardinality group key."""
    s = _get_searcher(spark, sf_dir)
    return s.facet_terms("data", by="repo", size=8)


def _facet_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine histogram facet (Searcher.facet_histogram): doc-length
    buckets of the match set, dl from the per-doc meta table."""
    s = _get_searcher(spark, sf_dir)
    return s.facet_histogram(FACET_QUERY, interval=FACET_HIST_INTERVAL)


def _facet_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``stats`` aggregation (Searcher.facet_stats): count/min/max/
    avg/sum of analyzed doc length over the match set — one
    map-side-combinable aggregate, avg derived from the exact integer
    sum so the value is partition-order independent."""
    s = _get_searcher(spark, sf_dir)
    return s.facet_stats(FACET_QUERY, "dl")


def _facet_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``cardinality`` aggregation (Searcher.facet_cardinality),
    exact mode for the oracle; the HLL++ approx mode is the 100 TB path
    (pytest-gated against the exact count)."""
    s = _get_searcher(spark, sf_dir)
    return s.facet_cardinality(FACET_QUERY, "repo")


def _sorted_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES field-sort + from/size (Searcher.search_sorted): second page
    of the match set ordered by the n_chars stored field desc — scoring
    skipped entirely, global top-(from+k) plan."""
    s = _get_searcher(spark, sf_dir)
    return s.search_sorted(FACET_QUERY, "n_chars", k=10, from_=10)


def _sorted_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``search_after`` (Searcher.search_sorted cursor mode): the
    second page via the first page's final (sort value, doc_id) cursor —
    a strictly-after filter + one size-k heap, the O(k) deep-paging scale
    path (from+size pays O(from+k)). Equals OFFSET paging by contract."""
    s = _get_searcher(spark, sf_dir)
    p1 = s.search_sorted(FACET_QUERY, "n_chars", k=10).collect()
    return s.search_sorted(FACET_QUERY, "n_chars", k=10,
                           search_after=(p1[-1]["n_chars"],
                                         p1[-1]["doc_id"]))


def _bool_msm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``minimum_should_match`` (Searcher.search_bool msm gate):
    candidates must contain >= 2 distinct should terms; scores stay plain
    BM25 over the should terms (the gate never changes scores)."""
    s = _get_searcher(spark, sf_dir)
    out = s.search_bool(should=FACET_QUERY, k=10, minimum_should_match=2,
                        mode="distributed", round_dp=SCORE_DP)
    return (out.select("doc_id", F.round("score", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


MGET_IDS = [42, 7, 3, 10**9]  # one deliberately absent


def _mget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_mget`` (Searcher.get_docs): stored-field fetch by id with a
    column-pruned projection; missing ids are absent, order doc_id asc."""
    s = _get_searcher(spark, sf_dir)
    return s.get_docs(MGET_IDS, fields=["lang", "n_chars"])


_MULTIS: dict = {}


def _get_multi(spark: SparkSession, sf_dir: str):
    """Split the documents corpus into TWO independently-built indexes
    (hash of the stable path, original doc_id dropped — each member
    assigns its own ids) and return a cached MultiSearcher over them."""
    key = (id(spark.sparkContext), sf_dir)
    if key in _MULTIS:
        return _MULTIS[key]
    _ensure_shipped(spark)
    from deluge_spark.corpus import documents_as_corpus
    from deluge_spark.index.build import BuildConfig, build_index
    from deluge_spark.index.multi import MultiSearcher

    corpus = documents_as_corpus(spark, sf_dir).drop("doc_id")
    dirs = []
    for i in range(2):
        part = corpus.filter(
            F.pmod(F.xxhash64("path"), F.lit(2)) == i)
        d = tempfile.mkdtemp(prefix=f"deluge_entry_multi{i}_")
        build_index(spark, part, d,
                    BuildConfig(num_shards=4, tokenize_groups=1,
                                shard_batches=1, store_content=False))
        dirs.append(d)
    ms = MultiSearcher(spark, dirs)
    _MULTIS[key] = ms
    return ms


def _multi_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi-index search (MultiSearcher, dfs_query_then_fetch-merged
    stats): the corpus split across two independently-built indexes must
    score EVERY matching doc exactly as one merged index — the oracle is
    the plain single-corpus BM25 SQL. Original doc ids are recovered from
    the stored path (source '/' doc_id) since members assign their own."""
    ms = _get_multi(spark, sf_dir)
    out = ms.search(FACET_QUERY, k=10**6, round_dp=SCORE_DP, fetch=True)
    orig = F.element_at(F.split(F.col("path"), "/"), -1).cast("long")
    return (out.select(orig.alias("doc_id"),
                       F.round("score", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


PCT = [25.0, 50.0, 75.0, 95.0, 99.0]


def _percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``percentiles`` aggregation (Searcher.facet_percentiles), exact
    mode for the oracle (SQL ``percentile`` == ``quantile_cont`` linear
    interpolation); the approx_percentile GK-sketch mode is the 100 TB
    path (pytest-gated against exact)."""
    s = _get_searcher(spark, sf_dir)
    return s.facet_percentiles(FACET_QUERY, "n_chars", PCT)


def _top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``terms`` bucket + ``top_hits`` sub-aggregation / field
    collapsing (Searcher.facet_top_hits): top-2 docs by n_chars within
    each of the 3 largest lang buckets of the match set — a
    WindowGroupLimit per-bucket top-k, no driver collect."""
    s = _get_searcher(spark, sf_dir)
    return s.facet_top_hits(FACET_QUERY, by="lang", sort_by="n_chars",
                            hits_per_bucket=2, buckets=3)


#: more_like_this source doc (exists at every driver sf)
MLT_DOC = 42


def _highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``highlight`` (Searcher.highlight): top-k + one snippet per hit
    around the first matched term, all string ops JVM-side over only the
    k result docs."""
    s = _get_searcher(spark, sf_dir)
    out = s.highlight(FACET_QUERY, k=10, round_dp=SCORE_DP,
                      content_df=_docs(spark, sf_dir), content_col="text")
    return (out.select("doc_id",
                       F.round("score", SCORE_DP).alias("score"),
                       "snippet")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


def _mlt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``more_like_this`` (Searcher.more_like_this): re-analyze one
    stored doc, top tf·idf terms as a scored disjunction, source doc
    excluded."""
    s = _get_searcher(spark, sf_dir)
    out = s.more_like_this(MLT_DOC, k=10, round_dp=SCORE_DP,
                           content_df=_docs(spark, sf_dir),
                           content_col="text")
    return (out.select("doc_id",
                       F.round("score", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


def _count_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_count`` API (Searcher.count): match-set size under a filter,
    no scoring, no top-k; surfaced as a one-row frame for the oracle."""
    s = _get_searcher(spark, sf_dir)
    n = s.count(FACET_QUERY, filters={"lang": "en"})
    return spark.createDataFrame([(n,)], "n_matches long")


def _explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_explain`` API (Searcher.explain_score): per-term BM25
    breakdown (tf/df/idf/contribution) of one doc for a query."""
    s = _get_searcher(spark, sf_dir)
    return s.explain_score(FACET_QUERY, MLT_DOC, round_dp=SCORE_DP)


def _fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``fuzzy`` query (Searcher.search_fuzzy): dictionary expansion
    within 1 Levenshtein edit of the (misspelled) term, scored as a
    disjunction with per-term idf."""
    s = _get_searcher(spark, sf_dir)
    out = s.search_fuzzy("valu", k=10, max_edits=1, max_expansions=50,
                         round_dp=SCORE_DP)
    return (out.select("doc_id", F.round("score", SCORE_DP).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()))


def _bm25_sql(query: str, k: int, lang: str | None = None,
              where: str | None = None) -> str:
    """``where`` is a raw SQL predicate over the documents table (the
    DuckDB twin of a Searcher filter spec); ``lang`` is shorthand."""
    terms = list(dict.fromkeys(tokenize_py(query, "code")))
    vals = ", ".join(f"('{t}')" for t in terms)
    toks = duckdb_tokens_expr("text", "code")
    preds = ([f"lang = '{lang}'"] if lang else []) + ([where] if where else [])
    lang_clause = (
        "AND doc_id IN (SELECT doc_id FROM documents WHERE "
        + " AND ".join(preds) + ")" if preds else "")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl
), q(term) AS (VALUES {vals}),
m AS (SELECT tf.* FROM tf WHERE term IN (SELECT term FROM q)),
idf AS (
  SELECT term, ln(1.0 + (stats.n - count(*) + 0.5) / (count(*) + 0.5)) AS idf
  FROM m CROSS JOIN stats GROUP BY term, stats.n
), scored AS (
  SELECT m.doc_id,
         sum(idf.idf * (m.tf * ({K1} + 1.0))
             / (m.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM m JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY m.doc_id
)
SELECT doc_id, ROUND(s, {SCORE_DP}) AS score FROM scored
WHERE 1=1 {lang_clause}
ORDER BY ROUND(s, {SCORE_DP}) DESC, doc_id LIMIT {k}
"""


def _bm25_scaffold() -> str:
    """Shared CTE prefix: tokenize → tf → dl → corpus stats."""
    toks = duckdb_tokens_expr("text", "code")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl
)"""


def _bm25_score_tail(k: int, extra_where: str = "") -> str:
    """Shared scoring tail over CTEs ``m`` (matched tf rows) + scaffold."""
    return f""", idf AS (
  SELECT term, ln(1.0 + (stats.n - count(*) + 0.5) / (count(*) + 0.5)) AS idf
  FROM m CROSS JOIN stats GROUP BY term, stats.n
), scored AS (
  SELECT m.doc_id,
         sum(idf.idf * (m.tf * ({K1} + 1.0))
             / (m.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM m JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY m.doc_id
)
SELECT doc_id, ROUND(s, {SCORE_DP}) AS score FROM scored
WHERE 1=1 {extra_where}
ORDER BY ROUND(s, {SCORE_DP}) DESC, doc_id LIMIT {k}
"""


def _bool_sql(must: str, should: str, must_not: str, k: int) -> str:
    """DuckDB twin of Searcher.search_bool: must = conjunctive gate (all
    tokens), must_not = exclusion, score = BM25 over must+should tokens."""
    m = list(dict.fromkeys(tokenize_py(must or "", "code")))
    s = list(dict.fromkeys(tokenize_py(should or "", "code")))
    mn = list(dict.fromkeys(tokenize_py(must_not or "", "code")))
    m = [t for t in m if t not in set(mn)]
    s = [t for t in s if t not in set(mn)]
    scoring = list(dict.fromkeys(m + s))
    vals = ", ".join(f"('{t}')" for t in scoring)
    mvals = ", ".join(f"('{t}')" for t in m)
    nvals = ", ".join(f"('{t}')" for t in mn)
    where = ""
    body = f""", q(term) AS (VALUES {vals}),
m AS (SELECT tf.* FROM tf WHERE term IN (SELECT term FROM q))"""
    if m:
        body += f""", mq(term) AS (VALUES {mvals}),
cand AS (
  SELECT doc_id FROM tf WHERE term IN (SELECT term FROM mq)
  GROUP BY doc_id HAVING count(DISTINCT term) = {len(m)}
)"""
        where += " AND doc_id IN (SELECT doc_id FROM cand)"
    if mn:
        body += f""", nq(term) AS (VALUES {nvals}),
excl AS (SELECT DISTINCT doc_id FROM tf
         WHERE term IN (SELECT term FROM nq))"""
        where += " AND doc_id NOT IN (SELECT doc_id FROM excl)"
    return _bm25_scaffold() + body + _bm25_score_tail(k, where)


def _phrase_sql(phrase: str, k: int) -> str:
    """DuckDB twin of Searcher.search_phrase: adjacency via a contiguous-
    subsequence check on the space-joined analyzed token stream; score =
    BM25 over the phrase's distinct terms (full-document tf)."""
    toks = tokenize_py(phrase, "code")
    uniq = list(dict.fromkeys(toks))
    vals = ", ".join(f"('{t}')" for t in uniq)
    needle = " " + " ".join(toks) + " "
    toks_expr = duckdb_tokens_expr("text", "code")
    body = f""", q(term) AS (VALUES {vals}),
m AS (SELECT tf.* FROM tf WHERE term IN (SELECT term FROM q)),
ph AS (
  SELECT doc_id FROM documents
  WHERE contains(' ' || array_to_string({toks_expr}, ' ') || ' ',
                 '{needle}')
)"""
    return (_bm25_scaffold() + body
            + _bm25_score_tail(k, " AND doc_id IN (SELECT doc_id FROM ph)"))


def _prefix_sql(prefix: str, max_expansions: int, k: int) -> str:
    """DuckDB twin of Searcher.search_prefix: expansion = terms LIKE
    'prefix%' ordered (df desc, term asc) capped at max_expansions, scored
    as a disjunction with per-term idf."""
    body = f""", dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), exp AS (
  SELECT term FROM dft WHERE term LIKE '{prefix}%'
  ORDER BY df DESC, term LIMIT {max_expansions}
), m AS (SELECT tf.* FROM tf WHERE term IN (SELECT term FROM exp))"""
    return _bm25_scaffold() + body + _bm25_score_tail(k)


TOKS_SQL = duckdb_tokens_expr("text", "code")
SIMPLE_TOKS_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _match_ids_sql(query: str) -> str:
    """Shared CTE: distinct doc_ids containing ANY analyzed query term —
    the DuckDB twin of Searcher._match_ids (query-context match set)."""
    terms = list(dict.fromkeys(tokenize_py(query, "code")))
    vals = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH tok AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ({vals}))"""


def _facet_terms_sql(query: str, by: str, size: int) -> str:
    """DuckDB twin of Searcher.facet_terms (``by`` is the documents-table
    column backing the stored field)."""
    return _match_ids_sql(query) + f"""
SELECT CAST({by} AS VARCHAR) AS value, CAST(count(*) AS BIGINT) AS n_docs
FROM documents WHERE doc_id IN (SELECT doc_id FROM m)
GROUP BY 1 ORDER BY n_docs DESC, value LIMIT {size}"""


def _facet_stats_sql(query: str) -> str:
    """DuckDB twin of Searcher.facet_stats over dl: exact integer sum,
    avg = sum/count rounded to 6 dp (same derivation as the engine, so
    doubles compare byte-identical)."""
    return _match_ids_sql(query) + """,
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(dl) AS DOUBLE) AS min_v,
       CAST(max(dl) AS DOUBLE) AS max_v,
       ROUND(CAST(sum(dl) AS DOUBLE) / count(*), 6) AS avg_v,
       CAST(sum(dl) AS DOUBLE) AS sum_v
FROM dl JOIN m USING (doc_id)"""


def _facet_card_sql(query: str) -> str:
    """DuckDB twin of Searcher.facet_cardinality (exact mode); repo =
    documents.source per the corpus adapter."""
    return _match_ids_sql(query) + """
SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_values
FROM documents WHERE doc_id IN (SELECT doc_id FROM m)"""


def _sorted_sql(query: str, k: int, from_: int) -> str:
    """DuckDB twin of Searcher.search_sorted: match set ordered by the
    n_chars stored field desc, doc_id tiebreak, LIMIT/OFFSET paging."""
    return _match_ids_sql(query) + f"""
SELECT doc_id, n_chars FROM documents
WHERE doc_id IN (SELECT doc_id FROM m)
ORDER BY n_chars DESC, doc_id LIMIT {k} OFFSET {from_}"""


def _wildcard_sql(pattern: str, max_expansions: int, k: int) -> str:
    """DuckDB twin of Searcher.search_wildcard: expansion = terms LIKE
    the translated pattern (* -> %, ? -> _), (df desc, term asc) capped,
    scored as a disjunction with per-term idf."""
    like = pattern.lower().replace("*", "%").replace("?", "_")
    body = f""", dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), exp AS (
  SELECT term FROM dft WHERE term LIKE '{like}'
  ORDER BY df DESC, term LIMIT {max_expansions}
), m AS (SELECT tf.* FROM tf WHERE term IN (SELECT term FROM exp))"""
    return _bm25_scaffold() + body + _bm25_score_tail(k)


def _boost_sql(should: str, boosts: dict[str, float], k: int) -> str:
    """DuckDB twin of search_bool(boosts=): per-term boost multiplies the
    idf inside the BM25 sum."""
    s = list(dict.fromkeys(tokenize_py(should, "code")))
    vals = ", ".join(f"('{t}', {float(boosts.get(t, 1.0))!r})" for t in s)
    return _bm25_scaffold() + f""", q(term, boost) AS (VALUES {vals}),
m AS (SELECT tf.* FROM tf WHERE term IN (SELECT term FROM q)),
idf AS (
  SELECT term, ln(1.0 + (stats.n - count(*) + 0.5) / (count(*) + 0.5)) AS idf
  FROM m CROSS JOIN stats GROUP BY term, stats.n
), scored AS (
  SELECT m.doc_id,
         sum(q.boost * idf.idf * (m.tf * ({K1} + 1.0))
             / (m.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))) AS s
  FROM m JOIN idf USING (term) JOIN q USING (term)
       JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY m.doc_id
)
SELECT doc_id, ROUND(s, {SCORE_DP}) AS score FROM scored
ORDER BY ROUND(s, {SCORE_DP}) DESC, doc_id LIMIT {k}"""


def _suggest_sql(text: str, size: int) -> str:
    """DuckDB twin of Searcher.suggest_terms (mode=missing, prefix 1):
    candidates = dictionary terms within ES-AUTO edits sharing the first
    character, ranked (distance, df desc, term), size per token."""
    toks = list(dict.fromkeys(tokenize_py(text, "code")))
    vals = ", ".join(
        f"('{t}', {0 if len(t) < 3 else (1 if len(t) <= 5 else 2)})"
        for t in toks)
    return _bm25_scaffold() + f""", dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), q(token, e) AS (VALUES {vals}),
cand AS (
  SELECT q.token, dft.term AS suggestion, dft.df,
         CAST(levenshtein(dft.term, q.token) AS BIGINT) AS distance
  FROM q JOIN dft
    ON abs(length(dft.term) - length(q.token)) <= q.e
   AND dft.term <> q.token
   AND substr(dft.term, 1, 1) = substr(q.token, 1, 1)
  WHERE q.e > 0
    AND levenshtein(dft.term, q.token) <= q.e
    AND q.token NOT IN (SELECT term FROM dft)
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY token ORDER BY distance, df DESC, suggestion) AS rn
  FROM cand)
SELECT token, suggestion, df, distance FROM ranked WHERE rn <= {size}
ORDER BY token, distance, df DESC, suggestion"""


def _percentiles_sql(query: str, percents: list[float]) -> str:
    """DuckDB twin of Searcher.facet_percentiles (exact): quantile_cont
    == SQL percentile's linear interpolation."""
    legs = "\nUNION ALL ".join(
        f"SELECT {p!r} AS percent, "
        f"ROUND(quantile_cont(v, {p / 100.0!r}), 6) AS value FROM vals"
        for p in percents)
    return _match_ids_sql(query) + f""",
vals AS (SELECT n_chars AS v FROM documents
         WHERE doc_id IN (SELECT doc_id FROM m))
{legs}
ORDER BY percent"""


def _top_hits_sql(query: str, hits: int, buckets: int) -> str:
    """DuckDB twin of Searcher.facet_top_hits: largest lang buckets of
    the match set, per-bucket top docs by n_chars desc (doc_id tiebreak)."""
    return _match_ids_sql(query) + f""",
j AS (SELECT CAST(lang AS VARCHAR) AS value, doc_id, n_chars
      FROM documents WHERE doc_id IN (SELECT doc_id FROM m)),
b AS (SELECT value FROM j GROUP BY value
      ORDER BY count(*) DESC, value ASC LIMIT {buckets}),
r AS (SELECT value, doc_id, n_chars,
             row_number() OVER (PARTITION BY value
                                ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM j WHERE value IN (SELECT value FROM b))
SELECT value, doc_id, n_chars FROM r WHERE rk <= {hits}
ORDER BY value, rk"""


def _bool_msm_sql(should: str, msm: int, k: int) -> str:
    """DuckDB twin of Searcher.search_bool(minimum_should_match=msm):
    candidates hold >= msm distinct should terms; BM25 over the should
    terms, scores unchanged by the gate."""
    s = list(dict.fromkeys(tokenize_py(should, "code")))
    vals = ", ".join(f"('{t}')" for t in s)
    body = f""", q(term) AS (VALUES {vals}),
m AS (SELECT tf.* FROM tf WHERE term IN (SELECT term FROM q)),
cand AS (
  SELECT doc_id FROM m GROUP BY doc_id
  HAVING count(DISTINCT term) >= {msm}
)"""
    return (_bm25_scaffold() + body
            + _bm25_score_tail(k, " AND doc_id IN (SELECT doc_id FROM cand)"))


def _mget_sql(ids: list[int]) -> str:
    """DuckDB twin of Searcher.get_docs with a field projection."""
    idl = ", ".join(str(i) for i in ids)
    return f"""SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id IN ({idl}) ORDER BY doc_id"""


def _count_sql(query: str, lang: str) -> str:
    """DuckDB twin of Searcher.count with a term filter."""
    return _match_ids_sql(query) + f"""
SELECT CAST(count(*) AS BIGINT) AS n_matches
FROM m WHERE doc_id IN (SELECT doc_id FROM documents
                        WHERE lang = '{lang}')"""


def _explain_sql(query: str, doc: int) -> str:
    """DuckDB twin of Searcher.explain_score: per-term tf/df/idf and BM25
    contribution for one doc; query terms missing from the doc appear
    with tf=0 and contribution=0 (ES explain shows the full structure)."""
    terms = sorted(dict.fromkeys(tokenize_py(query, "code")))
    vals = ", ".join(f"('{t}')" for t in terms)
    return _bm25_scaffold() + f""", q(term) AS (VALUES {vals}),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
tfd AS (
  SELECT tf.term, tf.tf, dl.dl FROM tf JOIN dl USING (doc_id)
  WHERE doc_id = {doc}
)
SELECT q.term,
       CAST(COALESCE(tfd.tf, 0) AS BIGINT) AS tf,
       dft.df,
       ROUND(ln(1.0 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)),
             {SCORE_DP}) AS idf,
       CASE WHEN tfd.tf IS NULL THEN 0.0
            ELSE ROUND(ln(1.0 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
                       * (tfd.tf * ({K1} + 1.0))
                       / (tfd.tf + {K1} * (1.0 - {B}
                                           + {B} * tfd.dl / stats.avgdl)),
                       {SCORE_DP})
       END AS contribution
FROM q JOIN dft USING (term) CROSS JOIN stats
LEFT JOIN tfd USING (term)
ORDER BY q.term"""


def _highlight_sql(query: str, k: int, frag: int = 100) -> str:
    """DuckDB twin of Searcher.highlight: top-k hits joined back to the
    documents text; matched term = first analyzed query term (query
    order) whose lowercase substring occurs; fragment = ``frag`` chars
    starting frag/2 before the occurrence, match wrapped in <em> tags."""
    terms = list(dict.fromkeys(tokenize_py(query, "code")))
    whens_t = " ".join(
        f"WHEN strpos(lower(text), '{t}') > 0 THEN '{t}'" for t in terms)
    whens_p = " ".join(
        f"WHEN strpos(lower(text), '{t}') > 0 "
        f"THEN strpos(lower(text), '{t}')" for t in terms)
    return f"""
WITH hits AS ({_bm25_sql(query, k)}),
j AS (
  SELECT h.doc_id, h.score, d.text,
         CASE {whens_t} ELSE '{terms[0]}' END AS mt,
         CASE {whens_p} ELSE 1 END AS p
  FROM hits h JOIN documents d USING (doc_id)
), c AS (
  SELECT doc_id, score, text, mt, p,
         GREATEST(1, p - {frag // 2}) AS s
  FROM j
), r AS (
  SELECT doc_id, score, mt, p - s + 1 AS rel,
         substring(text, s, {frag}) AS raw
  FROM c
)
SELECT doc_id, score,
       substring(raw, 1, rel - 1) || '<em>'
       || substring(raw, rel, length(mt)) || '</em>'
       || substring(raw, rel + length(mt), {frag}) AS snippet
FROM r ORDER BY score DESC, doc_id"""


def _mlt_sql(doc: int, k: int, max_terms: int = 25, min_tf: int = 2,
             min_df: int = 5) -> str:
    """DuckDB twin of Searcher.more_like_this: source-doc terms filtered
    by tf/df floors, ranked by tf·idf (tie: term asc), top
    ``max_terms`` scored as a disjunction excluding the source doc."""
    body = f""", dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), src AS (
  SELECT term, tf FROM tf WHERE doc_id = {doc}
), sel AS (
  SELECT src.term FROM src JOIN dft USING (term) CROSS JOIN stats
  WHERE src.tf >= {min_tf} AND dft.df >= {min_df}
  ORDER BY src.tf * ln(1.0 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
             DESC,
           src.term
  LIMIT {max_terms}
), m AS (SELECT tf.* FROM tf WHERE term IN (SELECT term FROM sel))"""
    return _bm25_scaffold() + body + _bm25_score_tail(
        k, f" AND doc_id != {doc}")


def _fuzzy_sql(term: str, max_edits: int, max_expansions: int,
               k: int) -> str:
    """DuckDB twin of Searcher.search_fuzzy: expansion = dictionary terms
    within ``max_edits`` Levenshtein edits, ordered (distance, df desc,
    term) capped at ``max_expansions``, scored as a disjunction with
    per-term idf — the same rewrite as the prefix twin."""
    lo, hi = len(term) - max_edits, len(term) + max_edits
    body = f""", dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), exp AS (
  SELECT term FROM dft
  WHERE length(term) BETWEEN {lo} AND {hi}
    AND levenshtein(term, '{term}') <= {max_edits}
  ORDER BY levenshtein(term, '{term}'), df DESC, term
  LIMIT {max_expansions}
), m AS (SELECT tf.* FROM tf WHERE term IN (SELECT term FROM exp))"""
    return _bm25_scaffold() + body + _bm25_score_tail(k)


def _facet_hist_sql(query: str, interval: int) -> str:
    """DuckDB twin of Searcher.facet_histogram: dl = analyzed token count
    per doc, bucket = floor(dl / interval) * interval."""
    return _match_ids_sql(query) + f""",
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1)
SELECT CAST(CAST(floor(dl.dl / {interval}.0) AS BIGINT) * {interval} AS BIGINT)
         AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM dl JOIN m USING (doc_id) GROUP BY 1 ORDER BY bucket"""


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for a multi-term query on sf0.001 through the
    real engine — packed-segment index build + distributed block-max WAND."""
    return _bm25_wand(spark, "/root/testdata/sf0.001", "spark join table", 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- full-text engine (north rule) ---------------------------------
    # bm25_wand_*: THE ENGINE — packed-segment build (index/build.py) +
    # distributed block-max WAND (index/wand.py, index/search.py), shared
    # index built once per sf_dir. Same DuckDB oracles as the twins below.
    q["bm25_wand_multi"] = lambda s, d: _bm25_wand(s, d, "spark join table", 10)
    q["bm25_wand_hot"] = lambda s, d: _bm25_wand(s, d, "data", 20)
    q["bm25_wand_rare_pair"] = lambda s, d: _bm25_wand(
        s, d, "window order fast", 15)
    q["bm25_wand_filtered"] = lambda s, d: _bm25_wand(
        s, d, "batch value", 10, lang="en")
    q["bm25_wand_missing"] = lambda s, d: _bm25_wand(s, d, "zzzabsentterm", 10)
    # typed filter-context parity (round 5): range + terms-IN filters
    # resolve through the same executor-side shard cogroup as lang
    q["bm25_wand_range"] = lambda s, d: _bm25_wand(
        s, d, "data value", 10,
        filters={"n_chars": {"gte": 200, "lt": 700}})
    q["bm25_wand_terms_in"] = lambda s, d: _bm25_wand(
        s, d, "spark table", 10, filters={"lang": ["fr", "es"]})
    # batch serving path: M queries in ONE distributed job (search_many)
    q["bm25_wand_batch"] = lambda s, d: _bm25_wand_batch(s, d)
    # mixed filtered+unfiltered batch: per-query keyword filters via the
    # executor-side shard cogroup (round-5: search_many filters= parity)
    q["bm25_wand_batch_filtered"] = lambda s, d: _bm25_wand_batch(
        s, d, BATCH_FILTERED)
    # ES query-DSL parity (round 5): bool / phrase / prefix through the
    # engine (Searcher.search_bool / search_phrase / search_prefix)
    q["bm25_bool"] = _bm25_bool
    q["bm25_phrase"] = _bm25_phrase
    q["bm25_prefix"] = _bm25_prefix
    # ES aggregations parity (round 5): facets over the full match set
    # through the engine (Searcher.facet_terms / facet_histogram)
    q["facet_terms_lang"] = _facet_lang
    q["facet_terms_source"] = _facet_source
    q["facet_histogram_dl"] = _facet_hist
    q["facet_stats_dl"] = _facet_stats
    q["facet_cardinality_repo"] = _facet_card
    # ES sort/from/size + fuzzy + highlight + more_like_this (round 5)
    q["search_sorted_page2"] = _sorted_page2
    q["bm25_fuzzy"] = _fuzzy
    q["highlight_topk"] = _highlight
    q["more_like_this"] = _mlt
    q["count_filtered"] = _count_api
    q["explain_score"] = _explain
    q["sorted_page_after"] = _sorted_after
    q["facet_percentiles"] = _percentiles
    q["facet_top_hits"] = _top_hits
    q["multi_index_search"] = _multi_index
    q["bm25_wildcard"] = _bm25_wildcard
    q["bool_boosted"] = _bm25_boosted
    q["term_suggest"] = _term_suggest
    q["bool_min_should_match"] = _bool_msm
    q["mget_fields"] = _mget
    # bm25_topk_*: the pure-DataFrame scoring twin (cross-check path).
    q["bm25_topk_multi"] = lambda s, d: _bm25(s, d, "spark join table", 10)
    q["bm25_topk_hot"] = lambda s, d: _bm25(s, d, "data", 20)
    q["bm25_topk_rare_pair"] = lambda s, d: _bm25(s, d, "window order fast", 15)
    q["bm25_topk_filtered"] = lambda s, d: _bm25(s, d, "batch value", 10, lang="en")
    q["bm25_topk_missing"] = lambda s, d: _bm25(s, d, "zzzabsentterm", 10)

    def term_stats(s, d):
        tf, _, _, _ = _tf_dl_stats(s, d)
        return (tf.groupBy("term")
                .agg(F.count(F.lit(1)).cast("long").alias("df"),
                     F.sum("tf").cast("long").alias("cf"))
                .orderBy(F.col("df").desc(), F.col("term").asc()).limit(50))
    q["term_stats_top50"] = term_stats

    def corpus_stats(s, d):
        _, dl, _, _ = _tf_dl_stats(s, d)
        return dl.agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                      F.round(F.avg("dl"), 6).alias("avgdl"),
                      F.sum("dl").cast("long").alias("total_tokens"))
    q["corpus_stats"] = corpus_stats

    def doc_lengths(s, d):
        _, dl, _, _ = _tf_dl_stats(s, d)
        return dl
    q["doc_lengths"] = doc_lengths

    # --- reference ingestion semantics (SURVEY §2A) ---------------------
    def project_id_type_source(s, d):
        # deluge's (id, type, source) projection + silent empty/null skip
        # (/root/reference/ingestor.go:285-327)
        docs = _docs(s, d)
        return (docs.select(F.col("doc_id").cast("string").alias("id"),
                            F.col("lang").alias("type"),
                            F.col("text").alias("source"))
                .filter(F.col("id").isNotNull() & (F.col("id") != "")
                        & F.col("type").isNotNull() & (F.col("type") != "")
                        & F.col("source").isNotNull() & (F.col("source") != "")))
    q["project_id_type_source"] = project_id_type_source

    def exclude_filter(s, d):
        # path-exclude + skip-empty (/root/reference/util/exclude.go:8-28)
        docs = _docs(s, d)
        return (docs.filter(~F.col("source").isin("src0", "src7")
                            & (F.length("text") > 0))
                .select("doc_id", "source"))
    q["exclude_filter"] = exclude_filter

    def typed_projection(s, d):
        # lenient typed field accessors (/root/reference/document/csv.go:45-129):
        # try_cast semantics — failures yield NULL, never errors
        ev = s.read.parquet(f"{d}/events.parquet")
        return ev.select(
            "event_id",
            F.regexp_extract("props", r"(\d+)", 1).try_cast("long").alias("k_val"),
            F.round(F.col("value"), 4).alias("value"),
            F.col("event_type").alias("type"),
        )
    q["typed_projection"] = typed_projection

    def events_hourly(s, d):
        ev = s.read.parquet(f"{d}/events.parquet")
        return (ev.groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
                           "event_type")
                .agg(F.count(F.lit(1)).cast("long").alias("n"),
                     F.round(F.sum("value"), 4).alias("sum_value")))
    q["events_hourly"] = events_hourly

    def top_terms_per_lang(s, d):
        from pyspark.sql import Window
        docs = _docs(s, d)
        tf = (docs.select("lang", "doc_id",
                          F.explode(tokens_col("text", "code")).alias("term"))
              .groupBy("lang", "term")
              .agg(F.countDistinct("doc_id").cast("long").alias("df")))
        w = Window.partitionBy("lang").orderBy(F.col("df").desc(),
                                               F.col("term").asc())
        return (tf.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 3)
                .select("lang", "term", "df", F.col("rank").cast("long").alias("rank")))
    q["top_terms_per_lang"] = top_terms_per_lang

    def sessionize(s, d):
        from deluge_spark.streaming.stateful import sessionize_batch
        ev = s.read.parquet(f"{d}/events.parquet")
        out = sessionize_batch(ev, gap_minutes=30)
        return out.select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_end"),
            "n_events", "sum_value")
    q["sessionize"] = sessionize

    def source_summary(s, d):
        docs = _docs(s, d)
        return docs.agg(F.count(F.lit(1)).cast("long").alias("docs"),
                        F.sum(F.length("text")).cast("long").alias("bytes"))
    q["source_summary"] = source_summary

    # --- relational analytics over the star schema -----------------------
    # Classic TPC-H-shaped queries on the driver's fixture tables — the
    # general-analytics surface of the engine (pure DataFrame; Catalyst
    # broadcasts the dims and pushes the date/segment predicates to the
    # scans, asserted in tests/test_plan_audit.py style). Money math runs
    # in DECIMAL so the aggregate is EXACT and engine-order-independent,
    # then casts to double for a stable comparison hash.
    def _dec(c):
        return F.col(c).cast("decimal(18,4)")

    def tpch_q1(s, d):
        li = s.read.parquet(f"{d}/lineitem.parquet")
        disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)")
                                          - _dec("l_discount"))
        return (li.filter(F.col("l_shipdate") <= "2000-12-01")
                .groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
                     F.sum(_dec("l_extendedprice")).cast("double")
                     .alias("sum_base_price"),
                     F.sum(disc).cast("double").alias("sum_disc_price"),
                     F.count(F.lit(1)).cast("long").alias("count_order"))
                .orderBy("l_returnflag", "l_linestatus"))
    q["tpch_q1_pricing_summary"] = tpch_q1

    def tpch_q3(s, d):
        cu = s.read.parquet(f"{d}/customer.parquet")
        o = s.read.parquet(f"{d}/orders.parquet")
        li = s.read.parquet(f"{d}/lineitem.parquet")
        rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)")
                                         - _dec("l_discount"))
        return (li.filter(F.col("l_shipdate") > "1999-03-15")
                .join(o.filter(F.col("o_orderdate") < "1999-03-15"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
                .join(F.broadcast(cu.filter(
                    F.col("c_mktsegment") == "BUILDING")),
                    F.col("o_custkey") == F.col("c_custkey"), "left_semi")
                .groupBy("l_orderkey",
                         F.date_format("o_orderdate", "yyyy-MM-dd")
                         .alias("o_orderdate"))
                .agg(F.sum(rev).cast("double").alias("revenue"))
                .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
                .limit(10))
    q["tpch_q3_shipping_priority"] = tpch_q3

    def tpch_q5(s, d):
        cu = s.read.parquet(f"{d}/customer.parquet")
        o = s.read.parquet(f"{d}/orders.parquet")
        li = s.read.parquet(f"{d}/lineitem.parquet")
        su = s.read.parquet(f"{d}/supplier.parquet")
        na = s.read.parquet(f"{d}/nation.parquet")
        rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)")
                                         - _dec("l_discount"))
        return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                .join(cu, F.col("o_custkey") == F.col("c_custkey"))
                .join(F.broadcast(su),
                      (F.col("l_suppkey") == F.col("s_suppkey"))
                      & (F.col("c_nationkey") == F.col("s_nationkey")))
                .join(F.broadcast(na),
                      F.col("s_nationkey") == F.col("n_nationkey"))
                .groupBy("n_name")
                .agg(F.sum(rev).cast("double").alias("revenue"))
                .orderBy(F.col("revenue").desc(), F.col("n_name").asc()))
    q["tpch_q5_local_volume"] = tpch_q5

    # --- dedup family ----------------------------------------------------
    q["dedup_exact_groups"] = lambda s, d: exact_dedup_groups(_docs(s, d))
    # exact all-pairs oracle baseline (quadratic — kept as the oracle)
    q["dedup_ngram_jaccard"] = lambda s, d: ngram_jaccard_pairs(
        _docs(s, d), n=1, threshold=0.5, mode="simple")
    # the guarded configuration (scale path): stopword-shingle ceiling
    q["dedup_ngram_jaccard_guarded"] = lambda s, d: ngram_jaccard_pairs(
        _docs(s, d), n=1, threshold=0.5, mode="simple", max_shingle_df=64)
    q["dedup_minhash_lsh"] = lambda s, d: minhash_lsh_pairs(
        _docs(s, d), n=2, num_hashes=64, bands=16, threshold=0.35)
    # 100 TB configuration: exact-dup clusters collapse to representatives
    # before LSH (giant identical clusters cost one row, not n² pairs)
    q["dedup_minhash_lsh_collapsed"] = lambda s, d: minhash_lsh_pairs(
        _docs(s, d), n=2, num_hashes=64, bands=16, threshold=0.35,
        collapse_exact=True)
    q["dedup_simhash"] = lambda s, d: simhash_near_pairs(
        _docs(s, d), max_hamming=3)

    # --- similarity search ------------------------------------------------
    def ann_brute(s, d):
        emb = s.read.parquet(f"{d}/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        return cosine_top_k(emb, list(qv), 10, exclude_id=0)
    q["ann_cosine_topk"] = ann_brute

    def ann_lsh(s, d):
        _ensure_shipped(s)  # sign sketch is an Arrow stage (numpy matmul)
        emb = s.read.parquet(f"{d}/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        return rp_lsh_top_k(emb, list(qv), 10, n_planes=16, bands=8,
                            exclude_id=0)
    q["ann_rp_lsh_topk"] = ann_lsh

    def ann_indexed(s, d):
        # the SERVING path: persisted sign-sketch index built once per
        # (session, sf_dir); the query reads only its buckets + candidates
        idx = _get_ann_index(s, d)
        emb = s.read.parquet(f"{d}/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        return ann_index_top_k(s, idx, list(qv), 10, exclude_id=0)
    q["ann_indexed_topk"] = ann_indexed

    # embedding-cosine near-dup pairs: exact oracle baseline + LSH scale path
    q["dedup_embedding_cosine"] = lambda s, d: cosine_near_pairs(
        s.read.parquet(f"{d}/embeddings.parquet"), threshold=0.35)
    def emb_cos_lsh(s, d):
        _ensure_shipped(s)  # sign sketch is an Arrow stage (numpy matmul)
        return cosine_near_pairs_lsh(
            s.read.parquet(f"{d}/embeddings.parquet"), threshold=0.35,
            n_planes=16, bands=8)
    q["dedup_embedding_cosine_lsh"] = emb_cos_lsh

    # --- text analysis -----------------------------------------------------
    q["lang_id"] = lambda s, d: dtext.lang_id(_docs(s, d))
    q["quality_score"] = lambda s, d: dtext.quality_score(_docs(s, d))
    q["token_count"] = lambda s, d: dtext.token_counts(_docs(s, d))
    q["doc_fingerprint"] = lambda s, d: dtext.fingerprint(_docs(s, d))

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["bm25_wand_multi"] = _bm25_sql("spark join table", 10)
    o["bm25_wand_hot"] = _bm25_sql("data", 20)
    o["bm25_wand_rare_pair"] = _bm25_sql("window order fast", 15)
    o["bm25_wand_filtered"] = _bm25_sql("batch value", 10, lang="en")
    o["bm25_wand_missing"] = _bm25_sql("zzzabsentterm", 10)
    o["bm25_wand_range"] = _bm25_sql(
        "data value", 10, where="n_chars >= 200 AND n_chars < 700")
    o["bm25_wand_terms_in"] = _bm25_sql(
        "spark table", 10, where="lang IN ('fr', 'es')")
    o["bm25_wand_batch"] = " UNION ALL ".join(
        f"SELECT '{name}' AS query, * FROM ({_bm25_sql(q, k)})"
        for name, (q, k) in BATCH_QUERIES.items())
    o["bm25_wand_batch_filtered"] = " UNION ALL ".join(
        f"SELECT '{name}' AS query, * FROM ({_bm25_sql(q, k, lang=lang)})"
        for name, (q, k, lang) in BATCH_FILTERED.items())
    o["bm25_bool"] = _bool_sql(BOOL_SPEC["must"], BOOL_SPEC["should"],
                               BOOL_SPEC["must_not"], BOOL_SPEC["k"])
    o["bm25_phrase"] = _phrase_sql(*PHRASE_SPEC)
    o["bm25_prefix"] = _prefix_sql(*PREFIX_SPEC)
    o["facet_terms_lang"] = _facet_terms_sql(FACET_QUERY, "lang", 10)
    o["facet_terms_source"] = _facet_terms_sql("data", "source", 8)
    o["facet_stats_dl"] = _facet_stats_sql(FACET_QUERY)
    o["facet_cardinality_repo"] = _facet_card_sql(FACET_QUERY)
    o["search_sorted_page2"] = _sorted_sql(FACET_QUERY, 10, 10)
    o["bm25_fuzzy"] = _fuzzy_sql("valu", 1, 50, 10)
    o["highlight_topk"] = _highlight_sql(FACET_QUERY, 10)
    o["more_like_this"] = _mlt_sql(MLT_DOC, 10)
    o["count_filtered"] = _count_sql(FACET_QUERY, "en")
    o["explain_score"] = _explain_sql(FACET_QUERY, MLT_DOC)
    # search_after page 2 == OFFSET page 2 by contract (test-asserted)
    o["sorted_page_after"] = _sorted_sql(FACET_QUERY, 10, 10)
    o["facet_percentiles"] = _percentiles_sql(FACET_QUERY, PCT)
    o["facet_top_hits"] = _top_hits_sql(FACET_QUERY, 2, 3)
    # the split invariant: two member indexes + merged stats == the
    # single-corpus BM25 ranking over the ENTIRE match set
    o["multi_index_search"] = _bm25_sql(FACET_QUERY, 10**6)
    o["bm25_wildcard"] = _wildcard_sql(*WILDCARD_SPEC)
    o["bool_boosted"] = _boost_sql(FACET_QUERY, BOOST_SPEC, 10)
    o["term_suggest"] = _suggest_sql(*SUGGEST_SPEC)
    o["bool_min_should_match"] = _bool_msm_sql(FACET_QUERY, 2, 10)
    o["mget_fields"] = _mget_sql(MGET_IDS)
    o["facet_histogram_dl"] = _facet_hist_sql(FACET_QUERY,
                                              FACET_HIST_INTERVAL)
    o["bm25_topk_multi"] = _bm25_sql("spark join table", 10)
    o["bm25_topk_hot"] = _bm25_sql("data", 20)
    o["bm25_topk_rare_pair"] = _bm25_sql("window order fast", 15)
    o["bm25_topk_filtered"] = _bm25_sql("batch value", 10, lang="en")
    o["bm25_topk_missing"] = _bm25_sql("zzzabsentterm", 10)

    o["term_stats_top50"] = f"""
WITH tok AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 50
"""
    o["corpus_stats"] = f"""
WITH tok AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_docs, ROUND(avg(dl), 6) AS avgdl,
       CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl
"""
    o["doc_lengths"] = f"""
WITH tok AS (SELECT doc_id, unnest({TOKS_SQL}) AS term FROM documents)
SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
"""
    o["project_id_type_source"] = """
SELECT CAST(doc_id AS VARCHAR) AS id, lang AS type, text AS source
FROM documents
WHERE doc_id IS NOT NULL AND lang IS NOT NULL AND lang <> ''
  AND text IS NOT NULL AND text <> ''
"""
    o["exclude_filter"] = """
SELECT doc_id, source FROM documents
WHERE source NOT IN ('src0', 'src7') AND length(text) > 0
"""
    o["typed_projection"] = r"""
SELECT event_id,
       TRY_CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT) AS k_val,
       ROUND(value, 4) AS value, event_type AS type
FROM events
"""
    o["events_hourly"] = """
SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
       CAST(count(*) AS BIGINT) AS n, ROUND(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""
    o["top_terms_per_lang"] = f"""
WITH tok AS (SELECT lang, doc_id, unnest({TOKS_SQL}) AS term FROM documents),
tf AS (SELECT lang, term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tok GROUP BY 1, 2),
r AS (SELECT lang, term, df,
             row_number() OVER (PARTITION BY lang ORDER BY df DESC, term) AS rank
      FROM tf)
SELECT lang, term, df, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 3
"""
    o["sessionize"] = """
WITH t AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0
         END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM t
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, sid
"""
    o["source_summary"] = """
SELECT CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(length(text)) AS BIGINT) AS bytes FROM documents
"""
    o["tpch_q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4))
                   - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
    o["tpch_q3_shipping_priority"] = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4))
                   - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '1999-03-15'
  AND o_orderdate < TIMESTAMP '1999-03-15'
  AND o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""
    o["tpch_q5_local_volume"] = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4))
                   - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""
    o["dedup_exact_groups"] = """
SELECT md5(text) AS content_hash, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id
FROM documents GROUP BY md5(text)
"""
    o["dedup_ngram_jaccard"] = f"""
WITH sh AS (
  SELECT DISTINCT doc_id AS id, unnest({SIMPLE_TOKS_SQL}) AS shingle
  FROM documents
), sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = doc_a JOIN sizes sb ON sb.id = doc_b
WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
"""
    o["dedup_ngram_jaccard_guarded"] = f"""
WITH sh0 AS (
  SELECT DISTINCT doc_id AS id, unnest({SIMPLE_TOKS_SQL}) AS shingle
  FROM documents
), sh AS (
  SELECT * FROM sh0 WHERE shingle NOT IN (
    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 64)
), sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = doc_a JOIN sizes sb ON sb.id = doc_b
WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
"""
    o["ann_cosine_topk"] = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), q.v)
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product(q.v, q.v))) AS sim
  FROM embeddings, q WHERE vec_id <> 0
)
SELECT vec_id, ROUND(sim, 6) AS sim FROM s
ORDER BY ROUND(sim, 6) DESC, vec_id LIMIT 10
"""
    o["dedup_embedding_cosine"] = """
WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
p AS (SELECT a.id AS id_a, b.id AS id_b,
             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
      FROM n a JOIN n b ON a.id < b.id)
SELECT id_a, id_b, ROUND(sim, 6) AS sim FROM p WHERE sim >= 0.35
"""
    o["lang_id"] = (
        f"SELECT doc_id, {dtext.lang_id_sql('text')} AS lang_pred FROM documents")
    qcols = dtext.quality_score_sql("text")
    o["quality_score"] = ("SELECT doc_id, "
                          + ", ".join(f"{v} AS {k}" for k, v in qcols.items())
                          + " FROM documents")
    tcols = dtext.token_counts_sql("text")
    o["token_count"] = ("SELECT doc_id, "
                        + ", ".join(f"{v} AS {k}" for k, v in tcols.items())
                        + " FROM documents")
    o["doc_fingerprint"] = (
        f"SELECT doc_id, {dtext.fingerprint_sql('text')} AS fp FROM documents")
    # dedup_minhash_lsh / dedup_simhash / ann_rp_lsh_topk: hash-based,
    # not SQL-expressible → rows-only checks by design.
    return o
