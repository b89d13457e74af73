"""ES parity round-out: stats/cardinality aggregations, field-sorted
search with from/size pagination, and fuzzy queries via dictionary
expansion — each checked against an independent brute-force recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.functions.tokenizer import tokenize_py
from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher

from tests.oracle import OracleIndex

QUERY = "import return"


@pytest.fixture(scope="module")
def index_dir(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("aggs_index"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=4, tokenize_groups=3,
                            shard_batches=2))
    return d


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return Searcher(spark, index_dir)


@pytest.fixture(scope="module")
def oracle(spark, index_dir):
    docs = spark.read.parquet(f"{index_dir}/docs")
    return OracleIndex({r["doc_id"]: r["content"]
                        for r in docs.select("doc_id", "content").collect()})


def _match_set(oracle, query: str) -> set[int]:
    terms = set(tokenize_py(query, "code"))
    return {d for d, c in oracle.tf.items() if terms & set(c)}


# -- facet_stats / facet_cardinality ----------------------------------------

def test_facet_stats_matches_brute_force(searcher, oracle):
    m = _match_set(oracle, QUERY)
    assert m, "fixture query must match something"
    dls = [oracle.dl[d] for d in m]
    row = searcher.facet_stats(QUERY, "dl").collect()[0]
    assert row["n_docs"] == len(dls)
    assert row["min_v"] == float(min(dls))
    assert row["max_v"] == float(max(dls))
    assert row["sum_v"] == float(sum(dls))
    assert row["avg_v"] == round(sum(dls) / len(dls), 6)


def test_facet_stats_respects_filters(spark, searcher, index_dir, oracle):
    docs = spark.read.parquet(f"{index_dir}/docs")
    go_ids = {r["doc_id"] for r in
              docs.filter(F.col("lang") == "go").select("doc_id").collect()}
    m = _match_set(oracle, QUERY) & go_ids
    row = searcher.facet_stats(QUERY, "dl",
                               filters={"lang": "go"}).collect()[0]
    assert row["n_docs"] == len(m)
    assert row["sum_v"] == float(sum(oracle.dl[d] for d in m))


def test_facet_stats_unknown_terms_empty(searcher):
    assert searcher.facet_stats("zzzabsentterm", "dl").count() == 0


def test_facet_cardinality_exact_and_approx(spark, searcher, index_dir,
                                            oracle):
    docs = spark.read.parquet(f"{index_dir}/docs")
    m = _match_set(oracle, QUERY)
    truth = len({r["repo"] for r in docs.select("doc_id", "repo").collect()
                 if r["doc_id"] in m})
    exact = searcher.facet_cardinality(QUERY, "repo").collect()[0]
    assert exact["n_values"] == truth
    approx = searcher.facet_cardinality(
        QUERY, "repo", exact=False, rsd=0.05).collect()[0]
    # HLL++ at rsd=0.05: generous 3-sigma-ish band
    assert abs(approx["n_values"] - truth) <= max(2, int(0.2 * truth))


# -- search_sorted (sort + from/size) ---------------------------------------

def test_search_sorted_order_and_pagination(searcher, oracle):
    m = _match_set(oracle, QUERY)
    want = sorted(((oracle.dl[d], d) for d in m),
                  key=lambda x: (-x[0], x[1]))
    got = searcher.search_sorted(QUERY, "dl", k=10).collect()
    assert [(r["dl"], r["doc_id"]) for r in got] == want[:10]
    # ascending
    got_asc = searcher.search_sorted(QUERY, "dl", k=5,
                                     ascending=True).collect()
    want_asc = sorted(((oracle.dl[d], d) for d in m))
    assert [(r["dl"], r["doc_id"]) for r in got_asc] == want_asc[:5]
    # two pages stitch to one double-size page
    p1 = searcher.search_sorted(QUERY, "dl", k=5).collect()
    p2 = searcher.search_sorted(QUERY, "dl", k=5, from_=5).collect()
    both = searcher.search_sorted(QUERY, "dl", k=10).collect()
    assert [r["doc_id"] for r in p1 + p2] == [r["doc_id"] for r in both]


def test_search_sorted_string_field_filtered_fetch(spark, searcher,
                                                   index_dir, oracle):
    docs = spark.read.parquet(f"{index_dir}/docs")
    rows = {r["doc_id"]: (r["path"], r["lang"])
            for r in docs.select("doc_id", "path", "lang").collect()}
    m = [d for d in _match_set(oracle, QUERY) if rows[d][1] == "python"]
    want = sorted(((rows[d][0], d) for d in m))[:7]
    got = searcher.search_sorted(QUERY, "path", k=7, ascending=True,
                                 filters={"lang": "python"},
                                 fetch=True).collect()
    assert [(r["path"], r["doc_id"]) for r in got] == want
    # fetch joined the other stored fields without duplicating sort_by
    assert got and got[0]["lang"] == "python" and "repo" in got[0].asDict()


def test_search_sorted_validates_from(searcher):
    with pytest.raises(ValueError, match="from_"):
        searcher.search_sorted(QUERY, "dl", from_=-1)


# -- fuzzy ------------------------------------------------------------------

def _brute_expand(oracle, q: str, e: int, pre: int = 0) -> dict[str, int]:
    out = {}
    for t, d in oracle.df.items():
        if pre and not t.startswith(q[:pre]):
            continue
        if Searcher._edit_distance(t, q, e) <= e:
            out[t] = d
    return out


def test_edit_distance_banded():
    ed = Searcher._edit_distance
    assert ed("kitten", "sitting", 3) == 3
    assert ed("abc", "abc", 2) == 0
    assert ed("abc", "abcd", 2) == 1
    assert ed("abc", "xyz", 1) == 2  # capped: reports cap+1
    assert ed("a", "abcdef", 2) == 3  # length-band early exit


def test_auto_fuzziness():
    af = Searcher._auto_fuzziness
    assert af("ab") == 0 and af("abc") == 1
    assert af("abcde") == 1 and af("abcdef") == 2


def test_expand_fuzzy_matches_brute(searcher, oracle):
    q = "return"
    e = 1
    want = _brute_expand(oracle, q, e)
    got = searcher.expand_fuzzy(q, max_edits=e, max_expansions=10_000)
    assert set(got) == set(want)
    # ordering: distance asc, df desc, term asc
    keyed = [(Searcher._edit_distance(t, q, e), -want[t], t) for t in got]
    assert keyed == sorted(keyed)


def test_expand_fuzzy_driver_vs_distributed(spark, index_dir, searcher):
    cached = Searcher(spark, index_dir, cache_stats=True)
    for q, e, p in (("return", 1, 0), ("import", 2, 1), ("valu", 1, 2)):
        assert (cached.expand_fuzzy(q, e, 100, p)
                == searcher.expand_fuzzy(q, e, 100, p))


def test_expand_fuzzy_prefix_and_zero_edits(searcher, oracle):
    got = searcher.expand_fuzzy("return", max_edits=1, prefix_length=3)
    assert all(t.startswith("ret") for t in got)
    assert searcher.expand_fuzzy("return", max_edits=0) == ["return"]
    assert searcher.expand_fuzzy("zzzabsent", max_edits=0) == []
    with pytest.raises(ValueError):
        searcher.expand_fuzzy("")


def test_search_fuzzy_scores_expansion_disjunction(searcher, oracle):
    q = "retur"  # 5 chars -> AUTO = 1 edit ("return" is in range)
    exp = searcher.expand_fuzzy(q, "auto", 50)
    assert "return" in exp
    got = searcher.search_fuzzy(q, k=10).collect()
    want = searcher.search_bool(should=exp, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
           [(r["doc_id"], r["score"]) for r in want]
    assert searcher.search_fuzzy("zzqx", k=5).count() == 0


# -- highlight --------------------------------------------------------------

def _brute_snippet(text: str, terms: list[str], frag: int = 100,
                   pre: str = "<em>", post: str = "</em>") -> str:
    low = text.lower()
    for t in terms:
        p = low.find(t)
        if p >= 0:
            break
    else:
        t, p = terms[0], 0
    pos = p + 1 if p >= 0 else 1
    start = max(1, pos - frag // 2)
    rel = pos - start + 1
    raw = text[start - 1:start - 1 + frag]
    tl = len(t)
    return (raw[:rel - 1] + pre + raw[rel - 1:rel - 1 + tl] + post
            + raw[rel - 1 + tl:rel - 1 + tl + frag])


def test_highlight_matches_brute_force(spark, searcher, index_dir, oracle):
    terms = list(dict.fromkeys(tokenize_py(QUERY, "code")))
    texts = {r["doc_id"]: r["content"] for r in
             spark.read.parquet(f"{index_dir}/docs")
             .select("doc_id", "content").collect()}
    got = searcher.highlight(QUERY, k=10).collect()
    want_top = oracle.top_k(tokenize_py(QUERY, "code"), 10)
    assert [r["doc_id"] for r in got] == [d for d, _ in want_top]
    for r in got:
        assert r["snippet"] == _brute_snippet(texts[r["doc_id"]], terms)
        assert "<em>" in r["snippet"] and "</em>" in r["snippet"]


def test_highlight_custom_tags_and_empty(searcher):
    got = searcher.highlight(QUERY, k=3, frag_size=40, pre_tag="**",
                             post_tag="**").collect()
    assert got and all("**" in r["snippet"] for r in got)
    # a 40-char fragment wraps its tags around <= 40 chars of content
    assert all(len(r["snippet"]) <= 40 + 4 for r in got)
    assert searcher.highlight("zzzabsentterm", k=3).count() == 0
    assert searcher.highlight("", k=3).count() == 0


# -- more_like_this ---------------------------------------------------------

def _mlt_terms(oracle, src: int, max_terms: int = 25, min_tf: int = 2,
               min_df: int = 5) -> list[str]:
    c = oracle.tf[src]
    cand = [(-tf * oracle.idf(t), t) for t, tf in c.items()
            if tf >= min_tf and oracle.df.get(t, 0) >= min_df]
    cand.sort()
    return [t for _, t in cand[:max_terms]]


def test_more_like_this_matches_oracle(searcher, oracle):
    # pick a source doc with enough repeated terms to survive min_term_freq
    src = max(oracle.tf, key=lambda d: sum(
        1 for tf in oracle.tf[d].values() if tf >= 2))
    sel = _mlt_terms(oracle, src)
    assert sel, "fixture doc must yield MLT terms"
    want = [(d, s) for d, s in oracle.top_k(sel, 11) if d != src][:10]
    got = searcher.more_like_this(src, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == want
    assert src not in [r["doc_id"] for r in got]


def test_more_like_this_filters_and_errors(spark, searcher, index_dir,
                                           oracle):
    src = max(oracle.tf, key=lambda d: sum(
        1 for tf in oracle.tf[d].values() if tf >= 2))
    docs = spark.read.parquet(f"{index_dir}/docs")
    py_ids = {r["doc_id"] for r in
              docs.filter(F.col("lang") == "python")
              .select("doc_id").collect()}
    sel = _mlt_terms(oracle, src)
    want = [(d, s) for d, s in
            oracle.top_k(sel, len(oracle.tf), filter_ids=py_ids)
            if d != src][:5]
    got = searcher.more_like_this(src, k=5,
                                  filters={"lang": "python"}).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == want
    with pytest.raises(ValueError, match="not found"):
        searcher.more_like_this(-999)
    # a doc whose every term is too rare yields the empty result
    strict = searcher.more_like_this(src, k=5, min_term_freq=10**6)
    assert strict.count() == 0


# -- count + explain_score --------------------------------------------------

def test_count_matches_brute_force(spark, searcher, index_dir, oracle):
    assert searcher.count(QUERY) == len(_match_set(oracle, QUERY))
    docs = spark.read.parquet(f"{index_dir}/docs")
    go = {r["doc_id"] for r in
          docs.filter(F.col("lang") == "go").select("doc_id").collect()}
    assert searcher.count(QUERY, filters={"lang": "go"}) \
        == len(_match_set(oracle, QUERY) & go)
    assert searcher.count("zzzabsentterm") == 0


def test_explain_score_decomposes_search_score(searcher, oracle):
    terms = tokenize_py(QUERY, "code")
    top = oracle.top_k(terms, 3)
    for doc, score in top:
        rows = searcher.explain_score(QUERY, doc).collect()
        assert [r["term"] for r in rows] == sorted(dict.fromkeys(terms))
        # per-term pieces match the oracle's scoring math
        for r in rows:
            assert r["df"] == oracle.df[r["term"]]
            assert r["idf"] == pytest.approx(oracle.idf(r["term"]), abs=1e-9)
            assert r["tf"] == oracle.tf[doc].get(r["term"], 0)
            if r["tf"] == 0:
                assert r["contribution"] == 0.0
        # contributions sum back to the doc's total BM25 score
        assert sum(r["contribution"] for r in rows) \
            == pytest.approx(score, abs=1e-6)


def test_explain_score_unknown_and_partial(searcher, oracle):
    assert searcher.explain_score("zzzabsentterm", 0).count() == 0
    # a doc missing one query term still shows that term with tf=0
    m_import = {d for d, c in oracle.tf.items() if "import" in c}
    m_return = {d for d, c in oracle.tf.items() if "return" in c}
    only_import = m_import - m_return
    if only_import:
        doc = min(only_import)
        rows = {r["term"]: r for r in
                searcher.explain_score(QUERY, doc).collect()}
        assert rows["return"]["tf"] == 0
        assert rows["return"]["contribution"] == 0.0
        assert rows["import"]["contribution"] > 0


# -- search_after (deep-paging scale path) ----------------------------------

def test_search_after_stitches_the_full_match_set(searcher, oracle):
    m = _match_set(oracle, QUERY)
    want = sorted(((oracle.dl[d], d) for d in m), key=lambda x: (-x[0], x[1]))
    got, after = [], None
    while True:
        page = searcher.search_sorted(QUERY, "dl", k=7,
                                      search_after=after).collect()
        if not page:
            break
        got.extend((r["dl"], r["doc_id"]) for r in page)
        after = (page[-1]["dl"], page[-1]["doc_id"])
    assert got == want  # every doc exactly once, in order
    # ascending cursoring agrees with one big ascending page
    asc_all = searcher.search_sorted(QUERY, "dl", k=len(m),
                                     ascending=True).collect()
    p1 = searcher.search_sorted(QUERY, "dl", k=4, ascending=True).collect()
    p2 = searcher.search_sorted(
        QUERY, "dl", k=4, ascending=True,
        search_after=(p1[-1]["dl"], p1[-1]["doc_id"])).collect()
    assert [r["doc_id"] for r in p1 + p2] \
        == [r["doc_id"] for r in asc_all[:8]]


def test_search_after_equals_from_size_pages(searcher):
    """Cursor paging returns exactly what offset paging returns."""
    p0 = searcher.search_sorted(QUERY, "dl", k=5).collect()
    off = searcher.search_sorted(QUERY, "dl", k=5, from_=5).collect()
    cur = searcher.search_sorted(
        QUERY, "dl", k=5,
        search_after=(p0[-1]["dl"], p0[-1]["doc_id"])).collect()
    assert [(r["dl"], r["doc_id"]) for r in cur] \
        == [(r["dl"], r["doc_id"]) for r in off]


def test_search_after_string_field_and_validation(spark, searcher,
                                                  index_dir):
    docs = spark.read.parquet(f"{index_dir}/docs")
    rows = {r["doc_id"]: r["path"] for r in
            docs.select("doc_id", "path").collect()}
    full = searcher.search_sorted(QUERY, "path", k=10**6,
                                  ascending=True).collect()
    cur = searcher.search_sorted(
        QUERY, "path", k=3, ascending=True,
        search_after=(full[2]["path"], full[2]["doc_id"])).collect()
    assert [(r["path"], r["doc_id"]) for r in cur] \
        == [(r["path"], r["doc_id"]) for r in full[3:6]]
    assert all(rows[r["doc_id"]] == r["path"] for r in cur)
    with pytest.raises(ValueError, match="mutually exclusive"):
        searcher.search_sorted(QUERY, "dl", from_=5,
                               search_after=(10, 0))


# -- get_docs (ES _mget) ----------------------------------------------------

def test_get_docs_fetches_by_id(spark, searcher, index_dir):
    docs = spark.read.parquet(f"{index_dir}/docs")
    ids = [r["doc_id"] for r in docs.select("doc_id").limit(5).collect()]
    got = searcher.get_docs([ids[3], ids[0], ids[3], 10**12]).collect()
    assert [r["doc_id"] for r in got] == sorted({ids[0], ids[3]})
    assert set(got[0].asDict()) == set(docs.columns)
    # field projection prunes columns
    slim = searcher.get_docs(ids, fields=["lang"]).collect()
    assert set(slim[0].asDict()) == {"doc_id", "lang"}
    assert len(slim) == len(set(ids))
    with pytest.raises(ValueError, match="unknown stored"):
        searcher.get_docs(ids, fields=["nope"])


def test_get_docs_excludes_tombstones(spark, corpus_df, tmp_path_factory):
    from deluge_spark.index.build import BuildConfig, build_index
    from deluge_spark.plans.admin import delete_docs

    d = str(tmp_path_factory.mktemp("mget_del"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    s = Searcher(spark, d)
    ids = [r["doc_id"] for r in spark.read.parquet(f"{d}/docs")
           .select("doc_id").limit(3).collect()]
    delete_docs(spark, d, doc_ids=[ids[1]])
    got = Searcher(spark, d).get_docs(ids).collect()
    assert [r["doc_id"] for r in got] == sorted(set(ids) - {ids[1]})


# -- facet_percentiles ------------------------------------------------------

def test_facet_percentiles_exact_matches_numpy(searcher, oracle):
    import numpy as np

    m = _match_set(oracle, QUERY)
    dls = np.array(sorted(oracle.dl[d] for d in m), dtype=float)
    ps = [25.0, 50.0, 75.0, 95.0, 99.0]
    got = searcher.facet_percentiles(QUERY, "dl", ps).collect()
    assert [r["percent"] for r in got] == ps
    for r in got:
        # SQL percentile == numpy linear interpolation
        assert r["value"] == pytest.approx(
            round(float(np.percentile(dls, r["percent"])), 6), abs=1e-6)


def test_facet_percentiles_approx_and_validation(searcher, oracle):
    import numpy as np

    m = _match_set(oracle, QUERY)
    dls = np.array(sorted(oracle.dl[d] for d in m), dtype=float)
    approx = searcher.facet_percentiles(QUERY, "dl", [50.0],
                                        exact=False).collect()[0]
    # GK sketch at default accuracy is rank-exact at this size
    lo, hi = np.percentile(dls, 40), np.percentile(dls, 60)
    assert lo <= approx["value"] <= hi
    with pytest.raises(ValueError, match="percents"):
        searcher.facet_percentiles(QUERY, "dl", [101.0])
    assert searcher.facet_percentiles("zzzabsentterm", "dl").count() == 0


# -- facet_top_hits (terms bucket + top_hits / field collapsing) ------------

def test_facet_top_hits_matches_brute_force(spark, searcher, index_dir,
                                            oracle):
    docs = spark.read.parquet(f"{index_dir}/docs")
    # brute: per-lang buckets over the match set, top-2 by dl desc
    m = _match_set(oracle, QUERY)
    lang = {r["doc_id"]: r["lang"]
            for r in docs.select("doc_id", "lang").collect()}
    per = {}
    for d in m:
        per.setdefault(lang[d], []).append((oracle.dl[d], d))
    buckets = sorted(per, key=lambda v: (-len(per[v]), v))[:3]
    want = []
    for v in sorted(buckets):
        hits = sorted(per[v], key=lambda x: (-x[0], x[1]))[:2]
        want.extend((v, d, dl) for dl, d in hits)
    got = searcher.facet_top_hits(QUERY, by="lang", sort_by="dl",
                                  hits_per_bucket=2, buckets=3).collect()
    assert [(r["value"], r["doc_id"], r["dl"]) for r in got] == want


def test_facet_top_hits_respects_filters_and_empty(searcher):
    got = searcher.facet_top_hits(QUERY, by="lang", sort_by="dl",
                                  hits_per_bucket=1, buckets=2,
                                  filters={"lang": "go"}).collect()
    assert {r["value"] for r in got} <= {"go"}
    assert searcher.facet_top_hits("zzzabsentterm", by="lang",
                                   sort_by="dl").count() == 0


# -- term suggester ---------------------------------------------------------

def _brute_suggest(oracle, tok: str, e: int, size: int,
                   prefix_length: int = 1) -> list[tuple]:
    pre = tok[:prefix_length] if prefix_length > 0 else ""
    cand = [(Searcher._edit_distance(t, tok, e), -d, t)
            for t, d in oracle.df.items()
            if t != tok and (not pre or t.startswith(pre))]
    cand = sorted(c for c in cand if c[0] <= e)
    return [(tok, t, -nd, dist) for dist, nd, t in cand[:size]]


def test_suggest_terms_missing_matches_brute(searcher, oracle):
    # "improt"/"tabel" are misspellings (absent from the dictionary);
    # "return" is present and must be skipped in missing mode
    assert "improt" not in oracle.df and "return" in oracle.df
    got = [tuple(r) for r in
           searcher.suggest_terms("improt return tabel", size=5).collect()]
    want = (_brute_suggest(oracle, "improt", 2, 5)
            + _brute_suggest(oracle, "tabel", 1, 5))   # token-major already
    assert got == want, (got, want)
    assert all(r[0] != "return" for r in got)


def test_suggest_terms_driver_vs_distributed(spark, index_dir, searcher):
    plain = Searcher(spark, index_dir, cache_stats=False)
    assert plain._df_map is None and searcher._df_map is not None
    for text, mode in (("improt tabel", "missing"),
                       ("return valu", "always"),
                       ("retur", "popular")):
        a = [tuple(r) for r in
             searcher.suggest_terms(text, 4, suggest_mode=mode).collect()]
        b = [tuple(r) for r in
             plain.suggest_terms(text, 4, suggest_mode=mode).collect()]
        assert a == b, (text, mode, a, b)


def test_suggest_terms_modes(searcher, oracle):
    # pick a PRESENT token that provably has dictionary neighbors so the
    # always/popular assertions exercise non-empty paths
    tok = next(t for t in sorted(oracle.df)
               if len(t) > 5 and _brute_suggest(oracle, t, 2, 5))
    want = _brute_suggest(oracle, tok, 2, 5)
    rows = [tuple(r) for r in
            searcher.suggest_terms(tok, 5, suggest_mode="always").collect()]
    assert rows == want, (tok, rows, want)
    assert all(r[1] != tok for r in rows)
    # missing mode skips the present token entirely
    assert searcher.suggest_terms(tok, 5).count() == 0
    # popular: every suggestion strictly more frequent than the token
    own = oracle.df[tok]
    pop = [tuple(r) for r in
           searcher.suggest_terms(tok, 50,
                                  suggest_mode="popular").collect()]
    assert pop == [
        (tok, t, d, dist)
        for _, t, d, dist in _brute_suggest(oracle, tok, 2, 10 ** 9)
        if d > own][:50], (tok, own, pop)
    with pytest.raises(ValueError, match="suggest_mode"):
        searcher.suggest_terms("x", suggest_mode="nope")
    # short tokens get edit budget 0 under AUTO -> no suggestions
    assert searcher.suggest_terms("ab", suggest_mode="always").count() == 0
