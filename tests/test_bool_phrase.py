"""Boolean / phrase / prefix queries (ES query-DSL parity, round 5).

Brute-force oracles mirror the documented semantics exactly:

- bool: docs must contain EVERY must token, may contain should tokens,
  are excluded by ANY must_not token; score = BM25 over matched
  must+should terms (exclusion never changes survivor scores).
- phrase: conjunctive candidates + contiguous-subsequence check on the
  analyzed token stream; score = BM25 over the phrase's distinct terms
  with full-document tf (documented divergence from ES phrase-freq).
- prefix: dictionary expansion (df desc, term asc, capped), scored as a
  disjunction with per-term idf.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.functions.tokenizer import tokenize_py
from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher
from deluge_spark.plans.admin import delete_docs

from tests.oracle import OracleIndex

DP = 9


@pytest.fixture(scope="module")
def bp_idx(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bp_idx"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=4, tokenize_groups=2,
                            shard_batches=1))
    return d


@pytest.fixture(scope="module")
def bp_docs(spark, bp_idx):
    """(doc_id, content, lang) as stored — ids are assigned at build."""
    return {int(r["doc_id"]): (r["content"], r["lang"]) for r in
            spark.read.parquet(f"{bp_idx}/docs")
            .select("doc_id", "content", "lang").collect()}


@pytest.fixture(scope="module")
def oracle(bp_docs):
    return OracleIndex({d: c for d, (c, _) in bp_docs.items()})


@pytest.fixture(scope="module")
def doc_tokens(bp_docs):
    return {d: tokenize_py(c, "code") for d, (c, _) in bp_docs.items()}


def _norm(clause) -> list[str]:
    if clause is None:
        return []
    if isinstance(clause, str):
        return list(dict.fromkeys(tokenize_py(clause, "code")))
    return list(dict.fromkeys(clause))


def brute_bool(oracle: OracleIndex, must, should, must_not, k=10,
               allowed_ids=None, banned_ids=frozenset()):
    m, s, mn = _norm(must), _norm(should), set(_norm(must_not))
    m = [t for t in m if t not in mn]
    s = [t for t in s if t not in mn]
    if _norm(must) and not m:
        return []
    scoring = [t for t in m + s if oracle.df.get(t)]
    if any(not oracle.df.get(t) for t in m) or not scoring:
        return []
    out = []
    for doc_id, c in oracle.tf.items():
        if allowed_ids is not None and doc_id not in allowed_ids:
            continue
        if doc_id in banned_ids:
            continue
        if any(t not in c for t in m):
            continue
        if any(t in c for t in mn):
            continue
        sc = oracle.score(scoring, doc_id)
        if sc > 0.0:
            out.append((doc_id, sc))
    out.sort(key=lambda x: (-round(x[1], DP), x[0]))
    return [(d, round(sc, DP)) for d, sc in out[:k]]


def _contains_sublist(hay: list[str], needle: list[str]) -> bool:
    n = len(needle)
    return any(hay[i:i + n] == needle for i in range(len(hay) - n + 1))


def brute_phrase(oracle: OracleIndex, doc_tokens, phrase: str, k=10,
                 allowed_ids=None):
    toks = tokenize_py(phrase, "code")
    uniq = list(dict.fromkeys(toks))
    if not uniq or any(not oracle.df.get(t) for t in uniq):
        return []
    out = []
    for doc_id, hay in doc_tokens.items():
        if allowed_ids is not None and doc_id not in allowed_ids:
            continue
        if _contains_sublist(hay, toks):
            out.append((doc_id, oracle.score(uniq, doc_id)))
    out.sort(key=lambda x: (-round(x[1], DP), x[0]))
    return [(d, round(sc, DP)) for d, sc in out[:k]]


def _got(df) -> list[tuple[int, float]]:
    return [(r["doc_id"], round(r["score"], DP)) for r in df.collect()]


BOOL_CASES = [
    dict(must="import", should="return table", must_not="error"),
    dict(must="data value", should=None, must_not=None),
    dict(must=None, should="import return", must_not="table"),
    dict(must="return", should="client buffer", must_not="import data"),
    dict(must=["import", "return"], should=["table"], must_not=[]),
]


def test_bool_matches_bruteforce_both_modes(spark, bp_idx, oracle):
    s = Searcher(spark, bp_idx)
    for case in BOOL_CASES:
        want = brute_bool(oracle, **case)
        for mode in ("coordinator", "distributed"):
            got = _got(s.search_bool(k=10, mode=mode, **case))
            assert got == want, (case, mode)


def test_bool_local_matches_dataframe_path(spark, bp_idx):
    s = Searcher(spark, bp_idx)
    top = s.search_bool_local(must="import", should="return", k=10)
    df = _got(s.search_bool(must="import", should="return", k=10))
    assert [(d, round(sc, DP)) for d, sc in top] == df


def test_bool_unknown_must_term_is_empty(spark, bp_idx):
    s = Searcher(spark, bp_idx)
    assert s.search_bool(must="zzzabsentterm", should="import").count() == 0
    assert s.search_bool_local(must="zzzabsentterm", should="import") == []


def test_bool_needs_must_or_should(spark, bp_idx):
    s = Searcher(spark, bp_idx)
    with pytest.raises(ValueError, match="must or"):
        s.search_bool(must_not="import")


def test_bool_term_in_both_scoring_and_must_not(spark, bp_idx, oracle):
    s = Searcher(spark, bp_idx)
    # every must term also excluded -> provably empty
    assert s.search_bool(must="import", must_not="import",
                         should="return").count() == 0
    # overlap only drops the shared term from scoring
    want = brute_bool(oracle, None, "import return", "return")
    got = _got(s.search_bool(should="import return", must_not="return"))
    assert got == want


def test_bool_with_keyword_filters(spark, bp_idx, oracle, bp_docs):
    s = Searcher(spark, bp_idx)
    lang = next(iter(bp_docs.values()))[1]
    allowed = {d for d, (_, lg) in bp_docs.items() if lg == lang}
    want = brute_bool(oracle, "import", "return", "error",
                      allowed_ids=allowed)
    for mode in ("coordinator", "distributed"):
        got = _got(s.search_bool(must="import", should="return",
                                 must_not="error",
                                 filters={"lang": lang}, mode=mode))
        assert got == want, mode


def test_bool_respects_tombstones(spark, corpus_df, oracle,
                                  tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bp_del"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    s = Searcher(spark, d)
    base = _got(s.search_bool(must="import", should="return", k=10))
    victim = base[0][0]
    delete_docs(spark, d, doc_ids=[victim])
    s2 = Searcher(spark, d)
    want = brute_bool(oracle, "import", "return", None,
                      banned_ids={victim})
    for mode in ("coordinator", "distributed"):
        got = _got(s2.search_bool(must="import", should="return", k=10,
                                  mode=mode))
        assert got == want, mode
        assert victim not in [doc for doc, _ in got]


def test_phrase_matches_bruteforce(spark, bp_idx, oracle, doc_tokens):
    s = Searcher(spark, bp_idx)
    # phrases planted from real documents: contiguous token windows
    phrases = []
    for toks in list(doc_tokens.values())[:40]:
        if len(toks) >= 6:
            phrases.append(" ".join(toks[2:5]))
        if len(phrases) >= 5:
            break
    phrases += ["import return", "zzzabsent phrase", "data"]
    assert len(phrases) >= 7
    for p in phrases:
        want = brute_phrase(oracle, doc_tokens, p, k=10)
        got = _got(s.search_phrase(p, k=10))
        assert got == want, p
        if want:
            # verification is real: conjunctive candidates ⊇ verified docs
            cand = {d for d, _ in _got(
                s.search_bool(must=p, k=10_000, mode="distributed"))}
            assert {d for d, _ in got} <= cand


def test_phrase_order_matters(spark, bp_idx, oracle, doc_tokens):
    s = Searcher(spark, bp_idx)
    fwd = None
    for toks in doc_tokens.values():
        if len(toks) >= 4 and toks[1] != toks[2]:
            fwd = f"{toks[1]} {toks[2]}"
            rev = f"{toks[2]} {toks[1]}"
            break
    assert fwd is not None
    for p in (fwd, rev):
        assert _got(s.search_phrase(p, k=10)) == brute_phrase(
            oracle, doc_tokens, p, k=10), p


def test_phrase_with_filters(spark, bp_idx, oracle, doc_tokens, bp_docs):
    s = Searcher(spark, bp_idx)
    lang = next(iter(bp_docs.values()))[1]
    allowed = {d for d, (_, lg) in bp_docs.items() if lg == lang}
    p = "import return"
    want = brute_phrase(oracle, doc_tokens, p, k=10, allowed_ids=allowed)
    got = _got(s.search_phrase(p, k=10, filters={"lang": lang}))
    assert got == want


def test_phrase_without_stored_content(spark, corpus_df, bp_docs,
                                       oracle, doc_tokens,
                                       tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bp_nostore"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1, store_content=False))
    s = Searcher(spark, d)
    with pytest.raises(ValueError, match="store_content"):
        s.search_phrase("import return").count()
    import pandas as pd
    content = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(bp_docs), "content": [c for c, _ in bp_docs.values()]}))
    got = _got(s.search_phrase("import return", k=10, content_df=content))
    assert got == brute_phrase(oracle, doc_tokens, "import return", k=10)


def test_prefix_expansion_and_search(spark, bp_idx, oracle):
    s = Searcher(spark, bp_idx)
    # expansion: df desc then term asc, capped — vs the oracle dictionary
    pre = "da"
    want_exp = sorted((t for t in oracle.df if t.startswith(pre)),
                      key=lambda t: (-oracle.df[t], t))
    assert s.expand_prefix(pre, max_expansions=3) == want_exp[:3]
    assert s.expand_prefix(pre, max_expansions=1000) == want_exp
    # uncached-dictionary path must agree (pushed parquet scan)
    s2 = Searcher(spark, bp_idx, cache_stats=False)
    assert s2.expand_prefix(pre, max_expansions=3) == want_exp[:3]
    # search == bool disjunction over the expansions
    got = _got(s.search_prefix(pre, k=10, max_expansions=5))
    want = brute_bool(oracle, None, want_exp[:5], None, k=10)
    assert got == want
    assert _got(s.search_prefix("zzzzzz", k=10)) == []


def test_prefix_empty_raises(spark, bp_idx):
    with pytest.raises(ValueError, match="empty prefix"):
        Searcher(spark, bp_idx).expand_prefix("")


def test_cli_bool_phrase_prefix(spark, bp_idx, oracle, doc_tokens):
    """CLI surface for the new query types: --must/--must-not, --phrase,
    --prefix all answer through the same engine paths."""
    import json
    import subprocess
    import sys

    def run(*args):
        p = subprocess.run([sys.executable, "-m", "deluge_spark.cli",
                            "--cores", "4", "search", "--index", bp_idx,
                            *args],
                           capture_output=True, text=True, timeout=600,
                           cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-2000:]
        return [json.loads(line) for line in p.stdout.splitlines()
                if line.startswith("{")]

    got = [(h["doc_id"], round(h["score"], DP))
           for h in run("--must", "import", "--query", "return",
                        "--must-not", "error", "-k", "5")]
    assert got == brute_bool(oracle, "import", "return", "error", k=5)
    got = [(h["doc_id"], round(h["score"], DP))
           for h in run("--phrase", "import return", "-k", "5")]
    assert got == brute_phrase(oracle, doc_tokens, "import return", k=5)
    hits = run("--prefix", "re", "-k", "5", "--max-expansions", "3")
    assert 0 < len(hits) <= 5


def brute_facet_terms(oracle, bp_docs, query, size=10, allowed_ids=None):
    terms = [t for t in _norm(query) if oracle.df.get(t)]
    if not terms:
        return []
    from collections import Counter
    c = Counter()
    for doc_id, tf in oracle.tf.items():
        if allowed_ids is not None and doc_id not in allowed_ids:
            continue
        if any(t in tf for t in terms):
            c[bp_docs[doc_id][1]] += 1
    out = sorted(c.items(), key=lambda x: (-x[1], x[0]))
    return out[:size]


def test_facet_terms_matches_bruteforce(spark, bp_idx, oracle, bp_docs):
    s = Searcher(spark, bp_idx)
    for q in ("import return", "data", "zzzabsentterm"):
        want = brute_facet_terms(oracle, bp_docs, q)
        got = [(r["value"], r["n_docs"])
               for r in s.facet_terms(q, by="lang").collect()]
        assert got == want, q
    # filters compose: facet within one lang = that lang's own count
    lang = next(iter(bp_docs.values()))[1]
    allowed = {d for d, (_, lg) in bp_docs.items() if lg == lang}
    want = brute_facet_terms(oracle, bp_docs, "import return",
                             allowed_ids=allowed)
    got = [(r["value"], r["n_docs"]) for r in
           s.facet_terms("import return", by="lang",
                         filters={"lang": lang}).collect()]
    assert got == want


def test_facet_histogram_matches_bruteforce(spark, bp_idx, oracle):
    s = Searcher(spark, bp_idx)
    from collections import Counter
    terms = [t for t in _norm("import return") if oracle.df.get(t)]
    c = Counter()
    for doc_id, tf in oracle.tf.items():
        if any(t in tf for t in terms):
            c[(oracle.dl[doc_id] // 50) * 50] += 1
    want = sorted(c.items())
    got = [(r["bucket"], r["n_docs"]) for r in
           s.facet_histogram("import return", interval=50).collect()]
    assert got == want
    with pytest.raises(ValueError, match="interval"):
        s.facet_histogram("import", interval=0)


def test_facet_respects_tombstones(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bp_facet_del"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    s = Searcher(spark, d)
    before = {r["value"]: r["n_docs"]
              for r in s.facet_terms("import", by="lang").collect()}
    victim = s.search_local("import", 1)[0][0]
    vlang = spark.read.parquet(f"{d}/docs").filter(
        F.col("doc_id") == victim).collect()[0]["lang"]
    delete_docs(spark, d, doc_ids=[victim])
    after = {r["value"]: r["n_docs"] for r in
             Searcher(spark, d).facet_terms("import", by="lang").collect()}
    assert after[vlang] == before[vlang] - 1


def test_bool_fetch_fields(spark, bp_idx):
    s = Searcher(spark, bp_idx)
    out = s.search_bool(must="import", should="return", k=5, fetch=True)
    cols = set(out.columns)
    assert {"doc_id", "score", "lang"} <= cols
    assert out.count() == s.search_bool(must="import", should="return",
                                        k=5).count()


# -- minimum_should_match ---------------------------------------------------

def brute_bool_msm(oracle: OracleIndex, must, should, must_not, msm,
                   k=10):
    """brute_bool + the msm candidate gate: >= msm distinct should terms."""
    m, s, mn = _norm(must), _norm(should), set(_norm(must_not))
    m = [t for t in m if t not in mn]
    s_eff = [t for t in s if t not in mn]
    if _norm(must) and not m:
        return []
    scoring = [t for t in m + s_eff if oracle.df.get(t)]
    if any(not oracle.df.get(t) for t in m) or not scoring:
        return []
    out = []
    for doc_id, c in oracle.tf.items():
        if any(t not in c for t in m):
            continue
        if any(t in c for t in mn):
            continue
        if msm > 0 and sum(1 for t in s if t in c) < msm:
            continue
        sc = oracle.score(scoring, doc_id)
        if sc > 0.0:
            out.append((doc_id, sc))
    out.sort(key=lambda x: (-round(x[1], DP), x[0]))
    return [(d, round(sc, DP)) for d, sc in out[:k]]


MSM_CASES = [
    dict(must=None, should="import return table", must_not=None),
    dict(must="data", should="import return client", must_not=None),
    dict(must=None, should="import return buffer", must_not="error"),
]


def test_bool_msm_matches_bruteforce_both_modes(spark, bp_idx, oracle):
    s = Searcher(spark, bp_idx)
    for case in MSM_CASES:
        for msm in (1, 2, 3):
            want = brute_bool_msm(oracle, msm=msm, **case)
            for mode in ("coordinator", "distributed"):
                got = _got(s.search_bool(k=10, mode=mode,
                                         minimum_should_match=msm, **case))
                assert got == want, (case, msm, mode)


def test_bool_msm_tightens_the_match_set(spark, bp_idx, oracle):
    s = Searcher(spark, bp_idx)
    should = "import return table"
    n = [s.search_bool(should=should, k=10**6,
                       minimum_should_match=m).count()
         for m in (0, 1, 2, 3)]
    # msm=0 and msm=1 agree (any-should default); higher msm narrows
    assert n[0] == n[1] and n[1] >= n[2] >= n[3]
    assert n[2] < n[1], "fixture should have docs matching only one term"


def test_bool_msm_edges(spark, bp_idx):
    s = Searcher(spark, bp_idx)
    # msm above the number of (present) should terms matches nothing
    assert s.search_bool(should="import return",
                         minimum_should_match=3).count() == 0
    # absent should terms cannot satisfy msm
    assert s.search_bool(should="import zzzabsentterm",
                         minimum_should_match=2).count() == 0
    with pytest.raises(ValueError, match="minimum_should_match"):
        s.search_bool(should="import", minimum_should_match=-1)


# -- wildcard + boosts ------------------------------------------------------

def test_wildcard_expansion_and_search(spark, bp_idx, oracle):
    import fnmatch

    s = Searcher(spark, bp_idx)
    for pat in ("imp*", "*turn", "d?ta", "*at*"):
        want_terms = sorted((t for t in oracle.df
                             if fnmatch.fnmatchcase(t, pat)),
                            key=lambda t: (-oracle.df[t], t))[:50]
        assert s.expand_wildcard(pat) == want_terms, pat
        if not want_terms:
            continue
        got = _got(s.search_wildcard(pat, k=10))
        want = brute_bool(oracle, None, want_terms, None)
        assert got == want, pat
    # driver-dictionary expansion == pushed terms-table scan
    s2 = Searcher(spark, bp_idx, cache_stats=False)
    assert s2._df_map is None or s2._df_map == {}
    for pat in ("imp*", "*turn", "d?ta"):
        assert Searcher.expand_wildcard(s2, pat) == s.expand_wildcard(pat)
    with pytest.raises(ValueError, match="literal"):
        s.expand_wildcard("*")


def test_boosts_scale_contributions(spark, bp_idx, oracle):
    s = Searcher(spark, bp_idx)
    boosts = {"import": 3.0, "return": 0.5}
    # brute: BM25 with idf scaled per term
    out = []
    for doc_id, c in oracle.tf.items():
        sc = sum(boosts.get(t, 1.0) * oracle.score([t], doc_id)
                 for t in ("import", "return") if t in c)
        if sc > 0:
            out.append((doc_id, sc))
    out.sort(key=lambda x: (-round(x[1], DP), x[0]))
    want = [(d, round(sc, DP)) for d, sc in out[:10]]
    for mode in ("coordinator", "distributed"):
        got = _got(s.search_bool(should="import return", k=10, mode=mode,
                                 boosts=boosts))
        assert got == want, mode
    # boost=1 everywhere is a no-op
    assert _got(s.search_bool(should="import return", k=10,
                              boosts={"import": 1.0})) \
        == _got(s.search_bool(should="import return", k=10))
    with pytest.raises(ValueError, match="positive"):
        s.search_bool(should="import", boosts={"import": 0.0}).count()
