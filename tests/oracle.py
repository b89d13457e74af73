"""Pure-Python BM25 reference scorer (the pytest oracle, SURVEY.md §5.2).

Deliberately naive: dict postings, exact float64 BM25, no pruning. Engine
top-k must be rank-identical (tie-break: score desc, doc_id asc) and
score-close (1e-9 rel) on every fixture.
"""

from __future__ import annotations

import math
from collections import Counter

from deluge_spark.functions.tokenizer import tokenize_py

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, docs: dict[int, str], mode: str = "code"):
        self.tf: dict[int, Counter] = {}
        self.df: Counter = Counter()
        self.dl: dict[int, int] = {}
        for doc_id, text in docs.items():
            toks = tokenize_py(text, mode)
            if not toks:
                continue
            c = Counter(toks)
            self.tf[doc_id] = c
            self.dl[doc_id] = sum(c.values())
            for t in c:
                self.df[t] += 1
        self.n = len(self.dl)
        self.avgdl = (sum(self.dl.values()) / self.n) if self.n else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def score(self, query_terms: list[str], doc_id: int) -> float:
        c = self.tf.get(doc_id)
        if not c:
            return 0.0
        dl = self.dl[doc_id]
        s = 0.0
        for t in dict.fromkeys(query_terms):
            tf = c.get(t, 0)
            if tf == 0:
                continue
            norm = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
            s += self.idf(t) * norm
        return s

    def top_k(self, query_terms: list[str], k: int = 10,
              filter_ids: set[int] | None = None,
              round_dp: int | None = 9) -> list[tuple[int, float]]:
        """Top-k with deterministic tie-break (score desc, doc_id asc).

        ``round_dp`` rounds scores before ordering so that docs whose scores
        are analytically equal (same tf vector, same dl) cannot be split by
        float summation-order noise — the engine applies the same rounding.
        """
        terms = list(dict.fromkeys(query_terms))
        cand: set[int] = set()
        for t in terms:
            for d, c in self.tf.items():
                if t in c:
                    cand.add(d)
        if filter_ids is not None:
            cand &= filter_ids
        scored = [(d, self.score(terms, d)) for d in cand]
        if round_dp is not None:
            scored = [(d, round(s, round_dp)) for d, s in scored]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]


def reference_queries() -> list[dict]:
    """The deterministic reference query set (FIXTURES.md §2)."""
    qs = [
        {"query": "rareterm0", "k": 10},
        {"query": "rareterm1", "k": 1},
        {"query": "import", "k": 10},          # hot term
        {"query": "the", "k": 100},            # hot term, large k
        {"query": "import return table", "k": 10},
        {"query": "buffer client error", "k": 10},
        {"query": "getHTTPResponse", "k": 10},  # camelCase → sub-tokens
        {"query": "parseJSONBody index", "k": 10},
        {"query": "snake_case_ident", "k": 10},
        {"query": "zzzmissingterm", "k": 10},   # absent → empty
        {"query": "literal_3 value", "k": 10},
        {"query": "bigblock", "k": 5},
    ]
    for i, q in enumerate(qs):
        q["query_id"] = i
    return qs
