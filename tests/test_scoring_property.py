"""Property test: TAAT == WAND == brute force on random posting lists.

Pure numpy — no Spark session — so hypothesis can hammer hundreds of random
(postings, idfs, k, allowed-filter) configurations cheaply. Segment rows are
built through the real encoder (encode_group), so the whole
encode → skip-table → decode → score → rank contract is under test.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from deluge_spark.index.codec import encode_group, tfnorm
from deluge_spark.index.wand import PostingIterator, taat_top_k, wand_top_k

ROUND_DP = 9


def _rows_from_group(term_idx, docs, tfs, dls):
    """encode_group output → list of segment-row dicts (one per term)."""
    g = encode_group(term_idx, docs, tfs, dls)
    data = g["data"].tobytes()
    rows = []
    for ti in range(g["n_terms"]):
        lo, hi = g["term_block_offsets"][ti], g["term_block_offsets"][ti + 1]
        bs, be = int(g["term_byte_start"][ti]), int(g["term_byte_end"][ti])
        rows.append({
            "term": f"t{int(term_idx[g['term_pos'][ti]])}",
            "shard": 0,
            "n_postings": int(g["df_local"][ti]),
            "block_first": g["block_first"][lo:hi].tolist(),
            "block_last": g["block_last"][lo:hi].tolist(),
            "block_count": g["block_count"][lo:hi].tolist(),
            "block_off": g["block_off"][lo:hi].tolist(),
            "block_max_tf": g["block_max_tf"][lo:hi].tolist(),
            "block_min_dl": g["block_min_dl"][lo:hi].tolist(),
            "data": data[bs:be],
        })
    return rows


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),       # term index
            st.integers(min_value=0, max_value=2000),    # doc id
            st.integers(min_value=1, max_value=50),      # tf
            st.integers(min_value=1, max_value=500),     # dl
        ),
        min_size=1, max_size=600,
        unique_by=lambda x: (x[0], x[1]),
    ),
    st.integers(min_value=1, max_value=40),              # k
    st.floats(min_value=0.1, max_value=8.0),             # avgdl scale
    st.booleans(),                                       # apply a filter?
)
def test_taat_wand_brute_identical(postings, k, avgdl_scale, filtered):
    postings.sort()
    idx = np.array([p[0] for p in postings], dtype=np.int64)
    doc = np.array([p[1] for p in postings], dtype=np.int64)
    tf = np.array([p[2] for p in postings], dtype=np.int64)
    dl = np.array([p[3] for p in postings], dtype=np.int64)
    avgdl = float(dl.mean() * avgdl_scale)
    rows = _rows_from_group(idx, doc, tf, dl)
    idfs = {r["term"]: 0.3 + 0.2 * i for i, r in enumerate(rows)}

    allowed = None
    if filtered:
        allowed = np.unique(doc[doc % 3 == 0])  # deterministic subset

    # brute force from the raw postings
    scores: dict[int, float] = {}
    for i in range(len(doc)):
        t = f"t{int(idx[i])}"
        scores[int(doc[i])] = scores.get(int(doc[i]), 0.0) + idfs[t] * float(
            tfnorm(tf[i:i + 1], dl[i:i + 1], avgdl)[0])
    cand = [(d, s) for d, s in scores.items()
            if allowed is None or d in set(allowed.tolist())]
    cand.sort(key=lambda x: (-round(x[1], ROUND_DP), x[0]))
    want = cand[:k]

    its = [PostingIterator(r, idfs[r["term"]], avgdl) for r in rows]
    got_wand = wand_top_k(its, k, ROUND_DP, allowed)
    got_taat = taat_top_k(rows, idfs, avgdl, k, ROUND_DP, allowed)

    assert [d for d, _ in got_wand] == [d for d, _ in want]
    assert [d for d, _ in got_taat] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got_wand, want):
        assert abs(s1 - s2) <= 1e-9 * max(1.0, abs(s2))
    for (_, s1), (_, s2) in zip(got_taat, want):
        assert abs(s1 - s2) <= 1e-9 * max(1.0, abs(s2))
