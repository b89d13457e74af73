from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from deluge_spark.index.codec import (
    BLOCK,
    decode_block,
    decode_postings,
    encode_postings,
    tfnorm,
    varint_decode,
    varint_encode,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = varint_encode(arr)
    dec, consumed = varint_decode(enc)
    assert consumed == enc.size
    assert dec.tolist() == vals


def test_varint_partial_decode_with_offset():
    a = np.array([300, 1, 2**40, 7], dtype=np.uint64)
    b = np.array([5, 6], dtype=np.uint64)
    buf = np.concatenate([varint_encode(a), varint_encode(b)])
    got_a, used = varint_decode(buf, count=4)
    assert got_a.tolist() == a.tolist()
    got_b, _ = varint_decode(buf, count=2, offset=used)
    assert got_b.tolist() == b.tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=100_000),
        ),
        min_size=1,
        max_size=700,
        unique_by=lambda x: x[0],
    )
)
def test_postings_roundtrip(postings):
    postings.sort()
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    enc = encode_postings(docs, tfs, dls)
    d, t, l = decode_postings(enc)
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    assert l.tolist() == dls.tolist()
    # skip table invariants
    assert enc["n_postings"] == len(docs)
    assert enc["block_first"][0] == docs[0]
    assert enc["block_last"][-1] == docs[-1]
    # the impact pair (max_tf, min_dl) upper-bounds tfnorm within each
    # block for ANY avgdl (monotone ↑tf ↓dl)
    for i in range(len(enc["block_off"])):
        s, e = i * BLOCK, min((i + 1) * BLOCK, len(docs))
        assert enc["block_max_tf"][i] == tfs[s:e].max()
        assert enc["block_min_dl"][i] == dls[s:e].min()
        for avgdl in (1.0, 50.0, 10_000.0):
            import numpy as _np
            ub = tfnorm(_np.array([enc["block_max_tf"][i]]),
                        _np.array([enc["block_min_dl"][i]]), avgdl)[0]
            assert ub >= tfnorm(tfs[s:e], dls[s:e], avgdl).max()


def test_independent_block_decode():
    n = 300
    docs = np.arange(0, 5 * n, 5, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 10, dtype=np.int64)
    enc = encode_postings(docs, tfs, dls)
    # decode only block 1 — fully self-contained given its skip entry
    d, t, l = decode_block(enc["data"], int(enc["block_off"][1]),
                           int(enc["block_count"][1]),
                           first_doc=int(enc["block_first"][1]))
    assert d.tolist() == docs[BLOCK:2 * BLOCK].tolist()


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),       # term index
            st.integers(min_value=0, max_value=10**9),    # doc id
            st.integers(min_value=1, max_value=500),      # tf
            st.integers(min_value=1, max_value=10_000),   # dl
        ),
        min_size=1, max_size=800,
        unique_by=lambda x: (x[0], x[1]),
    )
)
def test_encode_group_matches_per_term(postings):
    """The vectorized multi-term group encoder must be byte-identical, per
    term, to encode_postings."""
    from deluge_spark.index.codec import encode_group

    postings.sort()
    idx = np.array([p[0] for p in postings], dtype=np.int64)
    doc = np.array([p[1] for p in postings], dtype=np.int64)
    tf = np.array([p[2] for p in postings], dtype=np.int64)
    dl = np.array([p[3] for p in postings], dtype=np.int64)
    g = encode_group(idx, doc, tf, dl)

    data = g["data"].tobytes()
    uniq = np.unique(idx)
    assert g["n_terms"] == len(uniq)
    for ti in range(g["n_terms"]):
        s, e = g["term_pos"][ti], (g["term_pos"][ti + 1]
                                   if ti + 1 < g["n_terms"] else len(idx))
        ref = encode_postings(doc[s:e], tf[s:e], dl[s:e])
        bs, be = int(g["term_byte_start"][ti]), int(g["term_byte_end"][ti])
        assert data[bs:be] == ref["data"]
        lo, hi = g["term_block_offsets"][ti], g["term_block_offsets"][ti + 1]
        assert g["block_first"][lo:hi].tolist() == ref["block_first"].tolist()
        assert g["block_last"][lo:hi].tolist() == ref["block_last"].tolist()
        assert g["block_count"][lo:hi].tolist() == ref["block_count"].tolist()
        assert g["block_off"][lo:hi].tolist() == ref["block_off"].tolist()
        assert g["block_max_tf"][lo:hi].tolist() == ref["block_max_tf"].tolist()
        assert g["block_min_dl"][lo:hi].tolist() == ref["block_min_dl"].tolist()
        assert g["df_local"][ti] == e - s
        assert g["cf_local"][ti] == tf[s:e].sum()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=100_000),
        ),
        min_size=1, max_size=700,
        unique_by=lambda x: x[0],
    )
)
def test_decode_list_matches_per_block(postings):
    """The vectorized whole-list decoder must equal per-block decode_block
    on every block layout — with and without the block_last fast path."""
    from deluge_spark.index.codec import decode_list

    postings.sort()
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    enc = encode_postings(docs, tfs, dls)
    for last in (enc["block_last"], None):
        d, t, l = decode_list(enc["data"], enc["block_off"],
                              enc["block_count"], enc["block_first"], last)
        assert d.tolist() == docs.tolist()
        assert t.tolist() == tfs.tolist()
        assert l.tolist() == dls.tolist()


def test_unsorted_input_is_sorted():
    docs = np.array([30, 10, 20], dtype=np.int64)
    enc = encode_postings(docs, np.array([1, 2, 3]), np.array([4, 5, 6]))
    d, t, l = decode_postings(enc)
    assert d.tolist() == [10, 20, 30]
    assert t.tolist() == [2, 3, 1]
