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
    enc = encode_postings(docs, tfs, dls, avgdl=50.0)
    d, t, l = decode_postings(enc)
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    assert l.tolist() == dls.tolist()
    # skip table invariants
    assert enc["n_postings"] == len(docs)
    assert enc["block_first"][0] == docs[0]
    assert enc["block_last"][-1] == docs[-1]
    # block max is a true upper bound of tfnorm within each block
    for i in range(len(enc["block_off"])):
        s, e = i * BLOCK, min((i + 1) * BLOCK, len(docs))
        want = tfnorm(tfs[s:e], dls[s:e], 50.0).max()
        assert enc["block_max"][i] == want


def test_independent_block_decode():
    n = 300
    docs = np.arange(0, 5 * n, 5, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    dls = np.full(n, 10, dtype=np.int64)
    enc = encode_postings(docs, tfs, dls, avgdl=10.0)
    # decode only block 1, seeded by block 0's last doc from the skip table
    d, t, l = decode_block(enc["data"], int(enc["block_off"][1]),
                           int(enc["block_count"][1]),
                           prev_last=int(enc["block_last"][0]))
    assert d.tolist() == docs[BLOCK:2 * BLOCK].tolist()


def test_unsorted_input_is_sorted():
    docs = np.array([30, 10, 20], dtype=np.int64)
    enc = encode_postings(docs, np.array([1, 2, 3]), np.array([4, 5, 6]), 5.0)
    d, t, l = decode_postings(enc)
    assert d.tolist() == [10, 20, 30]
    assert t.tolist() == [2, 3, 1]
