"""Posting-list block codec — delta + varint, skip pointers, block maxes.

The reference ships postings to Elasticsearch and never owns an index format
(bulk payloads are opaque JSON, /root/reference/elastic/v7/bulk.go:41-59).
This is our native format (north-star B2), all numpy-vectorized:

Per (shard, term) posting list, postings sorted by doc_id, fixed-size blocks
of ``BLOCK`` postings. The packed ``data`` buffer holds, per block:
varint(doc-gap)* then varint(tf)* then varint(dl)* (gaps are delta-encoded
doc_ids, first gap relative to the previous block's last doc_id — so a block
is independently decodable given its skip entry). The skip table (parquet
array columns, one row per posting list) carries per block:
first/last doc_id, byte offset, posting count, and the block-max *tfnorm*
``max tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))`` — idf-independent, so the
build needs no df join; query-time block-max impact = idf(term) · tfnorm.

Varint is LEB128 (7 bits/byte, MSB continuation), encode and decode fully
vectorized (np.add.reduceat over continuation-bit groups) — no per-posting
Python in either direction.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
K1 = 1.2
B = 0.75


def varint_encode(values: np.ndarray) -> np.ndarray:
    """uint64 array → LEB128 bytes (uint8 array). Vectorized."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbytes = np.ones(v.size, dtype=np.int64)
    thresh = np.uint64(1 << 7)
    rem = v.copy()
    while True:
        more = rem >= thresh
        if not more.any():
            break
        nbytes[more] += 1
        rem = rem >> np.uint64(7)
        # loop runs ≤ 10 times (64/7)
    offsets = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    total = int(offsets[-1] + nbytes[-1])
    out = np.zeros(total, dtype=np.uint8)
    maxb = int(nbytes.max())
    for j in range(maxb):
        mask = nbytes > j
        if not mask.any():
            break
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1) > j
        byte[cont] |= 0x80
        out[offsets[mask] + j] = byte
    return out


def varint_decode(buf: np.ndarray, count: int | None = None,
                  offset: int = 0) -> tuple[np.ndarray, int]:
    """LEB128 bytes → (uint64 values, bytes consumed). Vectorized.

    Decodes ``count`` values starting at ``offset`` (all values if None).
    """
    b = np.asarray(buf, dtype=np.uint8)[offset:]
    if b.size == 0:
        return np.empty(0, dtype=np.uint64), 0
    ends = (b & 0x80) == 0
    if count is not None:
        end_idx = np.flatnonzero(ends)[:count]
        last = int(end_idx[-1]) + 1
        b = b[:last]
        ends = ends[:last]
    end_positions = np.flatnonzero(ends)
    starts = np.empty(end_positions.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = end_positions[:-1] + 1
    # position of each byte within its value group
    pos = np.arange(b.size, dtype=np.int64)
    group_start = np.repeat(starts, np.diff(np.append(starts, b.size)))
    shifts = (pos - group_start).astype(np.uint64) * np.uint64(7)
    contrib = (b & 0x7F).astype(np.uint64) << shifts
    vals = np.add.reduceat(contrib, starts)
    return vals.astype(np.uint64), int(b.size)


def tfnorm(tf: np.ndarray, dl: np.ndarray, avgdl: float,
           k1: float = K1, b: float = B) -> np.ndarray:
    """BM25 tf normalization (float64) — the idf-free factor."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / float(avgdl)))


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                    avgdl: float) -> dict:
    """Sorted postings → packed block format.

    Returns dict with ``data`` (bytes) and skip-table arrays; see module doc.
    """
    n = len(doc_ids)
    order = np.argsort(doc_ids, kind="stable")
    d = np.asarray(doc_ids, dtype=np.int64)[order]
    t = np.asarray(tfs, dtype=np.int64)[order]
    l = np.asarray(dls, dtype=np.int64)[order]

    n_blocks = (n + BLOCK - 1) // BLOCK
    block_first = np.empty(n_blocks, dtype=np.int64)
    block_last = np.empty(n_blocks, dtype=np.int64)
    block_count = np.empty(n_blocks, dtype=np.int32)
    block_off = np.empty(n_blocks, dtype=np.int64)
    block_max = np.empty(n_blocks, dtype=np.float64)

    chunks: list[np.ndarray] = []
    pos = 0
    prev_last = 0
    for i in range(n_blocks):
        s, e = i * BLOCK, min((i + 1) * BLOCK, n)
        bd, bt, bl = d[s:e], t[s:e], l[s:e]
        gaps = np.empty(e - s, dtype=np.uint64)
        gaps[0] = np.uint64(bd[0] - prev_last)
        gaps[1:] = np.diff(bd).astype(np.uint64)
        payload = varint_encode(
            np.concatenate([gaps, bt.astype(np.uint64), bl.astype(np.uint64)])
        )
        block_first[i] = bd[0]
        block_last[i] = bd[-1]
        block_count[i] = e - s
        block_off[i] = pos
        block_max[i] = tfnorm(bt, bl, avgdl).max()
        chunks.append(payload)
        pos += payload.size
        prev_last = bd[-1]

    data = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint8)
    return {
        "data": data.tobytes(),
        "block_first": block_first,
        "block_last": block_last,
        "block_count": block_count,
        "block_off": block_off,
        "block_max": block_max,
        "n_postings": n,
    }


def decode_block(data: bytes | np.ndarray, off: int, count: int,
                 prev_last: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block → (doc_ids, tfs, dls)."""
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else data
    vals, _ = varint_decode(buf, count=3 * count, offset=off)
    gaps = vals[:count].astype(np.int64)
    tfs = vals[count:2 * count].astype(np.int64)
    dls = vals[2 * count:].astype(np.int64)
    docs = np.cumsum(gaps) + prev_last
    return docs, tfs, dls


def decode_postings(enc: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode (tests / TAAT fallback)."""
    docs, tfs, dls = [], [], []
    prev_last = 0
    buf = np.frombuffer(enc["data"], dtype=np.uint8)
    for i in range(len(enc["block_off"])):
        d, t, l = decode_block(buf, int(enc["block_off"][i]),
                               int(enc["block_count"][i]), prev_last)
        prev_last = int(d[-1])
        docs.append(d); tfs.append(t); dls.append(l)
    if not docs:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return np.concatenate(docs), np.concatenate(tfs), np.concatenate(dls)
