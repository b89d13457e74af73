"""Block-max WAND top-k executor (north-star B5).

The reference's query path is an HTTP call into Elasticsearch; this is the
native replacement: document-at-a-time WAND (Broder et al. 2003) with
per-block max-impact pruning (Ding & Suel 2011 "block-max" refinement) over
the packed posting lists of one shard.

Pruning soundness with the engine's deterministic ranking: the final order
is (round(score, round_dp) desc, doc_id asc). A candidate can enter the
top-k when its upper bound could beat the heap floor *after rounding*, so
all bound checks use ``ub > θ − eps`` with eps = 10^-round_dp — strictly
safe (bounds are exact-float upper bounds of the exact score; rounding can
lift a score by at most eps/2).

Skip behavior: ``advance(target)`` jumps whole blocks via the skip table
(block_last) without decoding them; a block is only varint-decoded when an
iterator actually lands in it. Hot terms therefore stream block-by-block
while rare terms drive the pivots — the standard WAND win.

This module is pure numpy/Python on one shard's lists; distribution happens
in search.py (groupBy(shard).applyInPandas → per-shard top-k → tiny global
merge), mirroring how Elasticsearch fans a query out to shards and merges.
"""

from __future__ import annotations

import heapq

import numpy as np

from deluge_spark.index.codec import decode_block, tfnorm


class PostingIterator:
    """Lazy block-decoding cursor over one (shard, term) posting list.

    Shallow advance: entering a block positions the cursor at its first
    posting WITHOUT decoding — ``block_first`` (skip table) already gives
    that posting's doc_id, which is all WAND's sort/pivot/bound phases read.
    The varint decode runs only when the cursor must look INSIDE a block:
    in-block repositioning, scoring, or stepping past the first posting.
    Blocks that are jumped to purely for bounding (the common case for long
    hot-term lists driven by rare-term pivots) are never decoded;
    ``n_decoded`` counts actual block decodes for plan/bench assertions."""

    __slots__ = ("idf", "avgdl", "block_first", "block_last", "block_count",
                 "block_off", "block_ub", "data", "n_blocks", "bi", "pos",
                 "docs", "tfs", "dls", "exhausted", "term_max", "n_decoded")

    def __init__(self, row: dict, idf: float, avgdl: float):
        self.idf = float(idf)
        self.avgdl = float(avgdl)
        self.block_first = np.asarray(row["block_first"], dtype=np.int64)
        self.block_last = np.asarray(row["block_last"], dtype=np.int64)
        self.block_count = np.asarray(row["block_count"], dtype=np.int64)
        self.block_off = np.asarray(row["block_off"], dtype=np.int64)
        # block upper bounds from the stored impact pairs (max_tf, min_dl):
        # tfnorm is monotone ↑tf ↓dl, so tfnorm(max_tf, min_dl) ≥ every
        # posting's tfnorm in the block — avgdl applied at query time
        self.block_ub = self.idf * tfnorm(
            np.asarray(row["block_max_tf"], dtype=np.int64),
            np.asarray(row["block_min_dl"], dtype=np.int64), avgdl)
        self.data = np.frombuffer(row["data"], dtype=np.uint8)
        self.n_blocks = len(self.block_off)
        self.term_max = float(self.block_ub.max()) if self.n_blocks else 0.0
        self.bi = -1
        self.pos = 0
        self.docs = self.tfs = self.dls = None
        self.n_decoded = 0
        self.exhausted = self.n_blocks == 0
        if not self.exhausted:
            self._enter_block(0)

    def _enter_block(self, bi: int) -> None:
        """Shallow entry: cursor at the block's first posting, undecoded
        (its doc_id is block_first[bi] from the skip table)."""
        self.bi = bi
        self.docs = self.tfs = self.dls = None
        self.pos = 0

    def _ensure_decoded(self) -> None:
        if self.docs is None:
            self.docs, self.tfs, self.dls = decode_block(
                self.data, int(self.block_off[self.bi]),
                int(self.block_count[self.bi]),
                int(self.block_first[self.bi]))
            self.n_decoded += 1

    @property
    def cur_doc(self) -> int:
        if self.docs is None:  # at block head: skip table knows the doc
            return int(self.block_first[self.bi])
        return int(self.docs[self.pos])

    @property
    def cur_block_max(self) -> float:
        """idf · block-max tfnorm bound of the block the cursor is in."""
        return float(self.block_ub[self.bi])

    def cur_score(self) -> float:
        self._ensure_decoded()
        t = float(self.tfs[self.pos]); l = float(self.dls[self.pos])
        return self.idf * float(tfnorm(np.float64(t), np.float64(l), self.avgdl))

    def advance(self, target: int) -> None:
        """Move cursor to the first doc ≥ target. Block jumps use only the
        skip table; the landing block is decoded ONLY if the target falls
        strictly inside it (block_first < target ≤ block_last) — a target
        at or before the block head leaves the block undecoded."""
        if self.exhausted:
            return
        if int(self.block_last[self.bi]) < target:
            nbi = int(np.searchsorted(self.block_last, target, side="left"))
            if nbi >= self.n_blocks:
                self.exhausted = True
                return
            self._enter_block(nbi)
        if self.cur_doc >= target:
            return  # shallow: block head already satisfies the target
        self._ensure_decoded()
        self.pos = int(np.searchsorted(self.docs, target, side="left"))
        if self.pos >= len(self.docs):
            # target fell in the gap after this block's last doc
            if self.bi + 1 >= self.n_blocks:
                self.exhausted = True
            else:
                self._enter_block(self.bi + 1)

    def next(self) -> None:
        self._ensure_decoded()
        self.pos += 1
        if self.pos >= len(self.docs):
            if self.bi + 1 >= self.n_blocks:
                self.exhausted = True
            else:
                self._enter_block(self.bi + 1)


def taat_top_k(
    lists: list[dict],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    round_dp: int = 9,
    allowed: np.ndarray | None = None,
    banned: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Vectorized term-at-a-time exhaustive scoring — the cheap-query path.

    When the matched posting volume is small, decoding everything and
    aggregating with numpy beats the Python document-at-a-time WAND loop by
    ~10× (the loop costs ~10 µs/posting; vectorized decode+reduceat costs
    ~0.1 µs). Lucene makes the same choice (exhaustive scoring below a cost
    threshold). Same ranking contract: (round(score, dp) desc, doc_id asc),
    exact float64 scores.

    ``lists``: segment rows (dicts) across ALL shards — TAAT aggregates
    globally, no per-shard split needed.
    """
    from deluge_spark.index.codec import decode_postings

    docs_l, contrib_l = [], []
    for row in lists:
        d, t, l = decode_postings(row)
        if not len(d):
            continue
        docs_l.append(d)
        contrib_l.append(idfs[row["term"]] * tfnorm(t, l, avgdl))
    if not docs_l:
        return []
    docs = np.concatenate(docs_l)
    contrib = np.concatenate(contrib_l)
    order = np.argsort(docs, kind="stable")
    d = docs[order]
    c = contrib[order]
    starts = np.flatnonzero(np.diff(d, prepend=d[0] - 1))
    uids = d[starts]
    sums = np.add.reduceat(c, starts)
    if allowed is not None:
        if not len(allowed):
            return []
        j = np.searchsorted(allowed, uids)
        ok = (j < len(allowed)) & (allowed[np.minimum(j, len(allowed) - 1)]
                                   == uids)
        uids, sums = uids[ok], sums[ok]
    if banned is not None and len(banned) and len(uids):
        # tombstoned docs (sorted int64): dropped from candidates, scores
        # of the survivors untouched (ES/Lucene delete semantics — df and
        # avgdl change only on purge/merge)
        j = np.searchsorted(banned, uids)
        hit = (j < len(banned)) & (banned[np.minimum(j, len(banned) - 1)]
                                   == uids)
        uids, sums = uids[~hit], sums[~hit]
    if not len(uids):
        return []
    r = np.round(sums, round_dp)
    top = np.lexsort((uids, -r))[:k]
    return [(int(uids[i]), float(sums[i])) for i in top]


def wand_top_k(
    lists: list[PostingIterator],
    k: int,
    round_dp: int = 9,
    allowed: np.ndarray | None = None,
    banned: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Block-max WAND over one shard's iterators → [(doc_id, exact_score)].

    ``allowed``: optional sorted int64 array of permitted doc_ids (keyword
    filters, north-star B7) — candidates outside it are skipped before
    scoring. ``banned``: optional sorted int64 array of tombstoned doc_ids
    (deletes) — candidates inside it are skipped before scoring; survivor
    scores are untouched (ES/Lucene delete semantics).

    Execution is range-at-a-time (the vectorized refinement of classic
    doc-at-a-time block-max WAND): doc-level pruning is unchanged — the
    pivot/advance dance still jumps whole blocks via the skip table
    without decoding — but once iterators ALIGN on a pivot, the unit of
    work is the block range [pivot_doc, min current-block end] rather
    than one doc. The range is bounded with the same block-max upper
    bounds (Σ cur_block_max of the iterators overlapping the range): a
    failing bound skips the whole range (shallow block entry where the
    range ends at a block boundary — no decode), a passing bound decodes
    the overlapped blocks once and scores every candidate in the range in
    one numpy pass. Scores are exact float64 sums either way, so the
    top-k heap result is rank-identical to the per-doc loop (it scores a
    superset of the docs the per-doc loop scores); per-posting cost drops
    from ~10 µs (Python loop) to ~0.1 µs where pruning cannot skip —
    the hot-disjunction serving profile.
    """
    eps = 10.0 ** (-round_dp)
    if allowed is not None and not len(allowed):
        return []  # empty allowed set matches nothing (old per-doc path
        #            skipped every candidate; the vectorized filter must
        #            not index into a zero-length array)
    its = [it for it in lists if not it.exhausted]
    heap: list[tuple[float, int, int]] = []  # (rounded_score, -doc_id, doc_id)

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    while True:
        its = [it for it in its if not it.exhausted]
        if not its:
            break
        its.sort(key=lambda it: it.cur_doc)
        # find pivot: first prefix whose Σ term-max could beat the floor
        ub = 0.0
        pivot = -1
        th = theta()
        for i, it in enumerate(its):
            ub += it.term_max
            if ub > th - eps:
                pivot = i
                break
        if pivot < 0:
            break
        pivot_doc = its[pivot].cur_doc
        if its[0].cur_doc < pivot_doc:
            # advance the smallest-doc iterator up to the pivot doc — the
            # classic undecoded skip-table jump
            its[0].advance(pivot_doc)
            continue

        # ---- aligned: handle the block range [pivot_doc, e] ------------
        # e = min current-block end over ALL live iterators, so every
        # iterator's postings in the range lie inside its current block
        e = min(int(it.block_last[it.bi]) for it in its)
        involved = []
        ub_range = 0.0
        for it in its:
            if it.cur_doc > e:
                break  # sorted by cur_doc: none further overlap the range
            involved.append(it)
            ub_range += it.cur_block_max

        if ub_range <= th - eps:
            # block-max refinement over the whole range: nothing in
            # [pivot_doc, e] can reach the heap floor — consume the range.
            # Iterators whose current block ends exactly at e advance
            # shallowly (no decode); the rest must seek inside their block.
            for it in involved:
                if int(it.block_last[it.bi]) <= e:
                    if it.bi + 1 >= it.n_blocks:
                        it.exhausted = True
                    else:
                        it._enter_block(it.bi + 1)
                else:
                    it.advance(e + 1)
            continue

        # score the whole range vectorized — exact per-posting BM25
        docs_l, contrib_l, ends = [], [], []
        for it in involved:
            it._ensure_decoded()
            j = int(np.searchsorted(it.docs, e, side="right"))
            if j > it.pos:
                docs_l.append(it.docs[it.pos:j])
                contrib_l.append(it.idf * tfnorm(
                    it.tfs[it.pos:j], it.dls[it.pos:j], it.avgdl))
            ends.append(j)
        d = np.concatenate(docs_l)
        c = np.concatenate(contrib_l)
        order = np.argsort(d, kind="stable")
        d, c = d[order], c[order]
        starts = np.flatnonzero(np.diff(d, prepend=d[0] - 1))
        uids = d[starts]
        sums = np.add.reduceat(c, starts)
        if allowed is not None:
            jj = np.searchsorted(allowed, uids)
            ok = ((jj < len(allowed))
                  & (allowed[np.minimum(jj, len(allowed) - 1)] == uids))
            uids, sums = uids[ok], sums[ok]
        if banned is not None and len(banned) and len(uids):
            jj = np.searchsorted(banned, uids)
            hit = ((jj < len(banned))
                   & (banned[np.minimum(jj, len(banned) - 1)] == uids))
            uids, sums = uids[~hit], sums[~hit]
        if len(uids):
            # raw-sum pre-filter with one rounding quantum of slack:
            # round(s, dp) >= floor implies s >= floor - 0.5*10^-dp, so no
            # candidate the per-doc path would keep is dropped
            if len(heap) >= k:
                keep = sums >= (heap[0][0] - eps)
                uids, sums = uids[keep], sums[keep]
            for doc, sc in zip(uids.tolist(), sums.tolist()):
                r = round(sc, round_dp)
                entry = (r, -doc, doc, sc)
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                elif entry[:2] > heap[0][:2]:
                    heapq.heapreplace(heap, entry)
        for it, j in zip(involved, ends):
            it.pos = j
            if j >= len(it.docs):
                if it.bi + 1 >= it.n_blocks:
                    it.exhausted = True
                else:
                    it._enter_block(it.bi + 1)

    out = [(doc, exact) for _, _, doc, exact in heap]
    out.sort(key=lambda x: (-round(x[1], round_dp), x[0]))
    return out
