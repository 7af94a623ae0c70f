"""Posting-list compression: docID-delta + varint, with block-max metadata.

The reference stores postings as JSON dicts
(/root/reference/backend/utils/create_inverted_index.py:86-91, shape
``{id, freq, positions, fields}``). At 10^12-doc scale that layout is
untenable; per the north rule the rebuild stores each term's posting list as

    doc_deltas : binary  — varint(delta(sorted doc keys)))
    tfs        : binary  — varint(term frequency per posting)
    dls        : binary  — varint(doc length per posting; denormalized so the
                           BM25 scorer needs no query-time join to doc_stats)
    block_max_tf / block_min_dl : array<int64> — per-block (BLOCK=128)
                 monotone summaries; the BM25 block upper bound
                 bm25(max_tf, min_dl, idf, avgdl) is reconstructed AT QUERY
                 TIME from the live corpus stats, so WAND pruning (north
                 rule; replaces the reference's crude MAX_DOCS_TO_PROCESS
                 cap, app.py:73,604-617) remains exact after incremental
                 updates shift N/avgdl/df (a frozen score bound would go
                 stale and prune unsafely)

All encode/decode is numpy-vectorized (no per-element Python loops) so it can
run inside Arrow ``applyInPandas``/``mapInPandas`` at full speed.

Doc keys are xxhash64 int64 values; they are encoded as unsigned via a
+2^63 bias so deltas of the sorted sequence are non-negative.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
_BIAS = np.uint64(1 << 63)
_MAXB = 10  # max varint bytes for a 64-bit value


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style varint encoding of a uint64 array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    # byte length per value: ceil(bitlen/7), min 1
    nbytes = np.ones(n, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while shifted.any():
        nbytes += (shifted > 0).astype(np.int64)
        shifted >>= np.uint64(7)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for b in range(_MAXB):
        mask = nbytes > b
        if not mask.any():
            break
        chunk = ((v[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > b + 1).astype(np.uint8) << 7
        out[offsets[mask] + b] = chunk | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of varint_encode -> uint64 array (vectorized via reduceat)."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    arr = np.frombuffer(buf, dtype=np.uint8)
    is_end = (arr & 0x80) == 0
    # group start = position after previous end
    starts = np.concatenate(([0], np.flatnonzero(is_end)[:-1] + 1))
    idx = np.arange(len(arr), dtype=np.int64)
    group_id = np.cumsum(np.concatenate(([0], is_end[:-1].astype(np.int64))))
    pos_in_group = idx - starts[group_id]
    parts = (arr & 0x7F).astype(np.uint64) << (np.uint64(7) * pos_in_group.astype(np.uint64))
    return np.bitwise_or.reduceat(parts, starts)


def delta_encode_docids(doc_ids: np.ndarray) -> bytes:
    """Sorted int64 doc keys -> varint(first-biased, then gaps)."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if len(d) == 0:
        return b""
    u = d.view(np.uint64) + _BIAS  # order-preserving unsigned map
    deltas = np.empty(len(u), dtype=np.uint64)
    deltas[0] = u[0]
    np.subtract(u[1:], u[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_decode_docids(buf: bytes) -> np.ndarray:
    deltas = varint_decode(buf)
    if len(deltas) == 0:
        return np.empty(0, dtype=np.int64)
    u = np.cumsum(deltas, dtype=np.uint64)
    return (u - _BIAS).view(np.int64)


def bm25_score(
    tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float,
    k1: float = 1.2, b: float = 0.75,
) -> np.ndarray:
    """Standard BM25 per-posting partial score, float64 end-to-end
    (SURVEY.md §7 'Rank-identity under floats')."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def block_maxes(
    tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float,
    k1: float = 1.2, b: float = 0.75, block: int = BLOCK,
) -> np.ndarray:
    """Per-block max BM25 score (upper bound used by WAND pruning)."""
    s = bm25_score(tf, dl, idf, avgdl, k1, b)
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    nblocks = (n + block - 1) // block
    out = np.empty(nblocks, dtype=np.float64)
    full = (n // block) * block
    if full:
        out[: n // block] = s[:full].reshape(-1, block).max(axis=1)
    if full < n:
        out[-1] = s[full:].max()
    return out


def block_summaries(
    tf: np.ndarray, dl: np.ndarray, block: int = BLOCK
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (max_tf, min_dl) over docID-sorted postings.

    BM25 is monotone increasing in tf and decreasing in dl, so
    ``bm25_score(max_tf, min_dl, idf, avgdl)`` is a valid per-block upper
    bound computed AT QUERY TIME with the live (N, avgdl, df) — unlike a
    frozen score bound, it stays exact after incremental corpus updates
    change the global stats (streaming/incremental.py)."""
    n = len(tf)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    t = np.asarray(tf, dtype=np.int64)
    l = np.asarray(dl, dtype=np.int64)
    nblocks = (n + block - 1) // block
    mt = np.empty(nblocks, dtype=np.int64)
    md = np.empty(nblocks, dtype=np.int64)
    full = (n // block) * block
    if full:
        mt[: n // block] = t[:full].reshape(-1, block).max(axis=1)
        md[: n // block] = l[:full].reshape(-1, block).min(axis=1)
    if full < n:
        mt[-1] = t[full:].max()
        md[-1] = l[full:].min()
    return mt, md


def encode_posting_list(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
) -> tuple[bytes, bytes, bytes, np.ndarray, np.ndarray]:
    """Sort by doc key and encode one term's postings.

    Returns (doc_deltas, tfs_varint, dls_varint, block_max_tf,
    block_min_dl). No global stats needed at encode time — bounds are
    reconstructed from (max_tf, min_dl) at query time (block_summaries)."""
    order = np.argsort(doc_ids, kind="stable")
    d = np.asarray(doc_ids, dtype=np.int64)[order]
    t = np.asarray(tfs, dtype=np.int64)[order]
    l = np.asarray(dls, dtype=np.int64)[order]
    mt, md = block_summaries(t, l)
    return (
        delta_encode_docids(d),
        varint_encode(t.astype(np.uint64)),
        varint_encode(l.astype(np.uint64)),
        mt,
        md,
    )


def decode_posting_list(
    doc_deltas: bytes, tfs: bytes, dls: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (doc_ids int64 sorted, tf int64, dl int64)."""
    return (
        delta_decode_docids(doc_deltas),
        varint_decode(tfs).view(np.int64),
        varint_decode(dls).view(np.int64),
    )
