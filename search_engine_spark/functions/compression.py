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


def varint_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-style varint encoding of a uint64 array (vectorized).
    Returns (buffer, per-value byte sizes) — the sizes feed the per-block
    byte-length tables that make blocks independently sliceable."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
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
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    return varint_encode_with_sizes(values)[0]


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


def bm25f_score(
    tf1: np.ndarray, tfb: np.ndarray, dl1: np.ndarray, dlb: np.ndarray,
    idf: float, w_t: float, w_b: float, avgdl1: float, avgdlb: float,
    k1: float = 1.2, b: float = 0.75,
) -> np.ndarray:
    """TRUE BM25F per-posting partial score (Robertson/Zaragoza simple
    BM25F): each field's tf is length-normalized by ITS OWN field length
    against the field's corpus average BEFORE weighting, then the
    weighted sum saturates once —

        tfn = w_t·tf1/B1 + w_b·tfb/B0,  B_f = (1−b) + b·dl_f/avgdl_f
        score = idf · tfn·(k1+1)/(tfn + k1)

    This is the canonical float64 expression shape shared VERBATIM by
    the Spark decode scorer (operators/query.py), the single-node oracle
    (oracle/engine.py) and mirrored by the DuckDB SQL — do not reorder
    operations. A zero avgdl (field absent corpus-wide ⇒ that field's tf
    is identically 0) must be guarded to 1.0 by the CALLER so the dead
    term is 0, not NaN."""
    tf1 = tf1.astype(np.float64)
    tfb = tfb.astype(np.float64)
    dl1 = dl1.astype(np.float64)
    dlb = dlb.astype(np.float64)
    b1 = (1.0 - b) + (b * dl1) / avgdl1
    b0 = (1.0 - b) + (b * dlb) / avgdlb
    tfn = w_t * tf1 / b1 + w_b * tfb / b0
    return idf * (tfn * (k1 + 1.0)) / (tfn + k1)


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


def _block_starts(n: int, block: int = BLOCK) -> np.ndarray:
    return np.arange(0, n, block, dtype=np.int64)


def decode_docids_blocks(doc_deltas: bytes, db_lens: np.ndarray) -> np.ndarray:
    """Decode ONLY the doc-id stream of a blob row — the tf/dl/field
    streams are never touched. Used by the freshness-window stats pass
    (query.search_uncompacted): exact live df needs the base doc ids (to
    subtract delta-superseded docs) but none of the frequency payload.
    Same per-block layout as decode_posting_blocks with keep=None: each
    block restarts with an absolute (biased) first key, then gaps."""
    db_lens = np.asarray(db_lens, dtype=np.int64)
    nb = len(db_lens)
    if nb == 0:
        return np.empty(0, dtype=np.int64)
    vals = varint_decode(doc_deltas)
    counts = np.full(nb, BLOCK, dtype=np.int64)
    counts[-1] = len(vals) - BLOCK * (nb - 1)
    cs = np.cumsum(vals, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    base = vals[starts]
    cs_start = cs[starts]
    expand = np.repeat(np.arange(nb), counts)
    u = base[expand] + (cs - cs_start[expand])
    return (u - _BIAS).view(np.int64)


def encode_posting_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    tf1s: np.ndarray | None = None,
    block: int = BLOCK,
    dl1s: np.ndarray | None = None,
) -> dict:
    """Sort by doc key and encode one term's postings with INDEPENDENTLY
    DECODABLE blocks: each block's first doc delta is its absolute
    (biased) key, and per-block byte lengths are recorded for all four
    streams, so a pruned block is never even decompressed — true
    block-max WAND decode skipping, the thing the north rule's
    MAX_DOCS_TO_PROCESS replacement actually pays off with.

    ``tf1s`` is the per-posting TITLE-FIELD tf (the fields channel —
    reference postings carry per-field matches,
    create_inverted_index.py:86-91); ``dl1s`` the per-posting TITLE-field
    doc length (constant per doc, denormalized like dls — the true-BM25F
    per-field length norm needs it at score time). None encodes as
    all-zero (1 byte per posting, the varint floor). block_max_tf1 plus
    the per-field minima block_min_dl1 / block_min_dlb (body = dl−dl1)
    ride along so field-weighted WAND bounds stay tight.

    Returns dict: doc_deltas, tfs, dls, tf1s, dls1 (bytes); db_lens,
    tf_lens, dl_lens, tf1_lens, dl1_lens (per-block byte lengths);
    block_max_tf, block_min_dl, block_max_tf1, block_min_dl1,
    block_min_dlb; max_tf, min_dl; n_docs."""
    order = np.argsort(doc_ids, kind="stable")
    d = np.asarray(doc_ids, dtype=np.int64)[order]
    t = np.asarray(tfs, dtype=np.int64)[order]
    l = np.asarray(dls, dtype=np.int64)[order]
    if tf1s is None:
        t1 = np.zeros(len(d), dtype=np.int64)
    else:
        t1 = np.asarray(tf1s, dtype=np.int64)[order]
    if dl1s is None:
        d1 = np.zeros(len(d), dtype=np.int64)
    else:
        d1 = np.asarray(dl1s, dtype=np.int64)[order]
    n = len(d)
    mt, md = block_summaries(t, l, block)
    mt1, md1 = block_summaries(t1, d1, block)
    _, mdb = block_summaries(t1, l - d1, block)
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        return {
            "doc_deltas": b"", "tfs": b"", "dls": b"", "tf1s": b"",
            "dls1": b"",
            "db_lens": empty, "tf_lens": empty, "dl_lens": empty,
            "tf1_lens": empty.copy(), "dl1_lens": empty.copy(),
            "block_max_tf": mt, "block_min_dl": md, "block_max_tf1": mt1,
            "block_min_dl1": md1, "block_min_dlb": mdb,
            "max_tf": 0, "min_dl": 1, "n_docs": 0,
        }
    u = d.view(np.uint64) + _BIAS
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = u[0]
    np.subtract(u[1:], u[:-1], out=deltas[1:])
    starts = _block_starts(n, block)
    deltas[starts] = u[starts]  # block-local absolute base
    db, db_sz = varint_encode_with_sizes(deltas)
    tb, tf_sz = varint_encode_with_sizes(t.astype(np.uint64))
    lb, dl_sz = varint_encode_with_sizes(l.astype(np.uint64))
    t1b, tf1_sz = varint_encode_with_sizes(t1.astype(np.uint64))
    d1b, dl1_sz = varint_encode_with_sizes(d1.astype(np.uint64))
    return {
        "doc_deltas": db, "tfs": tb, "dls": lb, "tf1s": t1b, "dls1": d1b,
        "db_lens": np.add.reduceat(db_sz, starts),
        "tf_lens": np.add.reduceat(tf_sz, starts),
        "dl_lens": np.add.reduceat(dl_sz, starts),
        "tf1_lens": np.add.reduceat(tf1_sz, starts),
        "dl1_lens": np.add.reduceat(dl1_sz, starts),
        "block_max_tf": mt, "block_min_dl": md, "block_max_tf1": mt1,
        "block_min_dl1": md1, "block_min_dlb": mdb,
        "max_tf": int(t.max()), "min_dl": int(l.min()), "n_docs": n,
    }


def decode_posting_blocks(
    doc_deltas: bytes,
    tfs: bytes,
    dls: bytes,
    db_lens: np.ndarray,
    tf_lens: np.ndarray,
    dl_lens: np.ndarray,
    keep: np.ndarray | None = None,
    tf1s: bytes | None = None,
    tf1_lens: np.ndarray | None = None,
    dls1: bytes | None = None,
    dl1_lens: np.ndarray | None = None,
) -> tuple[np.ndarray, ...]:
    """Decode only the blocks where ``keep`` is True (None = all).
    Returns (doc_ids int64 sorted, tf int64, dl int64) over the kept
    blocks — plus a 4th array (tf1 int64, the title-field channel) when
    ``tf1s``/``tf1_lens`` are given, plus a 5th (dl1 int64, the title
    field length — true-BM25F norm input) when ``dls1``/``dl1_lens`` are
    given. Skipped blocks cost ZERO decode work — their bytes are never
    touched (slicing is offset arithmetic on the lens tables)."""
    with_tf1 = tf1s is not None and tf1_lens is not None
    with_dl1 = dls1 is not None and dl1_lens is not None
    db_lens = np.asarray(db_lens, dtype=np.int64)
    tf_lens = np.asarray(tf_lens, dtype=np.int64)
    dl_lens = np.asarray(dl_lens, dtype=np.int64)

    def _empty():
        z = np.empty(0, dtype=np.int64)
        out = (z, z.copy(), z.copy())
        if with_tf1:
            out = out + (z.copy(),)
        if with_dl1:
            out = out + (z.copy(),)
        return out

    nb = len(db_lens)
    if nb == 0:
        return _empty()
    if keep is None:
        keep = np.ones(nb, dtype=bool)
    keep = np.asarray(keep, dtype=bool)
    db_off = np.concatenate(([0], np.cumsum(db_lens)))
    tf_off = np.concatenate(([0], np.cumsum(tf_lens)))
    dl_off = np.concatenate(([0], np.cumsum(dl_lens)))
    kept = np.flatnonzero(keep)
    if len(kept) == 0:
        return _empty()
    # concatenate kept byte ranges (contiguous runs collapse naturally)
    db_sel = b"".join(doc_deltas[db_off[i] : db_off[i + 1]] for i in kept)
    tf_sel = b"".join(tfs[tf_off[i] : tf_off[i + 1]] for i in kept)
    dl_sel = b"".join(dls[dl_off[i] : dl_off[i + 1]] for i in kept)
    vals = varint_decode(db_sel)
    t = varint_decode(tf_sel).view(np.int64)
    l = varint_decode(dl_sel).view(np.int64)
    if with_tf1:
        t1_lens = np.asarray(tf1_lens, dtype=np.int64)
        t1_off = np.concatenate(([0], np.cumsum(t1_lens)))
        t1_sel = b"".join(tf1s[t1_off[i] : t1_off[i + 1]] for i in kept)
        t1 = varint_decode(t1_sel).view(np.int64)
    if with_dl1:
        d1_lens = np.asarray(dl1_lens, dtype=np.int64)
        d1_off = np.concatenate(([0], np.cumsum(d1_lens)))
        d1_sel = b"".join(dls1[d1_off[i] : d1_off[i + 1]] for i in kept)
        d1 = varint_decode(d1_sel).view(np.int64)
    # per-kept-block value counts: all full blocks except possibly the
    # last overall block; recover counts from the tf stream segmentation
    # by decoding per-block sizes via lens -> we already know counts:
    # every block has BLOCK postings except the final one.
    n_total_last = None  # inferred below
    counts = np.full(len(kept), BLOCK, dtype=np.int64)
    # the only short block is the globally-last one
    if kept[-1] == nb - 1:
        counts[-1] = len(vals) - BLOCK * (len(kept) - 1)
    # vectorized per-block cumsum: docs = base_b + (cs - cs_at_block_start)
    cs = np.cumsum(vals, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    base = vals[starts]  # absolute biased first key per block
    cs_start = cs[starts]
    expand = np.repeat(np.arange(len(kept)), counts)
    u = base[expand] + (cs - cs_start[expand])
    d = (u - _BIAS).view(np.int64)
    del n_total_last
    out = (d, t, l)
    if with_tf1:
        out = out + (t1,)
    if with_dl1:
        out = out + (d1,)
    return out


def encode_position_lists(lists: list[np.ndarray]) -> list[bytes]:
    """Batch-compress per-(term,doc) position lists (ascending ints) as
    delta+varint blobs — one varint pass over the whole batch's
    concatenated deltas, split back by per-row byte counts (no per-row
    Python in the varint hot path). Empty lists encode as b''."""
    if not lists:
        return []
    arrs = [np.asarray(p, dtype=np.int64) for p in lists]
    lens = np.array([len(a) for a in arrs], dtype=np.int64)
    if lens.sum() == 0:
        return [b""] * len(arrs)
    flat = np.concatenate([a for a in arrs if len(a)]).astype(np.int64)
    # per-row delta with the row's first value kept absolute
    deltas = np.empty(len(flat), dtype=np.uint64)
    deltas[1:] = (flat[1:] - flat[:-1]).view(np.uint64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[lens > 0]
    deltas[0] = np.uint64(flat[0])
    deltas[starts] = flat[starts].view(np.uint64)
    buf, sizes = varint_encode_with_sizes(deltas)
    byte_ends = np.concatenate(([0], np.cumsum(sizes)))
    out: list[bytes] = []
    row_start = 0
    for n in lens.tolist():
        if n == 0:
            out.append(b"")
            continue
        b0 = int(byte_ends[row_start])
        b1 = int(byte_ends[row_start + n])
        out.append(buf[b0:b1])
        row_start += n
    return out


def decode_position_list(blob: bytes) -> np.ndarray:
    """Inverse of one row of encode_position_lists -> ascending int64."""
    vals = varint_decode(blob)
    if len(vals) == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(vals.view(np.int64))


def encode_posting_list(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
) -> tuple[bytes, bytes, bytes, np.ndarray, np.ndarray]:
    """Legacy single-stream form (kept for round-trip tests).

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
