"""Kill-anywhere INGEST crash safety (round 4, VERDICT r3 #4): a crash
after ANY step of apply_incremental_batch must leave one fully consistent
epoch — the half-written batch is invisible to every reader (serving,
union snapshot, compaction) because visibility is a single atomic commit
record (_commits/<bid>.json), the cross-table analogue of compact()'s
journal rename. A replay of the same batch_id then completes the batch;
compact() over a crashed (uncommitted) batch is a no-op.

Complements tests/test_crash_compact.py (which kills inside compact()'s
swap window) — together they cover the full build+ingest+compact
lifecycle: any single crash leaves the index either on the old epoch or
rolled forward to the new one, never between."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.operators import index_build as ib
from search_engine_spark.operators.query import (
    SearchIndex,
    search_phrase_topk,
    search_topk,
    search_uncompacted,
)
from search_engine_spark.sources.pages import generate_pages_df
from search_engine_spark.streaming import incremental as inc

QUERIES = ["best good well", "hotel room", "western"]

FAULT_POINTS = ["doc_stats", "tombstones", "lexicon", "postings", "positions"]


def _topk(df):
    return [(int(r["doc_id"]), float(r["score"])) for r in df.collect()]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    """Base positional index over 150 pages (positions exercise the 3b
    delta too), the 30-page batch, and fresh-build reference answers for
    both the base corpus and the union corpus."""
    root = tmp_path_factory.mktemp("crashingest")
    base = generate_pages_df(spark, 150, partitions=4)
    full = generate_pages_df(spark, 180, partitions=4)
    paths = ib.IndexPaths(str(root / "idx"))
    ib.build_index(
        spark, base, paths, n_salts=2, salt_threshold=60, n_barrels=4,
        id_partitions=4, with_positions=True,
    )
    batch = spark.createDataFrame(
        full.toPandas().iloc[150:],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    fresh_union = ib.IndexPaths(str(root / "freshu"))
    ib.build_index(
        spark, full, fresh_union, n_salts=2, salt_threshold=60, n_barrels=4,
        id_partitions=4, with_positions=True,
    )
    base_answers = {
        q: search_topk(SearchIndex(spark, paths), q, k=10) for q in QUERIES
    }
    union_answers = {
        q: search_topk(SearchIndex(spark, fresh_union), q, k=10)
        for q in QUERIES
    }
    return paths, batch, base_answers, union_answers


def test_crash_at_every_ingest_step_leaves_batch_invisible(spark, setup):
    """For every fault point: the crashed batch must not exist to any
    reader — term search (fresh path), phrase search, the union snapshot,
    and compact() all behave as if the ingest never started. The SAME
    index instance survives all faults (each replay overwrites the
    previous garbage)."""
    paths, batch, base_answers, _ = setup
    idx = SearchIndex(spark, paths)
    for point in FAULT_POINTS:
        inc._INGEST_FAULT_AT = point
        try:
            with pytest.raises(RuntimeError, match="injected ingest crash"):
                inc.apply_incremental_batch(spark, batch, paths, "cx")
        finally:
            inc._INGEST_FAULT_AT = None
        # no commit record -> snapshot is None -> base-only serving
        assert inc.uncompacted_snapshot(spark, paths) is None, point
        for q in QUERIES:
            got = _topk(search_uncompacted(idx, q, k=10))
            assert got == base_answers[q], (point, q)
            pg = search_phrase_topk(idx, "best western", k=10)
            assert pg == search_phrase_topk(idx, "best western", k=10)
        # compaction over crashed-ingest garbage is a consistent no-op
        r = inc.compact(spark, paths)
        assert r["compacted_barrels"] == 0, point
        for q in QUERIES:
            assert _topk(search_uncompacted(idx, q, k=10)) == base_answers[q]


def test_replay_after_crash_completes_batch(spark, setup):
    """Crash mid-ingest (after the postings delta, before positions /
    commit), then REPLAY the same batch_id: the batch completes, serving
    equals a fresh union build pre-compact AND post-compact."""
    paths, batch, base_answers, union_answers = setup
    inc._INGEST_FAULT_AT = "postings"
    try:
        with pytest.raises(RuntimeError, match="injected ingest crash"):
            inc.apply_incremental_batch(spark, batch, paths, "replay1")
    finally:
        inc._INGEST_FAULT_AT = None
    r = inc.apply_incremental_batch(spark, batch, paths, "replay1")
    assert r["new_docs"] > 0
    idx = SearchIndex(spark, paths)
    for q in QUERIES:
        got = _topk(search_uncompacted(idx, q, k=10))
        want = union_answers[q]
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_array_equal(
            np.array([s for _, s in got]), np.array([s for _, s in want])
        )
    inc.compact(spark, paths)
    idx2 = SearchIndex(spark, paths)
    for q in QUERIES:
        got = search_topk(idx2, q, k=10)
        want = union_answers[q]
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_array_equal(
            np.array([s for _, s in got]), np.array([s for _, s in want])
        )


def test_committed_replay_is_noop(spark, setup):
    """A replay of an ALREADY-COMMITTED batch must touch nothing:
    rewriting would re-derive the batch's lexicon term ids against a
    moved max_id, and a crash between the lexicon and postings rewrites
    would leave a COMMITTED batch whose postings use ids its lexicon no
    longer maps (code-review finding r4). The skip keeps every artifact
    byte-identical."""
    import os

    paths, batch, _, _ = setup
    inc.apply_incremental_batch(spark, batch, paths, "noop1")

    def fingerprint():
        out = {}
        for root in (
            inc.doc_stats_delta_dir(paths),
            inc.lexicon_delta_dir(paths),
            inc.delta_dir(paths),
        ):
            base = f"{root}/batch=noop1"
            for dirpath, _, files in os.walk(base):
                for fn in files:
                    p = os.path.join(dirpath, fn)
                    out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    before = fingerprint()
    assert before
    idx = SearchIndex(spark, paths)
    res_before = {
        q: _topk(search_uncompacted(idx, q, k=10)) for q in QUERIES
    }
    r = inc.apply_incremental_batch(spark, batch, paths, "noop1")
    assert r.get("replayed_noop") is True
    assert fingerprint() == before  # nothing rewritten
    for q in QUERIES:
        assert _topk(search_uncompacted(idx, q, k=10)) == res_before[q]


def test_legacy_seqless_batch_stays_visible(spark, setup):
    """Pre-upgrade delta logs have NO commit record and NO pending
    marker — they were complete by definition and must stay VISIBLE
    (served + folded by compact), not be classified as crashed garbage
    and deleted (code-review finding r4). Simulated by stripping a
    committed batch's records."""
    import os

    paths, batch, _, _ = setup
    inc.apply_incremental_batch(spark, batch, paths, "leg1")
    idx = SearchIndex(spark, paths)
    served = {q: _topk(search_uncompacted(idx, q, k=10)) for q in QUERIES}
    # strip every record: the dir now looks like a pre-upgrade batch
    for p in (
        inc._seq_path(paths, "leg1"),
        inc._pending_path(paths, "leg1"),
        inc._legacy_seq_path(paths, "leg1"),
    ):
        if os.path.exists(p):
            os.remove(p)
    assert inc._read_seq(paths, "leg1") is None
    vis = dict(
        inc._visible_batches(paths, inc.doc_stats_delta_dir(paths))
    )
    leg_dir = f"{inc.doc_stats_delta_dir(paths)}/batch=leg1"
    assert leg_dir in vis and vis[leg_dir] < 0  # negative fallback seq
    for q in QUERIES:
        assert _topk(search_uncompacted(idx, q, k=10)) == served[q]
    # legacy in-dir seq file (the pre-round-4 layout) is also honored
    import json

    with open(inc._legacy_seq_path(paths, "leg1"), "w") as f:
        json.dump({"seq": 7, "batch": "leg1"}, f)
    assert inc._read_seq(paths, "leg1") == 7
    for q in QUERIES:
        assert _topk(search_uncompacted(idx, q, k=10)) == served[q]


def test_legacy_complete_replay_is_noop(spark, setup):
    """Redelivering a COMPLETE legacy pre-upgrade batch (dir present, no
    commit record, no pending marker) must be a NO-OP (ADVICE r4):
    re-ingesting it would assign a fresh max+1 seq, promoting the legacy
    batch ABOVE post-upgrade batches in latest-wins resolution — the
    inverse of the negative fallback ordering _visible_batches gives
    unreplayed legacy batches."""
    import os

    paths, batch, _, _ = setup
    inc.apply_incremental_batch(spark, batch, paths, "legre")
    inc.apply_incremental_batch(spark, batch, paths, "legre2")  # newer
    for p in (
        inc._seq_path(paths, "legre"),
        inc._pending_path(paths, "legre"),
        inc._legacy_seq_path(paths, "legre"),
    ):
        if os.path.exists(p):
            os.remove(p)
    assert inc._read_seq(paths, "legre") is None  # now looks pre-upgrade
    idx = SearchIndex(spark, paths)
    served = {q: _topk(search_uncompacted(idx, q, k=10)) for q in QUERIES}
    r = inc.apply_incremental_batch(spark, batch, paths, "legre")
    assert r.get("replayed_noop") is True
    # no promotion: still record-less, still a NEGATIVE fallback seq
    assert inc._read_seq(paths, "legre") is None
    vis = dict(inc._visible_batches(paths, inc.doc_stats_delta_dir(paths)))
    leg_dir = f"{inc.doc_stats_delta_dir(paths)}/batch=legre"
    assert leg_dir in vis and vis[leg_dir] < 0
    for q in QUERIES:
        assert _topk(search_uncompacted(idx, q, k=10)) == served[q]


def test_replay_reuses_seq_after_commit(spark, setup, tmp_path):
    """A replay of an ALREADY COMMITTED batch keeps its original seq —
    the batch's latest-wins position is a fact of the first delivery.
    (Round-4 fix: the seq record now lives OUTSIDE the batch dir, where
    the replay's mode=overwrite used to wipe it and re-assign a higher
    seq, silently promoting the replayed batch over newer ones.)"""
    paths, batch, _, _ = setup
    # two committed batches on whatever state the module already has
    inc.apply_incremental_batch(spark, batch, paths, "seqA")
    seq_a = inc._read_seq(paths, "seqA")
    inc.apply_incremental_batch(spark, batch, paths, "seqB")
    seq_b = inc._read_seq(paths, "seqB")
    assert seq_a is not None and seq_b is not None and seq_b > seq_a
    # replay of A must NOT jump above B
    inc.apply_incremental_batch(spark, batch, paths, "seqA")
    assert inc._read_seq(paths, "seqA") == seq_a
