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
