"""Crash-safe compaction (VERDICT r2 item 2 / item 7).

compact() stages every heavy output in *_staging dirs, then journals the
ENTIRE swap (barrel renames, table swaps, delta-log truncation, epoch
bump) as an ordered list of idempotent ops committed with ONE atomic
file rename — the parquet-dir stand-in for an Iceberg snapshot commit.

Invariants driven here:
- crash BEFORE the journal commit → the old epoch stays fully readable
  (bit-equal to pre-compact answers) and a later compact() succeeds;
- crash at ANY op index AFTER the commit → the next open (SearchIndex /
  ingest / compact all call recover_pending) rolls the swap forward, and
  the recovered index equals a from-scratch build over the union corpus
  bit-for-bit (the existing incremental==fresh invariant).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pytest

from search_engine_spark.operators import index_build as ib
from search_engine_spark.operators.query import SearchIndex, search_topk
from search_engine_spark.sources.pages import generate_pages_pandas
from search_engine_spark.streaming import incremental as incr

N_BASE, N_FULL = 250, 300
# mixes: changed-doc term, dropped-old-term query, new-batch title term
QUERIES = ["best western", "zzznew updated", "good well best", f"t{N_BASE + 5}"]


def _pages_df(spark, pdf):
    return spark.createDataFrame(
        pdf,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


@pytest.fixture(scope="module")
def crash_setup(spark, tmp_path_factory):
    """Template index with UNCOMPACTED state that exercises every swap op
    kind: a changed-content re-ingest (tombstones → full merge over all
    barrels) plus a new-docs batch (lexicon extension, doc_stats fold),
    and the fresh-build oracle over the union corpus."""
    root = tmp_path_factory.mktemp("crash")
    pdf = generate_pages_pandas(np.arange(N_FULL))
    base = pdf.iloc[:N_BASE]

    tmpl = str(root / "template")
    paths = ib.IndexPaths(tmpl)
    ib.build_index(
        spark, _pages_df(spark, base), paths, n_salts=2, salt_threshold=60,
        n_barrels=4, id_partitions=4,
    )
    base_answers = {
        q: search_topk(SearchIndex(spark, paths), q, k=10) for q in QUERIES
    }

    changed = pdf.iloc[5:8].copy()
    changed["html"] = [
        (
            b"<html><head><title>t%d</title></head><body><p>"
            b"zzznew best updated content</p></body></html>" % i
        )
        for i in (5, 6, 7)
    ]
    r = incr.apply_incremental_batch(spark, _pages_df(spark, changed), paths, "c1")
    assert r["tombstoned"] == 3
    incr.apply_incremental_batch(
        spark, _pages_df(spark, pdf.iloc[N_BASE:]), paths, "n1"
    )

    updated = pdf.copy()
    updated.iloc[5:8] = changed
    fresh_paths = ib.IndexPaths(str(root / "fresh"))
    ib.build_index(
        spark, _pages_df(spark, updated), fresh_paths, n_salts=2,
        salt_threshold=60, n_barrels=4, id_partitions=4,
    )
    fresh = SearchIndex(spark, fresh_paths)
    return tmpl, fresh, base_answers, root


def _clone(template: str, root, tag: str) -> ib.IndexPaths:
    dst = str(root / f"clone_{tag}")
    shutil.copytree(template, dst)
    return ib.IndexPaths(dst)


def _assert_equals_fresh(spark, paths, fresh):
    inc = SearchIndex(spark, paths)
    assert inc.n_docs == fresh.n_docs
    assert inc.avgdl == fresh.avgdl
    for q in QUERIES:
        a = search_topk(inc, q, k=10)
        b = search_topk(fresh, q, k=10)
        assert [d for d, _ in a] == [d for d, _ in b], q
        np.testing.assert_array_equal(
            np.array([s for _, s in a]), np.array([s for _, s in b])
        )


@pytest.mark.parametrize("kill_at", [0, 1, 6, 12])
def test_crash_mid_swap_rolls_forward(spark, crash_setup, kill_at):
    """Kill the swap after `kill_at` journal ops; opening the index must
    roll the commit forward and equal the fresh build bit-for-bit."""
    tmpl, fresh, _, root = crash_setup
    paths = _clone(tmpl, root, f"k{kill_at}")
    incr._FAULT_AFTER_OPS = kill_at
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            incr.compact(spark, paths)
    finally:
        incr._FAULT_AFTER_OPS = None
    jp = incr.journal_path(paths)
    assert os.path.exists(jp), "commit point not durable"
    ops = json.load(open(jp))["ops"]
    assert len(ops) > kill_at, "fault index beyond the op list"
    # SearchIndex.__init__ calls recover_pending: the interrupted swap
    # completes before anything is read
    _assert_equals_fresh(spark, paths, fresh)
    assert not os.path.exists(jp)
    # no staging debris survives recovery
    assert not [
        d for d in os.listdir(paths.root) if d.endswith("_staging")
    ]


def test_crash_before_journal_preserves_old_epoch(spark, crash_setup):
    """A crash while staging (before the atomic journal commit) must
    leave the OLD snapshot fully readable — bit-equal to pre-compact
    answers — and a rerun compact() must then succeed."""
    tmpl, fresh, base_answers, root = crash_setup
    paths = _clone(tmpl, root, "prejournal")
    incr._FAULT_BEFORE_JOURNAL = True
    try:
        with pytest.raises(RuntimeError, match="before journal"):
            incr.compact(spark, paths)
    finally:
        incr._FAULT_BEFORE_JOURNAL = False
    assert not os.path.exists(incr.journal_path(paths))
    # served snapshot is exactly the base epoch
    inc = SearchIndex(spark, paths)
    for q in QUERIES:
        assert search_topk(inc, q, k=10) == base_answers[q], q
    # recovery-by-rerun: the next compact overwrites the orphaned staging
    res = incr.compact(spark, paths)
    assert res["compacted_barrels"] > 0
    _assert_equals_fresh(spark, paths, fresh)


def test_recover_via_compact_entrypoint(spark, crash_setup):
    """compact() itself must roll forward a pending journal before doing
    anything else (a crashed compactor restarted by a scheduler), and a
    rerun with nothing left to fold is a clean no-op."""
    tmpl, fresh, _, root = crash_setup
    paths = _clone(tmpl, root, "viacompact")
    incr._FAULT_AFTER_OPS = 3
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            incr.compact(spark, paths)
    finally:
        incr._FAULT_AFTER_OPS = None
    res = incr.compact(spark, paths)  # recovery happens first
    assert res == {"compacted_barrels": 0}  # delta log already truncated
    _assert_equals_fresh(spark, paths, fresh)
