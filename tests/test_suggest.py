"""Query-UX surface: prefix autocomplete, spelling correction, KWIC
snippets (operators/query.py). Each is checked against an independent
Python recompute over the collected lexicon / normalized text — and the
levenshtein intrinsic additionally against DuckDB's, so the engine's
ranking can't drift from either reference implementation."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from search_engine_spark.operators import index_build as ib
from search_engine_spark.operators.query import (
    SearchIndex,
    correct_term,
    search_topk,
    snippets,
    suggest_terms,
)
from search_engine_spark.sources.pages import generate_pages_df


def _lex_rows(index):
    return [
        (r["term"], int(r["term_id"]), int(r["df"]))
        for r in index.lexicon.select("term", "term_id", "df").collect()
    ]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_suggest_terms_matches_python_recompute(spark, spark_index):
    got = [
        (r["term"], r["df"])
        for r in suggest_terms(spark_index, "go", k=5).collect()
    ]
    lex = _lex_rows(spark_index)
    want = sorted(
        ((t, df) for t, _, df in lex if t.startswith("go")),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert got == want and got  # non-empty on this corpus ("good", ...)


def test_suggest_terms_empty_prefix(spark, spark_index):
    assert suggest_terms(spark_index, "   ", k=5).collect() == []
    assert suggest_terms(spark_index, "zzzzz", k=5).collect() == []


def test_correct_term_matches_python_and_duckdb(spark, spark_index):
    word = "westarn"  # one edit from "western"
    got = [
        (r["term"], r["dist"])
        for r in correct_term(spark_index, word, max_dist=2, k=10).collect()
    ]
    lex = _lex_rows(spark_index)
    cand = [
        (t, _lev(t, word), df)
        for t, _, df in lex
        if abs(len(t) - len(word)) <= 2
    ]
    want = [
        (t, d)
        for t, d, df in sorted(
            (c for c in cand if c[1] <= 2), key=lambda x: (x[1], -x[2], x[0])
        )
    ][:10]
    assert got == want
    assert got[0][0] == "western" and got[0][1] == 1
    # cross-engine distance check: Spark's levenshtein == DuckDB's on the
    # full banded candidate set
    con = duckdb.connect()
    duck = {
        t: int(d)
        for t, d in con.execute(
            "SELECT t, levenshtein(t, ?) FROM (SELECT unnest(?) AS t)",
            [word, [t for t, _, _ in cand]],
        ).fetchall()
    }
    assert all(duck[t] == d for t, d, _ in cand)


def test_correct_term_rejects_phrases_and_blanks(spark, spark_index):
    assert correct_term(spark_index, "two words").collect() == []
    assert correct_term(spark_index, "  ").collect() == []


# --- SymSpell deletion-neighborhood artifact (round 4, VERDICT r3 #7) ----


@pytest.fixture(scope="module")
def spell_index(spark, spark_index):
    """Build the spell artifact over the shared session index (additive —
    a derived table next to the lexicon; the other tests' behavior is
    unchanged because both correction paths return identical rows)."""
    n = ib.build_spell_index(spark, spark_index.paths, max_dist=2)
    assert n > 0
    return spark_index


def test_spell_deletions_shape(spark):
    ks = ib.spell_deletions("abcd", 2)
    assert "abcd" in ks and "bcd" in ks and "cd" in ks and "ad" in ks
    # 1 + 4 + C(4,2) distinct two-deletions of a 4-unique-char word
    assert len(ks) == 1 + 4 + 6
    assert ib.spell_deletions("", 2) == {""}


def test_spell_path_equals_scan_path(spark, spell_index):
    """The SymSpell probe must return IDENTICAL rows to the banded
    lexicon scan for typos, exact terms, and no-match words — the
    losslessness claim (lev ≤ d ⇒ deletion neighborhoods intersect),
    with the levenshtein verify killing delkey-collision false
    positives."""
    for word in ("westarn", "western", "breakfst", "goood", "zzzzzzzzzz"):
        fast = [
            (r["term"], int(r["term_id"]), int(r["df"]), int(r["dist"]))
            for r in correct_term(
                spell_index, word, max_dist=2, k=10, use_spell=True
            ).collect()
        ]
        scan = [
            (r["term"], int(r["term_id"]), int(r["df"]), int(r["dist"]))
            for r in correct_term(
                spell_index, word, max_dist=2, k=10, use_spell=False
            ).collect()
        ]
        assert fast == scan, word
    # typo'd query resolves through the fast path end-to-end
    assert [
        r["term"] for r in correct_term(spell_index, "westarn", k=1).collect()
    ] == ["western"]


def test_spell_path_skips_lexicon_scan(spark, spell_index):
    """Plan probe: with the artifact present the correction plan reads
    the spell table (delkey IN pushdown), not the lexicon directory."""
    df = correct_term(spell_index, "westarn", max_dist=2, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "spell" in plan
    assert "lexicon" not in plan
    assert "delkey" in plan  # the IN probe reached the scan


def test_spell_refreshed_by_compaction(spark, tmp_path):
    """compact() rebuilds the spell artifact (the epoch bump would
    otherwise silently demote correct_term to the band scan), the
    refreshed table serves NEW terms ingested by the folded batches, and
    the rebuild PRESERVES the recorded max_dist (ADVICE r4: a default
    rebuild would silently downgrade a depth-3 artifact to depth 2,
    permanently demoting deeper queries to the band scan)."""
    from search_engine_spark.operators.query import correct_term
    from search_engine_spark.streaming.incremental import (
        apply_incremental_batch,
        compact,
    )

    base = generate_pages_df(spark, 200, partitions=4)
    paths = ib.IndexPaths(str(tmp_path / "spellcompact"))
    ib.build_index(
        spark, base, paths, n_salts=2, salt_threshold=60, n_barrels=4,
        id_partitions=4,
    )
    ib.build_spell_index(spark, paths, max_dist=3)
    import pandas as pd

    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["http://x.example/zzz1"],
                "warc_ts": [pd.Timestamp("2024-01-01")],
                "html": [
                    b"<html><head><title>t</title></head><body><p>"
                    b"zebrafish zebrafish content</p></body></html>"
                ],
                "text": [""],
                "lang": ["en"],
            }
        )
    )
    apply_incremental_batch(spark, batch, paths, "sp1")
    compact(spark, paths)
    idx = SearchIndex(spark, paths)
    df = correct_term(idx, "zebrafiah", k=1)  # 1 edit from the NEW term
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "delkey" in plan and "lexicon" not in plan  # fast path alive
    assert [r["term"] for r in df.collect()] == ["zebrafish"]
    # depth preserved: the rebuilt meta still records max_dist=3 and a
    # d=3 query stays on the artifact (a default rebuild would record 2
    # and the epoch gate would demote this query to the band scan)
    import json

    with open(paths.spell_meta) as f:
        assert int(json.load(f)["max_dist"]) == 3
    df3 = correct_term(idx, "zebrafiah", max_dist=3, k=1)
    plan3 = df3._jdf.queryExecution().executedPlan().toString()
    assert "delkey" in plan3 and "lexicon" not in plan3
    assert [r["term"] for r in df3.collect()] == ["zebrafish"]


def test_spell_smaller_max_dist_still_served(spark, spell_index):
    """A d=1 query against the d=2 artifact stays lossless (the deletion
    neighborhoods at depth 1 are subsets of the stored depth-2 keys)."""
    fast = [
        (r["term"], int(r["dist"]))
        for r in correct_term(
            spell_index, "westarn", max_dist=1, k=10, use_spell=True
        ).collect()
    ]
    scan = [
        (r["term"], int(r["dist"]))
        for r in correct_term(
            spell_index, "westarn", max_dist=1, k=10, use_spell=False
        ).collect()
    ]
    assert fast == scan and fast[0] == ("western", 1)


@pytest.fixture(scope="module")
def pos_setup(spark, tmp_path_factory):
    pages = generate_pages_df(spark, 300, partitions=4)
    root = str(tmp_path_factory.mktemp("snipidx"))
    paths = ib.IndexPaths(root)
    ib.build_index(
        spark, pages, paths, n_salts=2, salt_threshold=60, n_barrels=4,
        id_partitions=4, with_positions=True,
    )
    return SearchIndex(spark, paths), pages


def test_snippets_exact_windows(spark, pos_setup):
    index, pages = pos_setup
    q, window = "western breakfast", 5
    rows = snippets(index, q, pages, k=10, window=window).collect()
    top = search_topk(index, q, k=10)
    assert [int(r["doc_id"]) for r in rows] == [d for d, _ in top]
    np.testing.assert_array_equal(
        np.array([float(r["score"]) for r in rows]),
        np.array([s for _, s in top]),
    )
    norm = {
        int(r["doc_id"]): r["norm"]
        for r in ib.normalize_pages(pages)
        .select("doc_id", "norm")
        .collect()
    }
    qterms = {"western", "breakfast"}
    for r in rows:
        toks = norm[int(r["doc_id"])].split(" ")
        hits = [i for i, t in enumerate(toks) if t in qterms]
        p = min(hits)
        assert int(r["pos"]) == p  # earliest occurrence, 0-based
        start = max(p - window, 0)
        assert r["snippet"] == " ".join(toks[start : start + 2 * window + 1])


def test_snippets_require_positions(spark, spark_index, corpus):
    _, sdf = corpus
    with pytest.raises(ValueError, match="with_positions"):
        snippets(spark_index, "good", sdf)


def test_index_stats_invariants(spark, spark_index):
    from search_engine_spark.operators.query import index_stats

    rows = index_stats(spark_index).collect()
    assert len(rows) == spark_index.n_barrels
    # every term lives in exactly one barrel
    assert sum(r["n_terms"] for r in rows) == spark_index.lexicon.count()
    # postings across blobs == sum of lexicon document frequencies
    import pyspark.sql.functions as F

    total_df = spark_index.lexicon.agg(F.sum("df")).collect()[0][0]
    assert sum(r["n_postings"] for r in rows) == total_df
    # salting splits hot lists: blob rows >= terms, bytes positive
    for r in rows:
        assert r["n_blob_rows"] >= r["n_terms"]
        assert r["compressed_bytes"] > 0
        assert r["max_blob_postings"] <= spark_index.n_docs


def test_search_corrected_rewrites_typos(spark, spark_index):
    from search_engine_spark.operators.query import search_corrected

    res, corr = search_corrected(spark_index, "bezt westarn", k=5)
    assert corr == {"bezt": "best", "westarn": "western"}
    got = [(int(r["doc_id"]), float(r["score"])) for r in res.collect()]
    want = search_topk(spark_index, "best western", k=5)
    assert got == want and got
    # in-lexicon tokens never rewritten; unknown-beyond-distance dropped
    res2, corr2 = search_corrected(spark_index, "good qqqqqqqqqq", k=5)
    assert corr2 == {}
    got2 = [(int(r["doc_id"]), float(r["score"])) for r in res2.collect()]
    assert got2 == search_topk(spark_index, "good", k=5)


def test_search_many_equals_per_query(spark, spark_index):
    """Batch execution must be bit-equal to per-query search() for every
    query in the workload, OR and AND modes."""
    from search_engine_spark.operators.query import search_many

    workload = {
        1: "best western",
        2: "good well clean",
        3: "breakfast",
        4: "zzznotaterm",          # binds nothing -> absent from output
    }
    for mode in ("OR", "AND"):
        out = search_many(spark_index, workload, k=10, mode=mode).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(int(r["query_id"]), []).append(
                (int(r["doc_id"]), float(r["score"]))
            )
        assert 4 not in by_q
        for qid, text in workload.items():
            want = search_topk(spark_index, text, k=10, mode=mode)
            assert by_q.get(qid, []) == want, (qid, mode)
