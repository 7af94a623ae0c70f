"""Phrase queries over the positional index: engine == oracle, bit-equal
scores (SURVEY data model stores positions — create_forward_index.py:38-47;
phrase search makes them queryable)."""

from __future__ import annotations

import pytest

from search_engine_spark.operators import index_build as ib
from search_engine_spark.operators.query import SearchIndex, search_phrase_topk
from search_engine_spark.oracle import engine as oracle
from search_engine_spark.sources.pages import generate_pages_df, generate_pages_pandas

N = 400

PHRASES = [
    "best western",          # two head terms
    "good hotel",
    "best good",
    "western",               # single-term phrase == that term's BM25
    "zzz missing",           # out-of-lexicon -> empty
]


@pytest.fixture(scope="module")
def positional_index(spark, tmp_path_factory):
    import numpy as np

    root = str(tmp_path_factory.mktemp("posidx"))
    sdf = generate_pages_df(spark, N, partitions=4)
    paths = ib.IndexPaths(root)
    ib.build_index(
        spark, sdf, paths, n_salts=4, salt_threshold=60, n_barrels=8,
        id_partitions=8, with_positions=True,
    )
    pdf = generate_pages_pandas(np.arange(N))
    oidx = oracle.build_index(pdf)
    return SearchIndex(spark, paths), oidx


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_matches_oracle(positional_index, phrase):
    idx, oidx = positional_index
    got = search_phrase_topk(idx, phrase, k=10)
    want = oracle.search_phrase(oidx, phrase, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], phrase
    for (gd, gs), (_, es) in zip(got, want):
        assert gs == es, (phrase, gd)  # bit-equal float64


def test_phrase_stricter_than_and(positional_index):
    """Phrase matches must be a subset of AND-mode matches."""
    from search_engine_spark.operators.query import search_topk

    idx, oidx = positional_index
    phrase_docs = {d for d, _ in search_phrase_topk(idx, "best western", k=10**6)}
    and_docs = {
        d for d, _ in search_topk(idx, "best western", k=10**6, mode="AND")
    }
    assert phrase_docs <= and_docs
    assert phrase_docs  # the head-term corpus contains adjacent pairs


def test_phrase_requires_positions(spark_index):
    with pytest.raises(ValueError, match="positions"):
        from search_engine_spark.operators.query import search_phrase

        search_phrase(spark_index, "best western")
