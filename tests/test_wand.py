"""Block-max WAND pruning must be LOSSLESS: identical top-k (docs AND
scores) to exhaustive scoring (FIXTURES.md §4; SURVEY.md §7 'WAND
correctness')."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.query import search_topk

MULTI_TERM_QUERIES = [
    "best western",
    "good hotel",
    "best good well",
    "clean room staff breakfast",
]


@pytest.mark.parametrize("query", MULTI_TERM_QUERIES)
def test_wand_equals_exhaustive(spark_index, query):
    exhaustive = search_topk(spark_index, query, k=10, use_wand=False)
    pruned = search_topk(spark_index, query, k=10, use_wand=True)
    assert pruned == exhaustive, query


def test_wand_k_larger_than_matches(spark_index):
    # k larger than the candidate set: theta stays 0, nothing pruned
    exhaustive = search_topk(spark_index, "w4000 w4001", k=10**6, use_wand=False)
    pruned = search_topk(spark_index, "w4000 w4001", k=10**6, use_wand=True)
    assert pruned == exhaustive
