"""F12 sentiment scorer: the pure-Python oracle, pandas-vectorized, and
SQL-CASE variants must agree exactly (same lexicon, same normalization)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.sentiment import (
    POLARITY,
    sentiment_score,
    sentiment_series,
)

WORDS = list(POLARITY) + ["hotel", "room", "the", "a", "stay", "w1", "w2"]


@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), max_size=40).map(" ".join),
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_vectorized_equals_scalar(texts):
    got = sentiment_series(pd.Series(texts, dtype=object)).tolist()
    want = [sentiment_score(t) for t in texts]
    assert got == want


def test_known_values():
    assert sentiment_score("") == 0.0
    assert sentiment_score("hotel room") == 0.0
    assert sentiment_score("good") == 1.0  # 1/sqrt(1), clamped at 1
    assert sentiment_score("terrible awful") == -1.0  # -4/sqrt(2) clamped
    v = sentiment_score("good hotel room bad")  # (+1-1)/2 = 0
    assert v == 0.0


def test_clamping():
    assert sentiment_score(" ".join(["great"] * 50)) == 1.0
    assert sentiment_score(" ".join(["worst"] * 50)) == -1.0
