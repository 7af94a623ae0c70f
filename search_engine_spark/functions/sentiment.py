"""Deterministic lexicon-based sentiment scoring (SURVEY.md §2.8 F12).

The reference scores every document and query with VADER
(/root/reference/backend/app.py:28-40, backend/utils/sentiment.py:17-25):
a lexicon lookup + normalization — inherently vectorizable. VADER's
lexicon isn't vendored here; this module implements the same mechanism
over a small hand-curated polarity table so the operator is (a)
deterministic, (b) Arrow-vectorizable with zero per-row Python, and (c)
ANSI-SQL-expressible for the driver's DuckDB oracle. Swapping in the full
VADER table is a data change, not a code change.

score(doc) = clamp(sum(polarity(token)) / sqrt(n_tokens), -1, 1) — the
same compound-score shape VADER normalizes with (sum / sqrt(sum^2 + a)).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

# polarity ∈ [-2, 2]; curated for generic web/review text, with overlap
# into the driver corpus vocabulary so scores are non-degenerate
POLARITY: dict[str, int] = {
    "good": 1, "great": 2, "best": 2, "excellent": 2, "nice": 1,
    "clean": 1, "fast": 1, "friendly": 1, "comfortable": 1, "perfect": 2,
    "amazing": 2, "wonderful": 2, "love": 2, "loved": 2, "helpful": 1,
    "well": 1, "fresh": 1, "quiet": 1, "spacious": 1, "beautiful": 2,
    "bad": -1, "worst": -2, "terrible": -2, "awful": -2, "dirty": -1,
    "slow": -1, "rude": -2, "broken": -1, "noisy": -1, "poor": -1,
    "horrible": -2, "hate": -2, "error": -2, "stale": -1, "small": 0,
    "disappointing": -1, "uncomfortable": -1, "smelly": -1, "old": 0,
}


def sentiment_score(text: str) -> float:
    """Pure-Python scorer (oracle side). Whitespace tokens; same clamp and
    sqrt-length normalization as the vectorized and SQL variants."""
    tokens = [t for t in str(text).split() if t]
    if not tokens:
        return 0.0
    s = sum(POLARITY.get(t, 0) for t in tokens)
    # math.sqrt / np.sqrt are IEEE correctly-rounded; x**0.5 (np.power)
    # is not — all three variants must use true sqrt for bit parity
    val = s / math.sqrt(len(tokens))
    return max(-1.0, min(1.0, val))


def sentiment_series(texts: pd.Series) -> pd.Series:
    """pandas-vectorized scorer for the Spark pandas UDF path: split →
    explode-free map via str token extraction, no per-row Python."""
    toks = texts.astype("string").fillna("").str.split()
    n = toks.str.len().clip(lower=1).astype("float64")
    s = toks.map(lambda ts: sum(POLARITY.get(t, 0) for t in ts)).astype("float64")
    return (s / np.sqrt(n.to_numpy())).clip(-1.0, 1.0).astype("float64")


def sql_polarity_case(term_col: str = "term") -> str:
    """CASE expression mapping a token to its polarity — the DuckDB/Spark
    SQL face of the lexicon."""
    whens = " ".join(
        f"WHEN '{w}' THEN {p}" for w, p in sorted(POLARITY.items())
    )
    return f"CASE {term_col} {whens} ELSE 0 END"
