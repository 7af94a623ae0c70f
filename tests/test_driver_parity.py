"""Regression guard for the driver's correctness gate: run a cross-section
of __spark_entry__ queries against their DuckDB oracles at sf0.001 (the
driver itself runs the full set at sf0.01 — tools/check_parity.py runs it
locally)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = [
    "term_tf",
    "lexicon",
    "bm25_topk_or",
    "bm25_topk_and",
    "engine_bm25_topk",
    "dedup_exact",
    "minhash_signatures",
    "simhash",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "quality_score",
    "dedup_clusters",
    "corpus_select_cc",
    "source_detail",
    "split_assign",
    "stratified_sample",
    "sessionize",
    "groupby_multi_mean",
    "window_user_events",
    "json_extract",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, sf_dir).toPandas()
    odf = duck.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = _norm(sdf), _norm(odf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
