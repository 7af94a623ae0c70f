"""Hashing invariants.

1. doc_id derivation is bit-identical across Spark (F.md5 + conv),
   pure Python (hashlib) — the property the single-node oracle relies on.
2. The portable xxHash64-style token hash is deterministic and stable
   (engine and oracle share the same Python definition; JVM parity is
   intentionally NOT required — this env's Spark xxhash64 is non-spec,
   see functions/hashing.py docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.hashing import (
    DOC_ID_HEX_CHARS,
    doc_id_from_url,
    xxhash64_str,
)


def spark_doc_id_col(col: str = "url"):
    return F.conv(F.substring(F.md5(col), 1, DOC_ID_HEX_CHARS), 16, 10).cast("long")


def test_doc_id_matches_spark(spark):
    urls = [
        "https://site0.example/page/0",
        "https://site42.example/page/123456789",
        "",
        "üñïçødé ✓ mixed",
        "x" * 500,
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r["url"]: r["id"] for r in df.select("url", spark_doc_id_col().alias("id")).collect()}
    for u in urls:
        did = doc_id_from_url(u)
        assert got[u] == did, u
        assert 0 <= did < 2**60


def test_doc_id_no_collisions_small_scale():
    n = 50_000
    ids = {doc_id_from_url(f"https://site{i % 97}.example/page/{i}") for i in range(n)}
    assert len(ids) == n


@given(st.text(max_size=80))
@settings(max_examples=100, deadline=None)
def test_token_hash_deterministic(s):
    h = xxhash64_str(s)
    assert h == xxhash64_str(s)
    assert -(2**63) <= h < 2**63


def test_token_hash_spread():
    hs = {xxhash64_str(f"tok{i}") for i in range(1000)}
    assert len(hs) == 1000
