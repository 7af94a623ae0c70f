"""TTL result cache (SURVEY §2.9 St3 — reference app.py:166-198):
hit/miss behavior, TTL expiry via an injected clock, LRU bound, and the
epoch-aware invalidation the reference lacks (a compaction must flush the
cache AND refresh the handle — never serve pre-compaction results)."""

from __future__ import annotations

from search_engine_spark.operators.result_cache import TTLSearchCache


def test_cache_hit_and_ttl_expiry(spark_index, monkeypatch):
    t = [0.0]
    cache = TTLSearchCache(spark_index, ttl_seconds=100, clock=lambda: t[0])
    calls = []
    from search_engine_spark.operators import result_cache as rc

    real = rc.q.search_topk

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(rc.q, "search_topk", counting)
    r1 = cache.search_topk("best western", k=5)
    r2 = cache.search_topk("best western", k=5)
    assert r1 == r2 and len(calls) == 1  # second is a pure cache hit
    assert cache.hits == 1 and cache.misses == 1
    t[0] = 101.0  # past TTL
    r3 = cache.search_topk("best western", k=5)
    assert r3 == r1 and len(calls) == 2  # recomputed after expiry
    # different params are different entries
    cache.search_topk("best western", k=3)
    assert len(calls) == 3
    cache.search_topk("best western", k=5, field_weights=(2.0, 1.0))
    assert len(calls) == 4


def test_cache_lru_bound(spark_index):
    cache = TTLSearchCache(spark_index, max_entries=2)
    cache.search_topk("best", k=1)
    cache.search_topk("good", k=1)
    cache.search_topk("western", k=1)
    assert len(cache._cache) == 2  # oldest evicted


def test_cache_epoch_invalidation(spark, tmp_path):
    """After ingest + compact, the cache must flush and serve results from
    the refreshed index (the reference would serve stale results for up
    to the TTL)."""
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.query import SearchIndex
    from search_engine_spark.sources.pages import generate_pages_df
    from search_engine_spark.streaming.incremental import (
        apply_incremental_batch,
        compact,
    )

    base = generate_pages_df(spark, 200, partitions=4)
    full = generate_pages_df(spark, 260, partitions=4)
    paths = ib.IndexPaths(str(tmp_path / "cidx"))
    ib.build_index(
        spark, base, paths, n_salts=2, salt_threshold=60, n_barrels=4,
        id_partitions=4,
    )
    cache = TTLSearchCache(SearchIndex(spark, paths), ttl_seconds=10**9)
    before = cache.search_topk("best western", k=10)
    assert cache.search_topk("best western", k=10) == before  # hit
    batch = spark.createDataFrame(
        full.toPandas().iloc[200:],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    apply_incremental_batch(spark, batch, paths, batch_id="cc1")
    compact(spark, paths)
    after = cache.search_topk("best western", k=10)  # no stale handle error
    fresh = TTLSearchCache(SearchIndex(spark, paths)).search_topk(
        "best western", k=10
    )
    assert after == fresh
    assert cache.index.n_docs > 190  # refreshed handle sees the new corpus
