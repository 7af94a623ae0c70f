"""TTL result cache over the search engine (SURVEY.md §2.9 St3).

The reference caches query results app-side with a 3600 s TTL
(/root/reference/backend/app.py:166-198 — ``Cache(ttl_seconds=3600)``
keyed by the query params). This is the engine-side equivalent, with one
semantic upgrade the reference lacks: EPOCH-AWARE invalidation. The
reference serves stale results for up to the TTL after its index mutates;
here every lookup validates the index epoch (one local file read —
operators/index_build.read_epoch), and a compaction flushes the whole
cache and transparently re-opens the handle, so a hit is always computed
against the live index.

Driver-side only (the result lists are top-k — tiny); LRU-bounded."""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Callable

from search_engine_spark.operators import query as q
from search_engine_spark.operators.index_build import read_epoch


class TTLSearchCache:
    def __init__(
        self,
        index: q.SearchIndex,
        ttl_seconds: float = 3600.0,
        max_entries: int = 10_000,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.index = index
        self.ttl = float(ttl_seconds)
        self.max_entries = int(max_entries)
        self._clock = clock
        self._cache: OrderedDict[tuple, tuple[float, list]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def _validate_epoch(self) -> None:
        if read_epoch(self.index.paths) != self.index._open_epoch:
            # index was compacted: every cached result is stale AND the
            # handle's cached lexicon/theta metadata is invalid
            self._cache.clear()
            self.index = self.index.refresh()

    def search_topk(
        self,
        query: str,
        k: int = 10,
        mode: str = "OR",
        field_weights: tuple[float, float] | None = None,
    ) -> list[tuple[int, float]]:
        self._validate_epoch()
        key = (query, k, mode, field_weights)
        now = self._clock()
        hit = self._cache.get(key)
        if hit is not None:
            ts, result = hit
            if now - ts <= self.ttl:
                self._cache.move_to_end(key)  # LRU touch
                self.hits += 1
                return list(result)
            del self._cache[key]
        result = q.search_topk(
            self.index, query, k=k, mode=mode, field_weights=field_weights
        )
        self.misses += 1
        self._cache[key] = (now, result)
        while len(self._cache) > self.max_entries:
            self._cache.popitem(last=False)
        return list(result)
