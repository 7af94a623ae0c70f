"""Benchmark harness (driver contract): runs the headline pipeline at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "build_docs_per_sec": ..., "query_p50_ms": ...}

Headline content (BASELINE.json metric):
  1. engine_build   — full compressed-barrel index build (synthetic pages
                      corpus sized ~200k docs/sf) → docs/sec throughput
  2. engine_query_* — BM25 top-10 over the compressed barrels with
                      block-max WAND, reference-query-set analogs
  3. a cross-section of the declarative operator suite on the driver's
                      testdata tables (same plans the correctness gate runs)

`python bench.py --scaling` additionally runs the N-vs-4N scaling
campaign (tools/scaling_campaign.py: taskset-pinned 4- vs 16-core hosts,
interleaved best-of-K, cpu_probe normalization — BASELINE.md
"Methodology fix") and reports raw + ceiling-normalized efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"
PAGES_PER_SF = 200_000  # sf0.1 -> 20k synthetic pages for the build bench

BENCH_QUERIES = [
    "bm25_topk_or",
    "phrase_bm25_topk",
    "bm25_topk_and",
    "bm25f_topk",
    "field_weighted_topk",
    "bm25_filtered_topk",
    "rollup_topk",
    "term_tf",
    "lexicon",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash",
    "simhash_near_dup",
    "embedding_cosine_topk",
    "kmeans_centroids",
    "quality_score",
    "groupby_multi_mean",
    "join_map_chain",
    "window_user_events",
    "event_hour_window",
    "topk_orders",
]

ENGINE_QUERIES = {
    "engine_q_western": ("western best", "OR", None),
    "engine_q_multi": ("good well western", "OR", None),
    "engine_q_and": ("good well western", "AND", None),
    "engine_q_single": ("best", "OR", None),
    "engine_q_weighted": ("western best", "OR", (2.0, 1.0)),
}


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_bench(sf_dir: str, cpus: str, scaling: bool) -> dict:
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.query import SearchIndex, search_topk
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.pages import write_pages

    sf = _sf_of(sf_dir)
    n_pages = max(2000, int(PAGES_PER_SF * sf))
    work = tempfile.mkdtemp(prefix="se_bench_")
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    try:
        spark = get_spark("bench", master=f"local[{cpus}]")
        # corpus generation (not part of the measured build)
        pages_path = f"{work}/pages"
        write_pages(spark, n_pages, pages_path)
        pages = spark.read.parquet(pages_path)

        # 1. index build throughput
        t0 = time.monotonic()
        ib.build_index(
            spark, pages, ib.IndexPaths(f"{work}/index"),
            n_salts=8, salt_threshold=2000, n_barrels=32,
        )
        build_s = time.monotonic() - t0
        timings["engine_build"] = round(build_s, 3)
        extra["build_docs_per_sec"] = round(n_pages / build_s, 1)
        extra["build_n_docs"] = n_pages

        # 2. BM25 query latency over compressed barrels (WAND on)
        idx = SearchIndex(spark, ib.IndexPaths(f"{work}/index"))
        lat = []
        for qname, (qtext, qmode, fw) in ENGINE_QUERIES.items():
            t0 = time.monotonic()
            search_topk(idx, qtext, k=10, mode=qmode, field_weights=fw)
            dt = time.monotonic() - t0
            timings[qname] = round(dt, 3)
            lat.append(dt)
        lat.sort()
        extra["query_p50_ms"] = round(lat[len(lat) // 2] * 1000, 1)

        # 3. operator suite on the driver's testdata
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.monotonic() - t0, 3)
        spark.stop()

        if scaling:
            n_scale = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "400000"))
            extra["scaling"] = run_scaling("", n_scale, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = round(sum(v for v in timings.values()), 3)
    return {
        "metric": "index-build + BM25 top-10 + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extra,
    }


def run_scaling(pages_path: str, n_pages: int, work: str) -> dict:
    """Delegates to tools/scaling_campaign.py — the ONE scaling
    methodology (taskset-pinned N-core hosts, -XX:ActiveProcessorCount,
    interleaved best-of-K, same-window cpu_probe normalization; see
    BASELINE.md "Methodology fix"). ``pages_path``/``work`` are ignored
    (the campaign generates its own deterministic corpus of n_pages)."""
    import json as _json
    import subprocess
    import sys as _sys

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "scaling_campaign.py")
    try:
        r = subprocess.run(
            [_sys.executable, script, "--docs", str(n_pages), "--reps", "3"],
            capture_output=True, text=True, timeout=3 * 3600,
        )
        return _json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:  # never break the one-JSON-line contract
        return {"error": str(e)[:500]}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    args = p.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    result = run_bench(sf_dir, cpus, args.scaling)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
