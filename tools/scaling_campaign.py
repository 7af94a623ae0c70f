"""N-vs-4N scaling measurement campaign (north-rule criterion).

Methodology (BASELINE.md "BENCH"):
- The measured job is `index_build.build_index` over a pre-generated
  deterministic corpus — the same code path `spark-submit
  plans/build_job.py` drives.
- Each measurement runs in a FRESH process pinned to exactly N cores
  (`taskset -c 0..N-1`) with `-XX:ActiveProcessorCount=N`, so GC/JIT/
  Python workers share the N-core budget — the faithful model of an
  N-core executor host. Without pinning, a local[4] JVM borrows the
  host's 32-core GC parallelism and the comparison undercounts the
  4-core cost.
- Runs interleave (N, 4N, N, 4N, ...) best-of-K: this VM's aggregate CPU
  budget drifts ±30% over minutes, so paired interleaving + best-of-K
  suppresses the noise floor (CLAUDE.md measurement rule).
- tools/cpu_probe.py runs in the same window to record the machine's own
  parallel-scaling ceiling for the normalized figure.

Usage: python tools/scaling_campaign.py [--docs 400000] [--lo 4] [--hi 16]
       [--reps 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN_SNIPPET = """
import sys, time, json
sys.path.insert(0, {repo!r})
from search_engine_spark.session import get_spark
from search_engine_spark.operators import index_build as ib
import pyspark.sql.functions as F
cpus = {cpus}
s = get_spark("scale-%d" % cpus, master="local[%d]" % cpus,
              shuffle_partitions=max(8, cpus))
pages = s.read.parquet({pages!r})
# steady-state discipline: warm the JVM (codegen/classloading) and the
# Python UDF workers with a tiny job BEFORE the timer — first-job warmup
# is per-process setup, not index-build work, and identical at every
# core count (documented in BASELINE.md)
warm = pages.limit(256)
ib.normalize_pages(warm).agg(F.count("*")).collect()
t0 = time.monotonic()
ib.build_index(s, pages, ib.IndexPaths({out!r}),
               n_salts=8, salt_threshold=2000, n_barrels=32)
print("WALL=%.3f" % (time.monotonic() - t0))
s.stop()
"""


def run_build(cpus: int, pages: str, out: str) -> float:
    env = dict(os.environ)
    env["SPARK_GRAFT_JAVA_OPTS"] = f"-XX:ActiveProcessorCount={cpus}"
    code = _RUN_SNIPPET.format(repo=REPO, cpus=cpus, pages=pages, out=out)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=1800)
    for line in r.stdout.splitlines():
        if line.startswith("WALL="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(f"build at {cpus} cores failed: {r.stderr[-2000:]}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=400_000)
    p.add_argument("--lo", type=int, default=4)
    p.add_argument("--hi", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    work = tempfile.mkdtemp(prefix="scale_camp_")
    try:
        gen = subprocess.run(
            [sys.executable, "-c", (
                f"import sys; sys.path.insert(0, {REPO!r})\n"
                "from search_engine_spark.session import get_spark\n"
                "from search_engine_spark.sources.pages import write_pages\n"
                "s = get_spark('gen', master='local[16]')\n"
                f"write_pages(s, {args.docs}, {work!r} + '/pages')\n"
                "s.stop()\n"
            )],
            capture_output=True, text=True, timeout=1800,
        )
        if gen.returncode:
            raise RuntimeError(gen.stderr[-2000:])
        pages = f"{work}/pages"
        walls: dict[int, list[float]] = {args.lo: [], args.hi: []}
        for rep in range(args.reps):
            for cpus in (args.lo, args.hi):
                out = f"{work}/idx{cpus}"
                w = run_build(cpus, pages, out)
                walls[cpus].append(round(w, 2))
                shutil.rmtree(out, ignore_errors=True)
                print(json.dumps({"rep": rep, "cpus": cpus, "wall": w}),
                      file=sys.stderr, flush=True)
        lo_b, hi_b = min(walls[args.lo]), min(walls[args.hi])
        factor = args.hi / args.lo
        result = {
            "docs": args.docs,
            "walls": {str(k): v for k, v in walls.items()},
            f"best_{args.lo}": lo_b,
            f"best_{args.hi}": hi_b,
            "speedup": round(lo_b / hi_b, 3),
            "raw_efficiency": round(lo_b / hi_b / factor, 3),
            f"docs_per_sec_{args.lo}": round(args.docs / lo_b, 1),
            f"docs_per_sec_{args.hi}": round(args.docs / hi_b, 1),
        }
        probe = subprocess.run(
            [sys.executable, f"{REPO}/tools/cpu_probe.py",
             str(args.lo), str(args.hi)],
            capture_output=True, text=True, timeout=600,
        )
        try:
            pj = json.loads(probe.stdout.strip().splitlines()[-1])
            hw = pj.get(f"hw_efficiency_{args.lo}_{args.hi}")
            result["hw_ceiling_efficiency"] = hw
            if hw:
                result["normalized_efficiency"] = round(
                    result["raw_efficiency"] / hw, 3
                )
        except Exception:
            pass
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
