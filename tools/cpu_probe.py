"""Measure this machine's raw parallel-scaling ceiling.

The sandbox VM does not deliver linear CPU scaling: an embarrassingly
parallel pure-Python workload (no shared state, no I/O, single-threaded
BLAS) measures how much aggregate compute is actually available at each
process count. Engine scaling efficiency is reported raw AND normalized
against this ceiling in BASELINE.md — a distributed engine cannot scale
better than the hardware under it.

Usage: python tools/cpu_probe.py [nprocs ...]   (default: 1 4 8 16 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"

TASKS = 64
ITERS = 4_000_000


def burn(_: int) -> int:
    s = 0
    for i in range(ITERS):
        s += i * i
    return s


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16, 32]
    out = {}
    for n in levels:
        t0 = time.monotonic()
        with mp.get_context("spawn").Pool(n) as p:
            p.map(burn, range(TASKS))
        out[str(n)] = round(time.monotonic() - t0, 2)
    result = {"wall_sec": out}
    pairs = [(4, 16), (8, 32)]
    if len(levels) == 2 and levels[1] == 4 * levels[0]:
        pairs.append((levels[0], levels[1]))
    for a, b in pairs:
        ka, kb = str(a), str(b)
        if ka in out and kb in out and f"hw_speedup_{a}_{b}" not in result:
            result[f"hw_speedup_{a}_{b}"] = round(out[ka] / out[kb], 2)
            result[f"hw_efficiency_{a}_{b}"] = round(out[ka] / out[kb] / 4.0, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
