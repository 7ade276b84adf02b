#!/usr/bin/env python
"""Is the 8 -> 32 kernel-scaling plateau a DRAM-bandwidth artifact of
this single-socket host?  (VERDICT r2 item 7: lift the 8->32 step or
measure why it cannot lift.)

Two sweeps over process counts p = 1, 2, 4, 8, 16, 32:

1. `copy`: aggregate numpy memcpy bandwidth (big arrays, pure stream) —
   the machine's practical DRAM ceiling at p readers/writers.
2. `build`: aggregate per-shard fuse8 construction throughput (each
   process builds independent 300k-key shards in a loop — the
   distributed build's per-task workload, no Spark overhead).

If both curves flatten at the same p while per-process CPU stays busy,
the plateau is the memory bus, not the kernel: more in-task threading
cannot raise it, and on a real N->4N *cluster* each executor brings its
own bus (the scenario the north rule targets).  Prints a markdown
table for BENCH.md.

Usage: python scripts/dram_ceiling.py [--seconds 3]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _copy_worker(barrier, seconds: float, out):
    a = np.random.default_rng(0).integers(0, 255, size=64 << 20,
                                          dtype=np.uint8)  # 64 MB
    b = np.empty_like(a)
    np.copyto(b, a)                      # fault the pages before timing
    barrier.wait()                       # all workers start together
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(b, a)
        n += 1
    out.put(n * a.nbytes * 2 / (time.perf_counter() - t0))  # read+write B/s


def _build_worker(barrier, seconds: float, out):
    from fastfilter_spark.operators.local import FuseFilter
    keys = np.random.default_rng(os.getpid()).integers(
        0, 1 << 63, size=300_000, dtype=np.uint64)
    FuseFilter.build(keys)  # warm: compile/load the native kernel
    barrier.wait()
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        FuseFilter.build(keys)
        n += keys.size
    out.put(n / (time.perf_counter() - t0))


def sweep(worker, seconds: float, procs: list[int]) -> dict[int, float]:
    res = {}
    for p in procs:
        q = mp.Queue()
        barrier = mp.Barrier(p)
        ps = [mp.Process(target=worker, args=(barrier, seconds, q))
              for _ in range(p)]
        for x in ps:
            x.start()
        total = sum(q.get() for _ in ps)
        for x in ps:
            x.join()
        res[p] = total
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()
    procs = [1, 2, 4, 8, 16, 32]
    copy_bw = sweep(_copy_worker, args.seconds, procs)
    build_tp = sweep(_build_worker, args.seconds, procs)
    print("| procs | memcpy GB/s | x vs 1 | build Mkeys/s | x vs 1 |")
    print("|---|---|---|---|---|")
    for p in procs:
        print(f"| {p} | {copy_bw[p]/1e9:.1f} | "
              f"{copy_bw[p]/copy_bw[1]:.1f} | {build_tp[p]/1e6:.1f} | "
              f"{build_tp[p]/build_tp[1]:.1f} |")
    print()
    print(json.dumps({
        "memcpy_gbps": {str(p): round(copy_bw[p] / 1e9, 1) for p in procs},
        "build_mkeys": {str(p): round(build_tp[p] / 1e6, 1) for p in procs},
    }))


if __name__ == "__main__":
    main()
