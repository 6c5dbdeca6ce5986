"""Raw memory-bandwidth probe for the scaling analysis (BENCH/BASELINE.md).

Measures aggregate copy bandwidth (numpy memcpy of a buffer far larger
than LLC) with P worker processes pinned to cores 0..P-1 — the same
pinning scheme bench_scaling.py uses for the Spark JVMs. If aggregate
bandwidth stops growing with P, the box's shared memory bus is the
ceiling for any scan-heavy workload at that parallelism, independent of
the execution engine.

Usage: python tools/bench_membw.py [P ...]   (default: 1 2 4 8 16 32)
Prints one JSON line per P.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

BUF_MB = 256  # per worker; 2×256 MB working set ≫ any LLC
REPS = 8


def _worker(core: int, q: mp.Queue) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    a = np.ones(BUF_MB * 1024 * 1024 // 8, dtype=np.float64)
    b = np.empty_like(a)
    np.copyto(b, a)  # warm / fault pages
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.copyto(b, a)
    dt = time.perf_counter() - t0
    # copy moves 2 bytes per byte of buffer (read + write)
    q.put(2 * BUF_MB * REPS / dt / 1024)  # GB/s


def measure(p: int) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(c, q)) for c in range(p)]
    for pr in procs:
        pr.start()
    per = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    agg = sum(per)
    return {"procs": p, "agg_gb_s": round(agg, 1),
            "per_proc_gb_s": round(agg / p, 2)}


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    out = []
    for p in levels:
        r = measure(p)
        out.append(r)
        print(json.dumps(r))
    base = out[0]["agg_gb_s"]
    for r in out:
        r["speedup_vs_1"] = round(r["agg_gb_s"] / base, 2)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
