"""Pure-CPU (no-memory) scaling probe for the scaling analysis.

Spins an integer-arithmetic loop in P pinned processes and reports
aggregate iterations/sec. Touches no data beyond a few registers, so it
is immune to memory bandwidth — if aggregate spin throughput does not
scale ~linearly in P, the host simply does not deliver P concurrent
vCPUs (overcommit/throttling), and NO engine or plan can scale past that
point on this box.

Usage: python tools/bench_cpuspin.py [P ...]  (default: 2 8 16 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

SECONDS = 4.0


def _worker(core: int, q: mp.Queue) -> None:
    os.sched_setaffinity(0, {core})
    x = 1
    iters = 0
    t0 = time.perf_counter()
    deadline = t0 + SECONDS
    while time.perf_counter() < deadline:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        iters += 100_000
    q.put(iters / (time.perf_counter() - t0))


def measure(p: int) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(c, q)) for c in range(p)]
    for pr in procs:
        pr.start()
    per = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    agg = sum(per)
    return {"procs": p, "agg_mips": round(agg / 1e6, 1),
            "per_proc_mips": round(agg / p / 1e6, 2)}


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [2, 8, 16, 32]
    for p in levels:
        print(json.dumps(measure(p)))


if __name__ == "__main__":
    main()
