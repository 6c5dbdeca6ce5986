"""North-rule scaling evidence: run the IDENTICAL flagship pipeline on the
IDENTICAL input at two parallelism levels (local[8] = N, local[32] = 4N —
the sandbox proxy for N vs 4N executors) and report throughput at both
plus scaling efficiency = (thr_4N / thr_N) / 4.

Each level runs in its own JVM (subprocess) so no executor state bleeds.
Writes BENCH/BASELINE.md. Usage: python tools/bench_scaling.py [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from ilogtail_spark.session import get_spark
from ilogtail_spark.plans.pipeline import FLAGSHIP_SPEC, build_pipeline

cpus = int(sys.argv[1]); data = sys.argv[2]
spark = get_spark(app_name=f"scaling_{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
src = spark.read.parquet(data)
n = src.count()
routed = build_pipeline(src, FLAGSHIP_SPEC)
# two warm-up runs (JIT + codegen + page cache), then 5 timed runs; median
routed.write.format("noop").mode("overwrite").save()
routed.write.format("noop").mode("overwrite").save()
times = []
for _ in range(3):
    t0 = time.time()
    routed.write.format("noop").mode("overwrite").save()
    times.append(time.time() - t0)
times.sort()
med = times[len(times) // 2]
print(json.dumps({"cpus": cpus, "turns": n, "sec": round(med, 3),
                  "turns_per_sec": round(n / med, 1), "all_runs": [round(t,3) for t in times]}))
spark.stop()
"""


def run_level(cpus: int, data: str) -> dict:
    # taskset pins the whole JVM (task threads + GC + JIT) to exactly
    # `cpus` cores — otherwise the small level borrows idle cores for GC
    # and the comparison flatters N / deflates measured efficiency.
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
           _WORKER % {"repo": REPO}, str(cpus), data]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 150000
    # materialize shared input once
    sys.path.insert(0, REPO)
    from ilogtail_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from bench import _ensure_bench_data

    data = _ensure_bench_data(spark, n_convs)
    spark.stop()

    lo = run_level(8, data)
    hi = run_level(32, data)
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
    result = {"N(local[8])": lo, "4N(local[32])": hi,
              "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result, indent=2))

    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH baseline — scaling + throughput evidence

Workload: flagship parse → enrich → route → aggregate pipeline
(`ilogtail_spark.plans.pipeline.FLAGSHIP_SPEC`) over the deterministic
generated transcript table ({lo['turns']} turns), noop sink (the
reference benchmarks against a blackhole flusher). Identical job,
identical input, two parallelism levels — the sandbox proxy for N vs 4N
executors per the north rule. Best of 3 post-warm-up runs per level,
separate JVM per level.

| level | cores | wall sec | turns/sec | turns/sec/core |
|---|---|---|---|---|
| N  (local[8])  | 8  | {lo['sec']} | {lo['turns_per_sec']:.0f} | {lo['turns_per_sec']/8:.0f} |
| 4N (local[32]) | 32 | {hi['sec']} | {hi['turns_per_sec']:.0f} | {hi['turns_per_sec']/32:.0f} |

**Scaling efficiency (thr_4N / thr_N) / 4 = {eff:.3f}** (north rule: ≥ 0.8)

Reference anchor (BASELINE.md): full regex-parse pipeline ≈ 37k
turns/sec/core. This engine: {hi['turns_per_sec']/32:.0f} turns/sec/core at
4N with the full parse+enrich+route+aggregate DAG (single-pass sentinel
regex parse; zero per-row Python).

Raw runs: N={lo['all_runs']}, 4N={hi['all_runs']}
""")
    print(f"wrote {REPO}/BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
