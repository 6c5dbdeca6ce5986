"""WEAK-scaling evidence: N cores on D data vs 4N cores on 4D data —
the cluster-growth question ("add executors as the corpus grows") that
complements tools/bench_scaling.py's strong-scaling pairs. Perfect
weak scaling = equal wall time (efficiency t_N / t_4N = 1.0).

Same hygiene as the strong-scaling tool: each level in its own JVM
pinned with taskset to exactly its core budget, pairs interleaved
round-robin, best-of over all rounds. Appends results to stdout as
JSON lines; paste the summary into BENCH/BASELINE.md §Weak scaling.

Usage: python tools/bench_weak_scaling.py [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (cpus, n_convs, taskset cores); 60000 convs ≈ 2M turns
PAIRS = [
    ((2, 60000, "0-1"), (8, 240000, "0-7")),
    ((8, 60000, "0-7"), (32, 240000, "0-31")),
]

_WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from ilogtail_spark.session import get_spark
from ilogtail_spark.plans.pipeline import FLAGSHIP_SPEC, build_pipeline
cpus, data = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name=f"weak_{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
src = spark.read.parquet(data)
n = src.count()
routed = build_pipeline(src, FLAGSHIP_SPEC)
routed.write.format("noop").mode("overwrite").save()
times = []
for _ in range(3):
    t0 = time.time(); routed.write.format("noop").mode("overwrite").save()
    times.append(time.time() - t0)
print(json.dumps({"cpus": cpus, "turns": n, "best": min(times), "runs": times}))
spark.stop()
"""


def ensure_data(n_convs: int) -> str:
    marker = f"/tmp/ilogtail_spark_bench_transcripts_{n_convs}"
    if not os.path.exists(f"{marker}/_SUCCESS"):
        sys.path.insert(0, REPO)
        from ilogtail_spark.gen import gen_transcripts
        from ilogtail_spark.session import get_spark

        spark = get_spark(master="local[32]", shuffle_partitions=32,
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
        spark.sparkContext.setLogLevel("ERROR")
        gen_transcripts(spark, n_convs).repartition(128).write.mode(
            "overwrite"
        ).parquet(marker)
        spark.stop()
    return marker


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    wf = tempfile.NamedTemporaryFile("w", suffix=".py", delete=False)
    wf.write(_WORKER % {"repo": REPO})
    wf.close()

    datasets = {n: ensure_data(n) for pair in PAIRS for _, n, _ in pair}
    results: list[dict] = []
    for rnd in range(rounds):
        for pair in PAIRS:
            for cpus, n_convs, cores in pair:
                out = subprocess.run(
                    ["taskset", "-c", cores, sys.executable, wf.name,
                     str(cpus), datasets[n_convs]],
                    capture_output=True, text=True, timeout=1200,
                )
                line = [ln for ln in out.stdout.splitlines()
                        if ln.startswith("{")][-1]
                r = json.loads(line)
                r["round"] = rnd
                print(json.dumps(r))
                results.append(r)

    for (c1, n1, _), (c2, n2, _) in PAIRS:
        b1 = min(r["best"] for r in results
                 if r["cpus"] == c1 and r["turns"] < 4_000_000)
        b2 = min(r["best"] for r in results
                 if r["cpus"] == c2 and r["turns"] > 4_000_000)
        print(json.dumps({
            "pair": f"{c1}({n1})->{c2}({n2})",
            "t_small_best": round(b1, 2),
            "t_big_best": round(b2, 2),
            "weak_efficiency": round(b1 / b2, 3),
        }))


if __name__ == "__main__":
    main()
