"""Per-query isolation harness (guide §1.4): time a registry query with the
noop sink, N interleaved reps, and optionally dump .explain("formatted").

Usage: python tools/profile_query.py <sf_dir> <reps> <query> [<query>...]
       EXPLAIN=1 dumps plans to plans/r08/<query>_<EXPLAIN_TAG>.txt
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir, reps, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    from ilogtail_spark.queries import QUERIES
    from ilogtail_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="profile_query",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("FATAL")
    runs = {n: [] for n in names}
    for r in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"{n} rep{r}")
            t0 = time.time()
            df = QUERIES[n](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs[n].append(round(time.time() - t0, 3))
    for n in names:
        print(f"{n}: best={min(runs[n])} runs={runs[n]}")
    if os.environ.get("EXPLAIN"):
        tag = os.environ.get("EXPLAIN_TAG", "before")
        for n in names:
            df = QUERIES[n](spark, sf_dir)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            out = f"plans/r08/{n}_{tag}.txt"
            with open(out, "w") as f:
                f.write(p)
            print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
