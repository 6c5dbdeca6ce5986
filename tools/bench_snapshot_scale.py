"""Durable dedup-index path at 1M documents: the r5 scale table
(SCALE.md) timed the IN-MEMORY index (build 38.6 s once, probe 2.3 s
per ~0.5% batch); this runs the same corpus through the DISK path —
`CorpusSnapshot` bucketed write, reload in a fresh reader, probe,
append a generation, compact — so the resumable-ingestion story has
scale numbers of its own.

Prints one JSON line per step; paste the summary into SCALE.md.
Usage: python tools/bench_snapshot_scale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAP = "/tmp/ilogtail_spark_snap_scale"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from bench_dedup_scale import gen_docs  # same corpus as the r4/r5 runs
    from ilogtail_spark.functions.dedup import dedup_index, incremental_dedup
    from ilogtail_spark.plans.snapshot import CorpusSnapshot
    from ilogtail_spark.session import get_spark

    spark = get_spark(
        app_name="snapshot_scale",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(gen_docs(spark, n))
    corpus = docs.filter(F.col("doc_id") % 211 != 0)
    batch = docs.filter(F.col("doc_id") % 211 == 0)

    def step(name, fn):
        t0 = time.time()
        out = fn()
        print(json.dumps({"op": name, "n_docs": n,
                          "sec": round(time.time() - t0, 1)}), flush=True)
        return out

    shutil.rmtree(SNAP, ignore_errors=True)
    snap = CorpusSnapshot(spark, SNAP, buckets=32)

    ex, bk = dedup_index(corpus)
    step("index_build_and_bucketed_write",
         lambda: snap.write_dedup_index(
             ex, bk, params={"n": 3, "num_hashes": 64, "bands": 16}))

    # fresh-catalog reload (the restart path): drop catalog entries,
    # loader re-registers from the commit payload
    for part in ("exact", "bands"):
        spark.sql(f"DROP TABLE IF EXISTS {snap._table('latest', part)}")
    ex2, bk2, params = step(
        "load_from_disk", lambda: CorpusSnapshot(spark, SNAP).load_dedup_index()
    )

    flagged = step(
        "probe_batch_from_disk",
        lambda: incremental_dedup(batch, ex2, bk2, **params)
        .localCheckpoint(eager=True),
    )
    n_dup = step(
        "flag_counts",
        lambda: flagged.filter(F.col("exact_dup") | F.col("near_dup")).count(),
    )
    print(json.dumps({"op": "flagged_docs", "n_docs": n, "count": n_dup}))

    kept = flagged.filter(~F.col("exact_dup") & ~F.col("near_dup")).drop(
        "exact_dup", "near_dup"
    )
    dex, dbk = dedup_index(kept, **params)
    step("append_generation", lambda: snap.append_dedup_index(dex, dbk))
    shrink = step("compact", lambda: snap.compact_dedup_index())
    print(json.dumps({"op": "compact_rows", "n_docs": n,
                      "exact": shrink["exact"], "bands": shrink["bands"]}))
    spark.stop()


if __name__ == "__main__":
    main()
