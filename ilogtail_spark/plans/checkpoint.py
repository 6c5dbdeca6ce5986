"""Checkpoint table — idempotent resume + lineage/metrics bookkeeping.

Reimplements the *semantics* of the reference's checkpoint layers:
  * Go: leveldb checkpoint manager (pluginmanager/checkpoint_manager.go:40-52)
    and FlushOutStore for unflushed groups on shutdown
    (pluginmanager/flusher_out_store.go);
  * C++: exactly-once RangeCheckpoint (core/checkpoint/RangeCheckpoint.h:26)
    and AdhocJobCheckpoint for one-shot imports
    (core/checkpoint/AdhocJobCheckpoint.cpp).

Spark-first shape: a tiny append-only parquet table of commit records
(run_id, stage, payload, commit marker). A stage re-run first consults
the table; already-committed stages are skipped, so the whole pipeline is
resumable from the last committed write — the sandbox stand-in for an
Iceberg snapshot id per commit (on a real cluster this table IS an
Iceberg table and `payload` carries the snapshot id).

The table is driver-written (a few rows per run), never on the data path.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession

# commit_seq: parquet collect order follows FILE LISTING, not append
# time — with one parquet file per commit, "the last row" is otherwise
# arbitrary. Every commit stamps a monotonic sequence and `payload`
# returns the record with the highest one (re-commits with updated
# payloads — index compaction generations — depend on this). Tables
# written before the column existed read as NULL and sort oldest.
_SCHEMA = "run_id string, stage string, payload string, committed boolean, commit_seq long"


class CheckpointTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self):
        try:
            return self.spark.read.schema(_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], _SCHEMA)

    def is_committed(self, run_id: str, stage: str) -> bool:
        df = self._read()
        return (
            df.filter(
                (df.run_id == run_id) & (df.stage == stage) & df.committed
            ).limit(1).count()
            > 0
        )

    def commit(self, run_id: str, stage: str, payload: dict | None = None) -> None:
        row = [(run_id, stage, json.dumps(payload or {}, sort_keys=True), True,
                time.time_ns())]
        self.spark.createDataFrame(row, _SCHEMA).write.mode("append").parquet(self.path)

    def payload(self, run_id: str, stage: str) -> dict | None:
        df = self._read()
        rows = (
            df.filter((df.run_id == run_id) & (df.stage == stage) & df.committed)
            .orderBy(df.commit_seq.asc_nulls_first())
            .collect()
        )
        if not rows:
            return None
        return json.loads(rows[-1]["payload"])
