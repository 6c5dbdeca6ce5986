"""CDC event-log application — the semantic core of input_canal.

The reference's canal input tails a MySQL binlog and emits one event
per row change: `_event_` ∈ {row_insert, row_update, row_delete},
`_db_`/`_table_` identity, the new column values (plus `_old_<col>` on
updates), and a total order from the binlog position
(`_filename_`/`_offset_`, plugins/input/canal/input_canal.go:211-215,
349-406). The transport half (replication protocol, GTID tracking,
server reconnects, input_canal.go:478-520) is out of scope; what a
Spark pipeline needs from those events is MATERIALIZATION: apply the
log to produce each key's current row — the lakehouse upsert/merge.

Scale shape: ONE map-side-combinable aggregation. The latest event per
key is `max_by(payload, order)` — partial aggregation keeps one row per
key per task, so the shuffle carries O(distinct keys), never O(events).
This deliberately beats the textbook row_number() window, which must
sort full partitions of raw events. Applying a 100 TB backlog is one
keyed aggregate; applying an incremental batch on top of a snapshot is
the same aggregate over `base ∪ batch` with the snapshot rows ordered
below every event (they lose to any change for their key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cdc_apply"]

_EVENTS = ("row_insert", "row_update", "row_delete")


def cdc_apply(
    events: DataFrame,
    key_cols: list[str],
    *,
    order_cols: list[str] | None = None,
    event_col: str = "_event_",
    payload_cols: list[str] | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """Materialize current state from a canal-shaped change log: for
    each key, the event with the highest `order_cols` wins; a winning
    `row_delete` removes the key. Non-row events (`ddl`, heartbeats —
    OnRowEvent only emits row_* actions) are ignored.

    `base` is an optional initial snapshot with the same key/payload
    columns and NO event/order columns — its rows rank below every log
    event for the same key (a snapshot is, by definition, older than
    the log that follows it).

    Returns key_cols + payload_cols of the latest surviving row per key.
    """
    order_cols = list(order_cols or ["_offset_"])
    if payload_cols is None:
        meta = set(key_cols) | set(order_cols) | {event_col}
        payload_cols = [
            c for c in events.columns
            if c not in meta and not c.startswith("_old_")
        ]

    def ranked(df: DataFrame, live: bool) -> DataFrame:
        # rank struct: (1, order...) for log events, (0, zeros) for the
        # snapshot — struct comparison is lexicographic, so any event
        # outranks the snapshot without faking order values
        rank_fields: list[Column] = [
            (F.lit(1) if live else F.lit(0)).alias("__live")
        ]
        for i, c in enumerate(order_cols):
            rank_fields.append(
                (F.col(c) if live else F.lit(None).cast(events.schema[c].dataType))
                .alias(f"__o{i}")
            )
        keep = (
            F.col(event_col) != "row_delete" if live else F.lit(True)
        )
        return df.select(
            *key_cols,
            F.struct(*rank_fields).alias("__rank"),
            F.struct(
                keep.alias("__keep"),
                *[F.col(c).alias(c) for c in payload_cols],
            ).alias("__row"),
        )

    log = ranked(events.filter(F.col(event_col).isin(*_EVENTS)), live=True)
    union = log if base is None else ranked(base, live=False).unionByName(log)
    latest = union.groupBy(*key_cols).agg(
        F.max_by("__row", "__rank").alias("__row")
    )
    return latest.filter(F.col("__row.__keep")).select(
        *key_cols, *[F.col(f"__row.{c}").alias(c) for c in payload_cols]
    )


class CdcStateTable:
    """Durable materialized state for a CDC stream: each micro-batch
    folds into the committed state via :func:`cdc_apply` and lands as a
    FRESH GENERATION (`gen_N` directory) whose commit-marker flip makes
    it authoritative — the same torn-write-invisible discipline as
    plans/snapshot.py's compaction: a crash mid-write leaves the
    previous generation fully loadable, a crash after the flip leaves
    only orphan files. Batch ordering supplies recency across batches
    (a monotonic binlog: any event outranks the prior state by
    construction), so no order column needs to persist in the state.

    Use with foreachBatch:

        def sink(batch_df, batch_id):
            state.apply_batch(batch_df, batch_id)

    `apply_batch` is idempotent per batch_id — a retried micro-batch
    re-applies onto the same PRIOR generation (the reference's send
    dedup analog; cdc application is idempotent anyway: same events,
    same winners).
    """

    def __init__(
        self,
        spark,
        path: str,
        key_cols: list[str],
        *,
        order_cols: list[str] | None = None,
        payload_cols: list[str] | None = None,
        event_col: str = "_event_",
        keep_generations: int = 2,
    ) -> None:
        from ilogtail_spark.plans.checkpoint import CheckpointTable

        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols or ["_offset_"])
        self.payload_cols = payload_cols
        self.event_col = event_col
        # every batch writes a FULL state copy; without retention a
        # long-running stream accumulates one copy per trigger. Keep
        # the newest `keep_generations` (≥2: current + its predecessor
        # for in-flight readers), GC the rest post-commit.
        self.keep_generations = max(2, int(keep_generations))
        self.ckpt = CheckpointTable(spark, f"{path}/_commits")

    def _meta(self) -> dict | None:
        return self.ckpt.payload("cdc_state", "state")

    def current(self) -> "DataFrame | None":
        meta = self._meta()
        if meta is None:
            return None
        return self.spark.read.parquet(meta["location"])

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        meta = self._meta()
        if meta is not None and int(meta.get("batch_id", -1)) >= int(batch_id):
            return  # replayed micro-batch: already folded in
        base = self.current()
        new_state = cdc_apply(
            batch_df,
            self.key_cols,
            order_cols=self.order_cols,
            payload_cols=self.payload_cols,
            event_col=self.event_col,
            base=base,
        )
        gen = int(meta.get("gen", 0)) + 1 if meta else 1
        location = f"{self.path}/gen_{gen}"
        new_state.write.mode("overwrite").parquet(location)
        self.ckpt.commit(
            "cdc_state", "state",
            {"location": location, "gen": gen, "batch_id": int(batch_id),
             "superseded": (meta or {}).get("location")},
        )
        # post-commit GC — failures here orphan files, never state
        # (the commit already points at the new generation)
        old_gen = gen - self.keep_generations
        if old_gen >= 1:
            jvm = self.spark._jvm
            hconf = self.spark._jsc.hadoopConfiguration()
            op = jvm.org.apache.hadoop.fs.Path(f"{self.path}/gen_{old_gen}")
            fs = op.getFileSystem(hconf)
            if fs.exists(op):
                fs.delete(op, True)
