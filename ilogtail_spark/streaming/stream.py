"""Structured Streaming execution of the same pipeline DAG.

The reference's continuous mode is file tailing with checkpointed offsets
(core/plugin/input/InputFile.h:45, file_server/): new bytes appear → the
fixed pipeline processes them → flushers emit. The Spark-first
equivalent: a file-source `readStream` over the transcript directory,
the SAME stage functions (they're engine-agnostic DataFrame transforms),
and a `foreachBatch` multi-sink write with a streaming checkpoint —
offsets-in-checkpoint replaces the reference's per-file offset store, and
`Trigger.AvailableNow` replaces its one-shot historical import
(core/plugin/input/InputStaticFile.cpp).

At cluster scale this is `readStream.format("iceberg")` over snapshot
ranges; the file source is the sandbox stand-in with identical semantics
(exactly-once per batch via the checkpoint + idempotent sink paths).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def stream_transcripts(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over a transcript parquet directory.
    maxFilesPerTrigger is the backpressure knob — the analog of the
    reference's bounded process queues
    (core/pipeline/queue/BoundedProcessQueue.cpp)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_route_counts(
    stream: DataFrame,
    spec: dict[str, Any],
    *,
    window_duration: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed per-sink counts with a watermark.

    The reference handles late data by ingestion-time batching + timeout
    flush (core/pipeline/batch/TimeoutFlushManager.cpp) and discards
    history beyond a threshold (ProcessorParseTimestampNative). The
    Spark-native upgrade: event-time windows + watermark — rows later
    than `watermark` past the max seen event time are dropped, windows
    finalize (and emit, in append mode) once the watermark passes their
    end. State is bounded by (routes × open windows).
    """
    from ilogtail_spark.plans.pipeline import apply_processors, apply_router

    routed = apply_router(
        apply_processors(stream, spec.get("processors", [])), spec.get("router")
    )
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), F.col("route"))
        .agg(F.count(F.lit(1)).alias("log_count"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "route",
            "log_count",
        )
    )


def run_stream_pipeline(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    spec: dict[str, Any],
    *,
    available_now: bool = True,
    timeout_sec: int = 120,
) -> None:
    """Stream → build_pipeline (same spec as batch) → foreachBatch routed
    write. foreachBatch is the reference's FlusherV1.Flush extension point
    (pkg/pipeline/flusher.go:60-66) — per micro-batch, write each sink.
    """
    from ilogtail_spark.plans.pipeline import build_pipeline

    src = stream_transcripts(spark, in_path)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent per-batch sink: rows land under their batch_id
        # partition and a retried micro-batch dynamically OVERWRITES only
        # its own batch_id partitions — replaying after a partial failure
        # cannot duplicate rows (exactly-once = checkpointed offsets +
        # this idempotent write, the analog of the reference's
        # send-queue dedup on pack id).
        routed = build_pipeline(batch_df, spec).withColumn(
            "batch_id", F.lit(batch_id)
        )
        (
            routed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "route")
            .parquet(f"{out_dir}/routed")
        )

    writer = (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", f"{out_dir}/_stream_ckpt")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
