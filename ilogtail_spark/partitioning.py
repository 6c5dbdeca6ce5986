"""Explicit, cores-sized shuffles for row-expanding / CPU-heavy stages.

AQE coalesces exchanges by SHUFFLE BYTES. When the work after a shuffle
is dominated by expressions that expand rows (format synthesis, regex
parse, string_agg reassembly), byte-based coalescing collapses the
stage to a handful of tasks — measured 10x at sf0.1 when the transcripts
window fed the parsers from a single task. Operators whose required
distribution is a key these helpers can name should issue that shuffle
as an explicit hash repartition: the plan keeps exactly one Exchange
(the explicit partitioning satisfies the window/aggregate distribution,
including the subset rule for composite group keys), AQE honors the
explicit partition count, and stage parallelism scales with CORES, not
with the pre-projection byte size. The same rule holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def session_parallelism(df: DataFrame) -> int:
    """max(cores, shuffle.partitions) of the owning session."""
    spark = df.sparkSession
    shuffle = spark.conf.get("spark.sql.shuffle.partitions", "32")
    return max(
        spark.sparkContext.defaultParallelism,
        int(shuffle) if str(shuffle).isdigit() else 32,
    )


def cores_repartition(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition on ``cols`` with an explicit cores-sized count —
    the shuffle the downstream window/aggregate needs anyway, pinned so
    AQE cannot coalesce the following CPU-heavy stage to 1 task."""
    return df.repartition(session_parallelism(df), *cols)


def spread_for_expansion(df: DataFrame, *cols: str) -> DataFrame:
    """Spread a NARROW scan before row-expanding, key-aggregated work
    (shingle explode, 64-permutation MinHash, hyperplane projection) —
    but ONLY when the scan genuinely has fewer splits than the session
    parallelism. `repartition(n, col)` always inserts an Exchange, so an
    unconditional spread is a full-data shuffle at 100 TB where the scan
    already has thousands of splits; the gate makes it a true no-op
    there (no Exchange node at all), while a single-file local fixture
    still fans out to all cores. Callers are the operators whose
    downstream aggregation keys match ``cols`` — the one inserted
    exchange is then reused by the aggregate (ClusteredDistribution is
    satisfied), never wasted. `getNumPartitions()` is plan-time only
    (file-split enumeration), no job runs.
    """
    if df.isStreaming:
        # no split count to inspect mid-stream (`.rdd` throws); the
        # micro-batch source controls parallelism
        return df
    n = session_parallelism(df)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)
