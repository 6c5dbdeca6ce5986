"""Multiline merge — the row-generating/merging pair (SURVEY.md §2.2).

The reference accumulates lines until the next begin-of-record regex
(processor_split_log_regex, ProcessorMergeMultilineLogNative). The
distributed equivalent is sessionization: a running sum of begin-marks
within each source partition assigns a record id, then records reassemble
with an order-preserving aggregation.

Scale note: the window partitions by the source key (conv_id), so a
single conversation's lines land in one task — fine while conversations
are bounded (they are: turns per conv ≪ partition size); the hot-conv
salting path in plans/pipeline.py handles the pathological case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_multiline(
    df: DataFrame,
    *,
    line_col: str = "line",
    partition_col: str = "conv_id",
    order_col: str = "line_no",
    begin_regex: str,
    record_col: str = "record_id",
    merged_col: str = "merged",
    sep: str = "\n",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """processor_split_log_regex
    (plugins/processor/split/logregex/split_log_regex.go:27-35) /
    ProcessorMergeMultilineLogNative MergeType::BY_REGEX
    (core/plugin/processor/inner/ProcessorMergeMultilineLogNative.cpp:83).

    A line matching `begin_regex` starts a new record; following
    non-matching lines are appended. Orphan lines before the first begin
    mark form record 0 (the reference emits them unmerged on flush).

    Output: one row per (partition, record) with the merged text and the
    record's first line_no — deterministic because the concat order is
    forced by sorting the collected (line_no, line) structs, never by
    arrival order (collect_list alone is NOT order-stable in Spark).
    `carry_cols` ride along as the record's FIRST line's values (the
    reference keeps the first event's metadata on the merged event) —
    min_by inside the same aggregation, no extra shuffle.
    """
    from ilogtail_spark.partitioning import cores_repartition

    is_begin = F.col(line_col).rlike(begin_regex).cast("int")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # explicit cores-sized shuffle: the window + string reassembly after
    # it are CPU-heavy, and AQE's byte-based coalescing otherwise folds
    # this stage to 1 task (see ilogtail_spark/partitioning.py)
    with_rec = cores_repartition(df, partition_col).withColumn(
        record_col, F.sum(is_begin).over(w)
    )
    merged = (
        with_rec.groupBy(partition_col, record_col)
        .agg(
            F.min(order_col).alias("first_line_no"),
            *[
                F.min_by(c, F.col(order_col)).alias(c)
                for c in carry_cols
            ],
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(line_col).alias("l")))
            ).alias("__lines__"),
        )
        .withColumn(
            merged_col,
            F.array_join(F.transform(F.col("__lines__"), lambda x: x["l"]), sep),
        )
        .drop("__lines__")
    )
    return merged
