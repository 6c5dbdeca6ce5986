"""Container stdout/stderr log parsing.

Reimplements ProcessorParseContainerLogNative
(core/plugin/processor/inner/ProcessorParseContainerLogNative.cpp) as
declarative column transforms:

  * containerd text format — ``<time> <stream> [P|F ]<content>``
    (ParseContainerdTextLogLine, :180-263): split at the first two space
    delimiters; `stream` must be stdout/stderr; a single ``P``/``F`` tag
    character followed by exactly one space marks a partial / full line
    (the P flag is what ProcessorMergeMultilineLogNative's flag mode
    merges on); a malformed tag region (e.g. ``PP 1`` or a trailing
    lone ``P``) is treated as plain content (:241-250).
  * docker json-file format — ``{"log": ..., "stream": ..., "time": ...}``
    (ParseDockerJsonLogLine, :463-525): stream must be stdout/stderr and
    exactly ONE trailing newline is stripped from the log payload
    (:517-519).

Output columns use the reference's key names: ``_time_``, ``_source_``,
``content`` (containerTimeKey/containerSourceKey/containerLogKey,
:46-48) plus a boolean ``is_partial`` (the columnar form of the
``P`` PartLogFlag content key).

Scale notes: both formats are pure whole-stage-codegen expressions
(`instr`/`substring` for containerd — no regex on the hot path;
`from_json` for docker). The partial-line merge is the same
window-sessionization as multiline.py — one shuffle on the source
partition key, which at 100 TB is the file/container id, bounded per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ilogtail_spark.operators.parse import _apply_keep_source

_STREAMS = ("stdout", "stderr")


def _finish(
    df: DataFrame,
    source_key: str,
    valid: Column,
    time_c: Column,
    stream_c: Column,
    content_c: Column,
    partial_c: Column,
    ignoring_stdout: bool,
    ignoring_stderr: bool,
    keep_source: bool,
    keep_source_if_parse_error: bool,
) -> DataFrame:
    # Materialize every derived expression BEFORE touching the source
    # column: `valid`/`time_c`/... are unresolved expressions over
    # F.col(source_key), so overwriting that column first would silently
    # re-evaluate them against the PARSED value — with the adapter's
    # default source_key='content' that made IgnoringStdout/Stderr
    # no-ops (valid re-read 'noise' instead of the raw frame).
    df = df.withColumns(
        {
            "__cvalid__": valid,
            "__ctime__": time_c,
            "__cstream__": stream_c,
            "__ccontent__": content_c,
            "__cpartial__": partial_c,
        }
    )
    v = F.col("__cvalid__")
    df = df.withColumns(
        {
            "_time_": F.when(v, F.col("__ctime__")),
            "_source_": F.when(v, F.col("__cstream__")),
            "is_partial": F.when(v, F.col("__cpartial__")).otherwise(F.lit(False)),
        }
    )
    # IgnoringStdout / IgnoringStderr drop the event entirely
    # (ProcessorParseContainerLogNative.cpp:219-228); invalid rows obey the
    # keep-source-when-parse-fail rule instead.
    if ignoring_stdout:
        df = df.filter(~(v & (F.col("_source_") == "stdout")))
    if ignoring_stderr:
        df = df.filter(~(v & (F.col("_source_") == "stderr")))
    if source_key == "content":
        # the parsed content replaces the raw frame in place; a parse
        # failure keeps the raw frame (the native processor returns the
        # event untouched) unless keep_source_if_parse_error is off
        fail = (
            F.col("content")
            if keep_source_if_parse_error
            else F.lit(None).cast("string")
        )
        df = df.withColumn("content", F.when(v, F.col("__ccontent__")).otherwise(fail))
    else:
        df = df.withColumn("content", F.when(v, F.col("__ccontent__")))
        df = _apply_keep_source(
            df, source_key, v, keep_source, keep_source_if_parse_error
        )
    return df.drop("__cvalid__", "__ctime__", "__cstream__", "__ccontent__", "__cpartial__")


def container_log_parse(
    df: DataFrame,
    source_key: str = "text",
    *,
    fmt: str = "containerd_text",
    ignoring_stdout: bool = False,
    ignoring_stderr: bool = False,
    keep_source: bool = False,
    keep_source_if_parse_error: bool = True,
) -> DataFrame:
    """ProcessorParseContainerLogNative — see module docstring."""
    src = F.col(source_key)
    if fmt == "containerd_text":
        # positions of the first two space delimiters (:187-206)
        p1 = F.instr(src, " ")
        after1 = F.substring(src, p1 + 1, 2147483647)
        p2_rel = F.instr(after1, " ")
        time_c = F.substring(src, 1, p1 - 1)
        stream_c = F.substring(after1, 1, p2_rel - 1)
        rest = F.substring(after1, p2_rel + 1, 2147483647)
        valid = (p1 > 0) & (p2_rel > 0) & stream_c.isin(*_STREAMS)
        c1 = F.substring(rest, 1, 1)
        c2 = F.substring(rest, 2, 1)
        tagged = c1.isin("P", "F") & (c2 == " ")
        content_c = F.when(tagged, F.substring(rest, 3, 2147483647)).otherwise(rest)
        partial_c = tagged & (c1 == "P")
        return _finish(
            df, source_key, valid, time_c, stream_c, content_c, partial_c,
            ignoring_stdout, ignoring_stderr, keep_source, keep_source_if_parse_error,
        )

    if fmt == "docker_json":
        j = F.from_json(src, "log string, stream string, time string")
        valid = j.isNotNull() & j["log"].isNotNull() & j["stream"].isin(*_STREAMS)
        log = j["log"]
        # strip exactly ONE trailing newline (:517-519)
        content_c = F.when(
            log.endswith("\n"), log.substr(F.lit(1), F.length(log) - 1)
        ).otherwise(log)
        return _finish(
            df, source_key, valid, j["time"], j["stream"], content_c, F.lit(False),
            ignoring_stdout, ignoring_stderr, keep_source, keep_source_if_parse_error,
        )

    raise ValueError(f"unknown container log format: {fmt!r}")


def merge_partial_logs(
    df: DataFrame,
    *,
    partition_col: str = "conv_id",
    order_col: str = "turn_idx",
    content_col: str = "content",
    partial_col: str = "is_partial",
    merged_col: str = "content",
) -> DataFrame:
    """ProcessorMergeMultilineLogNative flag mode
    (core/plugin/processor/inner/ProcessorMergeMultilineLogNative.cpp:31,
    MergeType::BY_FLAG): consecutive partial (``P``) parts merge with the
    next full line into one record; parts are raw segments of a single
    line so they concatenate with NO separator.

    A record ENDS at each non-partial row, so a row's record id is the
    count of non-partial rows strictly before it within the partition.
    """
    from ilogtail_spark.partitioning import cores_repartition

    w_prev = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end_mark = (~F.col(partial_col)).cast("int")
    # explicit cores-sized shuffle — the window and the groupBy below
    # both cluster on partition_col (subset rule covers the composite
    # group key), so this stays the stage's ONLY exchange while keeping
    # the reassembly parallel (see ilogtail_spark/partitioning.py)
    with_rec = cores_repartition(df, partition_col).withColumn(
        "record_id", F.coalesce(F.sum(end_mark).over(w_prev), F.lit(0))
    )
    return (
        with_rec.groupBy(partition_col, "record_id")
        .agg(
            F.min(order_col).alias("first_line_no"),
            F.min_by("_time_", F.col(order_col)).alias("_time_"),
            F.min_by("_source_", F.col(order_col)).alias("_source_"),
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(order_col).alias("o"), F.col(content_col).alias("c"))
                )
            ).alias("__parts__"),
            # a record whose LAST part is still partial was never closed
            # (flush-on-rotate in the reference); surface that
            F.max_by(partial_col, F.col(order_col)).alias("is_partial"),
        )
        .withColumn(
            merged_col,
            F.array_join(F.transform(F.col("__parts__"), lambda x: x["c"]), ""),
        )
        .drop("__parts__")
    )
