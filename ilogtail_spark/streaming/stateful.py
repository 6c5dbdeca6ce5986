"""Custom stateful streaming operators via applyInPandasWithState.

The reference's streaming state (SURVEY.md §2.11) is exactly: multiline
merge buffers (ProcessorMergeMultilineLogNative holds lines until the
next begin-of-record, core/plugin/processor/inner/
ProcessorMergeMultilineLogNative.cpp:83) and rate-limit token buckets.
In batch mode we express both with windows; in continuous mode the merge
buffer is genuinely cross-micro-batch state: a record's first lines may
arrive in batch k and its tail in batch k+1.

`stream_merge_multiline` reproduces the buffer with Spark's
applyInPandasWithState: state per conv_id = the pending (unterminated)
record; each begin-match flushes the previous buffer. Timeout flush
(the reference's TimeoutFlushManager, core/pipeline/batch/
TimeoutFlushManager.cpp) maps to GroupStateTimeout: an idle conversation
flushes its pending record after `timeout_ms`.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MERGED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("record_id", T.LongType()),
        T.StructField("first_line_no", T.IntegerType()),
        T.StructField("merged", T.StringType()),
    ]
)

# state: (next_record_id, pending_first_line_no, pending_lines_joined)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_rid", T.LongType()),
        T.StructField("first_no", T.IntegerType()),
        T.StructField("buf", T.StringType()),
    ]
)


def make_merge_fn(begin_regex: str, sep: str = "\n", timeout_ms: int = 60_000):
    pat = re.compile(begin_regex)

    def merge(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        conv_id = key[0]
        if state.hasTimedOut:
            # idle flush — emit the pending record (TimeoutFlushManager analog)
            if state.exists:
                rid, first_no, buf = state.get
                state.remove()
                if buf is not None:
                    yield pd.DataFrame(
                        {"conv_id": [conv_id], "record_id": [rid],
                         "first_line_no": [first_no], "merged": [buf]}
                    )
            return

        if state.exists:
            rid, first_no, buf = state.get
        else:
            rid, first_no, buf = 0, None, None

        out_rows: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("line_no")
            for line_no, line in zip(pdf["line_no"], pdf["text"]):
                if pat.search(str(line)):
                    if buf is not None:
                        out_rows.append((conv_id, rid, first_no, buf))
                        rid += 1
                    buf, first_no = str(line), int(line_no)
                else:
                    if buf is None:  # orphan before first begin-mark
                        buf, first_no = str(line), int(line_no)
                    else:
                        buf = buf + sep + str(line)
        state.update((rid, first_no, buf))
        state.setTimeoutDuration(timeout_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["conv_id", "record_id", "first_line_no", "merged"]
            )

    return merge


def stream_merge_multiline(
    lines: DataFrame,
    *,
    begin_regex: str,
    sep: str = "\n",
    timeout_ms: int = 60_000,
) -> DataFrame:
    """Streaming multiline merge: `lines` is a streaming DataFrame with
    (conv_id string, line_no int, text string). Emits completed records;
    the still-open record per conversation stays in state until its next
    begin-mark or the idle timeout.

    State partitioning is by conv_id — the same key the batch window
    uses, so the scale story (hot convs → salted upstream repartition)
    carries over; state size is bounded by one pending record per conv.
    """
    return lines.groupBy("conv_id").applyInPandasWithState(
        make_merge_fn(begin_regex, sep, timeout_ms),
        outputStructType=MERGED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
