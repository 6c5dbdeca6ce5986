"""Event-time parsing (SURVEY.md §2.3).

The reference sets the event timestamp from a parsed field via C strptime
formats (processor_strptime) or Go layouts (processor_gotime). Spark's
``to_timestamp`` takes Java DateTimeFormatter patterns, so both operators
share a driver-side format converter — compile-once, like the grok
compiler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# C strptime directive → Java DateTimeFormatter pattern
_STRPTIME_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%e": "d",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss",
    "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE",
    "%j": "DDD", "%p": "a", "%z": "xx", "%Z": "zz",
    "%f": "SSSSSS", "%L": "SSS", "%s": "epoch",  # %s handled specially
    "%%": "%",
}

# Go reference-time layout token → Java pattern (longest-first matching)
_GOTIME_TO_JAVA = [
    ("2006", "yyyy"), ("01", "MM"), ("02", "dd"), ("15", "HH"), ("03", "hh"),
    ("04", "mm"), ("05", "ss"), (".000000", ".SSSSSS"), (".000", ".SSS"),
    ("Jan", "MMM"), ("Mon", "EEE"), ("PM", "a"), ("-0700", "xx"),
    ("Z07:00", "XXX"), ("MST", "zz"), ("06", "yy"),
]


def strptime_to_java(fmt: str) -> str:
    """Convert a C strptime format (processor_strptime Format option,
    plugins/processor/strptime/strptime.go:59) to a Java pattern.
    Literal text is passed through; unknown directives raise."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            d = fmt[i : i + 2]
            if d not in _STRPTIME_TO_JAVA:
                raise ValueError(f"unsupported strptime directive {d}")
            out.append(_STRPTIME_TO_JAVA[d])
            i += 2
        else:
            c = fmt[i]
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "".join(out)


def gotime_to_java(layout: str) -> str:
    """Convert a Go reference-time layout (processor_gotime SourceFormat,
    plugins/processor/gotime/processor_gotime.go:34) to a Java pattern."""
    out = layout
    for go, java in _GOTIME_TO_JAVA:
        out = out.replace(go, java)
    return out


def strptime_op(
    df: DataFrame,
    source_key: str,
    fmt: str,
    *,
    dest: str = "ts",
    utc_offset_seconds: int = 0,
    keep_source: bool = True,
    precise_timestamp_key: str | None = None,
) -> DataFrame:
    """processor_strptime (plugins/processor/strptime/strptime.go:59-194):
    parse `source_key` with a strptime format into the event time.
    AdjustUTCOffset → fixed shift; EnablePreciseTimestamp → extra
    microsecond column. Unparseable values yield NULL (try_to_timestamp),
    matching the reference's keep-on-error behavior."""
    if fmt == "%s":
        ts = F.timestamp_seconds(F.col(source_key).try_cast("long"))
    else:
        java_fmt = strptime_to_java(fmt)
        ts = F.try_to_timestamp(F.col(source_key), F.lit(java_fmt))
    if utc_offset_seconds:
        ts = ts + F.make_interval(secs=F.lit(float(utc_offset_seconds)))
    out = df.withColumn(dest, ts)
    if precise_timestamp_key:
        out = out.withColumn(precise_timestamp_key, F.unix_micros(F.col(dest)))
    if not keep_source and source_key != dest:
        out = out.drop(source_key)
    return out


def gotime_op(
    df: DataFrame,
    source_key: str,
    source_layout: str,
    dest_key: str,
    dest_layout: str,
    *,
    source_location: int | None = None,
    dest_location: int | None = None,
) -> DataFrame:
    """processor_gotime (plugins/processor/gotime/processor_gotime.go:34-111):
    parse src with a Go layout and re-format into dest. Numeric modes
    (`seconds`/`milliseconds`/`microseconds`) accepted as layout names,
    mirroring the plugin's special layouts.

    `source_location`/`dest_location` are the reference's
    SourceLocation/DestLocation UTC hour offsets (e.g. 8 = UTC+8):
    parsing in zone UTC+h means the wall-clock string is h hours AHEAD
    of the instant (instant = parsed-as-UTC − h·3600); formatting in
    UTC+h renders instant + h·3600. None = session zone (the reference's
    machineTimeZone sentinel −100 is treated the same). Locations are
    ignored for the numeric timestamp layouts, as in the reference
    (timestampFormat short-circuits location handling)."""
    numeric = {"seconds": F.timestamp_seconds, "milliseconds": F.timestamp_millis,
               "microseconds": F.timestamp_micros}

    def _shift(ts, hours, sign):  # type: ignore[no-untyped-def]
        if hours is None or hours == -100:
            return ts
        return ts + F.make_interval(secs=F.lit(float(sign * hours * 3600)))

    if source_layout in numeric:
        ts = numeric[source_layout](F.col(source_key).try_cast("long"))
    else:
        ts = F.try_to_timestamp(F.col(source_key), F.lit(gotime_to_java(source_layout)))
        ts = _shift(ts, source_location, -1)
    if dest_layout in numeric:
        out = {"seconds": F.unix_seconds, "milliseconds": F.unix_millis,
               "microseconds": F.unix_micros}[dest_layout](ts).cast("string")
    else:
        out = F.date_format(_shift(ts, dest_location, +1), gotime_to_java(dest_layout))
    return df.withColumn(dest_key, out)


def parse_timestamp_native(
    df: DataFrame,
    source_key: str,
    fmt: str,
    *,
    dest: str = "ts",
    history_threshold_ts: str | None = None,
) -> DataFrame:
    """ProcessorParseTimestampNative
    (core/plugin/processor/ProcessorParseTimestampNative.cpp:99): strptime
    parse incl. %f fraction + drop events older than the history threshold
    (the reference's late-data policy — ingestion-time discard, not
    watermarks, SURVEY.md §2.11)."""
    out = strptime_op(df, source_key, fmt, dest=dest)
    if history_threshold_ts is not None:
        out = out.filter(F.col(dest) >= F.to_timestamp(F.lit(history_threshold_ts)))
    return out
