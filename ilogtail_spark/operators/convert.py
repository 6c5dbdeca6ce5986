"""Output converters: influxdb line protocol and OTLP v1 log records.

Reimplements the reference's flusher-side converter protocols
(pkg/protocol/converter/converter.go:29-34) that were not yet covered:

  * ``influxdb_line`` — pkg/protocol/converter/influxdb_metric.go:32-86
    (ConvertToInfluxdbProtocolStream over SLS metric rows, reader
    semantics in pkg/protocol/converter/converter_sls_metric.go:55-235);
  * ``otlp_log_records`` — pkg/protocol/converter/otlp.go:43-103
    (ConvertToOtlpResourseLogs): per-row OTLP LogRecord shape with
    contents+tags as string attributes, ``content`` → body, ``level`` →
    severityText, second-resolution timestamp in nanos.

Both are single-pass column projections (no shuffle, no Python): a
converter at 100 TB is a map stage fused into the sink write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.operators.transform import _g_fmt

_LBL_T = "array<struct<k:string,v:string>>"


def _esc(col: Column, chars: str) -> Column:
    """Line-protocol escaping: backslash-prefix each char in ``chars``
    (lineprotocol encoder; measurement escapes ', ' — tags also '=')."""
    return F.regexp_replace(col, f"([{chars}])", r"\\$1")


def influxdb_line(
    df: DataFrame,
    *,
    name_col: str = "__name__",
    labels_col: str = "__labels__",
    value_col: str = "__value__",
    time_col: str = "__time_nano__",
    field_col: str | None = None,
) -> DataFrame:
    """SLS metric rows → one influxdb line-protocol string per row.

    Mirrors ConvertToInfluxdbProtocolStream (influxdb_metric.go:32-86):

      * metric/field naming: no field (or field == 'value') emits
        ``name value=...``; a field name strips the ``:field`` suffix
        from the metric name and emits ``name field=...``
        (metricReader.readNames, converter_sls_metric.go:93-99);
      * ``__labels__`` ('k#$#v|...') is parsed and re-sorted by key
        (readSortedLabels:101-160; values containing '|' are out of
        this port's subset — the reference's resegmentation loop);
      * float values use Go shortest-form 'g' formatting;
      * a NULL/absent ``__time_nano__`` omits the timestamp, like the
        zero time.Time from readTimestamp:185-193.

    Appends a ``line`` string column.
    """
    name, labels = F.col(name_col), F.col(labels_col)
    value = F.col(value_col).cast("double")
    tnano = F.col(time_col) if time_col in df.columns else F.lit(None).cast("long")

    if field_col is not None:
        fld = F.coalesce(F.col(field_col), F.lit(""))
        field_name = F.when(fld == "", F.lit("value")).otherwise(fld)
        meas_raw = F.when(
            (fld == "") | (fld == "value"), name
        ).otherwise(
            # strings.TrimSuffix(name, ":"+fieldName)
            F.when(
                name.endswith(F.concat(F.lit(":"), fld)),
                F.expr(
                    f"substring({name_col}, 1, "
                    f"length({name_col}) - length({field_col}) - 1)"
                ),
            ).otherwise(name)
        )
    else:
        field_name = F.lit("value")
        meas_raw = name

    entries = F.transform(
        F.split(labels, r"\|"),
        lambda s: F.struct(
            F.substring_index(s, "#$#", 1),
            F.substring(s, F.instr(s, "#$#") + 3, F.lit(2147483647)),
        ),
    ).cast(_LBL_T)
    sorted_entries = F.array_sort(
        F.filter(entries, lambda e: e["k"] != "")
    )
    tag_part = F.array_join(
        F.transform(
            sorted_entries,
            lambda e: F.concat(_esc(e["k"], ",= "), F.lit("="), _esc(e["v"], ",= ")),
        ),
        ",",
    )

    line = F.concat(
        _esc(meas_raw, ", "),
        F.when(tag_part == "", F.lit("")).otherwise(F.concat(F.lit(","), tag_part)),
        F.lit(" "),
        _esc(field_name, ",= "),
        F.lit("="),
        _g_fmt(value),
        F.coalesce(F.concat(F.lit(" "), tnano.cast("string")), F.lit("")),
    )
    return df.withColumn("line", line)


def otlp_log_records(
    df: DataFrame,
    *,
    body_key: str = "content",
    level_key: str | None = "level",
    attr_cols: tuple[str, ...] = (),
    time_col: str = "ts",
    nano_col: str | None = None,
) -> DataFrame:
    """Log rows → OTLP v1 LogRecord columns
    (ConvertToOtlpResourseLogs, otlp.go:43-103).

    Per record: every content key except body/level plus the group tags
    becomes a string attribute (:75-82), the timestamp is
    seconds * 1e9 (+ nanos when EnableTimestampNanosecond, :85-89),
    ``content`` maps to body (:92) and ``level`` to severityText
    (:94-97). Attributes are emitted as a key-sorted
    array<struct<key, value:struct<stringValue>>> — the deterministic
    column form of the OTLP attribute list; wrap with
    ``F.to_json(F.struct(...))`` for the wire shape.
    """
    secs = F.col(time_col).cast("timestamp")
    tnano = F.unix_seconds(secs) * F.lit(1_000_000_000)
    if nano_col is not None:
        tnano = tnano + F.col(nano_col).cast("long")

    attr_entries = F.array_sort(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("key"),
                    F.struct(
                        F.coalesce(F.col(k).cast("string"), F.lit("")).alias(
                            "stringValue"
                        )
                    ).alias("value"),
                )
                for k in sorted(attr_cols)
            ]
        )
    )
    out = {
        "timeUnixNano": tnano.cast("long"),
        "body": F.col(body_key),
        "attributes": attr_entries,
    }
    if level_key is not None:
        out["severityText"] = F.coalesce(F.col(level_key), F.lit(""))
    return df.withColumns(out)
