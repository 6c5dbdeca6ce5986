"""Value-transform operators (SURVEY.md §2.2 tail — encode/hash/mask/reshape).

All pure Column expressions: whole-stage codegen, zero Python.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def base64_encode(df: DataFrame, source_key: str, new_key: str) -> DataFrame:
    """processor_base64_encoding
    (plugins/processor/base64/encoding/processor_base64_encoding.go:43).
    Spark's base64 emits MIME line breaks every 76 chars; the reference
    (Go encoding/base64.StdEncoding) does not — strip them."""
    return df.withColumn(
        new_key,
        F.replace(
            F.base64(F.col(source_key).cast("binary")), F.lit("\r\n"), F.lit("")
        ),
    )


def base64_decode(df: DataFrame, source_key: str, new_key: str) -> DataFrame:
    """processor_base64_decoding
    (plugins/processor/base64/decoding/processor_base64_decoding.go:44)."""
    return df.withColumn(new_key, F.unbase64(F.col(source_key)).cast("string"))


def md5_field(df: DataFrame, source_key: str, md5_key: str) -> DataFrame:
    """processor_md5 (plugins/processor/md5/processor_md5.go:44)."""
    return df.withColumn(md5_key, F.md5(F.col(source_key)))


def desensitize(
    df: DataFrame,
    source_key: str,
    *,
    method: str = "const",
    replace_string: str = "********",
    regex_begin: str = "",
    regex_content: str = ".*",
) -> DataFrame:
    """processor_desensitize
    (plugins/processor/desensitize/processor_desensitize.go:45-126) /
    ProcessorDesensitizeNative
    (core/plugin/processor/ProcessorDesensitizeNative.cpp:147).

    method="const": every occurrence of `regex_content` that follows a
    `regex_begin` match is replaced with `replace_string` (all
    occurrences, like the reference's replace-all loop). With empty
    `regex_begin`, the whole-value match is replaced.
    method="md5": the matched secret is replaced by its md5 — per-match
    hashing has no built-in JVM form, so it is documented as the one
    Arrow-path transform (see desensitize_md5_arrow).
    """
    if method != "const":
        raise ValueError("use desensitize_md5_arrow for method='md5'")
    pat = f"({regex_begin})(?:{regex_content})" if regex_begin else f"(?:{regex_content})"
    repl = ("$1" if regex_begin else "") + replace_string
    return df.withColumn(source_key, F.regexp_replace(F.col(source_key), pat, repl))


def desensitize_md5_arrow(
    df: DataFrame, source_key: str, regex_begin: str, regex_content: str
) -> DataFrame:
    """md5-mode desensitize: per-match hashing needs a callable replacement,
    so this is a vectorized pandas UDF (Arrow batches — off the default
    hot path, matching SURVEY.md §7.2's UDF policy)."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    pat = re.compile(f"({regex_begin})({regex_content})")

    @pandas_udf("string")
    def _mask(s):  # type: ignore[no-untyped-def]
        def one(v: str | None) -> str | None:
            if v is None:
                return None
            return pat.sub(
                lambda m: m.group(1) + hashlib.md5(m.group(2).encode()).hexdigest(), v
            )

        return s.map(one)

    return df.withColumn(source_key, _mask(F.col(source_key)))


def encrypt_fields(
    df: DataFrame,
    source_keys: list[str],
    key: str | None = None,
    *,
    key_file_path: str | None = None,
    iv_hex: str | None = None,
    keep_source_value_if_error: bool = False,
) -> DataFrame:
    """processor_encrypt (plugins/processor/encrypt/processor_encrypt.go:92):
    AES-CBC encrypt listed fields, hex output. Spark's aes_encrypt runs
    JVM-side; a fixed IV (the reference reads key+IV from config) keeps
    output deterministic for tests. Null/error ⇒ empty value unless
    `keep_source_value_if_error` (the reference's flag).

    ``key_file_path`` mirrors EncryptionInfo.KeyFilePath
    (processor_encrypt.go:41-53, parseKey:153-182): the file is a JSON
    object whose ``Key`` (hex, required) and ``IV`` (hex, optional)
    fields fill the parameters; like the reference, the material is
    read once at plugin init — here driver-side at plan build, so the
    key bytes travel to executors as plan literals, never re-read on
    the data path. One of ``key`` / ``key_file_path`` is required.

    ``key`` is HEX-ENCODED on both supply paths — parseKey:174 runs
    ``hex.DecodeString(Key)`` unconditionally, whether the Key came
    inline or from the file, so the same hex material yields the same
    ciphertext either way (pinned by the file-vs-inline equality test)."""
    if key is None and key_file_path is None:
        raise ValueError("encrypt_fields requires key or key_file_path")
    if key_file_path is not None:
        import json

        with open(key_file_path) as f:
            params = json.load(f)
        key_hex = params.get("Key", "")
        if not key_hex:
            raise ValueError(f"key file {key_file_path!r} has no 'Key' field")
        if iv_hex is None:
            iv_hex = params.get("IV") or None
    else:
        key_hex = key
    key_col = F.unhex(F.lit(key_hex))
    iv = F.unhex(F.lit(iv_hex)) if iv_hex else F.unhex(F.lit("00" * 16))
    cols = {}
    for k in source_keys:
        enc = F.hex(
            F.aes_encrypt(
                F.col(k).cast("binary"), key_col, F.lit("CBC"), F.lit("PKCS"), iv
            )
        )
        fallback = F.col(k) if keep_source_value_if_error else F.lit("")
        cols[k] = F.when(F.col(k).isNotNull(), enc).otherwise(fallback)
    return df.withColumns(cols)


def string_replace(
    df: DataFrame,
    source_key: str,
    *,
    method: str = "regex",
    match: str = "",
    replace: str = "",
    dest_key: str | None = None,
) -> DataFrame:
    """processor_string_replace
    (plugins/processor/stringreplace/processor_string_replace.go:30-86):
    regex / plain / unquote replacement, optionally into `DestKey`."""
    dest = dest_key or source_key
    if method == "regex":
        out = F.regexp_replace(F.col(source_key), match, replace)
    elif method == "const":
        out = F.replace(F.col(source_key), F.lit(match), F.lit(replace))
    elif method == "unquote":
        # strip one layer of surrounding quotes and unescape \" \\ \n \t.
        # Escaped backslashes are replaced FIRST (via a sentinel) so the
        # backslash they produce is never re-interpreted as starting a new
        # escape — input a\\nb must yield a\nb (backslash + 'n'), not a
        # newline (Go strconv.Unquote semantics). Pre-existing sentinel
        # bytes in the input are escaped first so the sentinel cannot
        # collide with literal NULs in the payload.
        stripped = F.regexp_replace(F.col(source_key), r'^"(.*)"$', "$1")
        nul, esc_nul, esc_bs = "\x00", "\x00z", "\x00b"
        out = F.replace(stripped, F.lit(nul), F.lit(esc_nul))
        out = F.regexp_replace(out, r"\\\\", esc_bs)
        out = F.regexp_replace(out, r'\\"', '"')
        out = F.regexp_replace(out, r"\\n", "\n")
        out = F.regexp_replace(out, r"\\t", "\t")
        out = F.replace(out, F.lit(esc_bs), F.lit("\\"))
        out = F.replace(out, F.lit(esc_nul), F.lit(nul))
    else:
        raise ValueError(f"unknown method {method}")
    return df.withColumn(dest, out)


def pack_json(
    df: DataFrame, source_keys: list[str], dest_key: str, *, keep: bool = True
) -> DataFrame:
    """processor_packjson (plugins/processor/packjson/processor_packjson.go:57):
    pack listed columns into one JSON object column."""
    out = df.withColumn(dest_key, F.to_json(F.struct(*[F.col(k) for k in source_keys])))
    if not keep:
        out = out.drop(*source_keys)
    return out


def otel_trace_reshape(
    df: DataFrame,
    *,
    trace_id: str,
    span_id: str,
    name: str,
    start_ts: str,
    end_ts: str,
    attr_keys: list[str],
) -> DataFrame:
    """processor_otel_trace (plugins/processor/otel/processor_otel_trace.go):
    reshape KV log rows into OTel span shape — pure column projection."""
    return df.select(
        F.col(trace_id).alias("traceId"),
        F.col(span_id).alias("spanId"),
        F.col(name).alias("name"),
        F.unix_micros(F.col(start_ts).cast("timestamp")).alias("startTimeUnixMicro"),
        F.unix_micros(F.col(end_ts).cast("timestamp")).alias("endTimeUnixMicro"),
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in attr_keys]),
            F.array(*[F.coalesce(F.col(k).cast("string"), F.lit("")) for k in attr_keys]),
        ).alias("attributes"),
    )


# --- processor_otel_metric ---------------------------------------------

_OTLP_ATTR = (
    "array<struct<key:string,value:struct<stringValue:string,"
    "intValue:string,doubleValue:double,boolValue:boolean>>>"
)
_OTLP_NUM_DP = (
    f"array<struct<attributes:{_OTLP_ATTR},timeUnixNano:string,"
    "asDouble:double,asInt:string>>"
)
_OTLP_HIST_DP = (
    f"array<struct<attributes:{_OTLP_ATTR},timeUnixNano:string,count:string,"
    "sum:double,min:double,max:double,explicitBounds:array<double>,"
    "bucketCounts:array<string>>>"
)
_OTLP_SUMM_DP = (
    f"array<struct<attributes:{_OTLP_ATTR},timeUnixNano:string,count:string,"
    "sum:double,quantileValues:array<struct<quantile:double,value:double>>>>"
)
OTLP_METRICS_SCHEMA = (
    "resourceMetrics array<struct<"
    f"resource:struct<attributes:{_OTLP_ATTR}>,"
    "scopeMetrics:array<struct<metrics:array<struct<"
    "name:string,"
    f"gauge:struct<dataPoints:{_OTLP_NUM_DP}>,"
    f"sum:struct<dataPoints:{_OTLP_NUM_DP},isMonotonic:boolean>,"
    f"histogram:struct<dataPoints:{_OTLP_HIST_DP}>,"
    f"summary:struct<dataPoints:{_OTLP_SUMM_DP}>"
    ">>>>"
    ">>"
)


_LBL_T = "array<struct<k:string,v:string>>"


def _otlp_attr_strs(attrs: Column) -> Column:
    """attributes → array of (k, v) structs (anyValueToString,
    pkg/protocol/decoder/opentelemetry/otlp_metric_parser.go:26-46)."""
    # struct field aliases inside a lambda don't survive analysis — the
    # positional cast to _LBL_T names the fields (k, v)
    return F.coalesce(
        F.transform(
            attrs,
            lambda a: F.struct(
                a["key"],
                F.coalesce(
                    a["value"]["stringValue"],
                    a["value"]["intValue"],
                    a["value"]["doubleValue"].cast("string"),
                    a["value"]["boolValue"].cast("string"),
                    F.lit(""),
                ),
            ),
        ).cast(_LBL_T),
        F.array().cast(_LBL_T),
    )


def _lbl(key: Column | str, value: Column) -> Column:
    """One extra (k, v) label as a 1-element struct array."""
    k = F.lit(key) if isinstance(key, str) else key
    return F.array(F.struct(k.alias("k"), value.alias("v")))


def _otlp_label_str(*parts: Column) -> Column:
    """Sorted 'k#$#v|k#$#v' serialization (helper MetricLabels.String,
    pkg/helper/log_helper.go:209-228): sorts by KEY (struct sort: k then
    v) — sorting packed strings instead would mis-order keys containing
    characters below '#'."""
    sorted_kv = F.array_sort(F.concat(*parts))
    return F.array_join(
        F.transform(sorted_kv, lambda e: F.concat(e["k"], F.lit("#$#"), e["v"])),
        "|",
    )


def _g_fmt(x: Column) -> Column:
    """Go strconv.FormatFloat(x, 'g', -1, 64) for the practical range:
    fixed-point via a decimal cast (Spark's plain double cast flips to
    scientific notation below 1e-3, e.g. 0.0005 → '5.0E-4'), trailing
    zeros and dot stripped (5.0 → '5', 2.5 → '2.5', 0.0005 → '0.0005').
    Bounds needing >38 digits or <1e-12 precision are out of scope."""
    # decimal(38,12) string form always carries a '.', so stripping
    # trailing zeros then a trailing dot is safe
    fixed = x.cast("decimal(38,12)").cast("string")
    return F.regexp_replace(F.regexp_replace(fixed, r"0+$", ""), r"\.$", "")


def otel_metric_reshape(df: DataFrame, source_key: str = "text",
                        *, id_cols: tuple[str, ...] = ()) -> DataFrame:
    """processor_otel_metric (plugins/processor/otel/processor_otel_metric.go,
    conversion in pkg/protocol/decoder/opentelemetry/otlp_metric_parser.go):
    explode an OTLP-JSON metrics payload into SLS metric rows
    (__name__/__labels__/__time_nano__/__value__).

    Supported: gauge, sum (+ otlp.metric.ismonotonic label), histogram
    (_sum/_min/_max when ≠0, _count, cumulative _bucket rows with le
    labels incl. +Inf), summary (_sum/_count + quantile rows). Exemplars
    and exponential histograms are out of the subset (like the reference's
    own tests).

    SINGLE PASS: the per-metric output rows are built as one array of
    structs (higher-order functions) and exploded once — a union of
    per-kind branches would re-scan and re-parse the JSON once per branch,
    which at 100 TB is ~9 full passes. No Python on the data path.
    """
    ids = [F.col(c) for c in id_cols]
    base = (
        df.select(
            *ids,
            F.explode(
                F.from_json(F.col(source_key), OTLP_METRICS_SCHEMA)["resourceMetrics"]
            ).alias("rm"),
        )
        .select(
            *ids,
            _otlp_attr_strs(F.col("rm.resource.attributes")).alias("rl"),
            F.explode("rm.scopeMetrics").alias("sm"),
        )
        .select(*ids, "rl", F.explode("sm.metrics").alias("m"))
    )
    mn, rl = F.col("m.name"), F.col("rl")

    def row(name: Column, labels: Column, tn: Column, value: Column) -> Column:
        return F.struct(
            name.alias("n"), labels.alias("l"),
            tn.cast("long").alias("t"), value.cast("double").alias("v"),
        )

    empty = F.array().cast("array<struct<n:string,l:string,t:bigint,v:double>>")

    def cond_rows(cond: Column, *args: Column) -> Column:
        return F.when(cond, F.array(row(*args))).otherwise(empty)

    def dp_labels(dp, extra: Column | None = None) -> Column:
        parts = [rl, _otlp_attr_strs(dp["attributes"])]
        if extra is not None:
            parts.append(extra)
        return _otlp_label_str(*parts)

    # gauge / sum — one row per number data point (gauge2Logs / sum2Logs)
    def num_rows(kind: str) -> Column:
        extra = None
        if kind == "sum":
            extra = _lbl(
                "otlp.metric.ismonotonic",
                F.coalesce(F.col("m.sum.isMonotonic"), F.lit(False)).cast("string"),
            )
        return F.coalesce(
            F.transform(
                F.col(f"m.{kind}.dataPoints"),
                lambda dp: row(
                    mn, dp_labels(dp, extra), dp["timeUnixNano"],
                    F.coalesce(dp["asDouble"], dp["asInt"].cast("double")),
                ),
            ),
            empty,
        )

    # histogram (histogram2Logs): _sum/_min/_max when ≠0, _count, then
    # CUMULATIVE per-bucket counts labeled le=<bound> with a final +Inf
    def hist_rows() -> Column:
        def per_dp(dp):
            labels = dp_labels(dp)
            tn = dp["timeUnixNano"]
            bounds = F.concat(
                F.coalesce(F.transform(dp["explicitBounds"], _g_fmt),
                           F.array().cast("array<string>")),
                F.array(F.lit("+Inf")),
            )
            nb = F.least(F.size(bounds), F.size(dp["bucketCounts"]))
            buckets = F.when(nb > 0, F.transform(
                F.sequence(F.lit(1), nb),
                lambda j: row(
                    F.concat(mn, F.lit("_bucket")),
                    dp_labels(dp, _lbl("le", F.element_at(bounds, j))),
                    tn,
                    F.aggregate(
                        F.slice(dp["bucketCounts"], F.lit(1), j), F.lit(0.0),
                        lambda acc, x: acc + x.cast("double"),
                    ),
                ),
            )).otherwise(empty)
            return F.concat(
                cond_rows(dp["sum"].isNotNull() & (dp["sum"] != 0),
                          F.concat(mn, F.lit("_sum")), labels, tn, dp["sum"]),
                cond_rows(dp["min"].isNotNull() & (dp["min"] != 0),
                          F.concat(mn, F.lit("_min")), labels, tn, dp["min"]),
                cond_rows(dp["max"].isNotNull() & (dp["max"] != 0),
                          F.concat(mn, F.lit("_max")), labels, tn, dp["max"]),
                F.array(row(F.concat(mn, F.lit("_count")), labels, tn,
                            dp["count"].cast("double"))),
                buckets,
            )

        return F.coalesce(
            F.flatten(F.transform(F.col("m.histogram.dataPoints"), per_dp)), empty
        )

    # summary (summary2Logs): _sum, _count, then per-quantile rows
    def summ_rows() -> Column:
        def per_dp(dp):
            labels = dp_labels(dp)
            tn = dp["timeUnixNano"]
            quantiles = F.coalesce(
                F.transform(
                    dp["quantileValues"],
                    lambda q: row(
                        mn,
                        dp_labels(dp, _lbl("quantile", _g_fmt(q["quantile"]))),
                        tn, q["value"],
                    ),
                ),
                empty,
            )
            return F.concat(
                F.array(
                    row(F.concat(mn, F.lit("_sum")), labels, tn, dp["sum"]),
                    row(F.concat(mn, F.lit("_count")), labels, tn,
                        dp["count"].cast("double")),
                ),
                quantiles,
            )

        return F.coalesce(
            F.flatten(F.transform(F.col("m.summary.dataPoints"), per_dp)), empty
        )

    all_rows = F.concat(num_rows("gauge"), num_rows("sum"), hist_rows(), summ_rows())
    return base.select(*ids, F.explode(all_rows).alias("r")).select(
        *ids,
        F.col("r.n").alias("__name__"),
        F.col("r.l").alias("__labels__"),
        F.col("r.t").alias("__time_nano__"),
        F.col("r.v").alias("__value__"),
    )


def log_to_metric(
    df: DataFrame,
    metric_name: str,
    value_key: str,
    label_keys: list[str],
    *,
    time_col: str = "ts",
) -> DataFrame:
    """processor_log_to_sls_metric
    (plugins/processor/logtoslsmetric/processor_log_to_sls_metric.go:171):
    reshape log rows into metric shape — `__labels__` is the sorted
    label_key#$#value list joined by '|', `__value__` numeric,
    `__time_nano__` from the event time. Rows with non-numeric values or
    invalid label charset are dropped (the reference's validation)."""
    pairs = sorted(label_keys)
    labels = F.concat_ws(
        "|", *[F.concat_ws("#$#", F.lit(k), F.coalesce(F.col(k), F.lit(""))) for k in pairs]
    )
    value = F.col(value_key).try_cast("double")
    valid = value.isNotNull()
    for k in pairs:
        valid = valid & (~F.coalesce(F.col(k), F.lit("")).rlike(r"[|#$]"))
    return (
        df.filter(valid)
        .select(
            F.lit(metric_name).alias("__name__"),
            labels.alias("__labels__"),
            value.alias("__value__"),
            (F.unix_micros(F.col(time_col).cast("timestamp")) * 1000).alias(
                "__time_nano__"
            ),
        )
    )


def log_to_metric_dynamic(
    df: DataFrame,
    metric_values: dict[str, str],
    label_keys: list[str],
    *,
    custom_labels: dict[str, str] | None = None,
    time_col: str = "ts",
) -> DataFrame:
    """processor_log_to_sls_metric with the reference's FULL MetricValues
    semantics (processor_log_to_sls_metric.go:34,310): each entry maps a
    NAME-FIELD key to a VALUE-FIELD key — the metric name is read from
    the row (dynamic), and one metric row is emitted per entry.

    Multiple entries compile to ONE array-of-structs + explode (single
    scan, no per-entry union re-scan — the same shape otel_metric uses).
    Validation mirrors the reference: the name must match
    ^[a-zA-Z_:][a-zA-Z0-9_:]*$, the value must be numeric, labels must
    not contain | # $; failing rows are dropped. CustomMetricLabels are
    constant labels merged into the sorted label string."""
    lbls = {k: F.coalesce(F.col(k), F.lit("")) for k in label_keys}
    for k, v in (custom_labels or {}).items():
        lbls[k] = F.lit(v)
    labels = F.concat_ws(
        "|", *[F.concat_ws("#$#", F.lit(k), lbls[k]) for k in sorted(lbls)]
    )
    valid = F.lit(True)
    for k in label_keys:
        valid = valid & (~F.coalesce(F.col(k), F.lit("")).rlike(r"[|#$]"))
    pairs = F.array(
        *[
            F.struct(
                F.col(name_key).alias("n"),
                F.col(value_key).try_cast("double").alias("v"),
            )
            for name_key, value_key in metric_values.items()
        ]
    )
    exploded = df.filter(valid).select(
        F.explode(pairs).alias("__m__"),
        labels.alias("__labels__"),
        (F.unix_micros(F.col(time_col).cast("timestamp")) * 1000).alias("__time_nano__"),
    )
    return exploded.filter(
        F.col("__m__.n").rlike(r"^[a-zA-Z_:][a-zA-Z0-9_:]*$")
        & F.col("__m__.v").isNotNull()
    ).select(
        F.col("__m__.n").alias("__name__"),
        "__labels__",
        F.col("__m__.v").alias("__value__"),
        "__time_nano__",
    )
