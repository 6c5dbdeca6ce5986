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
    key: str,
    *,
    iv_hex: str | None = None,
    keep_source_value_if_error: bool = False,
) -> DataFrame:
    """processor_encrypt (plugins/processor/encrypt/processor_encrypt.go:92):
    AES-CBC encrypt listed fields, hex output. Spark's aes_encrypt runs
    JVM-side; a fixed IV (the reference reads key+IV from config) keeps
    output deterministic for tests. Null/error ⇒ empty value unless
    `keep_source_value_if_error` (the reference's flag)."""
    iv = F.unhex(F.lit(iv_hex)) if iv_hex else F.unhex(F.lit("00" * 16))
    cols = {}
    for k in source_keys:
        enc = F.hex(
            F.aes_encrypt(
                F.col(k).cast("binary"), F.lit(key), F.lit("CBC"), F.lit("PKCS"), iv
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
        # newline (Go strconv.Unquote semantics).
        stripped = F.regexp_replace(F.col(source_key), r'^"(.*)"$', "$1")
        sent = "\x00"
        out = F.regexp_replace(stripped, r"\\\\", sent)
        out = F.regexp_replace(out, r'\\"', '"')
        out = F.regexp_replace(out, r"\\n", "\n")
        out = F.regexp_replace(out, r"\\t", "\t")
        out = F.replace(out, F.lit(sent), F.lit("\\"))
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
