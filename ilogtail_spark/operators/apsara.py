"""Apsara-format log parsing.

Reimplements ProcessorParseApsaraNative
(core/plugin/processor/ProcessorParseApsaraNative.cpp) declaratively.

Format: a leading run of bracketed base fields separated by tabs, then
tab-separated ``key:value`` pairs::

    [2024-01-01 00:00:05.123456]\t[ERROR]\t[1234]\t[/src/worker.cpp:88]\tk:v\t...

Semantics mirrored from the reference:

  * base field 0 is the time — either epoch seconds (first char ``1``,
    ApsaraEasyReadLogTimeParser:256-273) or ``%Y-%m-%d %H:%M:%S`` with an
    optional fractional part (:274-320); ``microtime`` is seconds*1e6 +
    microseconds (AddLog("microtime", ...), :229);
  * among the remaining base fields, the FIRST all-uppercase field is
    ``__LEVEL__`` (IsFieldLevel:366-373), the first all-digits field is
    ``__THREAD__`` (IsFieldThread:382-389), and the first containing
    ``/`` or ``.`` splits at its first colon into ``__FILE__`` /
    ``__LINE__`` (IsFieldFileLine:398-404, FindColonIndex:413-421) — the
    three predicates are disjoint over non-empty fields, and an EMPTY
    base field is claimed by the level predicate in both implementations
    (IsFieldLevel's loop over an empty range returns true, hence the
    deliberate ``^[A-Z]*$``), so independent first-match scans reproduce
    the reference's claim-in-order bitmap loop
    (ParseApsaraBaseFields:430-460);
  * the remainder parses as tab-separated pairs split at the first colon
    (:200-221), exposed as a ``fields`` map column (or as typed columns
    via ``kv_keys``);
  * a time-parse failure obeys the keep-source-when-parse-fail rule
    (:137-170).

Everything is whole-stage-codegen column expressions — the regexes are
anchored single-pass extracts, the field scan is an array ``filter`` over
at most 10 base fields (MAX_BASE_FIELD_NUM:34).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.operators.parse import _apply_keep_source

_HEAD_RE = r"^(\[[^\]]*\](?:\t\[[^\]]*\])*)"
_DT_RE = r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"


def _first_match(arr: Column, pattern: str) -> Column:
    # F.get is null-safe on empty arrays (ANSI element_at throws)
    return F.get(F.filter(arr, lambda x: x.rlike(pattern)), 0)


def apsara_parse(
    df: DataFrame,
    source_key: str = "text",
    *,
    kv_keys: list[str] | None = None,
    keep_source: bool = False,
    keep_source_if_parse_error: bool = True,
) -> DataFrame:
    """ProcessorParseApsaraNative — see module docstring."""
    from ilogtail_spark.exprutil import pin

    src = F.col(source_key)
    # pin the three shared extraction roots as named columns: every
    # output column's tree references time/head/base (microtime + 4
    # field scans + the kv tail all derive from them), and unpinned,
    # CollapseProject re-inlines each regex extract — and whatever
    # expression synthesized `src` — into every referencing output
    # (guide §4.4; same fix as parse.py / prom.py)
    df = df.withColumns(
        {
            "__ap_time__": pin(F.regexp_extract(src, r"^\[([^\]]*)\]", 1)),
            "__ap_head__": pin(F.regexp_extract(src, _HEAD_RE, 1)),
            "__ap_base__": pin(
                F.regexp_extract_all(src, F.lit(r"\[([^\]]*)\]"), 1)
            ),
        }
    )
    time_str = F.col("__ap_time__")

    is_epoch = time_str.rlike(r"^1[0-9]*$")
    dt_secs = F.unix_timestamp(F.substring(time_str, 1, 19), "yyyy-MM-dd HH:mm:ss")
    seconds = F.when(is_epoch, time_str.cast("long")).otherwise(
        F.when(time_str.rlike(_DT_RE), dt_secs)
    )
    # fractional part → microseconds (Strptime %f scales digit count to ns)
    frac = F.regexp_extract(time_str, r"\.([0-9]+)", 1)
    micros = F.when(
        is_epoch | (frac == ""), F.lit(0)
    ).otherwise(
        (F.rpad(F.substring(frac, 1, 9), 9, "0").cast("long") / 1000).cast("long")
    )
    valid = src.startswith("[") & seconds.isNotNull() & (seconds > 0)
    microtime = (seconds * F.lit(1000000) + micros).cast("long")

    head = F.col("__ap_head__")
    base = F.col("__ap_base__")
    # regexp_extract_all scans the whole line; restrict to the head run's
    # field count so a bracketed token inside the kv tail can't leak in
    n_base = F.size(F.split(head, "\t"))
    tail_fields = F.slice(base, 2, F.greatest(n_base - 1, F.lit(0)))

    level = _first_match(tail_fields, r"^[A-Z]*$")
    thread = _first_match(tail_fields, r"^[0-9]+$")
    fileline = _first_match(tail_fields, r"[/.]")
    file_c = F.substring_index(fileline, ":", 1)
    line_c = F.when(
        fileline.contains(":"),
        F.substring(fileline, F.instr(fileline, ":") + 1, F.lit(2147483647)),
    )

    # kv tail exists only when a tab directly follows the base-field run
    rest = F.when(
        F.substring(src, F.length(head) + 1, F.lit(1)) == "\t",
        F.substring(src, F.length(head) + 2, F.lit(2147483647)),
    )
    # NOT str_to_map: ANSI map building throws DUPLICATED_MAP_KEY on a
    # repeated key, where the reference's AddLog(overwritten=false)
    # keeps the FIRST occurrence (:200-221) — dedup entries first
    segs = F.filter(F.split(rest, "\t"), lambda s: s.contains(":"))
    entries = F.transform(
        segs,
        lambda s: F.struct(
            F.substring_index(s, ":", 1),
            F.substring(s, F.instr(s, ":") + 1, F.lit(2147483647)),
        ),
    ).cast("array<struct<k:string,v:string>>")
    first_wins = F.aggregate(
        entries,
        F.array().cast("array<struct<k:string,v:string>>"),
        lambda acc, e: F.when(
            F.exists(acc, lambda a: a["k"] == e["k"]), acc
        ).otherwise(F.concat(acc, F.array(e))),
    )
    # the kv map is referenced once per requested key — pin it too
    df = df.withColumn("__ap_kv__", pin(F.map_from_entries(first_wins)))
    kv = F.col("__ap_kv__")

    cols: dict[str, Column] = {
        "microtime": F.when(valid, microtime),
        "__LEVEL__": F.when(valid, level),
        "__THREAD__": F.when(valid, thread),
        "__FILE__": F.when(valid, file_c),
        "__LINE__": F.when(valid, line_c),
    }
    if kv_keys is None:
        cols["fields"] = F.when(valid, kv)
    else:
        for k in kv_keys:
            # try_element_at: NULL (not ANSI error) when the key is absent
            cols[k] = F.when(valid, F.try_element_at(kv, F.lit(k)))
    df = df.withColumns(cols)
    df = _apply_keep_source(df, source_key, valid, keep_source, keep_source_if_parse_error)
    return df.drop("__ap_time__", "__ap_head__", "__ap_base__", "__ap_kv__")
