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


# ---------------------------------------------------------------------
# custom_single_flatten (pkg/protocol/converter/
# converter_single_log_flatten.go:23-60) + the tag/content model of
# convertLogToMap (converter.go:230-281)
# ---------------------------------------------------------------------

TAG_PREFIX = "__tag__:"

# tagConversionMap (converter.go:79-92) — well-known tag renames
TAG_CONVERSION: dict[str, str] = {
    "__path__": "log.file.path",
    "__hostname__": "host.name",
    "_node_ip_": "k8s.node.ip",
    "_node_name_": "k8s.node.name",
    "_namespace_": "k8s.namespace.name",
    "_pod_name_": "k8s.pod.name",
    "_pod_ip_": "k8s.pod.ip",
    "_pod_uid_": "k8s.pod.uid",
    "_container_name_": "container.name",
    "_container_ip_": "container.ip",
    "_image_name_": "container.image.name",
}

# specialTagConversionMap (converter.go:94-98) — K8sFlag overrides
K8S_TAG_CONVERSION: dict[str, str] = {
    "_container_name_": "k8s.container.name",
    "_container_ip_": "k8s.container.ip",
    "_image_name_": "k8s.container.image.name",
}

_ENT_T = "array<struct<key:string,value:string>>"


def _rename_tag(name: str, rename: dict[str, str]) -> str | None:
    """addTagIfRequired (converter.go:309-315): rename-map hit with a
    non-empty target renames; a hit with an EMPTY target deletes the
    tag; a miss keeps the name. None = deleted."""
    if name in rename:
        return rename[name] or None
    return name


def _convert_tag(name: str, k8s: bool) -> str:
    if k8s and name in K8S_TAG_CONVERSION:
        return K8S_TAG_CONVERSION[name]
    return TAG_CONVERSION.get(name, name)


def _split_contents_tags(
    contents_col: str,
    *,
    group_tags: dict[str, str] | None,
    source_col: str | None,
    topic_col: str | None,
    rename: dict[str, str],
    k8s: bool,
) -> tuple[Column, Column]:
    """convertLogToMap (converter.go:230-281) as two entry arrays:
    (content entries, tag entries in add order). Shared by the flatten
    and nested custom_single converters."""
    conv_keys = sorted(TAG_CONVERSION)
    ent = F.map_entries(F.col(contents_col)).cast(_ENT_T)

    def is_tag_key(k: Column) -> Column:
        out = (k == "__log_topic__") | k.startswith(TAG_PREFIX)
        for c in conv_keys:
            out = out | (k == c)
        return out

    c_ent = F.filter(ent, lambda e: ~is_tag_key(e["key"]))

    def tag_name_for(k: Column) -> Column:
        """Final tag name for a tag-like content key (conversion +
        rename applied at plan time over the STATIC candidate names);
        NULL for deleted/skipped keys. Dynamic ``__tag__:`` suffixes
        outside the static tables fall through to suffix-then-rename,
        which is total for any rename map given at plan build."""
        suffix = F.substring(k, len(TAG_PREFIX) + 1, 2147483647)
        name = F.when(k == "__log_topic__", F.lit("log.topic"))
        for src in conv_keys:
            tgt = _convert_tag(src, k8s)
            name = name.when(k == F.lit(TAG_PREFIX + src), F.lit(tgt)).when(
                k == F.lit(src), F.lit(tgt)
            )
        name = name.otherwise(suffix)
        out = name
        for src, tgt in sorted(rename.items()):
            out = F.when(name == src, F.lit(tgt or None)).otherwise(out)
        return out

    t_ent = F.transform(
        F.filter(
            ent,
            lambda e: is_tag_key(e["key"])
            & (e["key"] != TAG_PREFIX + "__user_defined_id__"),
        ),
        lambda e: F.struct(
            tag_name_for(e["key"]).alias("key"), e["value"].alias("value")
        ),
    ).cast(_ENT_T)
    t_ent = F.filter(t_ent, lambda e: e["key"].isNotNull())

    extra: list[Column] = []
    for k, v in (group_tags or {}).items():
        if k in ("__user_defined_id__", "__pack_id__"):
            continue
        name = _rename_tag(_convert_tag(k, k8s), rename)
        if name is not None:
            extra.append(F.struct(F.lit(name).alias("key"), F.lit(v).alias("value")))
    if source_col is not None:
        name = _rename_tag("host.ip", rename)
        if name is not None:
            extra.append(
                F.struct(F.lit(name).alias("key"), F.col(source_col).alias("value"))
            )
    if topic_col is not None:
        name = _rename_tag("log.topic", rename)
        if name is not None:
            extra.append(
                F.struct(F.lit(name).alias("key"), F.col(topic_col).alias("value"))
            )
    if extra:
        t_ent = F.concat(t_ent, F.array(*extra).cast(_ENT_T))
    return c_ent, t_ent


def _dedup_last_wins(ent: Column) -> Column:
    """Deduplicate an entry array keeping the LAST value per key (Go map
    insertion semantics): walk reversed, keep first sighting."""
    rev = F.aggregate(
        F.reverse(ent),
        F.array().cast(_ENT_T),
        lambda acc, e: F.when(
            F.exists(acc, lambda x: x["key"] == e["key"]), acc
        ).otherwise(F.array_append(acc, e)),
    )
    return F.reverse(rev).cast(_ENT_T)


def _pairs_fragments(ent: Column) -> Column:
    """Render entries as escaped ``"k":"v"`` JSON fragments, paired with
    their key for sorting (Go's json.Marshal emits sorted map keys)."""
    frag_t = "array<struct<key:string,frag:string>>"
    return F.transform(
        ent,
        lambda e: F.struct(
            e["key"].alias("key"),
            F.substring(
                j := F.to_json(F.create_map(e["key"], e["value"])),
                2,
                F.length(j) - 2,
            ).alias("frag"),
        ),
    ).cast(frag_t)


_FRAG_T = "array<struct<key:string,frag:string>>"


def _json_object(frags: Column) -> Column:
    """Assemble pre-rendered fragments into a key-sorted JSON object."""
    return F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(F.array_sort(frags.cast(_FRAG_T)), lambda x: x["frag"]), ","
        ),
        F.lit("}"),
    )


def custom_single_flatten(
    df: DataFrame,
    contents_col: str = "fields",
    time_col: str = "log_time",
    *,
    group_tags: dict[str, str] | None = None,
    source_col: str | None = None,
    topic_col: str | None = None,
    tag_key_rename: dict[str, str] | None = None,
    protocol_key_rename: dict[str, str] | None = None,
    only_contents: bool = False,
    k8s: bool = False,
) -> DataFrame:
    """ConvertToSingleProtocolLogsFlatten
    (converter_single_log_flatten.go:23-60): flatten per-log contents
    and group tags into ONE key space and serialize as a JSON line.

    Faithful to the reference's precedence chain:

      * content keys are re-classified as tags when they carry the
        ``__tag__:`` prefix, equal ``__log_topic__``, or appear in the
        well-known tagConversionMap (convertLogToMap:230-263);
        ``__tag__:__user_defined_id__`` is dropped;
      * the K8s flag swaps in specialTagConversionMap names (:242-250);
      * tagKeyRenameMap renames tags — an EMPTY rename target deletes
        the tag (addTagIfRequired:309-315);
      * group LogTags (minus ``__user_defined_id__``/``__pack_id__``),
        then ``host.ip`` (= Source), then ``log.topic`` (= Topic) are
        added after content-derived tags — later adds win (:265-279);
      * flatten = contents then tags (tags win on collision) + the
        ``time`` protocol key, renamable via protocolKeyRenameMap
        (:39-56); OnlyContents drops the tag side;
      * the JSON object is key-sorted with a NUMERIC time value —
        byte-compatible with Go's map marshaling.

    Ordering note: the reference's Contents is an ORDERED slice; here it
    is a map column, and when two DIFFERENT content keys produce the
    SAME final tag name (e.g. ``__path__`` and ``__tag__:__path__``),
    the later MAP ENTRY wins. Spark's own map builders (``create_map``,
    ``str_to_map``, ``map_from_entries``, parse operators) preserve
    build order, matching the slice semantics; maps crossing in from
    Python dicts (java HashMap) do not — avoid same-target key pairs in
    such sources.

    Adds ``flat`` (map<string,string>) and ``flat_json`` (string).
    One fused projection: zero shuffle, zero Python — a converter at
    100 TB is a map stage inside the sink write.
    """
    import json as _json

    c_ent, tag_all = _split_contents_tags(
        contents_col,
        group_tags=group_tags,
        source_col=source_col,
        topic_col=topic_col,
        rename=tag_key_rename or {},
        k8s=k8s,
    )
    all_ent = c_ent if only_contents else F.concat(c_ent, tag_all)
    flat_ent = _dedup_last_wins(all_ent)

    # key-sorted JSON with a NUMERIC time value (Go's json.Marshal of a
    # map emits sorted keys; Time is uint32). Each string pair is
    # rendered through to_json for correct escaping.
    tkey = (protocol_key_rename or {}).get("time", "time")
    # a content/tag key EQUAL to the (possibly renamed) time protocol key
    # must be OVERWRITTEN by the time value — the reference assigns Time
    # into the same Go map last (converter_single_log_flatten.go:39-56),
    # so map semantics make time win; without this filter the JSON would
    # carry duplicate keys and the flat map would miss the time slot
    flat_ent = F.filter(flat_ent, lambda e: e["key"] != F.lit(tkey))
    # pin the classified entry array as a named column: `flat` and
    # `flat_json` both consume it, and unpinned the whole classify +
    # rename + dedup chain is inlined into each (see exprutil.pin)
    from ilogtail_spark.exprutil import pin

    df = df.withColumn("__fe__", pin(flat_ent))
    flat_ent = F.col("__fe__")
    time_frag = F.struct(
        F.lit(tkey).alias("key"),
        F.concat(
            F.lit(_json.dumps(tkey) + ":"), F.col(time_col).cast("long").cast("string")
        ).alias("frag"),
    )
    flat_json = _json_object(
        F.array_append(_pairs_fragments(flat_ent), time_frag)
    )
    return df.withColumns(
        {"flat": F.map_from_entries(flat_ent), "flat_json": flat_json}
    ).drop("__fe__")


def custom_single(
    df: DataFrame,
    contents_col: str = "fields",
    time_col: str = "log_time",
    *,
    group_tags: dict[str, str] | None = None,
    source_col: str | None = None,
    topic_col: str | None = None,
    tag_key_rename: dict[str, str] | None = None,
    protocol_key_rename: dict[str, str] | None = None,
    k8s: bool = False,
) -> DataFrame:
    """The NESTED custom_single protocol (custom_single_log.go:32-62):
    same content/tag classification as the flatten variant, but the JSON
    line keeps them under separate ``contents`` / ``tags`` objects plus
    a numeric ``time`` — each of the three protocol keys renamable via
    protocolKeyRenameMap. All objects key-sorted like Go's marshaling.

    Adds ``contents`` and ``tags`` map columns and ``single_json``."""
    import json as _json

    pk = protocol_key_rename or {}
    c_ent, tag_all = _split_contents_tags(
        contents_col,
        group_tags=group_tags,
        source_col=source_col,
        topic_col=topic_col,
        rename=tag_key_rename or {},
        k8s=k8s,
    )
    t_ent = _dedup_last_wins(tag_all)

    def nested_frag(proto_key: str, obj_json: Column) -> Column:
        key = pk.get(proto_key, proto_key)
        return F.struct(
            F.lit(key).alias("key"),
            F.concat(F.lit(_json.dumps(key) + ":"), obj_json).alias("frag"),
        )

    time_key = pk.get("time", "time")
    outer = F.array(
        nested_frag("contents", _json_object(_pairs_fragments(c_ent))),
        nested_frag("tags", _json_object(_pairs_fragments(t_ent))),
        F.struct(
            F.lit(time_key).alias("key"),
            F.concat(
                F.lit(_json.dumps(time_key) + ":"),
                F.col(time_col).cast("long").cast("string"),
            ).alias("frag"),
        ),
    )
    return df.withColumns(
        {
            "contents": F.map_from_entries(c_ent),
            "tags": F.map_from_entries(t_ent),
            "single_json": _json_object(outer),
        }
    )


def compile_topic(
    pattern: str,
    *,
    contents_col: str = "fields",
    tags_col: str | None = None,
    static_tags: dict[str, str] | None = None,
    tag_key_rename: dict[str, str] | None = None,
    time_col: str | None = None,
) -> Column:
    """Dynamic sink-name templating (pkg/fmtstr/format_topic.go:18 and
    format_index.go:20): compile a ``%{content.field}`` / ``%{tag.key}``
    / ``%{+<time-pattern>}`` pattern into ONE concat column usable as a
    kafka-style topic or an Elasticsearch-style time-based index name.

    Resolution mirrors findTargetValues (converter.go:284-307):
    ``content.X`` reads the contents map; ``tag.Y`` reads the tag side
    (a map column and/or plan-time static tags), falling back through
    tagKeyRenameMap when the raw name is absent. ``%{+yyyy.MM.dd}``
    renders ``time_col`` with the Java-style pattern (FormatIndex's
    general format IS the Java date-format dialect, so it maps straight
    onto ``date_format``). An unresolvable variable renders as its own
    name — FormatTopic's StringElement fallback — so a topic never
    becomes NULL mid-stream.
    """
    import re as _re

    rename = tag_key_rename or {}
    static = static_tags or {}
    parts: list[Column] = []
    pos = 0
    for m in _re.finditer(r"%\{([^}]+)\}", pattern):
        if m.start() > pos:
            parts.append(F.lit(pattern[pos : m.start()]))
        var = m.group(1)
        if var.startswith("+"):
            if time_col is None:
                raise ValueError(
                    f"%{{{var}}} needs time_col= (FormatIndex timestamp "
                    "expression with no timestamp source)"
                )
            parts.append(
                F.date_format(F.col(time_col).cast("timestamp"), var[1:])
            )
        elif var.startswith("content."):
            field = var[len("content.") :]
            parts.append(
                F.coalesce(
                    F.try_element_at(F.col(contents_col), F.lit(field)), F.lit(var)
                )
            )
        elif var.startswith("tag."):
            name = var[len("tag.") :]
            candidates: list[Column] = []
            for probe in [name] + ([rename[name]] if rename.get(name) else []):
                if tags_col is not None:
                    candidates.append(
                        F.try_element_at(F.col(tags_col), F.lit(probe))
                    )
                if probe in static:
                    candidates.append(F.lit(static[probe]))
            parts.append(F.coalesce(*candidates, F.lit(var)))
        else:
            # FormatTopic renders unknown variables as their name
            parts.append(F.lit(var))
        pos = m.end()
    if pos < len(pattern):
        parts.append(F.lit(pattern[pos:]))
    return F.concat(*parts) if parts else F.lit(pattern)


# ---------------------------------------------------------------------------
# protocol flusher wire shapes (loki / clickhouse / pulsar)
# ---------------------------------------------------------------------------


def _resolve_field_ref(ref: str, contents_col: str, tags_col: str) -> tuple[str, Column]:
    """'content.x' / 'tag.y' field reference → (trimmed name, value col) —
    findTargetValues (pkg/protocol/converter/converter.go:284-307) +
    TrimPrefix (:219-228). An unprefixed name reads the contents side,
    like the converter's default branch."""
    if ref.startswith("content."):
        name = ref[len("content."):]
        return name, F.try_element_at(F.col(contents_col), F.lit(name))
    if ref.startswith("tag."):
        name = ref[len("tag."):]
        return name, F.try_element_at(F.col(tags_col), F.lit(name))
    return ref, F.try_element_at(F.col(contents_col), F.lit(ref))


def loki_entries(
    df: DataFrame,
    contents_col: str = "fields",
    time_col: str = "log_time",
    *,
    dynamic_labels: list[str] | None = None,
    static_labels: dict[str, str] | None = None,
    group_tags: dict[str, str] | None = None,
    source_col: str | None = None,
    topic_col: str | None = None,
    tag_key_rename: dict[str, str] | None = None,
    k8s: bool = False,
) -> DataFrame:
    """flusher_loki wire shape (plugins/flusher/loki/flusher_loki.go:140-227):
    each log becomes one push entry — `line` is the custom_single JSON
    (the flusher's default converter, ProtocolCustomSingle/EncodingJSON,
    :91-92,104-108), `entry_ts` is the log time in seconds (:164), and
    `labels` is StaticLabels plus DynamicLabels resolved from the log
    with their 'content.'/'tag.' prefixes trimmed
    (buildLokiLabels:218-227, converter.TrimPrefix). Labels render as
    the canonical sorted '{name="value", ...}' label-set string
    (values backslash/quote-escaped); a dynamic label whose field is
    missing is skipped, the reference's not-found branch.

    One fused projection over the converter output — zero shuffle, zero
    Python; at 100 TB this is a map stage inside the sink write."""
    out = custom_single(
        df, contents_col, time_col,
        group_tags=group_tags, source_col=source_col, topic_col=topic_col,
        tag_key_rename=tag_key_rename, k8s=k8s,
    )
    frags: list[Column] = []
    for name, val in (static_labels or {}).items():
        lit = val.replace("\\", "\\\\").replace('"', '\\"')
        frags.append(F.lit(f'{name}="{lit}"'))
    for ref in dynamic_labels or []:
        name, vcol = _resolve_field_ref(ref, contents_col, "tags")
        esc = F.replace(
            F.replace(vcol, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
        )
        frags.append(
            F.when(vcol.isNotNull(), F.concat(F.lit(name + '="'), esc, F.lit('"')))
        )
    if frags:
        # fragments start with the label name → sorting fragments IS the
        # canonical sort-by-name of LabelSet.String()
        body = F.concat_ws(", ", F.array_sort(F.array_compact(F.array(*frags))))
    else:
        body = F.lit("")
    return out.withColumns(
        {
            "labels": F.concat(F.lit("{"), body, F.lit("}")),
            "entry_ts": F.col(time_col).cast("long"),
            "line": F.col("single_json"),
        }
    )


def clickhouse_rows(
    df: DataFrame,
    contents_col: str = "fields",
    time_col: str = "log_time",
    *,
    table: str = "logs",
    group_tags: dict[str, str] | None = None,
    source_col: str | None = None,
    topic_col: str | None = None,
    tag_key_rename: dict[str, str] | None = None,
    k8s: bool = False,
) -> DataFrame:
    """flusher_clickhouse wire shape (plugins/flusher/clickhouse/
    flusher_clickhouse.go:194,277): the buffer-table INSERT row is
    (`_timestamp` Int64, `_log` String) into `ilogtail_{Table}_buffer`,
    where _log is the converted JSON line. The reference stamps
    time.Now() — ingest wall clock — as _timestamp; the deterministic
    distributed equivalent is the EVENT time (a replayable 100 TB batch
    cannot carry wall clocks: resume/idempotency depends on byte-stable
    output), documented as the one deviation."""
    out = custom_single(
        df, contents_col, time_col,
        group_tags=group_tags, source_col=source_col, topic_col=topic_col,
        tag_key_rename=tag_key_rename, k8s=k8s,
    )
    return out.withColumns(
        {
            "_timestamp": F.col(time_col).cast("long"),
            "_log": F.col("single_json"),
            "sink_table": F.lit(f"ilogtail_{table}_buffer"),
        }
    )


def pulsar_messages(
    df: DataFrame,
    contents_col: str = "fields",
    time_col: str = "log_time",
    *,
    topic: str,
    partition_keys: list[str] | None = None,
    default_key: str = "logstore",
    group_tags: dict[str, str] | None = None,
    source_col: str | None = None,
    topic_col: str | None = None,
    tag_key_rename: dict[str, str] | None = None,
    k8s: bool = False,
) -> DataFrame:
    """flusher_pulsar wire shape (plugins/flusher/pulsar/
    flusher_pulsar.go:195-215,306-324): `payload` is the converted JSON
    line, `topic` renders the %{content.x}/%{tag.y} pattern (the same
    fmtstr.FormatTopic dialect kafka/ES use — shared compile_topic),
    and the message `key` is the PartitionKeys' values joined with
    '###', missing keys skipped, ALL missing → the default (logstore)
    name. The reference iterates hashKeyMap — a Go map, so >1-key join
    order is undefined there; here it is the declared PartitionKeys
    order (the deterministic refinement)."""
    out = custom_single(
        df, contents_col, time_col,
        group_tags=group_tags, source_col=source_col, topic_col=topic_col,
        tag_key_rename=tag_key_rename, k8s=k8s,
    )
    vals = [
        _resolve_field_ref(ref, contents_col, "tags")[1]
        for ref in partition_keys or []
    ]
    if vals:
        # concat_ws skips NULLs — exactly the reference's found-only join.
        # "all missing" is decided by a found-count, not by the joined
        # string being empty: a FOUND empty value keys as "" (hashData
        # gets the empty string in the reference too), only zero found
        # values fall back to the default name (:319-320).
        found = sum((v.isNotNull().cast("int") for v in vals), F.lit(0))
        key = F.when(found == 0, F.lit(default_key)).otherwise(
            F.concat_ws("###", *vals)
        )
    else:
        key = F.lit(default_key)
    return out.withColumns(
        {
            "topic": compile_topic(
                topic, contents_col=contents_col, tags_col="tags",
                time_col=time_col,
            ),
            "key": key,
            "payload": F.col("single_json"),
        }
    )


def prometheus_series(
    df: DataFrame,
    *,
    name_col: str = "__name__",
    labels_col: str = "__labels__",
    value_col: str = "__value__",
    time_col: str = "__time_nano__",
) -> DataFrame:
    """flusher_prometheus wire shape: SLS metric rows → one remote-write
    TimeSeries per event (pkg/protocol/encoder/prometheus/utils.go:44-61
    genPromRemoteWriteTimeseries). `series` is the label set rendered as
    the canonical '{name="value",...}' string with `__name__` appended
    as a label and the whole set sorted LEXICOGRAPHICALLY by label name
    (utils.go:83-88, the remote-write spec's MUST); labels with empty
    name or value are dropped (utils.go:71-75, spec's MUST NOT);
    `timestamp_ms` is the event's nanos / 1e6 (utils.go:57 — the
    encoder's inverse of the input_prometheus decode); `value` the
    sample double. Label values are backslash/quote-escaped exactly
    like loki's canonical label string so the rendering is injective.

    The snappy+protobuf framing and HTTP retry/batching are transport
    (flusher_prometheus.go:92-151) — per SURVEY's flusher mapping they
    collapse to the sink write; this converter is the semantic content
    a remote-write receiver sees. One fused projection, zero shuffle.
    """
    esc = lambda c: F.replace(  # noqa: E731
        F.replace(c, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )
    pairs = F.filter(
        F.split(F.coalesce(F.col(labels_col), F.lit("")), r"\|"),
        lambda t: t != "",
    )
    labels = F.transform(
        pairs,
        lambda t: F.struct(
            F.substring_index(t, "#$#", 1).alias("name"),
            t.substr(
                F.length(F.substring_index(t, "#$#", 1)) + F.lit(4),
                F.length(t),
            ).alias("value"),
        ),
    )
    labels = F.concat(
        labels,
        F.array(F.struct(
            F.lit("__name__").alias("name"),
            F.col(name_col).alias("value"),
        )),
    )
    labels = F.array_sort(
        F.filter(labels, lambda s: (s["name"] != "") & (s["value"] != ""))
    )
    series = F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(
                labels,
                lambda s: F.concat(
                    s["name"], F.lit('="'), esc(s["value"]), F.lit('"')
                ),
            ),
            ",",
        ),
        F.lit("}"),
    )
    return df.withColumns(
        {
            "series": series,
            "value": F.col(value_col).cast("double"),
            # integer division — exact at any epoch, matching Go's
            # int64 truncating divide (utils.go:57)
            "timestamp_ms": F.expr(f"cast({time_col} AS long) div 1000000"),
        }
    )
