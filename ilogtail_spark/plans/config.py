"""iLogtail YAML pipeline configs → the internal spec.

A reference user's pipeline is a YAML file — `inputs` / `processors` /
`aggregators` / `flushers` lists whose entries carry a `Type` plus
plugin parameters (example_config/data_pipelines/*.yaml). This adapter
lets that exact file run on this engine: each plugin `Type` + its
reference parameter names (SourceKey, Regex, Keys, …) translate to the
corresponding operator's kwargs, and `build_pipeline` compiles the
result into one lazy DataFrame as usual.

Scope mirrors SURVEY §2: the processor table below covers every plugin
this engine implements; an unknown `Type` raises with the plugin name so
config gaps are loud, never silently dropped stages. Network inputs and
protocol flushers collapse to file reads/writes exactly as route.py
documents (the transport is the cluster's storage layer here).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession


def _p_regex(c: dict) -> dict:
    return {
        "type": "regex",
        "pattern": c["Regex"],
        "keys": c["Keys"],
        "source_key": c.get("SourceKey", "content"),
        "keep_source": c.get("KeepSource", False),
        "keep_source_if_parse_error": c.get("KeepSourceIfParseError", True),
        "full_match": c.get("FullMatch", False),
    }


def _p_json(c: dict) -> dict:
    return {
        "type": "json",
        "source_key": c.get("SourceKey", "content"),
        "expand_depth": c.get("ExpandDepth", 0),
        "expand_connector": c.get("ExpandConnector", "_"),
        "prefix": c.get("Prefix", ""),
        "use_source_key_as_prefix": c.get("UseSourceKeyAsPrefix", False),
        "keep_source": c.get("KeepSource", True),
        "keep_source_if_parse_error": c.get("KeepSourceIfParseError", True),
    }


def _p_grok(c: dict) -> dict:
    return {
        "type": "grok",
        "matches": c["Match"],
        "source_key": c.get("SourceKey", "content"),
        "custom_patterns": c.get("CustomPatterns") or None,
        "keep_source": c.get("KeepSource", True),
    }


def _p_split_char(c: dict) -> dict:
    return {
        "type": "split_char",
        "split_keys": c["SplitKeys"],
        "sep": c.get("SplitSep", ","),
        "source_key": c.get("SourceKey", "content"),
        "preserve_others": c.get("PreserveOthers", False),
    }


def _p_csv(c: dict) -> dict:
    return {
        "type": "csv",
        "split_keys": c["SplitKeys"],
        "sep": c.get("SplitSep", ","),
        "quote": c.get("Quote", '"'),
        "source_key": c.get("SourceKey", "content"),
        "trim_leading_space": c.get("TrimLeadingSpace", False),
        "expand_others": c.get("ExpandOthers", False),
        "expand_key_prefix": c.get("ExpandKeyPrefix", "expand_"),
        "keep_source": c.get("KeepSource", True),
    }


def _p_kv(c: dict) -> dict:
    return {
        "type": "kv",
        "source_key": c.get("SourceKey", "content"),
        "delimiter": c.get("Delimiter", "\t"),
        "separator": c.get("Separator", ":"),
        "keys": c.get("Keys"),
    }


def _p_split_log_string(c: dict) -> dict:
    return {
        "type": "split_log_string",
        "source_key": c.get("SplitKey", "content"),
        "sep": c.get("SplitSep", "\n"),
    }


def _p_add_fields(c: dict) -> dict:
    return {
        "type": "add_fields",
        "fields": c["Fields"],
        "ignore_if_exist": c.get("IgnoreIfExist", False),
    }


def _p_drop(c: dict) -> dict:
    return {"type": "drop", "keys": c["DropKeys"]}


def _p_pick(c: dict) -> dict:
    return {"type": "pick_keys", "include": c.get("Include"), "exclude": c.get("Exclude")}


def _p_rename(c: dict) -> dict:
    return {
        "type": "rename",
        "renames": dict(zip(c["SourceKeys"], c["DestKeys"])),
    }


def _p_dict_map(c: dict) -> dict:
    return {
        "type": "dict_map",
        "mapping": c["MapDict"],
        "source_key": c["SourceKey"],
        "dest_key": c.get("DestKey", c["SourceKey"]),
        "handle_missing": c.get("HandleMissing", False),
        "missing": c.get("Missing", "Unknown"),
        "mode": "fill" if c.get("FillValue") else "overwrite",
    }


def _p_filter_regex(c: dict) -> dict:
    return {
        "type": "filter_regex",
        "include": c.get("Include"),
        "exclude": c.get("Exclude"),
    }


def _p_strptime(c: dict) -> dict:
    return {
        "type": "strptime",
        "source_key": c.get("SourceKey", "time"),
        "fmt": c["Format"],
        "utc_offset_seconds": int(c.get("AdjustUTCOffset", 0)),
        "keep_source": c.get("KeepSource", True),
    }


def _p_base64(c: dict) -> dict:
    return {
        "type": "base64_encode",
        "source_key": c["SourceKey"],
        "new_key": c.get("NewKey", c["SourceKey"]),
    }


def _p_md5(c: dict) -> dict:
    return {
        "type": "md5",
        "source_key": c["SourceKey"],
        "md5_key": c.get("NewKey", c["SourceKey"]),
    }


_PROCESSOR_ADAPTERS: dict[str, Callable[[dict], dict]] = {
    "processor_regex": _p_regex,
    "processor_parse_regex_native": _p_regex,
    "processor_json": _p_json,
    "processor_parse_json_native": _p_json,
    "processor_grok": _p_grok,
    "processor_split_char": _p_split_char,
    "processor_split_string": _p_split_char,
    "processor_csv": _p_csv,
    "processor_parse_delimiter_native": _p_csv,
    "processor_split_key_value": _p_kv,
    "processor_split_log_string": _p_split_log_string,
    "processor_add_fields": _p_add_fields,
    "processor_drop": _p_drop,
    "processor_pick_key": _p_pick,
    "processor_rename": _p_rename,
    "processor_dict_map": _p_dict_map,
    "processor_filter_regex": _p_filter_regex,
    "processor_strptime": _p_strptime,
    "processor_base64_encoding": _p_base64,
    "processor_md5": _p_md5,
}


def compile_ilogtail_config(config: str | dict[str, Any]) -> dict[str, Any]:
    """YAML text (or parsed dict) → internal pipeline spec for
    `build_pipeline`. Raises KeyError naming any plugin Type this engine
    doesn't implement (SURVEY §2's descoped rows raise here too)."""
    if isinstance(config, str):
        import yaml

        config = yaml.safe_load(config)
    assert isinstance(config, dict)
    if config.get("enable") is False:
        raise ValueError("config has enable: false")
    processors = []
    for p in config.get("processors", []) or []:
        typ = p.get("Type")
        fn = _PROCESSOR_ADAPTERS.get(typ)
        if fn is None:
            raise KeyError(f"unsupported processor plugin: {typ!r}")
        processors.append(fn(p))
    return {"processors": processors, "flushers": list(config.get("flushers", []) or [])}


def read_inputs(spark: SparkSession, config: str | dict[str, Any]) -> DataFrame:
    """`inputs` section → a DataFrame with the reference's default field
    name `content` (one row per line, input_file semantics). Only file
    inputs exist in this engine (SURVEY §2.1 descopes network inputs)."""
    if isinstance(config, str):
        import yaml

        config = yaml.safe_load(config)
    inputs = config.get("inputs", []) or []
    paths: list[str] = []
    for i in inputs:
        if i.get("Type") in ("input_file", "file_log"):
            paths.extend(i.get("FilePaths", []))
        else:
            raise KeyError(f"unsupported input plugin: {i.get('Type')!r}")
    if not paths:
        raise ValueError("no file inputs in config")
    return spark.read.text(paths).withColumnRenamed("value", "content")


def run_ilogtail_config(
    spark: SparkSession,
    config: str | dict[str, Any],
    *,
    df: DataFrame | None = None,
    out_dir: str | None = None,
) -> DataFrame:
    """End-to-end: inputs (or a supplied df) → processors → flushers.
    flusher_stdout/file write jsonlines under `out_dir` (one dir per
    flusher index); protocol flushers collapse to the same file write,
    per route.py's format-write equivalence. Returns the processed
    DataFrame (lazy) so callers can also aggregate/route it."""
    from ilogtail_spark.plans.pipeline import apply_processors

    if isinstance(config, str):
        import yaml

        config = yaml.safe_load(config)
    spec = compile_ilogtail_config(config)
    src = df if df is not None else read_inputs(spark, config)
    out = apply_processors(src, spec["processors"])
    if out_dir:
        for i, fl in enumerate(spec["flushers"]):
            (out.write.mode("overwrite").json(f"{out_dir}/flusher_{i}_{fl.get('Type', 'sink')}"))
    return out
