"""iLogtail YAML config adapter: a reference user's pipeline file runs
unchanged — inputs read as `content` rows, plugin Types + reference
parameter names translate to operators, flushers write files."""

from __future__ import annotations

import json
import os

import pytest

from ilogtail_spark.plans.config import (
    compile_ilogtail_config,
    read_inputs,
    run_ilogtail_config,
)

NGINX_YAML = """
enable: true
inputs:
  - Type: input_file
    FilePaths:
      - {log_path}
processors:
  - Type: processor_regex
    SourceKey: content
    Regex: '(\\S+) \\S+ \\S+ \\[([^\\]]+)\\] "(\\w+) (\\S+) HTTP/([\\d.]+)" (\\d+) (\\d+) "([^"]*)" "([^"]*)"'
    Keys:
      - remote_addr
      - time_local
      - method
      - url
      - protocol
      - status
      - body_bytes_sent
      - http_referer
      - http_user_agent
  - Type: processor_dict_map
    SourceKey: method
    DestKey: method_class
    MapDict:
      GET: read
      POST: write
    HandleMissing: true
    Missing: other
flushers:
  - Type: flusher_stdout
    OnlyStdout: true
"""

LINES = [
    '10.0.0.1 - - [01/Jan/2024:00:00:01 +0000] "GET /a HTTP/1.1" 200 123 "-" "curl/8"',
    '10.0.0.2 - - [01/Jan/2024:00:00:02 +0000] "POST /b HTTP/1.1" 500 7 "-" "wget/1"',
]


class TestYamlConfig:
    def _write_log(self, tmp_path):
        p = tmp_path / "access.log"
        p.write_text("\n".join(LINES) + "\n")
        return str(p)

    def test_end_to_end(self, spark, tmp_path):
        yaml_text = NGINX_YAML.format(log_path=self._write_log(tmp_path))
        out_dir = str(tmp_path / "sinks")
        df = run_ilogtail_config(spark, yaml_text, out_dir=out_dir)
        rows = {r["remote_addr"]: r for r in df.collect()}
        assert rows["10.0.0.1"]["method"] == "GET"
        assert rows["10.0.0.1"]["method_class"] == "read"
        assert rows["10.0.0.2"]["status"] == "500"
        assert rows["10.0.0.2"]["method_class"] == "write"
        # flusher wrote jsonlines
        sink = [d for d in os.listdir(out_dir) if d.startswith("flusher_0")][0]
        files = [
            f for f in os.listdir(os.path.join(out_dir, sink)) if f.endswith(".json")
        ]
        recs = []
        for f in files:
            with open(os.path.join(out_dir, sink, f)) as fh:
                recs += [json.loads(line) for line in fh if line.strip()]
        assert {r["remote_addr"] for r in recs} == {"10.0.0.1", "10.0.0.2"}

    def test_source_kept_on_parse_error_default(self, spark, tmp_path):
        p = tmp_path / "bad.log"
        p.write_text("not an access line\n")
        yaml_text = NGINX_YAML.format(log_path=str(p))
        row = run_ilogtail_config(spark, yaml_text).first()
        # regex.go keep-source-on-error default: raw content survives
        assert row["content"] == "not an access line"
        assert row["remote_addr"] is None

    def test_unknown_processor_raises(self, spark):
        with pytest.raises(KeyError, match="processor_nonexistent"):
            compile_ilogtail_config(
                {"processors": [{"Type": "processor_nonexistent"}], "flushers": []}
            )

    def test_unknown_input_raises(self, spark):
        with pytest.raises(KeyError, match="service_mqtt"):
            read_inputs(spark, {"inputs": [{"Type": "service_mqtt"}]})

    def test_http_server_unknown_format_raises(self, spark):
        with pytest.raises(KeyError, match="Format"):
            read_inputs(
                spark,
                {"inputs": [{"Type": "service_http_server", "Format": "sls"}]},
            )

    def test_disabled_config_raises(self, spark):
        with pytest.raises(ValueError, match="enable"):
            compile_ilogtail_config({"enable": False})


def _run(spark, cfg, df):
    """Compile + execute a config over a supplied DataFrame."""
    return run_ilogtail_config(spark, cfg, df=df)


class TestAdapterProcessors:
    """One case per processor Type newly wired into the adapter map
    (VERDICT r6 missing #2) — parameter names at reference parity."""

    def test_desensitize_const(self, spark):
        df = spark.createDataFrame([("user=abc password=12345,end",)], "content string")
        cfg = {"processors": [{
            "Type": "processor_desensitize", "SourceKey": "content",
            "Method": "const", "ReplaceString": "********",
            "RegexBegin": "password=", "RegexContent": "[^,]+",
        }]}
        assert _run(spark, cfg, df).first()["content"] == "user=abc password=********,end"

    def test_desensitize_md5(self, spark):
        import hashlib

        df = spark.createDataFrame([("password=12345,end",)], "content string")
        cfg = {"processors": [{
            "Type": "processor_desensitize", "SourceKey": "content",
            "Method": "md5", "RegexBegin": "password=", "RegexContent": "[^,]+",
        }]}
        want = "password=" + hashlib.md5(b"12345").hexdigest() + ",end"
        assert _run(spark, cfg, df).first()["content"] == want

    def test_string_replace(self, spark):
        df = spark.createDataFrame([("hello world",)], "content string")
        cfg = {"processors": [{
            "Type": "processor_string_replace", "SourceKey": "content",
            "Method": "regex", "Match": "wor\\w+", "ReplaceString": "spark",
            "DestKey": "replaced",
        }]}
        row = _run(spark, cfg, df).first()
        assert row["replaced"] == "hello spark"
        assert row["content"] == "hello world"

    def test_anchor(self, spark):
        df = spark.createDataFrame([("time:[2024] level:[INFO] done",)], "content string")
        cfg = {"processors": [{
            "Type": "processor_anchor", "SourceKey": "content",
            "Anchors": [
                {"Start": "time:[", "Stop": "]", "FieldName": "time"},
                {"Start": "level:[", "Stop": "]", "FieldName": "level"},
            ],
        }]}
        row = _run(spark, cfg, df).first()
        assert (row["time"], row["level"]) == ("2024", "INFO")

    def test_packjson(self, spark):
        df = spark.createDataFrame([("a1", "b2")], "a string, b string")
        cfg = {"processors": [{
            "Type": "processor_packjson", "SourceKeys": ["a", "b"],
            "DestKey": "packed", "KeepSource": False,
        }]}
        row = _run(spark, cfg, df).first()
        assert json.loads(row["packed"]) == {"a": "a1", "b": "b2"}
        assert "a" not in row.asDict()

    def test_gotime_with_locations(self, spark):
        # SourceLocation 8: wall-clock read as UTC+8 ⇒ instant is 8h earlier
        df = spark.createDataFrame([("2024-03-01 08:00:00",)], "t string")
        cfg = {"processors": [{
            "Type": "processor_gotime", "SourceKey": "t",
            "SourceFormat": "2006-01-02 15:04:05", "SourceLocation": 8,
            "DestKey": "epoch", "DestFormat": "seconds",
        }]}
        assert _run(spark, cfg, df).first()["epoch"] == "1709251200"

    def test_split_log_regex_multiline(self, spark, tmp_path):
        p = tmp_path / "stack.log"
        p.write_text(
            "2024-01-01 ERROR boom\n  at a.b\n  at c.d\n2024-01-01 INFO ok\n"
        )
        cfg = {
            "inputs": [{"Type": "input_file", "FilePaths": [str(p)]}],
            "processors": [{
                "Type": "processor_split_log_regex", "SplitKey": "content",
                "SplitRegex": r"\d{4}-\d{2}-\d{2}.*",
            }],
        }
        out = run_ilogtail_config(spark, cfg)
        recs = sorted(r["content"] for r in out.collect())
        assert recs == ["2024-01-01 ERROR boom\n  at a.b\n  at c.d", "2024-01-01 INFO ok"]

    def test_fields_with_condition(self, spark):
        df = spark.createDataFrame([("ERROR",), ("INFO",)], "level string")
        cfg = {"processors": [{
            "Type": "processor_fields_with_condition",
            "Switch": [{
                "Case": {"RelationOperator": "equals",
                         "FieldConditions": {"level": "ERROR"}},
                "Actions": [{"Type": "processor_add_fields",
                             "Fields": {"alert": "1"}}],
            }],
        }]}
        rows = {r["level"]: r["alert"] for r in _run(spark, cfg, df).collect()}
        assert rows == {"ERROR": "1", "INFO": None}

    def test_rate_limit(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [("u1", t0), ("u1", t0 + dt.timedelta(microseconds=1)),
                ("u2", t0), ("u1", t0 + dt.timedelta(seconds=1))]
        df = spark.createDataFrame(rows, "user string, ts timestamp")
        cfg = {"processors": [{
            "Type": "processor_rate_limit", "Fields": ["user"], "Limit": "1/s",
        }]}
        out = _run(spark, cfg, df)
        assert out.count() == 3  # u1 second-0 capped to 1 row

    def test_appender(self, spark):
        df = spark.createDataFrame([("v",)], "k string")
        cfg = {"processors": [{"Type": "processor_appender", "Key": "k",
                               "Value": "|suffix"}]}
        assert _run(spark, cfg, df).first()["k"] == "v|suffix"

    def test_geoip(self, spark, tmp_path):
        ranges = spark.createDataFrame(
            [(167772160, 167772416, "CN")],  # 10.0.0.0 - 10.0.1.0
            "ip_start long, ip_end long, country string",
        )
        db = str(tmp_path / "geo.parquet")
        ranges.write.parquet(db)
        df = spark.createDataFrame([("10.0.0.7",), ("192.168.0.1",)], "ip string")
        cfg = {"processors": [{"Type": "processor_geoip", "SourceKey": "ip",
                               "DBPath": db}]}
        rows = {r["ip"]: r["country"] for r in _run(spark, cfg, df).collect()}
        assert rows == {"10.0.0.7": "CN", "192.168.0.1": None}

    def test_encrypt(self, spark):
        df = spark.createDataFrame([("secret",)], "card string")
        cfg = {"processors": [{
            "Type": "processor_encrypt", "SourceKeys": ["card"],
            "EncryptionParameters": {
                "Key": "000102030405060708090a0b0c0d0e0f",
                "IV": "000102030405060708090a0b0c0d0e0f",
            },
        }]}
        val = _run(spark, cfg, df).first()["card"]
        assert val != "secret" and int(val, 16) is not None  # hex ciphertext

    def test_drop_last_key(self, spark):
        df = spark.createDataFrame(
            [("raw1", "a", "b"), ("raw2", None, "b")], "content string, x string, y string"
        )
        cfg = {"processors": [{
            "Type": "processor_drop_last_key", "DropKey": "content",
            "Include": ["x", "y"],
        }]}
        rows = {r["y"]: r["content"] for r in _run(spark, cfg, df).collect()}
        assert rows["b"] is None or "raw" in str(rows["b"])  # parsed row nulled
        got = {(r["x"], r["content"]) for r in _run(spark, cfg, df).collect()}
        assert got == {("a", None), (None, "raw2")}

    def test_log_to_sls_metric_dynamic_names(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [("requests_total", "42", "h1", dt.datetime(2024, 1, 1)),
             ("bad name!", "42", "h1", dt.datetime(2024, 1, 1)),
             ("requests_total", "not_num", "h1", dt.datetime(2024, 1, 1))],
            "mname string, mval string, host string, ts timestamp",
        )
        cfg = {"processors": [{
            "Type": "processor_log_to_sls_metric",
            "MetricValues": {"mname": "mval"},
            "MetricLabelKeys": ["host"],
            "CustomMetricLabels": {"env": "prod"},
            "MetricTimeKey": "ts",
        }]}
        rows = _run(spark, cfg, df).collect()
        assert len(rows) == 1  # invalid name + non-numeric value dropped
        r = rows[0]
        assert r["__name__"] == "requests_total"
        assert r["__value__"] == 42.0
        assert r["__labels__"] == "env#$#prod|host#$#h1"

    def test_strptime_utc_offset_mapping(self, spark):
        # ADVICE r6 (high): AdjustUTCOffset gates, UTCOffset carries the
        # seconds; reference subtracts it (strptime.go:145)
        import datetime as dt

        df = spark.createDataFrame([("2024-01-01 08:00:00",)], "time string")
        cfg = {"processors": [{
            "Type": "processor_strptime", "SourceKey": "time",
            "Format": "%Y-%m-%d %H:%M:%S",
            "AdjustUTCOffset": True, "UTCOffset": 28800,
        }]}
        got = _run(spark, cfg, df).first()["ts"]
        assert got == dt.datetime(2024, 1, 1, 0, 0, 0)  # UTC+8 wall → UTC instant

    def test_dict_map_mode_fill(self, spark):
        # ADVICE r6 (medium): Mode: fill must not clobber existing dest
        df = spark.createDataFrame(
            [("GET", None), ("POST", "preset")], "m string, cls string"
        )
        cfg = {"processors": [{
            "Type": "processor_dict_map", "SourceKey": "m", "DestKey": "cls",
            "MapDict": {"GET": "read", "POST": "write"}, "Mode": "fill",
        }]}
        rows = {r["m"]: r["cls"] for r in _run(spark, cfg, df).collect()}
        assert rows == {"GET": "read", "POST": "preset"}

    def test_dict_map_bad_mode_raises(self, spark):
        with pytest.raises(ValueError, match="fill|overwrite"):
            compile_ilogtail_config({"processors": [{
                "Type": "processor_dict_map", "SourceKey": "m",
                "MapDict": {}, "Mode": "upsert"}]})

    def test_grok_yaml_priority_and_cast(self, spark):
        # VERDICT r6 item 7: Match priority + :int alias through YAML
        df = spark.createDataFrame(
            [("status 200 from 1.2.3.4",), ("user alice logged_in",)],
            "content string",
        )
        cfg = {"processors": [{
            "Type": "processor_grok", "SourceKey": "content",
            "Match": [
                "status %{INT:status:int} from %{IP:client}",
                "user %{WORD:user} %{WORD:action}",
            ],
        }]}
        rows = _run(spark, cfg, df).collect()
        by_content = {r["content"]: r for r in rows}
        r1 = by_content["status 200 from 1.2.3.4"]
        assert r1["status"] == 200 and r1["client"] == "1.2.3.4"
        r2 = by_content["user alice logged_in"]
        assert r2["user"] == "alice" and r2["action"] == "logged_in"


class TestAdapterAggregators:
    """`aggregators:` section compiles (VERDICT r6 missing #1 / wrong #2) —
    previously silently dropped, violating the loud-failure contract."""

    def test_unknown_aggregator_raises(self):
        with pytest.raises(KeyError, match="aggregator_nonexistent"):
            compile_ilogtail_config(
                {"processors": [], "aggregators": [{"Type": "aggregator_nonexistent"}]}
            )

    def test_content_value_group_counts(self, spark):
        from ilogtail_spark.plans.pipeline import aggregates_for, build_pipeline

        df = spark.createDataFrame(
            [("a", "x"), ("a", "x"), ("b", "y")], "k1 string, k2 string"
        )
        spec = compile_ilogtail_config({
            "processors": [],
            "aggregators": [{"Type": "aggregator_content_value_group",
                             "GroupKeys": ["k1", "k2"]}],
        })
        routed = build_pipeline(df, spec)
        aggs = aggregates_for(routed, spec)
        rows = {r["group_key"]: r["log_count"] for r in aggs["group_k1_k2"].collect()}
        assert rows == {"a_x": 2, "b_y": 1}

    def test_otel_route_counts(self, spark):
        # aggregator_opentelemetry: field-count dispatch (<=5 metric,
        # >=19 trace, else log, empty dropped) over 20 event columns
        from ilogtail_spark.plans.pipeline import aggregates_for, build_pipeline

        cols = [f"f{i:02d}" for i in range(20)]
        def row(n):
            return tuple(("v" if i < n else None) for i in range(20))
        df = spark.createDataFrame(
            [row(3), row(5), row(20), row(19), row(8), row(6), row(0)],
            ", ".join(f"{c} string" for c in cols),
        )
        spec = compile_ilogtail_config({
            "processors": [],
            "aggregators": [{"Type": "aggregator_opentelemetry",
                             "TraceLogstore": "spans"}],
        })
        routed = build_pipeline(df, spec)
        aggs = aggregates_for(routed, spec)
        got = {r["logstore"]: r["log_count"]
               for r in aggs["otel_route_counts"].collect()}
        assert got == {"otlp-metrics": 2, "spans": 2, "otlp-logs": 2}

    def test_skywalking_route_counts(self, spark):
        # aggregator_skywalking: first-content-key dispatch; unknown
        # keys fall through to logs, only zero-contents rows drop
        from ilogtail_spark.plans.pipeline import aggregates_for, build_pipeline

        df = spark.createDataFrame(
            [("m1", None, None, None),
             (None, "[span]", None, None),
             (None, None, "svc", None),
             (None, None, None, "other"),
             (None, None, None, None)],
            "`__name__` string, links string, `otlp.name` string, misc string",
        )
        spec = compile_ilogtail_config({
            "processors": [],
            "aggregators": [{"Type": "aggregator_skywalking"}],
        })
        routed = build_pipeline(df, spec)
        aggs = aggregates_for(routed, spec)
        got = {r["logstore"]: r["log_count"]
               for r in aggs["skywalking_route_counts"].collect()}
        assert got == {"skywalking-metrics": 1, "skywalking-traces": 1,
                       "skywalking-logs": 2}

    def test_context_e2e_case(self, spark, tmp_path):
        """Mirrors /root/reference/test/e2e/test_cases/aggregator_context/
        case.feature: split_char on 'no|content' + aggregator_context ⇒
        per-source ordering is valid (seq == line order) + sink counts."""
        from ilogtail_spark.plans.pipeline import aggregates_for, build_pipeline

        p = tmp_path / "example.log"
        p.write_text("".join(f"{i}|msg-{i}\n" for i in range(1, 201)))
        cfg = {
            "inputs": [{"Type": "input_file", "FilePaths": [str(p)]}],
            "processors": [{
                "Type": "processor_split_char", "SourceKey": "content",
                "SplitSep": "|", "SplitKeys": ["no", "content"],
            }],
            "aggregators": [{"Type": "aggregator_context"}],
        }
        spec = compile_ilogtail_config(cfg)
        src = read_inputs(spark, cfg)
        routed = build_pipeline(src, spec)
        aggs = aggregates_for(routed, spec)
        ordered = aggs["context_order"].collect()
        assert len(ordered) >= 200  # "there is at least 200 logs"
        # "the context of log is valid": per-source seq follows line order
        for r in ordered:
            assert int(r["no"]) == r["seq"]
        counts = {r["route"]: r["log_count"] for r in aggs["sink_counts"].collect()}
        assert counts == {"sink_default": 200}

    def test_logstore_router_compiles_to_router(self, spark):
        from ilogtail_spark.plans.pipeline import build_pipeline

        df = spark.createDataFrame(
            [("ERROR",), ("WARN",), ("INFO",)], "level string"
        )
        spec = compile_ilogtail_config({
            "processors": [],
            "aggregators": [{
                "Type": "aggregator_logstore_router", "SourceKey": "level",
                "RouterRegex": ["ERROR", "WARN|INFO"],
                "RouterLogstore": ["errors", "normal"],
            }],
        })
        assert spec["router"]["rules"] == [["level", "ERROR", "errors"],
                                           ["level", "WARN|INFO", "normal"]]
        routed = build_pipeline(df, spec)
        got = {r["level"]: r["route"] for r in routed.collect()}
        assert got == {"ERROR": "errors", "WARN": "normal", "INFO": "normal"}

    def test_shardhash_and_pack_flag(self, spark):
        from ilogtail_spark.plans.pipeline import aggregates_for, build_pipeline

        df = spark.createDataFrame(
            [(f"c{i}", i, "x") for i in range(20)],
            "conv_id string, turn_idx int, v string",
        )
        spec = compile_ilogtail_config({
            "processors": [],
            "aggregators": [{"Type": "aggregator_shardhash",
                             "SourceKeys": ["conv_id"], "ShardCount": 4,
                             "EnablePackID": True}],
        })
        assert spec["lineage"]  # EnablePackID turned lineage on
        routed = build_pipeline(df, spec)
        assert "lineage" in routed.columns
        aggs = aggregates_for(routed, spec)
        shard = aggs["shard_counts"].collect()
        assert sum(r["log_count"] for r in shard) == 20
        assert {r["shard_bucket"] for r in shard} <= {0, 1, 2, 3}

    def test_router_regex_logstore_mismatch_raises(self):
        with pytest.raises(ValueError, match="length mismatch"):
            compile_ilogtail_config({"aggregators": [{
                "Type": "aggregator_logstore_router", "SourceKey": "k",
                "RouterRegex": ["a"], "RouterLogstore": ["s1", "s2"]}]})


class TestFlusherRouting:
    """Per-flusher Match conditions (VERDICT r6 missing #3): C++ Router
    semantics — every matching conditional flusher receives the rows,
    unconditional flushers always do (Router.cpp:26-49)."""

    def test_match_conditions_single_pass(self, spark, tmp_path):
        from ilogtail_spark.operators.route import CopyCondition, route_copy

        df = spark.createDataFrame(
            [("ERROR", 1), ("INFO", 2), ("ERROR", 3), ("DEBUG", 4)],
            "level string, id int",
        )
        cfg = {
            "processors": [],
            "flushers": [
                {"Type": "flusher_sls", "Match": {"Type": "tag", "Key": "level",
                                                  "Value": "ERROR"}},
                {"Type": "flusher_kafka", "Match": {"Type": "tag", "Key": "level",
                                                    "Value": "INFO"}},
                {"Type": "flusher_file"},  # unconditional
            ],
        }
        out_dir = str(tmp_path / "sinks")
        run_ilogtail_config(spark, cfg, df=df, out_dir=out_dir)
        routed_dir = os.path.join(out_dir, "routed")
        got = {}
        for d in os.listdir(routed_dir):
            if not d.startswith("route="):
                continue
            n = 0
            for f in os.listdir(os.path.join(routed_dir, d)):
                if f.endswith(".json"):
                    with open(os.path.join(routed_dir, d, f)) as fh:
                        n += sum(1 for line in fh if line.strip())
            got[d.removeprefix("route=")] = n
        # hand-built route_copy twin
        conds = [
            CopyCondition(sink="flusher_0_flusher_sls", key="level", value="ERROR"),
            CopyCondition(sink="flusher_1_flusher_kafka", key="level", value="INFO"),
            CopyCondition(sink="flusher_2_flusher_file"),
        ]
        want = {
            r["route"]: r["n"]
            for r in route_copy(df, conds).groupBy("route")
            .count().withColumnRenamed("count", "n").collect()
        }
        assert got == want == {
            "flusher_0_flusher_sls": 2,
            "flusher_1_flusher_kafka": 1,
            "flusher_2_flusher_file": 4,
        }

    def test_bad_match_type_raises(self, spark, tmp_path):
        cfg = {"processors": [], "flushers": [
            {"Type": "flusher_sls", "Match": {"Type": "event_type", "Value": "log"}}]}
        df = spark.createDataFrame([("x",)], "a string")
        with pytest.raises(KeyError, match="event_type"):
            run_ilogtail_config(spark, cfg, df=df, out_dir=str(tmp_path / "s"))


class TestStreamingConfig:
    """run_ilogtail_config_stream: the same YAML compiles to a Structured
    Streaming query — Match-routed idempotent micro-batch sinks,
    checkpointed resume picks up only NEW files."""

    CFG = {
        "inputs": [{"Type": "input_file", "FilePaths": []}],  # set per test
        "processors": [{
            "Type": "processor_regex", "SourceKey": "content",
            "Regex": r"(\w+) (\d+)", "Keys": ["level", "code"],
        }],
        "flushers": [
            {"Type": "flusher_sls",
             "Match": {"Type": "tag", "Key": "level", "Value": "ERROR"}},
            {"Type": "flusher_file"},
        ],
    }

    def _routed_counts(self, spark, out_dir):
        import pyspark.sql.functions as F

        df = spark.read.parquet(f"{out_dir}/routed")
        return {
            (r["route"], r["batch_id"]): r["n"]
            for r in df.groupBy("route", "batch_id")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }

    def test_stream_match_routing_and_resume(self, spark, tmp_path):
        from ilogtail_spark.plans.config import run_ilogtail_config_stream

        watch = tmp_path / "logs"
        watch.mkdir()
        (watch / "a.log").write_text("ERROR 1\nINFO 2\nERROR 3\n")
        cfg = dict(self.CFG)
        cfg["inputs"] = [{"Type": "input_file", "FilePaths": [str(watch)]}]
        out_dir = str(tmp_path / "sinks")

        run_ilogtail_config_stream(spark, cfg, out_dir=out_dir, timeout_sec=90)
        got = self._routed_counts(spark, out_dir)
        by_route = {}
        for (route, _b), n in got.items():
            by_route[route] = by_route.get(route, 0) + n
        assert by_route == {
            "flusher_0_flusher_sls": 2,      # the two ERROR lines
            "flusher_1_flusher_file": 3,     # unconditional: everything
        }

        # drop a NEW file and restart: checkpointed offsets mean only the
        # new file is processed (the reference's resume-from-offset)
        (watch / "b.log").write_text("ERROR 9\n")
        run_ilogtail_config_stream(spark, cfg, out_dir=out_dir, timeout_sec=90)
        by_route2 = {}
        for (route, _b), n in self._routed_counts(spark, out_dir).items():
            by_route2[route] = by_route2.get(route, 0) + n
        assert by_route2 == {
            "flusher_0_flusher_sls": 3,
            "flusher_1_flusher_file": 4,
        }

    def test_multiline_raises_on_stream(self, spark, tmp_path):
        from ilogtail_spark.plans.config import run_ilogtail_config_stream

        cfg = {
            "inputs": [{"Type": "input_file", "FilePaths": [str(tmp_path)]}],
            "processors": [{"Type": "processor_split_log_regex",
                            "SplitRegex": r"\d+.*"}],
            "flushers": [{"Type": "flusher_file"}],
        }
        with pytest.raises(ValueError, match="stream_merge_multiline"):
            run_ilogtail_config_stream(spark, cfg, out_dir=str(tmp_path / "o"))


class TestSplProcessor:
    def test_spl_script_through_yaml(self, spark):
        df = spark.createDataFrame(
            [("GET /a 200",), ("POST /b 500",)], "content string"
        )
        cfg = {"processors": [{
            "Type": "processor_spl",
            "Script": ("* | parse-regexp content, '(\\w+) (\\S+) (\\d+)' "
                       "as method, url, status | where status = '500'"),
            "TimeoutMilliSeconds": 1000,
        }]}
        rows = run_ilogtail_config(spark, cfg, df=df).collect()
        assert len(rows) == 1
        assert rows[0]["method"] == "POST" and rows[0]["url"] == "/b"


class TestNetworkInputReplay:
    """service_syslog / service_http_server inputs in offline-replay
    form: FilePaths carries the archived frames; the decoder half runs
    at reference parameter names (syslog.go:52-54,
    input_http_server.go:59-66)."""

    def test_service_syslog_auto(self, spark, tmp_path):
        p = tmp_path / "frames.log"
        p.write_text(
            "<60>Oct 09 14:36:47 hostname program: message\n"
            "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - boom\n"
            "garbage\n"
        )
        df = read_inputs(spark, {"inputs": [{
            "Type": "service_syslog",
            "FilePaths": [str(p)],
            "ParseProtocol": "auto",
            "IgnoreParseFailure": True,
        }]})
        rows = sorted(
            (r["_priority_"], r["_program_"], r["content"])
            for r in df.collect()
        )
        assert rows == [
            ("-1", "", "garbage"),
            ("34", "su", "boom"),
            ("60", "program", "message"),
        ]

    def test_syslog_chains_into_processors(self, spark, tmp_path):
        # decoded _content_ is re-exposed as `content`, so a default
        # SourceKey processor chains on
        p = tmp_path / "frames.log"
        p.write_text("<13>Aug  1 14:32:44 h root: code=42 msg=ok\n")
        cfg = {
            "inputs": [{"Type": "service_syslog", "FilePaths": [str(p)],
                        "ParseProtocol": "rfc3164"}],
            "processors": [{"Type": "processor_split_key_value",
                            "SourceKey": "content", "Delimiter": " ",
                            "Separator": "=", "Keys": ["code", "msg"]}],
        }
        row = run_ilogtail_config(spark, cfg, df=read_inputs(spark, cfg)).collect()[0]
        assert row["code"] == "42" and row["msg"] == "ok"

    def test_http_server_influx(self, spark, tmp_path):
        p = tmp_path / "points.txt"
        p.write_text("cpu,host=a value=0.5,idle=7i 1700000000000000000\n")
        df = read_inputs(spark, {"inputs": [{
            "Type": "service_http_server",
            "Format": "influxdb",
        } | {"FilePaths": [str(p)]}]})
        rows = sorted((r["__name__"], r["__value__"]) for r in df.collect())
        assert rows == [("cpu", "0.5"), ("cpu:idle", "7")]

    def test_http_server_statsd(self, spark, tmp_path):
        p = tmp_path / "metrics.txt"
        p.write_text("hits:4|c|@0.5|#env:ci\n")
        df = read_inputs(spark, {"inputs": [{
            "Type": "service_http_server", "Format": "statsd",
            "FilePaths": [str(p)],
        }]})
        r = df.collect()[0]
        assert (r["__name__"], r["__labels__"], r["__value__"]) == \
            ("hits", "env#$#ci", 8.0)
        assert r["__time_nano__"] is None  # no arrival time in replay

    def test_http_server_influx_e2e_case(self, spark, tmp_path):
        """Mirrors /root/reference/test/e2e/test_cases/input_http_server/
        case.feature: Format=influxdb + FieldsExtend over the case's own
        frame `weather,city=hz value=32` must yield the feature file's
        expected kv set (__name__/__value__/__labels__/__type__); the
        `__tag__:db` entry is the HTTP query param — transport, n/a."""
        p = tmp_path / "body.txt"
        p.write_text("weather,city=hz value=32\n")
        df = read_inputs(spark, {"inputs": [{
            "Type": "service_http_server", "Format": "influxdb",
            "FieldsExtend": True, "FilePaths": [str(p)],
        }]})
        r = df.collect()[0]
        assert r["__name__"] == "weather"
        assert r["__value__"] == "32"
        assert r["__labels__"] == "city#$#hz"
        assert r["__type__"] == "float"

    def test_container_stdio_multiline_e2e_case(self, spark, tmp_path):
        """Mirrors /root/reference/test/e2e/test_cases/
        input_container_stdio_multiline/case.feature: containerd-format
        stdout with Multiline.StartPattern "today" must merge into one
        record whose content is exactly 'today\nhello' with
        _source_=stdout (stderr ignored)."""
        p = tmp_path / "0.log"
        p.write_text(
            "2024-01-01T00:00:01.000000000Z stdout F today\n"
            "2024-01-01T00:00:02.000000000Z stdout F hello\n"
            "2024-01-01T00:00:03.000000000Z stderr F noise\n"
            "2024-01-01T00:00:04.000000000Z stdout F today\n"
            "2024-01-01T00:00:05.000000000Z stdout F again\n"
        )
        df = read_inputs(spark, {"inputs": [{
            "Type": "input_container_stdio",
            "FilePaths": [str(p)],
            "IgnoringStderr": True,
            "Multiline": {"StartPattern": "today"},
        }]})
        rows = sorted(r["content"] for r in df.collect())
        assert rows == ["today\nagain", "today\nhello"]
        srcs = {r["_source_"] for r in df.collect()}
        assert srcs == {"stdout"}

    def test_container_stdio_partial_parts(self, spark, tmp_path):
        # containerd P-flag parts concatenate with NO separator
        p = tmp_path / "0.log"
        p.write_text(
            "2024-01-01T00:00:01Z stdout P hel\n"
            "2024-01-01T00:00:01Z stdout P lo \n"
            "2024-01-01T00:00:01Z stdout F world\n"
        )
        df = read_inputs(spark, {"inputs": [{
            "Type": "input_container_stdio", "FilePaths": [str(p)],
        }]})
        assert [r["content"] for r in df.collect()] == ["hello world"]

    def test_filepaths_required(self, spark):
        with pytest.raises(ValueError, match="FilePaths"):
            read_inputs(spark, {"inputs": [{"Type": "service_syslog"}]})


class TestNetworkInputStream:
    def test_syslog_stream_decode(self, spark, tmp_path):
        """service_syslog frames tailed as a stream decode through the
        same stateless projection the batch reader uses."""
        from ilogtail_spark.plans.config import run_ilogtail_config_stream

        watch = tmp_path / "frames"
        watch.mkdir()
        (watch / "a.log").write_text(
            "<60>Oct 09 14:36:47 hostname program: message one\n"
            "<13>Aug  1 14:32:44 h root: message two\n"
        )
        cfg = {
            "inputs": [{"Type": "service_syslog", "FilePaths": [str(watch)],
                        "ParseProtocol": "rfc3164"}],
            "processors": [],
            "flushers": [{"Type": "flusher_file"}],
        }
        out_dir = str(tmp_path / "sinks")
        run_ilogtail_config_stream(spark, cfg, out_dir=out_dir, timeout_sec=90)
        got = spark.read.parquet(f"{out_dir}/flusher_0_flusher_file")
        rows = sorted((r["_program_"], r["content"]) for r in got.collect())
        assert rows == [("program", "message one"), ("root", "message two")]
