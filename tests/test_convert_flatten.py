"""custom_single_flatten converter parity with the reference's Go unit
tests (pkg/protocol/converter/converter_single_log_flatten_test.go) and
dynamic sink-name templating (pkg/fmtstr/format_topic.go)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.operators.convert import compile_topic, custom_single_flatten

# the logGroup of TestConvertToSimpleFlat (flatten_test.go:44-82)
GO_CONTENTS = {
    "method": "PUT",
    "status": "200",
    "__tag__:__user_defined_id__": "machine",
    "__tag__:__path__": "/root/test/origin/example.log",
    "__tag__:_node_name_": "node",
    "__tag__:_node_ip_": "172.10.1.19",
    "__tag__:_namespace_": "default",
    "__tag__:_pod_name_": "container",
    "__tag__:_pod_uid_": "12AFERR234SG-SBH6D67HJ9-AAD-VF34",
    "__tag__:_container_name_": "container",
    "__tag__:_container_ip_": "172.10.0.45",
    "__tag__:_image_name_": "image",
    "__tag__:label": "tag",
    "__log_topic__": "file",
}
GO_GROUP_TAGS = {
    "__hostname__": "alje834hgf",
    "__pack_id__": "AEDCFGHNJUIOPLMN-1E",
    "env": "K8S",
}
SCHEMA = (
    "log_time long, fields map<string,string>, src string, topic string"
)


def _go_df(spark):
    return spark.createDataFrame(
        [(1662434209, GO_CONTENTS, "172.10.0.56", "file"),
         (1662434487, {**GO_CONTENTS, "method": "GET", "status": "404"},
          "172.10.0.56", "file")],
        SCHEMA,
    )


class TestGoVectorRename:
    """First Convey block: k8s daemonset, tag renames + @timestamp."""

    RENAME = {"k8s.node.ip": "ip", "host.name": "hostname",
              "label": "tag", "env": "env_tag"}

    def _run(self, spark):
        out = custom_single_flatten(
            _go_df(spark), "fields", "log_time",
            group_tags=GO_GROUP_TAGS, source_col="src", topic_col="topic",
            tag_key_rename=self.RENAME,
            protocol_key_rename={"time": "@timestamp"},
            k8s=True,
        ).orderBy("log_time").collect()
        return [json.loads(r["flat_json"]) for r in out]

    def test_key_space_and_values(self, spark):
        logs = self._run(spark)
        assert len(logs) == 2
        for i, d in enumerate(logs):
            # every ShouldContainKey of flatten_test.go:92-107
            for key in ("method", "@timestamp", "log.file.path", "hostname",
                        "host.ip", "log.topic", "ip", "k8s.node.name",
                        "k8s.namespace.name", "k8s.pod.name", "k8s.pod.uid",
                        "k8s.container.name", "k8s.container.ip",
                        "k8s.container.image.name", "tag", "env_tag"):
                assert key in d, key
            assert d["method"] == ("PUT", "GET")[i]
            assert d["status"] == ("200", "404")[i]
            assert d["@timestamp"] == (1662434209, 1662434487)[i]  # numeric
            assert d["hostname"] == "alje834hgf"
            assert d["host.ip"] == "172.10.0.56"
            assert d["ip"] == "172.10.1.19"
            assert d["env_tag"] == "K8S"
            # __tag__:__user_defined_id__ and __pack_id__ never emitted
            assert "__user_defined_id__" not in json.dumps(d)
            assert "pack" not in json.dumps(d)

    def test_selected_fields_via_compile_topic(self, spark):
        """ToByteStreamWithSelectedFields' content./tag. resolution
        (flatten_test.go:110-122), expressed through compile_topic —
        including the rename-map fallback for tag.host.name."""
        df = _go_df(spark)
        col = compile_topic(
            "%{content.method}|%{tag.host.name}|%{tag.ip}",
            contents_col="fields",
            static_tags={"hostname": "alje834hgf", "ip": "172.10.1.19"},
            tag_key_rename=self.RENAME,
        )
        vals = [r[0] for r in df.orderBy("log_time").select(col).collect()]
        assert vals == ["PUT|alje834hgf|172.10.1.19",
                        "GET|alje834hgf|172.10.1.19"]


class TestGoVectorNullRename:
    """Second Convey block: renames to "" DELETE the tags
    (flatten_test.go:131-210)."""

    def test_empty_rename_deletes(self, spark):
        out = custom_single_flatten(
            _go_df(spark), "fields", "log_time",
            group_tags=GO_GROUP_TAGS, source_col="src", topic_col="topic",
            tag_key_rename={"k8s.node.ip": "", "host.name": "",
                            "label": "", "env": ""},
            k8s=True,
        ).first()
        d = json.loads(out["flat_json"])
        for key in ("time", "method", "status", "log.file.path", "host.ip",
                    "log.topic", "k8s.node.name", "k8s.namespace.name",
                    "k8s.pod.name", "k8s.pod.uid", "k8s.container.name",
                    "k8s.container.ip", "k8s.container.image.name"):
            assert key in d, key
        for deleted in ("k8s.node.ip", "host.name", "label", "env",
                        "ip", "hostname", "tag", "env_tag"):
            assert deleted not in d, deleted
        assert isinstance(d["time"], int)


class TestFlattenSemantics:
    def test_tags_override_contents_and_json_sorted(self, spark):
        df = spark.createDataFrame(
            [(7, {"host.name": "from-content", "a": 'q"uote'}, "1.2.3.4", "t")],
            SCHEMA,
        )
        out = custom_single_flatten(
            df, "fields", "log_time",
            group_tags={"__hostname__": "real-host"}, source_col="src",
        ).first()
        d = json.loads(out["flat_json"])
        assert d["host.name"] == "real-host"  # tag wins the collision
        assert d["a"] == 'q"uote'             # escaping survives round-trip
        keys = list(json.loads(out["flat_json"], object_pairs_hook=list))
        assert [k for k, _ in keys] == sorted(k for k, _ in keys)  # Go order
        assert dict(out["flat"])["host.name"] == "real-host"

    def test_same_target_collision_follows_map_order(self, spark):
        """Two content keys that both land on log.file.path: with a map
        built by create_map (order-preserving, the analog of the Go
        Contents slice), the LATER entry wins — slice semantics."""
        df = spark.range(1).select(
            F.lit(7).alias("log_time"),
            F.create_map(
                F.lit("__path__"), F.lit("early"),
                F.lit("__tag__:__path__"), F.lit("late"),
            ).alias("fields"),
        )
        d = json.loads(
            custom_single_flatten(df, "fields", "log_time").first()["flat_json"]
        )
        assert d["log.file.path"] == "late"

    def test_time_key_collision_time_wins(self, spark):
        """ADVICE r4: a content key equal to the (renamed) time protocol
        key must be OVERWRITTEN by the numeric time — the reference's
        map assignment writes Time last. No duplicate JSON keys, and the
        flat map drops the colliding string entry."""
        df = spark.range(1).select(
            F.lit(7).alias("log_time"),
            F.create_map(
                F.lit("time"), F.lit("bogus"), F.lit("m"), F.lit("1")
            ).alias("fields"),
        )
        out = custom_single_flatten(df, "fields", "log_time").first()
        d = json.loads(out["flat_json"])
        assert d == {"m": "1", "time": 7}
        assert out["flat_json"].count('"time"') == 1
        assert "time" not in out["flat"]
        # renamed time key: the collision follows the RENAMED name
        df2 = spark.range(1).select(
            F.lit(9).alias("log_time"),
            F.create_map(
                F.lit("@ts"), F.lit("bogus"), F.lit("time"), F.lit("kept")
            ).alias("fields"),
        )
        out2 = custom_single_flatten(
            df2, "fields", "log_time", protocol_key_rename={"time": "@ts"}
        ).first()
        d2 = json.loads(out2["flat_json"])
        assert d2 == {"@ts": 9, "time": "kept"}

    def test_only_contents(self, spark):
        df = spark.createDataFrame(
            [(7, {"m": "1", "__tag__:x": "y"}, "1.2.3.4", "t")], SCHEMA
        )
        out = custom_single_flatten(
            df, "fields", "log_time", group_tags={"g": "v"},
            source_col="src", only_contents=True,
        ).first()
        assert json.loads(out["flat_json"]) == {"m": "1", "time": 7}


class TestCustomSingleNested:
    """Nested custom_single protocol (custom_single_log.go:32-62):
    contents and tags stay in separate namespaces."""

    def test_namespaces_and_protocol_key_rename(self, spark):
        from ilogtail_spark.operators.convert import custom_single

        out = custom_single(
            _go_df(spark), "fields", "log_time",
            group_tags=GO_GROUP_TAGS, source_col="src", topic_col="topic",
            protocol_key_rename={"time": "@ts", "contents": "c", "tags": "t"},
            k8s=True,
        ).orderBy("log_time").first()
        d = json.loads(out["single_json"])
        assert set(d) == {"@ts", "c", "t"}
        assert d["@ts"] == 1662434209
        assert d["c"] == {"method": "PUT", "status": "200"}
        assert d["t"]["log.file.path"] == "/root/test/origin/example.log"
        assert d["t"]["host.name"] == "alje834hgf"
        assert d["t"]["host.ip"] == "172.10.0.56"
        assert d["t"]["k8s.container.name"] == "container"
        assert "__user_defined_id__" not in json.dumps(d)

    def test_collision_keeps_both_namespaces(self, spark):
        from ilogtail_spark.operators.convert import custom_single

        df = spark.createDataFrame(
            [(7, {"host.name": "from-content"}, "1.2.3.4", "t")], SCHEMA
        )
        d = json.loads(
            custom_single(
                df, "fields", "log_time",
                group_tags={"__hostname__": "real-host"}, source_col="src",
            ).first()["single_json"]
        )
        # unlike the flatten variant, both values survive
        assert d["contents"]["host.name"] == "from-content"
        assert d["tags"]["host.name"] == "real-host"


class TestDynamicTopicRouting:
    def test_templated_topic_routed_write(self, spark, tmp_path):
        """format_topic as a route column driving a partitioned sink
        write — kafka-style dynamic topics (%{content.field}): one
        one-pass partitionBy(route) write, per-sink counts asserted."""
        rows = [(i, {"app": ("web", "db")[i % 2], "lvl": "info"}, "s", "t")
                for i in range(20)]
        df = spark.createDataFrame(rows, SCHEMA)
        routed = df.withColumn(
            "route",
            compile_topic("logs_%{content.app}", contents_col="fields"),
        )
        out = str(tmp_path / "sinks")
        routed.select("log_time", "route").write.partitionBy(
            "route"
        ).mode("overwrite").parquet(out)
        back = spark.read.parquet(out).groupBy("route").count().collect()
        counts = {r["route"]: r["count"] for r in back}
        assert counts == {"logs_web": 10, "logs_db": 10}

    def test_unknown_variable_renders_as_name(self, spark):
        df = spark.createDataFrame([(1, {"a": "x"}, "s", "t")], SCHEMA)
        col = compile_topic("p_%{content.missing}_%{weird}",
                            contents_col="fields")
        assert df.select(col).first()[0] == "p_content.missing_weird"

    def test_timestamp_expression_index_name(self, spark):
        """FormatIndex's %{+pattern} (format_index.go:20) — the
        Logstash-style time-based Elasticsearch index name."""
        import pytest

        df = spark.createDataFrame(
            [(1, {"app": "web"}, "s", "t")], SCHEMA
        ).withColumn("ts", F.lit("2024-03-05 10:00:00").cast("timestamp"))
        col = compile_topic("logs-%{content.app}-%{+yyyy.MM.dd}",
                            contents_col="fields", time_col="ts")
        assert df.select(col).first()[0] == "logs-web-2024.03.05"
        with pytest.raises(ValueError, match="time_col"):
            compile_topic("x-%{+yyyyMM}", contents_col="fields")
