"""ProcessorParseContainerLogNative / ProcessorParseApsaraNative edge
semantics (core/plugin/processor/inner/ProcessorParseContainerLogNative.cpp,
core/plugin/processor/ProcessorParseApsaraNative.cpp)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ilogtail_spark.operators.apsara import apsara_parse
from ilogtail_spark.operators.container import container_log_parse, merge_partial_logs


def _one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


class TestContainerdText:
    def test_full_line(self, spark):
        r = container_log_parse(
            _one(spark, "2021-08-25T07:00:00.000000000Z stdout F hello world"),
            fmt="containerd_text",
        ).first()
        assert r["_time_"] == "2021-08-25T07:00:00.000000000Z"
        assert r["_source_"] == "stdout"
        assert r["content"] == "hello world"
        assert r["is_partial"] is False

    def test_partial_flag(self, spark):
        r = container_log_parse(
            _one(spark, "t stderr P part one"), fmt="containerd_text"
        ).first()
        assert r["content"] == "part one"
        assert r["is_partial"] is True

    def test_untagged_content(self, spark):
        r = container_log_parse(
            _one(spark, "t stdout plain content"), fmt="containerd_text"
        ).first()
        assert r["content"] == "plain content"
        assert r["is_partial"] is False

    def test_malformed_tag_region(self, spark):
        # ProcessorParseContainerLogNative.cpp:241-250 — "PP 1" and a lone
        # trailing "P" are plain content, not flags
        r = container_log_parse(_one(spark, "t stdout PP 1"), fmt="containerd_text").first()
        assert r["content"] == "PP 1" and r["is_partial"] is False
        r2 = container_log_parse(_one(spark, "t stdout P"), fmt="containerd_text").first()
        assert r2["content"] == "P" and r2["is_partial"] is False

    def test_invalid_stream_is_parse_fail(self, spark):
        out = container_log_parse(
            _one(spark, "t bogus F x"), fmt="containerd_text",
            keep_source_if_parse_error=True,
        ).first()
        assert out["content"] is None
        assert out["text"] == "t bogus F x"  # source kept on parse fail

    def test_ignoring_stdout_drops_row(self, spark):
        df = spark.createDataFrame(
            [("t stdout F a",), ("t stderr F b",)], "text string"
        )
        out = container_log_parse(
            df, fmt="containerd_text", ignoring_stdout=True
        ).collect()
        assert [r["content"] for r in out] == ["b"]

    def test_merge_partial_runs(self, spark):
        df = spark.createDataFrame(
            [("c", 0, "t stdout P ab"), ("c", 1, "t stdout P cd"),
             ("c", 2, "t stdout F ef"), ("c", 3, "t stdout F solo")],
            "conv_id string, turn_idx int, text string",
        )
        p = container_log_parse(df, fmt="containerd_text")
        m = merge_partial_logs(p).orderBy("record_id").collect()
        assert [r["content"] for r in m] == ["abcdef", "solo"]
        assert m[0]["is_partial"] is False and m[0]["first_line_no"] == 0

    def test_reference_exception_stack_fixture(self, spark):
        # mirrors core/unittest/processor/
        # ProcessorParseContainerLogNativeUnittest.cpp:168-195 — P parts
        # keep their leading spaces and concatenate with NO separator
        lines = [
            "2024-01-05T23:28:06.818486411+08:00 stdout P Exception",
            "2024-01-05T23:28:07.818486411+08:00 stdout P  in thread",
            "2024-01-05T23:28:08.818486411+08:00 stdout P   'main'",
            "2024-01-05T23:28:09.818486411+08:00 stdout F  java.lang.NullPoinntterException",
        ]
        df = spark.createDataFrame(
            [("c", i, ln) for i, ln in enumerate(lines)],
            "conv_id string, turn_idx int, text string",
        )
        m = merge_partial_logs(container_log_parse(df, fmt="containerd_text")).first()
        assert m["content"] == (
            "Exception in thread  'main' java.lang.NullPoinntterException"
        )
        assert m["_time_"] == "2024-01-05T23:28:06.818486411+08:00"
        assert m["is_partial"] is False

    def test_merge_unclosed_record_flagged(self, spark):
        df = spark.createDataFrame(
            [("c", 0, "t stdout F done"), ("c", 1, "t stdout P dangling")],
            "conv_id string, turn_idx int, text string",
        )
        m = merge_partial_logs(
            container_log_parse(df, fmt="containerd_text")
        ).orderBy("record_id").collect()
        assert m[1]["content"] == "dangling" and m[1]["is_partial"] is True


class TestDockerJson:
    def test_strips_exactly_one_newline(self, spark):
        r = container_log_parse(
            _one(spark, '{"log":"msg\\n\\n","stream":"stdout","time":"T"}'),
            fmt="docker_json",
        ).first()
        assert r["content"] == "msg\n"  # only ONE trailing \n stripped (:517-519)
        assert r["_source_"] == "stdout" and r["_time_"] == "T"

    def test_invalid_json_keeps_source(self, spark):
        r = container_log_parse(_one(spark, "not json"), fmt="docker_json").first()
        assert r["content"] is None and r["text"] == "not json"

    def test_bad_stream_is_parse_fail(self, spark):
        r = container_log_parse(
            _one(spark, '{"log":"x","stream":"weird","time":"T"}'), fmt="docker_json"
        ).first()
        assert r["content"] is None


class TestApsara:
    LINE = ("[2013-09-11 03:11:05.123456]\t[WARNING]\t[32]\t"
            "[/build/core/app.cpp:88]\tmethod:get\tcode:200")

    def test_full_line(self, spark):
        r = apsara_parse(_one(spark, self.LINE), kv_keys=["method", "code"]).first()
        assert r["__LEVEL__"] == "WARNING"
        assert r["__THREAD__"] == "32"
        assert r["__FILE__"] == "/build/core/app.cpp"
        assert r["__LINE__"] == "88"
        assert r["method"] == "get" and r["code"] == "200"
        # 2013-09-11 03:11:05 UTC = 1378869065
        assert r["microtime"] == 1378869065_123456

    def test_epoch_time_form(self, spark):
        r = apsara_parse(_one(spark, "[1378882630]\t[INFO]\tk:v")).first()
        assert r["microtime"] == 1378882630_000000
        assert r["__LEVEL__"] == "INFO"

    def test_fields_map_when_no_kv_keys(self, spark):
        r = apsara_parse(_one(spark, self.LINE)).first()
        assert r["fields"]["method"] == "get"

    def test_base_field_order_independent_claims(self, spark):
        # thread before level; file field without colon → no __LINE__
        r = apsara_parse(_one(spark, "[1378882630]\t[7]\t[ERROR]\t[main.py]\tk:v")).first()
        assert r["__THREAD__"] == "7" and r["__LEVEL__"] == "ERROR"
        assert r["__FILE__"] == "main.py" and r["__LINE__"] is None

    def test_bad_time_keeps_source(self, spark):
        r = apsara_parse(_one(spark, "[not a time]\t[INFO]\tk:v")).first()
        assert r["microtime"] is None and r["text"] == "[not a time]\t[INFO]\tk:v"

    def test_no_kv_tail(self, spark):
        r = apsara_parse(_one(spark, "[1378882630]\t[INFO]")).first()
        assert r["fields"] is None or len(r["fields"]) == 0
