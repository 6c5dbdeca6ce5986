"""Grok compiler tests — semantics of processor_grok
(plugins/processor/grok/processor_grok.go) without any Go code."""

from __future__ import annotations

import re

import pytest

from ilogtail_spark.grok import DEFAULT_PATTERNS, CompiledGrok, compile_grok, grok_parse


class TestCompile:
    def test_simple_alias(self):
        cg = compile_grok("%{INT:n}")
        assert cg.keys == ["n"]
        m = re.search(cg.regex, "x -42 y")
        assert m.group(1) == "-42"

    def test_nested_patterns_fully_inline(self):
        cg = compile_grok("%{NUMBER:v}")  # NUMBER -> BASE10NUM
        assert "%{" not in cg.regex
        assert re.fullmatch(cg.regex, "3.14").group(1) == "3.14"

    def test_group_indices_count_user_parens(self):
        cg = compile_grok(r"(\w+)=%{INT:v}")
        # user literal group shifts the alias to group 2
        assert cg.fields == [("v", "string", 2)]
        m = re.search(cg.regex, "k=5")
        assert m.group(2) == "5"

    def test_library_inner_parens_do_not_capture(self):
        # IPV4 contains parens; they must not shift user groups
        cg = compile_grok("%{IPV4:ip} %{INT:code}")
        m = re.search(cg.regex, "10.1.2.3 404")
        assert m.group(cg.fields[0][2]) == "10.1.2.3"
        assert m.group(cg.fields[1][2]) == "404"

    def test_types(self):
        cg = compile_grok("%{INT:a:int} %{NUMBER:b:float}")
        assert cg.types == {"a": "int", "b": "float"}

    def test_unknown_pattern_raises(self):
        with pytest.raises(KeyError):
            compile_grok("%{NOPE:x}")

    def test_cycle_detection(self):
        with pytest.raises(ValueError, match="cycle"):
            compile_grok("%{A:x}", {"A": "%{B}", "B": "%{A}"})

    def test_combined_apachelog(self):
        cg = compile_grok("%{COMBINEDAPACHELOG}", None)
        # no aliases at top level (unaliased ref discards inner aliases)
        assert isinstance(cg, CompiledGrok)

    def test_default_patterns_all_compile(self):
        for name in DEFAULT_PATTERNS:
            compile_grok(f"%{{{name}:x}}")


class TestGrokParse:
    def test_single_match(self, spark):
        df = spark.createDataFrame([("2021-08-27 13:04:14.920 INFO ok",)], "text string")
        out = grok_parse(
            df, r"%{TIMESTAMP_ISO8601:t} %{LOGLEVEL:lvl} %{GREEDYDATA:msg}"
        ).first()
        assert out["t"] == "2021-08-27 13:04:14.920"
        assert out["lvl"] == "INFO"
        assert out["msg"] == "ok"

    def test_multi_match_priority(self, spark):
        # first matching expression wins (processor_grok.go:135-173)
        df = spark.createDataFrame(
            [("code=7",), ("level=INFO",), ("nomatch",)], "text string"
        )
        out = grok_parse(
            df,
            [r"code=%{INT:code:int}", r"level=%{LOGLEVEL:level}"],
        ).collect()
        by_text = {r["text"]: r for r in out}
        # matched rows dropped source? keep_source default True for grok here
        codes = [r for r in out if r["code"] is not None]
        levels = [r for r in out if r["level"] is not None]
        assert len(codes) == 1 and codes[0]["code"] == 7
        assert len(levels) == 1 and levels[0]["level"] == "INFO"
        assert len(by_text) == 3

    def test_typed_cast(self, spark):
        df = spark.createDataFrame([("status 500 bytes 1234",)], "text string")
        out = grok_parse(df, r"status %{INT:st:int} bytes %{INT:b:long}").first()
        assert out["st"] == 500 and out["b"] == 1234
