"""Regression tests for the round-2 self-review findings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.grok import compile_grok, grok_parse
from ilogtail_spark.operators.apsara import apsara_parse
from ilogtail_spark.operators.route import RouteRule
from ilogtail_spark.operators.transform import otel_metric_reshape, string_replace


class TestGrokRegressions:
    def test_multi_match_duplicate_alias_branches(self, spark):
        # HTTPD_ERRORLOG duplicates timestamp/loglevel across branches;
        # the multi-match fill path must take the participating branch
        df = spark.createDataFrame(
            [("[Wed Oct 11 14:32:52 2000] [error] [client 1.2.3.4] oops",),
             ("nomatch-line",)],
            "text string",
        )
        out = grok_parse(df, ["%{HTTPD_ERRORLOG}", r"%{GREEDYDATA:raw}"]).collect()
        by_raw = {r["raw"]: r for r in out}
        hit = [r for r in out if r["loglevel"] is not None][0]
        assert hit["timestamp"] == "Wed Oct 11 14:32:52 2000"
        assert hit["loglevel"] == "error"
        assert by_raw.get("nomatch-line") is not None  # second expr caught it

    def test_inline_named_group_is_a_field(self, spark):
        # (?<name>…) is standard grok syntax; reference extracts it like
        # an alias (processor_grok.go:148)
        cg = compile_grok(r"(?<q>\w+)=%{INT:v}")
        assert cg.keys == ["q", "v"]
        df = spark.createDataFrame([("key=42",)], "text string")
        r = grok_parse(df, r"(?<q>\w+)=%{INT:v}").first()
        assert r["q"] == "key" and r["v"] == "42"

    def test_python_style_named_group(self):
        cg = compile_grok(r"(?P<name>[a-z]+) %{INT:n}")
        assert cg.keys == ["name", "n"]
        # lookbehind is NOT a named group and must pass through
        cg2 = compile_grok(r"(?<![0-9])%{INT:n}")
        assert cg2.keys == ["n"]


class TestRouteRuleValidation:
    def test_neither_set_raises(self):
        with pytest.raises(ValueError, match="exactly one"):
            RouteRule("status", None, "sink_x")

    def test_both_set_raises(self):
        with pytest.raises(ValueError, match="exactly one"):
            RouteRule("status", r"5\d\d", "sink_x", between=(500, 599))


class TestUnquoteNul:
    def test_literal_nul_preserved(self, spark):
        df = spark.createDataFrame([('"a\x00b"',)], "v string")
        out = string_replace(df, "v", method="unquote").first()
        assert out["v"] == "a\x00b"

    def test_nul_next_to_escapes(self, spark):
        df = spark.createDataFrame([('"a\x00\\\\nb"',)], "v string")
        out = string_replace(df, "v", method="unquote").first()
        assert out["v"] == "a\x00\\nb"


class TestOtelLabelEdges:
    def test_sort_by_key_not_packed_string(self, spark):
        # key 'a b' contains a space (< '#'): packed-string sort would put
        # it before 'a'; key sort (the reference's) puts 'a' first
        payload = (
            '{"resourceMetrics":[{"resource":{"attributes":['
            '{"key":"a b","value":{"stringValue":"x"}},'
            '{"key":"a","value":{"stringValue":"y"}}]},'
            '"scopeMetrics":[{"metrics":[{"name":"m","gauge":{"dataPoints":'
            '[{"timeUnixNano":"1","asDouble":1.0}]}}]}]}]}'
        )
        df = spark.createDataFrame([(payload,)], "text string")
        r = otel_metric_reshape(df).first()
        assert r["__labels__"] == "a#$#y|a b#$#x"

    def test_small_bound_not_scientific(self, spark):
        payload = (
            '{"resourceMetrics":[{"resource":{"attributes":[]},'
            '"scopeMetrics":[{"metrics":[{"name":"m","histogram":{"dataPoints":'
            '[{"timeUnixNano":"1","count":"2","explicitBounds":[0.0005],'
            '"bucketCounts":["1","1"]}]}}]}]}]}'
        )
        df = spark.createDataFrame([(payload,)], "text string")
        labels = {r["__labels__"] for r in otel_metric_reshape(df).collect()
                  if r["__name__"] == "m_bucket"}
        assert labels == {"le#$#0.0005", "le#$#+Inf"}


class TestApsaraDuplicateKeys:
    def test_first_occurrence_wins(self, spark):
        df = spark.createDataFrame(
            [("[1378882630]\t[INFO]\tk:1\tk:2\tz:9",)], "text string"
        )
        r = apsara_parse(df).first()  # must not throw DUPLICATED_MAP_KEY
        assert r["fields"]["k"] == "1" and r["fields"]["z"] == "9"


class TestMultimodalNullPayload:
    def test_null_payload_does_not_crash(self, spark):
        from ilogtail_spark.functions.multimodal import (
            extract_features,
            resize_media,
            sample_frames,
        )

        df = spark.createDataFrame(
            [(1, "video", None, (64, 64, 3000, "h264"))],
            "media_id long, kind string, payload binary, "
            "meta struct<width:int,height:int,duration_ms:int,codec:string>",
        )
        assert extract_features(df).count() == 1
        assert resize_media(df, 8, 8).first()["payload"] is not None
        assert sample_frames(df, every_ms=1000).count() == 3


class TestAdviceRound5:
    """Regression tests for the round-5 ADVICE findings."""

    def test_bloom_literal_nonmultiple_of_64_bits(self, spark):
        # ADVICE: words was sized n_bits//64, so n_bits=100 either
        # raised IndexError during fill or silently dropped candidates
        # whose probe landed in the last partial word (false negatives)
        from ilogtail_spark.functions.dedup import (
            bloom_contamination,
            ngram_contamination,
        )

        docs = spark.range(40).selectExpr(
            "id AS doc_id",
            "array_join(transform(sequence(0, 19), "
            "i -> concat('t', cast((id * 3 + i * i) % 37 AS string))), ' ')"
            " AS text",
        )
        train = docs.filter("doc_id % 7 != 0")
        test = docs.filter("doc_id % 7 = 0")
        exact = {
            (r["train_id"], r["test_id"]): r["shared_ngrams"]
            for r in ngram_contamination(
                train, test, n=3, min_shared=2
            ).collect()
        }
        assert exact
        for literal in (False, True):
            got = {
                (r["train_id"], r["test_id"]): r["shared_ngrams"]
                for r in bloom_contamination(
                    train, test, n=3, min_shared=2,
                    n_bits=100, n_hashes=3, bitmap_literal=literal,
                ).collect()
            }
            assert got == exact, f"bitmap_literal={literal}"

    def test_grok_empty_alternation_branch_flagged(self):
        # ADVICE: (a||b)+ — empty branch means the empty word matches
        # at every position (genuinely catastrophic); the branch filter
        # used to drop it before the Sardinas-Patterson check
        from ilogtail_spark.grok import lint_backtracking

        assert lint_backtracking(r"(a||b)+c")
        assert lint_backtracking(r"(?:x||y)+z")
        # non-literal variant with an empty branch hits the same guard
        assert lint_backtracking(r"(\d+||[a-f]+)+!")
        with pytest.raises(ValueError, match="backtrack"):
            compile_grok(r"(a||b)+c", custom_patterns={})

    def test_bm25_stats_empty_corpus(self, spark):
        # ADVICE: bm25_corpus_stats on an empty corpus returned
        # avgdl=None and bm25_topk(stats=...) crashed on float(None)
        from ilogtail_spark.functions.retrieval import (
            bm25_corpus_stats,
            bm25_topk,
        )

        empty = spark.createDataFrame([], "doc_id long, text string")
        stats = bm25_corpus_stats(empty, ["spark", "vector"])
        assert stats == {
            "n_docs": 0, "avgdl": 0.0, "sum_dl": 0,
            "df": {"spark": 0, "vector": 0},
        }
        assert bm25_topk(empty, ["spark", "vector"], stats=stats).count() == 0
        # inline-stats path on the same corpus stays graceful too
        assert bm25_topk(empty, ["spark", "vector"]).count() == 0
