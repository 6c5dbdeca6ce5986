"""SPL compiler tests — operator corpus mirrors core/unittest/spl/SplUnittest.cpp."""

from __future__ import annotations

import pytest

from ilogtail_spark.operators.transform import encrypt_fields
from ilogtail_spark.plans.spl import spl_query


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        ("10.0.0.1 GET /a 200", '{"body":{"a":"x"},"status":"200"}', "k1=v1&k2=v2", "a,b,c"),
        ("10.0.0.2 POST /b 500", '{"body":{"a":"y"},"status":"500"}', "k1=v9&k2=v8", "d,e,f"),
    ]
    return spark.createDataFrame(
        rows, "content string, js string, kv string, csv string"
    ).cache()


class TestSpl:
    def test_where(self, logs):
        # SplUnittest.cpp:93
        out = spl_query(logs, "* | where content like '%GET%'").collect()
        assert len(out) == 1 and "GET" in out[0]["content"]

    def test_extend_json_extract(self, logs):
        # SplUnittest.cpp:151 — extend a=json_extract(js,'$.body.a')
        out = spl_query(
            logs, "* | extend a=json_extract(js, '$.body.a') | where a='x'"
        ).collect()
        assert len(out) == 1 and out[0]["a"] == "x"

    def test_parse_regexp(self, logs):
        # SplUnittest.cpp:267
        out = spl_query(
            logs,
            r"* | parse-regexp content, '(\S+) (\S+) (\S+) (\d+)' as ip, method, path, status"
            " | where status='500'",
        ).collect()
        assert len(out) == 1 and out[0]["ip"] == "10.0.0.2"

    def test_parse_csv(self, logs):
        # SplUnittest.cpp:338
        out = spl_query(logs, "* | parse-csv csv as x, y, z | project x, z").collect()
        assert sorted((r["x"], r["z"]) for r in out) == [("a", "c"), ("d", "f")]

    def test_parse_kv(self, logs):
        # SplUnittest.cpp:415
        out = spl_query(logs, "* | parse-kv -delims='&=' kv as k1, k2").collect()
        assert sorted(r["k1"] for r in out) == ["v1", "v9"]

    def test_parse_json_dynamic(self, logs):
        # SplUnittest.cpp:198 — flat keys expand, nested stay stringified
        flat = logs.sparkSession.createDataFrame(
            [('{"a":"1","b":"2"}',), ('{"a":"3","c":"4"}',)], "js string"
        )
        out = spl_query(flat, "* | parse-json js").collect()
        cols = set(out[0].asDict().keys())
        assert {"a", "b", "c"} <= cols

    def test_parse_json_schema_given(self, logs):
        # `as` form: key set supplied, no driver-side key discovery at all
        flat = logs.sparkSession.createDataFrame(
            [('{"a":"1","b":"2"}',), ('{"a":"3","c":"4"}',)], "js string"
        )
        out = spl_query(flat, "* | parse-json js as a, c").collect()
        by_a = {r["a"]: r for r in out}
        assert by_a["3"]["c"] == "4" and by_a["1"]["c"] is None
        assert "b" not in out[0].asDict()

    def test_project_rename_away(self, logs):
        # SplUnittest.cpp:491 + project-away doc example
        out = spl_query(
            logs, "* | project-rename body=js | project-away content, kv, csv"
        )
        assert out.columns == ["body"]

    def test_stats(self, logs):
        out = spl_query(
            logs,
            r"* | parse-regexp content, '(\S+) (\S+)' as ip, method"
            " | stats count(1) as n by method",
        ).collect()
        assert sorted((r["method"], r["n"]) for r in out) == [("GET", 1), ("POST", 1)]

    def test_sort_limit(self, logs):
        out = spl_query(logs, "* | sort by content desc | limit 1").collect()
        assert len(out) == 1 and out[0]["content"].startswith("10.0.0.2")

    def test_unknown_op_raises(self, logs):
        with pytest.raises(ValueError):
            spl_query(logs, "* | frobnicate x")


class TestEncrypt:
    def test_aes_cbc_hex_deterministic(self, spark):
        df = spark.createDataFrame([("secret",), (None,)], "v string")
        key = "00112233445566778899aabbccddeeff"  # hex → 16-byte AES-128 key
        out = encrypt_fields(df, ["v"], key).collect()
        vals = [r["v"] for r in out]
        hexv = [v for v in vals if v][0]
        assert set(hexv) <= set("0123456789ABCDEF") and len(hexv) >= 32
        assert "" in vals  # null → empty unless keep_source_value_if_error
        out2 = encrypt_fields(df, ["v"], key).collect()
        assert sorted(map(str, out)) == sorted(map(str, out2))
