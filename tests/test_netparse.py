"""Network-input decoders (operators/netparse.py) vs the reference's
own test vectors:

- syslog RFC3164/RFC5424/auto — the exact frames of
  /root/reference/plugins/input/syslog/parser_test.go:29-250
- statsd / influx line protocol / OTLP-JSON logs — semantics of
  pkg/protocol/decoder/{statsd,influxdb,opentelemetry}.
"""

import json

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.operators.netparse import (
    influx_decode,
    otlp_log_decode,
    statsd_decode,
    syslog_parse,
)
from tests.conftest import spark  # noqa: F401  (fixture)


def _rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


class TestSyslogRfc3164:
    # parser_test.go:29-115 (year pinned to 2025; reference uses now().Year())
    VECTORS = [
        ("<60>Oct 09 14:36:47 hostname program: message",
         "program", "60", "7", "4", "hostname", "message"),
        ("<34>Aug  2 09:49:23 hostname program: message",
         "program", "34", "4", "2", "hostname", "message"),
        ("<86>Jul 31 13:14:22 rs1e13316 su: pam_unix(su:session): session closed for user nobody",
         "su", "86", "10", "6", "rs1e13316",
         "pam_unix(su:session): session closed for user nobody"),
        ("<13>Aug  1 14:32:44 ecs-test-yyh root: dfjksdfjkdlsfjsklf",
         "root", "13", "1", "5", "ecs-test-yyh", "dfjksdfjkdlsfjsklf"),
        ("<85>Aug  1 14:31:58 ecs-test-yyh polkitd[457]: Registered Authentication Agent for unix-process:22755:258653719 (system bus name :1.10269 [/usr/bin/pkttyagent --notify-fd 5 --fallback], object path /org/freedesktop/PolicyKit1/AuthenticationAgent, locale en_US.UTF-8)",
         "polkitd", "85", "10", "5", "ecs-test-yyh",
         "Registered Authentication Agent for unix-process:22755:258653719 (system bus name :1.10269 [/usr/bin/pkttyagent --notify-fd 5 --fallback], object path /org/freedesktop/PolicyKit1/AuthenticationAgent, locale en_US.UTF-8)"),
        ("<13>Aug 17 03:42:11 ecs-test-yyh LOGSTASH[-]: hello, a syslog from logstash",
         "LOGSTASH", "13", "1", "5", "ecs-test-yyh",
         "hello, a syslog from logstash"),
    ]

    def test_vectors(self, spark):  # noqa: F811
        df = spark.createDataFrame([(v[0],) for v in self.VECTORS], ["text"])
        out = syslog_parse(df, protocol="rfc3164", default_year=2025)
        got = _rows(out, "_program_", "_priority_", "_facility_",
                    "_severity_", "_hostname_", "_content_")
        assert got == [v[1:] for v in self.VECTORS]

    def test_timestamp_nanos(self, spark):  # noqa: F811
        df = spark.createDataFrame(
            [("<60>Oct 09 14:36:47 hostname program: message",)], ["text"]
        )
        out = syslog_parse(df, protocol="rfc3164", default_year=2025)
        # 2025-10-09T14:36:47Z
        assert out.collect()[0]["_unixtimestamp_"] == "1760020607000000000"

    def test_parse_failure_kept(self, spark):  # noqa: F811
        df = spark.createDataFrame([("garbage",)], ["text"])
        r = syslog_parse(df, protocol="rfc3164",
                         hostname_fallback="hx").collect()[0]
        assert (r["_priority_"], r["_facility_"], r["_severity_"]) == \
            ("-1", "-1", "-1")
        assert r["_content_"] == "garbage"
        assert r["_hostname_"] == "hx"
        assert r["_unixtimestamp_"] is None

    def test_parse_failure_dropped(self, spark):  # noqa: F811
        df = spark.createDataFrame(
            [("garbage",), ("<13>Aug  1 14:32:44 h root: x",)], ["text"]
        )
        out = syslog_parse(df, protocol="rfc3164", ignore_parse_failure=False)
        assert out.count() == 1

    def test_add_hostname_mode(self, spark):  # noqa: F811
        # parser_test.go:132-170: frame with no hostname token
        df = spark.createDataFrame(
            [("<86>Apr 16 14:33:06 su: pam_unix(su:session): session opened for user root by (uid=0)",)],
            ["text"],
        )
        r = syslog_parse(df, protocol="rfc3164", add_hostname=True,
                         hostname_fallback="me", default_year=2025).collect()[0]
        assert r["_program_"] == "su"
        assert r["_hostname_"] == "me"
        assert r["_content_"].startswith("pam_unix(su:session): session opened")

    def test_priority_range_guard(self, spark):  # noqa: F811
        df = spark.createDataFrame(
            [("<999>Aug  1 14:32:44 h root: x",)], ["text"]
        )
        r = syslog_parse(df, protocol="rfc3164").collect()[0]
        assert r["_priority_"] == "-1"  # >191 is not a valid PRI


class TestSyslogRfc5424:
    def test_full_vector(self, spark):  # noqa: F811
        # parser_test.go:185-204
        line = ('<29>1 2016-02-21T04:32:57+00:00 web1 someservice 2341 2 '
                '[origin][meta sequence="14125553" service="someservice"] '
                '"GET /v1/ok HTTP/1.1" 200 145 "-" "hacheck 0.9.0" 24306 '
                '127.0.0.1:40124 575')
        df = spark.createDataFrame([(line,)], ["text"])
        r = syslog_parse(df, protocol="rfc5424").collect()[0]
        assert r["_program_"] == "someservice"
        assert (r["_priority_"], r["_facility_"], r["_severity_"]) == \
            ("29", "3", "5")
        assert r["_hostname_"] == "web1"
        assert r["_process_id_"] == "2341"
        assert r["_message_id_"] == "2"
        assert json.loads(r["_structured_data_"]) == {
            "origin": {},
            "meta": {"sequence": "14125553", "service": "someservice"},
        }
        # Go json.Marshal key order (sorted) — byte-level contract
        assert r["_structured_data_"].startswith('{"meta":')
        assert r["_content_"] == ('"GET /v1/ok HTTP/1.1" 200 145 "-" '
                                  '"hacheck 0.9.0" 24306 127.0.0.1:40124 575')
        assert r["_unixtimestamp_"] == "1456029177000000000"

    def test_nilvalues_and_fraction(self, spark):  # noqa: F811
        # parser_test.go:206-219
        line = ("<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - "
                "ID47 - BOM'su root' failed for lonvick on /dev/pts/8")
        df = spark.createDataFrame([(line,)], ["text"])
        r = syslog_parse(df, protocol="rfc5424").collect()[0]
        assert r["_program_"] == "su"
        assert r["_process_id_"] is None
        assert r["_message_id_"] == "ID47"
        assert r["_structured_data_"] is None
        assert r["_content_"] == "BOM'su root' failed for lonvick on /dev/pts/8"
        assert r["_unixtimestamp_"] == "1065910455003000000"

    def test_nil_hostname_appname(self, spark):  # noqa: F811
        # '-' NILVALUE hostname/appname: program stays "" and hostname
        # takes the fallback (parser.go:156-163, syslog.go:420-423)
        df = spark.createDataFrame(
            [("<34>1 2003-10-11T22:14:15Z - - - - - msg body",)], ["text"]
        )
        r = syslog_parse(df, protocol="rfc5424",
                         hostname_fallback="me").collect()[0]
        assert r["_program_"] == ""
        assert r["_hostname_"] == "me"
        assert r["_priority_"] == "34"
        assert r["_content_"] == "msg body"

    def test_rfc3164_frame_fails_5424(self, spark):  # noqa: F811
        df = spark.createDataFrame(
            [("Jul 29 06:20:01 ecs-test-yyh systemd: Started Session 4530 of user root.",)],
            ["text"],
        )
        r = syslog_parse(df, protocol="rfc5424").collect()[0]
        assert r["_priority_"] == "-1"
        assert r["_content_"].startswith("Jul 29 06:20:01")


class TestSyslogAuto:
    def test_mixed_stream(self, spark):  # noqa: F811
        rows = [
            ("<60>Oct 09 14:36:47 hostname program: message",),
            ("<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - msg",),
            ("neither",),
        ]
        df = spark.createDataFrame(rows, ["text"])
        out = syslog_parse(df, protocol="auto", default_year=2025)
        got = _rows(out, "_program_", "_priority_")
        assert got == [("program", "60"), ("su", "34"), ("", "-1")]

    def test_default_parser_requires_ignore(self, spark):  # noqa: F811
        df = spark.createDataFrame([("x",)], ["text"])
        with pytest.raises(ValueError, match="IgnoreParseFailure"):
            syslog_parse(df, protocol="", ignore_parse_failure=False)
        r = syslog_parse(df, protocol="").collect()[0]
        assert r["_content_"] == "x" and r["_priority_"] == "-1"

    def test_unknown_protocol(self, spark):  # noqa: F811
        df = spark.createDataFrame([("x",)], ["text"])
        with pytest.raises(ValueError, match="Unsupported parser protocol"):
            syslog_parse(df, protocol="cef")


class TestLabelKeySort:
    def test_prefix_key_sorts_by_name_not_pair_string(self, spark):  # noqa: F811
        # 'env.id:3' vs 'env:prod': raw-pair sort would put env.id first
        # ('.' < ':'); MetricLabels sorts by KEY (log_helper.go:140)
        df = spark.createDataFrame(
            [("m:1|c|#env:prod,env.id:3",)], ["text"]
        ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
        r = statsd_decode(df).collect()[0]
        assert r["__labels__"] == "env#$#prod|env.id#$#3"

    def test_influx_prefix_tag_key_sort(self, spark):  # noqa: F811
        df = spark.createDataFrame(
            [("m,env=prod,env.id=3 value=1 5",)], ["text"]
        )
        r = influx_decode(df).collect()[0]
        assert r["__labels__"] == "env#$#prod|env.id#$#3"


class TestStatsdDecode:
    def test_counter_rate_tags(self, spark):  # noqa: F811
        df = spark.createDataFrame(
            [("page.views:15|c|@0.5|#env:prod,region:eu",),
             ("latency:3.2|ms|#svc:api",),
             ("gauge1:42|g",),
             ("garbage",)],
            ["text"],
        ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
        got = _rows(statsd_decode(df), "__name__", "__labels__", "__value__")
        assert got == [
            ("page.views", "env#$#prod|region#$#eu", 30.0),  # 15 / 0.5
            ("latency", "svc#$#api", 3.2),
            ("gauge1", "", 42.0),
        ]


class TestInfluxDecode:
    LINE = "cpu,host=a,dc=eu value=0.64,idle=12i,up=true 1700000000000000000"

    def test_per_field_rows(self, spark):  # noqa: F811
        df = spark.createDataFrame([(self.LINE,), ("not a line",)], ["text"])
        got = _rows(influx_decode(df),
                    "__name__", "__labels__", "__time_nano__", "__value__")
        assert got == [
            ("cpu", "dc#$#eu|host#$#a", 1700000000000000000, "0.64"),
            ("cpu:idle", "dc#$#eu|host#$#a", 1700000000000000000, "12"),
            ("cpu:up", "dc#$#eu|host#$#a", 1700000000000000000, "1"),
        ]

    def test_fields_extend_strings(self, spark):  # noqa: F811
        df = spark.createDataFrame(
            [('weather,city=sf temp=22.5,desc="sunny" 5',)], ["text"]
        )
        plain = influx_decode(df)
        assert plain.count() == 1  # string field skipped
        ext = influx_decode(df, fields_extend=True)
        got = _rows(ext, "__name__", "__value__", "__type__", "__field__")
        assert got == [
            ("weather:temp", "22.5", "float", "temp"),
            ("weather:desc", "sunny", "string", "desc"),
        ]

    def test_time_fallback(self, spark):  # noqa: F811
        df = spark.createDataFrame(
            [("m value=1",)], ["text"]
        ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
        r = influx_decode(df, time_col="ts").collect()[0]
        assert r["__time_nano__"] == 1704067200000000000


class TestOtlpLogDecode:
    DOC = json.dumps({
        "resourceLogs": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "api"}},
                {"key": "host", "value": {"stringValue": "h1"}},
            ]},
            "scopeLogs": [{"logRecords": [
                {"timeUnixNano": "1700000000000000000", "severityNumber": 9,
                 "severityText": "INFO", "body": {"stringValue": "hello"},
                 "attributes": [
                     {"key": "b", "value": {"stringValue": "2"}},
                     {"key": "a", "value": {"stringValue": "1"}},
                 ]},
                {"timeUnixNano": "1700000000000000001", "severityNumber": 17,
                 "severityText": "ERROR", "body": {"stringValue": "boom"},
                 "attributes": []},
            ]}],
        }]
    })

    def test_records(self, spark):  # noqa: F811
        df = spark.createDataFrame([(self.DOC,)], ["body"])
        got = _rows(otlp_log_decode(df),
                    "time_unix_nano", "severity_number", "severity_text",
                    "content", "attributes", "resources")
        res = '{"host":"h1","service.name":"api"}'  # sorted keys
        assert got == [
            ("1700000000000000000", "9", "INFO", "hello",
             '{"a":"1","b":"2"}', res),
            ("1700000000000000001", "17", "ERROR", "boom", None, res),
        ]
