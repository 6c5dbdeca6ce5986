"""processor_otel_metric reshape semantics
(pkg/protocol/decoder/opentelemetry/otlp_metric_parser.go)."""

from __future__ import annotations

import json

from ilogtail_spark.operators.transform import otel_metric_reshape

PAYLOAD = json.dumps({
    "resourceMetrics": [{
        "resource": {"attributes": [
            {"key": "host", "value": {"stringValue": "h1"}}]},
        "scopeMetrics": [{"metrics": [
            {"name": "cpu", "gauge": {"dataPoints": [
                {"attributes": [{"key": "core", "value": {"intValue": "0"}}],
                 "timeUnixNano": "1000", "asDouble": 0.5}]}},
            {"name": "req", "sum": {"isMonotonic": True, "dataPoints": [
                {"timeUnixNano": "2000", "asInt": "42"}]}},
            {"name": "lat", "histogram": {"dataPoints": [
                {"timeUnixNano": "3000", "count": "6", "sum": 7.5,
                 "explicitBounds": [0.5, 2.5],
                 "bucketCounts": ["1", "2", "3"]}]}},
            {"name": "size", "summary": {"dataPoints": [
                {"timeUnixNano": "4000", "count": "3", "sum": 9.0,
                 "quantileValues": [{"quantile": 0.5, "value": 2.0},
                                    {"quantile": 0.99, "value": 5.0}]}]}},
        ]}],
    }],
})


def _rows(spark):
    df = spark.createDataFrame([(PAYLOAD,)], "text string")
    return otel_metric_reshape(df).collect()


class TestOtelMetric:
    def test_gauge(self, spark):
        g = [r for r in _rows(spark) if r["__name__"] == "cpu"]
        assert len(g) == 1
        assert g[0]["__labels__"] == "core#$#0|host#$#h1"
        assert g[0]["__time_nano__"] == 1000 and g[0]["__value__"] == 0.5

    def test_sum_monotonic_label(self, spark):
        s = [r for r in _rows(spark) if r["__name__"] == "req"]
        assert s[0]["__labels__"] == "host#$#h1|otlp.metric.ismonotonic#$#true"
        assert s[0]["__value__"] == 42.0

    def test_histogram_cumulative_buckets(self, spark):
        rows = _rows(spark)
        by = {r["__name__"]: r for r in rows}
        assert by["lat_sum"]["__value__"] == 7.5
        assert by["lat_count"]["__value__"] == 6.0
        # cumulative counts (otlp_metric_parser.go:220-225) incl. +Inf bound
        buckets = {
            r["__labels__"]: r["__value__"]
            for r in rows if r["__name__"] == "lat_bucket"
        }
        assert buckets == {
            "host#$#h1|le#$#0.5": 1.0,
            "host#$#h1|le#$#2.5": 3.0,
            "host#$#h1|le#$#+Inf": 6.0,
        }
        # min/max were absent (0) → no _min/_max rows
        assert "lat_min" not in by and "lat_max" not in by

    def test_summary_quantiles(self, spark):
        rows = _rows(spark)
        by = {r["__name__"]: r for r in rows}
        assert by["size_sum"]["__value__"] == 9.0
        assert by["size_count"]["__value__"] == 3.0
        q = {
            r["__labels__"]: r["__value__"]
            for r in rows if r["__name__"] == "size"
        }
        assert q == {
            "host#$#h1|quantile#$#0.5": 2.0,
            "host#$#h1|quantile#$#0.99": 5.0,
        }

    def test_id_cols_carry_through(self, spark):
        df = spark.createDataFrame([("c1", PAYLOAD)], "conv_id string, text string")
        out = otel_metric_reshape(df, id_cols=("conv_id",)).collect()
        assert all(r["conv_id"] == "c1" for r in out)
