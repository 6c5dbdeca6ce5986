"""Prometheus exposition parse + relabel.

Vectors mirror core/unittest/prometheus/TextParserUnittest.cpp and
RelabelUnittest.cpp.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.operators.prom import (
    RelabelRule,
    labels_str,
    prom_parse,
    prom_relabel,
)


def _parse(spark, lines, **kw):
    df = spark.createDataFrame([(ln,) for ln in lines], "text string")
    out = prom_parse(df, "text", **kw)
    return {
        r["__name__"]: r
        for r in out.select(
            "__name__",
            labels_str(F.col("labels")).alias("l"),
            "__value__",
            "__time__",
            "__time_ns__",
        ).collect()
    }


def test_parse_reference_vectors(spark):
    # TextParserUnittest.cpp: sample with labels, value, ms timestamp
    rows = _parse(
        spark,
        [
            'test_metric{k1="v1", k2="v2"} 9.9410452992e+10 1715829785083 # exemplars',
            'test_metric2{k1="v1",k2="v2",} 2 1715829785083',  # trailing comma ok
            "# HELP a comment line",
            "   ",
        ],
        default_ts=111,
        default_ns=222,
    )
    assert set(rows) == {"test_metric", "test_metric2"}
    m = rows["test_metric"]
    assert m["l"] == "__name__#$#test_metric|k1#$#v1|k2#$#v2"
    assert m["__value__"] == pytest.approx(9.9410452992e10)
    assert m["__time__"] == 1715829785
    assert m["__time_ns__"] == 83000000
    assert rows["test_metric2"]["__value__"] == 2.0


def test_parse_empty_label_values_and_no_ts(spark):
    # container_blkio vector: empty label values are kept as tags
    rows = _parse(
        spark,
        [
            'container_blkio{container="",device="/dev/nvme0n1",operation="Async"} 3 1715829785083',
            'no_ts_metric{a="x"} 3.5',
        ],
        default_ts=1700000000,
        default_ns=7,
    )
    assert (
        rows["container_blkio"]["l"]
        == "__name__#$#container_blkio|container#$#|device#$#/dev/nvme0n1|operation#$#Async"
    )
    nt = rows["no_ts_metric"]
    assert (nt["__time__"], nt["__time_ns__"]) == (1700000000, 7)


def test_parse_seconds_scale_and_honor_timestamps(spark):
    # TextParser.cpp:311-313: ts below 2^31 is seconds, scaled to ms
    rows = _parse(spark, ["secs_metric 1.5 1715829785"], default_ts=1)
    assert rows["secs_metric"]["__time__"] == 1715829785
    assert rows["secs_metric"]["__time_ns__"] == 0
    # honorTimestamps=false: always the scrape default (:269,316-319)
    rows = _parse(
        spark,
        ["m 1.5 1715829785083"],
        default_ts=42,
        default_ns=9,
        honor_timestamps=False,
    )
    assert (rows["m"]["__time__"], rows["m"]["__time_ns__"]) == (42, 9)


def test_parse_escapes_inf_and_errors(spark):
    rows = _parse(
        spark,
        [
            'esc{p="a\\nb",q="c\\"d",r="e\\\\f",s="g\\xh"} 1',
            "inf_metric +Inf",
            "nan_metric NaN",
            "exemplar_only 2.0#ex",
            "bad line {",
            'noval{k="v"}',
            'dup{k="a",k="b"} 1',  # SetTag overwrite: last wins
        ],
        default_ts=0,
    )
    assert rows["esc"]["l"] == '__name__#$#esc|p#$#a\nb|q#$#c"d|r#$#e\\f|s#$#g\\xh'
    assert rows["inf_metric"]["__value__"] == math.inf
    assert math.isnan(rows["nan_metric"]["__value__"])
    assert rows["exemplar_only"]["__value__"] == 2.0
    assert "bad" not in " ".join(rows)
    assert "noval" not in rows
    assert rows["dup"]["l"] == "__name__#$#dup|k#$#b"


def _relabel(spark, labels, rules):
    df = spark.createDataFrame([(labels,)], "labels map<string,string>")
    out = prom_relabel(df, rules)
    return dict(out.select("labels").first()["labels"])


def test_relabel_keep_drop(spark):
    # RelabelUnittest TestProcess: keep on __meta_kubernetes_pod_ip
    labels = {
        "__address__": "172.17.0.3:9100",
        "__meta_kubernetes_pod_ip": "172.17.0.3",
    }
    keep = [
        RelabelRule(
            action="keep",
            source_labels=("__meta_kubernetes_pod_ip",),
            regex="172.*",
        )
    ]
    assert _relabel(spark, labels, keep) == labels
    drop = [RelabelRule(action="drop", source_labels=("__address__",), regex="172.*")]
    df = spark.createDataFrame([(labels,)], "labels map<string,string>")
    assert prom_relabel(df, drop).count() == 0
    # keep is a FULL match (boost::regex_match): partial must drop
    partial = [
        RelabelRule(action="keep", source_labels=("__address__",), regex="172")
    ]
    assert prom_relabel(df, partial).count() == 0


def test_relabel_replace_first_only_and_empty_deletes(spark):
    # boost format_first_only (Relabel.cpp:156-157): only the first
    # occurrence is rewritten and the unmatched prefix/suffix is KEPT —
    # in both the replacement value AND the expanded target-label name
    # (unlike Go Prometheus, whose ExpandString drops prefix/suffix).
    out = _relabel(
        spark,
        {"src": "aXbXc"},
        [
            RelabelRule(
                action="replace",
                source_labels=("src",),
                regex="X",
                target_label="t",
                replacement="Y",
            )
        ],
    )
    assert out["atbXc"] == "aYbXc"
    # full-span regex: target/replacement expand with no residue
    out = _relabel(
        spark,
        {"src": "host:9100"},
        [
            RelabelRule(
                action="replace",
                source_labels=("src",),
                regex="([^:]+):([0-9]+)",
                target_label="port",
                replacement="$2",
            )
        ],
    )
    assert out["port"] == "9100"
    # empty replacement result deletes the target (Relabel.cpp:158-161)
    out = _relabel(
        spark,
        {"src": "zz", "t": "old"},
        [
            RelabelRule(
                action="replace",
                source_labels=("src",),
                regex="(z+)",
                target_label="t",
                replacement="",
            )
        ],
    )
    assert "t" not in out
    # no regex match: label map untouched (Relabel.cpp:151-154)
    out = _relabel(
        spark,
        {"src": "abc", "t": "old"},
        [
            RelabelRule(
                action="replace",
                source_labels=("src",),
                regex="zzz",
                target_label="t",
                replacement="new",
            )
        ],
    )
    assert out["t"] == "old"


def test_relabel_hashmod_matches_md5_tail(spark):
    out = _relabel(
        spark,
        {"a": "v1"},
        [
            RelabelRule(
                action="hashmod",
                source_labels=("a",),
                target_label="m",
                modulus=222,
            )
        ],
    )
    digest = hashlib.md5(b"v1").digest()
    expect = int.from_bytes(digest[8:], "big") % 222
    assert out["m"] == str(expect)


def test_relabel_labelmap_case_and_meta_delete(spark):
    rules = [
        RelabelRule(action="labelmap", regex="k_(.*)", replacement="mapped_$1"),
        RelabelRule(action="lowercase", source_labels=("up",), target_label="lo"),
        RelabelRule(action="uppercase", source_labels=("lo",), target_label="up2"),
        # __-prefixed target is readable by later rules, deleted at end
        RelabelRule(
            action="replace",
            source_labels=("up",),
            regex="(.*)",
            target_label="__tmp",
            replacement="$1!",
        ),
        RelabelRule(
            action="replace",
            source_labels=("__tmp",),
            regex="(.*)",
            target_label="copied",
            replacement="$1",
        ),
        RelabelRule(action="labeldrop", regex="drop_.*"),
    ]
    out = _relabel(
        spark, {"k_a": "1", "up": "ABC", "drop_me": "x"}, rules
    )
    assert out == {
        "k_a": "1",
        "mapped_a": "1",
        "up": "ABC",
        "lo": "abc",
        "up2": "ABC",
        "copied": "ABC!",
    }


def test_relabel_keepequal_labelkeep(spark):
    labels = {"a": "x", "b": "x", "c": "y"}
    df = spark.createDataFrame([(labels,)], "labels map<string,string>")
    eq = [
        RelabelRule(action="keepequal", source_labels=("a",), target_label="b")
    ]
    assert prom_relabel(df, eq).count() == 1
    ne = [
        RelabelRule(action="keepequal", source_labels=("a",), target_label="c")
    ]
    assert prom_relabel(df, ne).count() == 0
    out = _relabel(spark, labels, [RelabelRule(action="labelkeep", regex="[ab]")])
    assert out == {"a": "x", "b": "x"}


def test_relabel_dynamic_meta_target_rejected(spark):
    df = spark.createDataFrame([({"a": "b"},)], "labels map<string,string>")
    with pytest.raises(NotImplementedError):
        prom_relabel(
            df,
            [
                RelabelRule(
                    action="replace",
                    source_labels=("a",),
                    regex="(.*)",
                    target_label="__dyn_$1",
                    replacement="x",
                )
            ],
        )
