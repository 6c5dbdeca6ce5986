"""Randomized differential test for the prom_parse line grammar: build
exposition lines from known components (with whitespace, escapes,
comments, exemplars, and malformed variants mixed in), parse them in
ONE Spark job, and compare against the expected decomposition."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ilogtail_spark.operators.prom import labels_str, prom_parse

DEFAULT_TS, DEFAULT_NS = 1_700_000_000, 7


def _mk_case(rng: random.Random, rid: int):
    """Returns (rid, line, expected) where expected is None for a line
    the parser must drop, else (labels_str, value, ts, ns)."""
    kind = rng.randrange(10)
    if kind == 0:
        return rid, rng.choice(["# HELP x", "  # TYPE y counter", "", "   "]), None
    if kind == 1:  # malformed
        return rid, rng.choice(
            ['{k="v"} 1', "9metric 1", 'm{k=v} 1', 'm{k="v" 1', "m one", 'm{k="v"}']
        ), None

    name = rng.choice(["m", "http_req_total", "a:b_c", "_x1"])
    n_labels = rng.randrange(4)
    pairs, expect = [], {"__name__": name}
    for i in range(n_labels):
        k = rng.choice(["k1", "k2", "aB_3", "_z"])
        style = rng.randrange(3)
        if style == 0:
            v, dec = "plain%d" % rng.randrange(99), None
        elif style == 1:
            v, dec = r"a\nb\\c\"d", 'a\nb\\c"d'
        else:
            v, dec = "", None
        pairs.append((k, v))
        expect[k] = dec if dec is not None else v
    ws = lambda: rng.choice(["", " ", "  ", "\t"])  # noqa: E731
    blob = ""
    if pairs or rng.random() < 0.3:
        inner = ",".join(f'{ws()}{k}{ws()}={ws()}"{v}"{ws()}' for k, v in pairs)
        blob = "{" + inner + (("," + ws()) if pairs and rng.random() < 0.3 else "") + "}"

    vstyle = rng.randrange(4)
    if vstyle == 0:
        val_tok, val = "2", 2.0
    elif vstyle == 1:
        val_tok, val = "9.941e+10", 9.941e10
    elif vstyle == 2:
        val_tok, val = "-0.5", -0.5
    else:
        val_tok, val = "+Inf", float("inf")

    tstyle = rng.randrange(3)
    if tstyle == 0:
        ts_tok, ts, ns = "", DEFAULT_TS, DEFAULT_NS
    elif tstyle == 1:
        ms = 1_715_829_785_083 + rng.randrange(1000)
        ts_tok, ts, ns = f" {ms}", ms // 1000, (ms % 1000) * 1_000_000
    else:
        secs = 1_715_829_000 + rng.randrange(600)  # < 2^31: seconds scale
        ts_tok, ts, ns = f" {secs}", secs, 0

    exemplar = " # exemplar stuff" if rng.random() < 0.25 else ""
    line = f"{ws()}{name}{ws()}{blob}{ws()}{val_tok}{ts_tok}{exemplar}"
    lbl = "|".join(f"{k}#$#{v}" for k, v in sorted(expect.items()))
    return rid, line, (lbl, val, ts, ns)


def test_parse_matches_generator(spark):
    rng = random.Random(99)
    cases = [_mk_case(rng, i) for i in range(300)]
    df = spark.createDataFrame(
        [(rid, line) for rid, line, _ in cases], "rid int, text string"
    )
    out = {
        r["rid"]: r
        for r in prom_parse(df, "text", default_ts=DEFAULT_TS, default_ns=DEFAULT_NS)
        .select(
            "rid",
            labels_str(F.col("labels")).alias("l"),
            "__value__",
            "__time__",
            "__time_ns__",
        )
        .collect()
    }
    for rid, line, expected in cases:
        if expected is None:
            assert rid not in out, (rid, line, out.get(rid))
        else:
            lbl, val, ts, ns = expected
            got = out.get(rid)
            assert got is not None, (rid, line)
            assert got["l"] == lbl, (rid, line, got["l"], lbl)
            assert got["__value__"] == val, (rid, line)
            assert (got["__time__"], got["__time_ns__"]) == (ts, ns), (rid, line)
