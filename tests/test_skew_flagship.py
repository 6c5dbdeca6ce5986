"""Skewed-flagship proof: the salted two-level ordering drop-in.

A 10^12-turn table always has hot conversations; the plain
`stable_order` window funnels each whole conversation into one task.
This test runs the flagship spec end-to-end on a generator with planted
~100x hot conversations and asserts that swapping `stable_order` for
`stable_order_salted` changes NOTHING about the output — same per-sink
counts, same per-row dense sequence — so the skew-safe plan is a pure
physical substitution. Wall-clock numbers for the same swap at bench
scale are recorded in SCALE.md.
"""

from pyspark.sql import functions as F

from ilogtail_spark.operators.aggregate import stable_order, stable_order_salted
from ilogtail_spark.plans.pipeline import FLAGSHIP_SPEC, build_pipeline


def _skewed_transcripts(spark):
    """2 hot convs x 50k turns + 5k cold convs x 20 turns (~100k + 100k
    rows): the hot/cold ratio that makes one window task dominate."""
    hot = spark.range(100000).select(
        F.concat(F.lit("hot-"), (F.col("id") % 2).cast("string")).alias("conv_id"),
        (F.col("id") / 2).cast("int").alias("turn_idx"),
    )
    cold = spark.range(100000).select(
        F.concat(F.lit("cold-"), (F.col("id") % 5000).cast("string")).alias(
            "conv_id"
        ),
        (F.col("id") / 5000).cast("int").alias("turn_idx"),
    )
    t = hot.unionAll(cold)
    return t.select(
        "conv_id",
        "turn_idx",
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
            (F.col("turn_idx") % 4 + 1).cast("int"),
        ).alias("role"),
        F.concat(F.lit("line-"), F.col("turn_idx").cast("string")).alias("text"),
        F.when(F.col("turn_idx") % 4 == 3, F.lit("python")).alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


def test_salted_flagship_identical_output(spark):
    src = _skewed_transcripts(spark)
    routed = build_pipeline(src, FLAGSHIP_SPEC)

    plain = stable_order(routed, "conv_id", "turn_idx")
    salted = stable_order_salted(routed, "conv_id", "turn_idx", salt_width=256)

    cols = ["conv_id", "turn_idx", "route", "role_group", "seq"]
    a, b = plain.select(cols), salted.select(cols)
    assert a.exceptAll(b).isEmpty()
    assert b.exceptAll(a).isEmpty()

    # per-sink counts survive the swap (the flagship delivered-count check)
    ca = {r["route"]: r["n"] for r in plain.groupBy("route").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    cb = {r["route"]: r["n"] for r in salted.groupBy("route").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert ca == cb and sum(ca.values()) == 200000

    # the hot conv really is dense 0..n-1 in BOTH plans
    mx = salted.where(F.col("conv_id") == "hot-0").agg(
        F.max("seq").alias("m"), F.count(F.lit(1)).alias("n")).first()
    assert mx["m"] == mx["n"] == 50000
