"""Deterministic transcript generator (seed-free: pure arithmetic).

Produces the BASELINE.json `input_hint` table at any scale for tests and
benchmarks — mirrors the reference's mock inputs
(plugins/input/mock/metric_mock.go) and its benchmark generator (fixed
nginx-format lines, test/benchmark/.../case.feature).

Reuses the exact text-format logic of sources/transcripts.py by
synthesizing an `events`-shaped intermediate, so generated data and
oracle-checked data share ONE format implementation.

Skew: every 97th conversation is "hot" (50× turns) to exercise the salted
repartition / AQE skew path — 10^12-turn tables always have hot convs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ilogtail_spark.sources.transcripts import TRANSCRIPTS_SQL_BODY

TURNS_PER_CONV = 20  # base; hot convs get 50x
HOT_EVERY = 97
HOT_FACTOR = 50
_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def gen_transcripts(
    spark: SparkSession,
    n_convs: int,
    *,
    view_name: str = "events",
    partitions: int | None = None,
) -> DataFrame:
    """Generate ~n_convs * TURNS_PER_CONV turns (plus hot-conv tail).

    Built from `spark.range` + column expressions only — distributed,
    deterministic, no Python on workers, no shuffle except the
    turn-ordering window inside the shared SQL body.
    """
    convs = spark.range(0, n_convs, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    convs = convs.withColumn(
        "n_turns",
        F.when(F.col("id") % HOT_EVERY == 0, F.lit(TURNS_PER_CONV * HOT_FACTOR)).otherwise(
            F.lit(TURNS_PER_CONV) + (F.col("id") % 7).cast("int")
        ),
    )
    events = convs.select(
        F.col("id").alias("user_id"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn"),
    ).select(
        (F.col("user_id") * 10000 + F.col("turn")).alias("event_id"),
        F.col("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("purchase"),
                    F.lit("error"), F.lit("signup")),
            ((F.col("user_id") * 13 + F.col("turn")) % 5 + 1).cast("int"),
        ).alias("event_type"),
        F.timestamp_seconds(
            F.lit(_EPOCH) + F.col("user_id") * 3600 + F.col("turn") * 7
        ).alias("ts"),
    )
    events.createOrReplaceTempView(view_name)
    return spark.sql(TRANSCRIPTS_SQL_BODY)
