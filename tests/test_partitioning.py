"""Explicit-shuffle helpers: the cores-sized spread and its gate.

The r3 unconditional scan spread was a wasted full-data shuffle for
consumers that couldn't reuse it (VERDICT r4 item 1); these tests pin
the corrected contract: spread ONLY when the input has fewer splits
than the session parallelism, as a hash repartition on the consumer's
own aggregation key.
"""

from __future__ import annotations

from ilogtail_spark.partitioning import (
    cores_repartition,
    session_parallelism,
    spread_for_expansion,
)


class TestSpreadForExpansion:
    def test_narrow_input_spreads_to_cores(self, spark):
        df = spark.range(1000).coalesce(1)
        n = session_parallelism(df)
        out = spread_for_expansion(df, "id")
        assert out.rdd.getNumPartitions() == n
        # the spread is an Exchange on the requested key
        assert "hashpartitioning(id" in out._jdf.queryExecution().executedPlan().toString() \
            or "hashpartitioning(id" in out._jdf.queryExecution().toString()

    def test_wide_input_is_left_alone(self, spark):
        n = session_parallelism(spark.range(10))
        df = spark.range(10_000).repartition(n + 4)
        out = spread_for_expansion(df, "id")
        # gate: already >= cores splits -> NO repartition node inserted
        assert out is df

    def test_cores_repartition_always_shuffles(self, spark):
        df = spark.range(100).coalesce(1)
        out = cores_repartition(df, "id")
        assert out.rdd.getNumPartitions() == session_parallelism(df)
