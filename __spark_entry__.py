"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ilogtail_spark package; the registry is
ilogtail_spark.queries (one Spark/DuckDB pair per operator from
SURVEY.md §2 plus the training-data ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full
    parse → enrich → route → aggregate pipeline over the deterministic
    transcripts table (per-sink × role_group counts + byte sums)."""
    from ilogtail_spark.queries import q_pipeline_e2e

    return q_pipeline_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ordered_queries rotates the registry so the driver's bounded
    # verification window (a prefix of this dict) cycles through every
    # family across rounds instead of re-verifying the same static head
    from ilogtail_spark.queries import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    from ilogtail_spark.queries import ORACLES, ordered_queries

    return {nm: ORACLES[nm] for nm in ordered_queries() if nm in ORACLES}
