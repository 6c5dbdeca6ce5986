"""Parquet table loaders for the driver-provided test data.

Replaces the reference's ~50 input plugins (plugins/input/*,
core/plugin/input/InputFile.h:45): in a Spark-first design every input
collapses to a declarative scan that Catalyst can prune — column pruning
and predicate pushdown reach the parquet reader for free, which is the
scale-path equivalent of the reference's file-offset checkpointing (only
read what the query needs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each parquet table as a temp view (idempotent)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
