"""Z-order write layout: footer-statistics skipping evidence.

The claim zorder_write makes — point predicates on EITHER clustered
column prune most files — is asserted directly from parquet footer
min/max, the same statistics a reader's row-group pruning uses."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ilogtail_spark.plans.layout import zorder_key, zorder_sql_expr, zorder_write

SF = "/root/testdata/sf0.001"


def _coverage(path: str, col: str, probe: int) -> tuple[int, int]:
    """(files whose [min,max] covers probe, total files)."""
    files = sorted(glob.glob(path + "/*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        if mn <= probe <= mx:
            hit += 1
    return hit, len(files)


class TestZorderKey:
    def test_matches_portable_sql(self, spark):
        e = spark.read.parquet(f"{SF}/events.parquet").limit(200)
        got = e.select(
            zorder_key("user_id", "event_id", bits=16).alias("a"),
            F.expr(zorder_sql_expr(["user_id", "event_id"], bits=16)).alias("b"),
        )
        assert got.filter(F.col("a") != F.col("b")).count() == 0

    def test_interleave_golden(self, spark):
        # 2 cols, 2 bits: a=0b11, b=0b01 -> bits a0@0 a1@2, b0@1 b1@3
        df = spark.createDataFrame([(3, 1)], "a long, b long")
        z = df.select(zorder_key("a", "b", bits=2).alias("z")).first()["z"]
        assert z == (1 << 0) | (1 << 2) | (1 << 1)  # 0b0111

    def test_width_guard(self, spark):
        with pytest.raises(ValueError, match="signed long"):
            zorder_key("a", "b", bits=32)


class TestZorderWrite:
    @pytest.fixture(scope="class")
    def layouts(self, spark, tmp_path_factory):
        base = tmp_path_factory.mktemp("zorder")
        e = spark.read.parquet(f"{SF}/events.parquet").select(
            "event_id", "user_id", "value"
        )
        zorder_write(e, str(base / "z"), ["user_id", "event_id"], 8)
        # the baseline every warehouse ships: sort on ONE column
        (
            e.repartitionByRange(8, "user_id")
            .sortWithinPartitions("user_id")
            .write.mode("overwrite")
            .parquet(str(base / "lin"))
        )
        return base

    def test_zorder_prunes_both_columns(self, layouts):
        zhit_e, zn = _coverage(str(layouts / "z"), "event_id", 500)
        zhit_u, _ = _coverage(str(layouts / "z"), "user_id", 7)
        assert zn == 8
        # measured: event_id probe reads 1/8 files, user_id probe ≤6/8
        assert zhit_e <= 3
        assert zhit_u <= 6

    def test_single_sort_cannot_prune_second_column(self, layouts):
        lhit_e, ln = _coverage(str(layouts / "lin"), "event_id", 500)
        lhit_u, _ = _coverage(str(layouts / "lin"), "user_id", 7)
        assert ln == 8
        assert lhit_u <= 2          # the sort column prunes perfectly…
        assert lhit_e == 8          # …the other column reads EVERYTHING
        # and zorder beats it on the non-sort column
        zhit_e, _ = _coverage(str(layouts / "z"), "event_id", 500)
        assert zhit_e < lhit_e

    def test_rows_preserved(self, spark, layouts):
        n_in = spark.read.parquet(f"{SF}/events.parquet").count()
        assert spark.read.parquet(str(layouts / "z")).count() == n_in
