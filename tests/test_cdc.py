"""cdc_apply (operators/cdc.py): canal-shaped change-log application —
latest event per key wins, deletes remove, snapshots rank below the log
(input_canal.go:211-215,349-406 event model)."""

from ilogtail_spark.operators.cdc import cdc_apply
from tests.conftest import spark  # noqa: F401

SCHEMA = "pk long, _offset_ long, _event_ string, val string"


def _state(df, base=None):
    out = cdc_apply(df, ["pk"], order_cols=["_offset_"],
                    payload_cols=["val"], base=base)
    return {r["pk"]: r["val"] for r in out.collect()}


class TestCdcApply:
    def test_last_event_wins(self, spark):  # noqa: F811
        ev = spark.createDataFrame(
            [(1, 10, "row_insert", "a"),
             (1, 20, "row_update", "b"),
             (2, 5, "row_insert", "x")],
            SCHEMA,
        )
        assert _state(ev) == {1: "b", 2: "x"}

    def test_delete_removes_and_can_be_overwritten(self, spark):  # noqa: F811
        ev = spark.createDataFrame(
            [(1, 10, "row_insert", "a"),
             (1, 20, "row_delete", "a"),
             (2, 10, "row_insert", "x"),
             (2, 20, "row_delete", "x"),
             (2, 30, "row_insert", "x2")],  # re-insert after delete
            SCHEMA,
        )
        assert _state(ev) == {2: "x2"}

    def test_ddl_events_ignored(self, spark):  # noqa: F811
        ev = spark.createDataFrame(
            [(1, 10, "row_insert", "a"),
             (1, 99, "ddl", "ALTER TABLE ...")],
            SCHEMA,
        )
        assert _state(ev) == {1: "a"}

    def test_snapshot_base_loses_to_any_event(self, spark):  # noqa: F811
        base = spark.createDataFrame(
            [(1, "old"), (2, "keep"), (3, "gone")], "pk long, val string"
        )
        ev = spark.createDataFrame(
            [(1, 1, "row_update", "new"),
             (3, 1, "row_delete", "gone"),
             (4, 1, "row_insert", "fresh")],
            SCHEMA,
        )
        assert _state(ev, base=base) == {1: "new", 2: "keep", 4: "fresh"}

    def test_shuffle_carries_keys_not_events(self, spark):  # noqa: F811
        # the plan must be ONE partial-aggregating keyed agg — no window
        # sort over raw events, no join
        ev = spark.createDataFrame(
            [(1, 10, "row_insert", "a")], SCHEMA
        )
        plan = (
            cdc_apply(ev, ["pk"], payload_cols=["val"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "partial_max_by" in plan or "partial_maxby" in plan.lower()
        assert "Window" not in plan and "Join" not in plan
