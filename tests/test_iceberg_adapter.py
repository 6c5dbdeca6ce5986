"""Both branches of the Iceberg adapter (sources/iceberg.py): the parquet
fallback executes for real; the Iceberg branch's call plumbing (identifier,
snapshot-range options, writeTo().append()) is verified with fakes since the
sandbox has no iceberg-spark-runtime jar."""

from __future__ import annotations

import ilogtail_spark.sources.iceberg as ice


class _FakeReader:
    def __init__(self, calls):
        self.calls = calls

    def format(self, fmt):
        self.calls["format"] = fmt
        return self

    def option(self, k, v):
        self.calls.setdefault("options", {})[k] = v
        return self

    def load(self, identifier):
        self.calls["load"] = identifier
        return "SENTINEL_DF"


class _FakeWriter:
    def __init__(self, calls):
        self.calls = calls

    def append(self):
        self.calls["append"] = True


class TestParquetFallback:
    def test_roundtrip(self, spark, tmp_path):
        p = str(tmp_path / "tbl")
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
        ice.write_append(df, "cat.db.tbl", fallback_path=p)
        ice.write_append(df, "cat.db.tbl", fallback_path=p)  # append, not overwrite
        out = ice.read_table(spark, "cat.db.tbl", fallback_path=p)
        assert out.count() == 4
        # snapshot-range args are accepted (tracked by the checkpoint table
        # at pipeline level in fallback mode)
        out2 = ice.read_table(
            spark, "cat.db.tbl", fallback_path=p, start_snapshot_id=1, end_snapshot_id=2
        )
        assert out2.count() == 4


class TestIcebergBranchPlumbing:
    def test_read_snapshot_range_options(self, spark, monkeypatch):
        calls: dict = {}
        monkeypatch.setattr(ice, "iceberg_available", lambda s: True)
        monkeypatch.setattr(
            type(spark), "read", property(lambda self: _FakeReader(calls))
        )
        out = ice.read_table(
            spark, "cat.db.transcripts", fallback_path="/nope",
            start_snapshot_id=100, end_snapshot_id=200,
        )
        assert out == "SENTINEL_DF"
        assert calls["format"] == "iceberg"
        assert calls["load"] == "cat.db.transcripts"
        assert calls["options"] == {
            "start-snapshot-id": "100",
            "end-snapshot-id": "200",
        }

    def test_read_full_table_no_options(self, spark, monkeypatch):
        calls: dict = {}
        monkeypatch.setattr(ice, "iceberg_available", lambda s: True)
        monkeypatch.setattr(
            type(spark), "read", property(lambda self: _FakeReader(calls))
        )
        ice.read_table(spark, "cat.db.t", fallback_path="/nope")
        assert "options" not in calls

    def test_write_append_commit(self, spark, monkeypatch):
        calls: dict = {}
        df = spark.createDataFrame([(1,)], "id int")
        monkeypatch.setattr(ice, "iceberg_available", lambda s: True)
        monkeypatch.setattr(
            type(df), "writeTo",
            lambda self, ident: calls.update(ident=ident) or _FakeWriter(calls),
        )
        ice.write_append(df, "cat.db.t", fallback_path="/nope")
        assert calls == {"ident": "cat.db.t", "append": True}
