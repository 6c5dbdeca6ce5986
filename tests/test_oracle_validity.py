"""Fast registry-health guards: every oracle must parse AND bind in
DuckDB against the real table schemas (sf0.001), and the registry
invariants must hold — catches SQL drift in seconds, without Spark.
"""

from __future__ import annotations

import duckdb
import pytest

from ilogtail_spark.queries import NO_ORACLE, ORACLES, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


class TestRegistryHealth:
    def test_every_query_has_oracle_or_reason(self):
        assert set(NO_ORACLE) == set(QUERIES) - set(ORACLES)
        assert set(ORACLES) <= set(QUERIES)

    def test_all_oracles_parse_and_bind(self, con):
        bad = []
        for name, sql in ORACLES.items():
            try:
                con.sql("EXPLAIN " + sql)
            except Exception as e:  # noqa: BLE001 - collecting all failures
                bad.append((name, str(e).splitlines()[0][:160]))
        assert not bad, bad

    def test_rows_only_set_is_minimal(self):
        # every rows-only survivor must be genuinely engine-internal —
        # encrypt graduated to a full KAT-literal oracle in r7, leaving
        # only the xxhash64 shard (whose md5 twin IS fully checked)
        assert set(NO_ORACLE) == {"shard_hash"}
