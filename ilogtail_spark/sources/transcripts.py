"""Deterministic `transcripts` table (the BASELINE.json `input_hint` shape).

Schema: (conv_id string, turn_idx int, role string, text string,
         tool string, ts timestamp)

Derived 1:1 from the driver's `events` parquet with pure integer/string
arithmetic — NO hash functions, NO randomness — so the *identical* SQL
body evaluates to byte-identical rows in both Spark SQL and DuckDB.
That property is what lets every pipeline operator be verified against a
DuckDB oracle (the correctness gate).

The `text` payload cycles through the five fixture formats the reference's
own tests use (FIXTURES.md §2):
  fmt 0  nginx access line   (test/benchmark/.../ilogtail.yaml regex fixture)
  fmt 1  app log line        (plugins/processor/regex/regex_test.go:63)
  fmt 2  JSON object         (core/unittest/spl/SplUnittest.cpp:151)
  fmt 3  KV pairs            (plugins/processor/split/keyvalue/key_value_splitter.go:26)
  fmt 4  CSV record          (plugins/processor/csv/processor_csv.go:30)
plus ~2% corrupted rows (event_id % 53 == 0) to exercise the
keep-source-on-parse-error semantics (plugins/processor/regex/regex.go:101-103).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The shared SQL body. `events` must be resolvable as a table/view in the
# engine executing it. Dialect-intersection only: concat / lpad / cast AS
# string / CASE / % on bigint / row_number() — verified identical in
# Spark 4.x and DuckDB 1.x.
TRANSCRIPTS_SQL_BODY = """
SELECT
  concat('conv-', lpad(cast(user_id AS string), 8, '0')) AS conv_id,
  cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS int) AS turn_idx,
  CASE cast(event_id % 4 AS int)
    WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' WHEN 2 THEN 'system' ELSE 'tool'
  END AS role,
  CASE
    WHEN event_id % 53 = 0 THEN concat('CORRUPT|', cast(event_id AS string))
    WHEN event_id % 5 = 0 THEN concat(
        '192.168.', cast(user_id % 256 AS string), '.', cast(event_id % 256 AS string),
        ' - - [01/Jan/2024:00:00:', lpad(cast(event_id % 60 AS string), 2, '0'),
        ' +0000] "', CASE WHEN event_id % 2 = 0 THEN 'GET' ELSE 'POST' END,
        ' /api/v', cast(event_id % 3 AS string), '/item HTTP/1.1" ',
        CASE WHEN event_id % 10 = 0 THEN '500'
             WHEN event_id % 7 = 0 THEN '404' ELSE '200' END,
        ' ', cast((event_id * 37) % 10000 AS string),
        ' "-" "agent-', cast(user_id % 7 AS string), '"')
    WHEN event_id % 5 = 1 THEN concat(
        '2024-01-01 00:00:', lpad(cast(event_id % 60 AS string), 2, '0'), '.',
        lpad(cast((event_id * 7) % 1000 AS string), 3, '0'),
        ' ', cast(event_id AS string),
        ' [Thread-', cast(event_id % 8 AS string), '] ',
        CASE WHEN event_id % 11 = 0 THEN 'ERROR' ELSE 'INFO' END,
        ' request handled code=', cast(event_id % 97 AS string))
    WHEN event_id % 5 = 2 THEN concat(
        '{"action":"', event_type, '","body":{"a":"a', cast(event_id % 100 AS string),
        '","b":"b', cast(user_id % 100 AS string),
        '"},"latency_ms":', cast((event_id * 13) % 1000 AS string), '}')
    WHEN event_id % 5 = 3 THEN concat(
        'class=main&userid=', cast(user_id AS string),
        '&method=', CASE WHEN event_id % 2 = 0 THEN 'get' ELSE 'post' END,
        '&message=msg', cast(event_id % 50 AS string))
    ELSE concat('u', cast(user_id AS string), ',',
                cast(event_id % 97 AS string), ',running,extra1,extra2')
  END AS text,
  CASE WHEN event_id % 4 = 3 THEN
    CASE cast(event_id % 5 AS int)
      WHEN 0 THEN 'search' WHEN 1 THEN 'browser' WHEN 2 THEN 'python'
      WHEN 3 THEN 'sql' ELSE 'shell'
    END
  ELSE NULL END AS tool,
  ts
FROM events
"""


def transcripts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the transcripts DataFrame for a test-data dir.

    Runs the shared SQL body over the `events` parquet. The scan stays
    fully declarative: Catalyst prunes to the 4 source columns and the
    window shuffle partitions by user_id (the future conv_id), which is
    exactly the partitioning the downstream per-conversation ordering
    window reuses — one shuffle, not two.

    The window's shuffle is issued as an EXPLICIT hash repartition on
    user_id sized to the session's parallelism (the window's required
    ClusteredDistribution is satisfied by it, so the plan still has
    exactly one Exchange). Without this, AQE coalesces the exchange by
    *shuffle bytes* — but the wide `text` payload is GENERATED after the
    shuffle, so byte-based coalescing collapses the whole parse stage to
    1 task (measured 10x slowdown at sf0.1: every downstream regex ran
    on one core). Parse parallelism must scale with CORES, not with the
    pre-projection shuffle size; the same trap exists at 100 TB whenever
    a narrow key shuffle feeds a row-expanding projection.
    """
    from ilogtail_spark.partitioning import cores_repartition

    cores_repartition(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "user_id"
    ).createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_SQL_BODY)


def transcripts_oracle_cte() -> str:
    """`WITH transcripts AS (...)` prefix for DuckDB oracle queries."""
    return f"WITH transcripts AS ({TRANSCRIPTS_SQL_BODY})"
