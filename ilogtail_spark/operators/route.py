"""Routing — content-based fan-out to sinks (SURVEY.md §2.8).

Two router flavors exist in the reference and both are supported:

1. **Exclusive first-match** (Go `aggregator_logstore_router`,
   plugins/aggregator/logstorerouter/aggregator_router.go:97-168):
   an ordered rule list of (source_key, FULL-match regex → sink); first
   match wins; no match → default sink unless DropDisMatch. Compiled to
   one chained `when()` producing a `route` column — a single projection,
   no shuffle, and `partitionBy(route)` at the write gives one sink dir
   per route with no extra pass.

2. **Copy-mode multi-match** (C++ `Router`,
   core/pipeline/route/Router.cpp:26-49 + Condition.cpp:55,105): every
   matching conditional flusher receives the group — one row can fan out
   to several sinks. Expressed columnar as array-of-matching-sinks +
   `explode` (still one pass over the data; the duplicate rows exist only
   downstream of the explode, exactly like the reference's copied groups).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RouteRule:
    source_key: str
    regex: str | None   # full-match anchored, aggregator_router.go:99
    sink: str
    # numeric alternative to `regex`: inclusive (lo, hi) range compiled to a
    # vectorizable integer compare instead of cast-to-string + regex — use
    # for numeric columns (e.g. 5xx status codes). Exactly one of
    # regex / between must be set (validated in __post_init__).
    between: tuple[float, float] | None = None

    def __post_init__(self) -> None:
        if (self.regex is None) == (self.between is None):
            raise ValueError(
                f"RouteRule({self.source_key!r} → {self.sink!r}): exactly one "
                f"of regex / between must be set, got regex={self.regex!r} "
                f"between={self.between!r}"
            )

    def condition(self) -> Column:
        if self.between is not None:
            lo, hi = self.between
            c = F.col(self.source_key)
            return c.isNotNull() & (c >= F.lit(lo)) & (c <= F.lit(hi))
        src = F.col(self.source_key).cast("string")
        return src.isNotNull() & src.rlike(f"^(?:{self.regex})$")


def route_exclusive(
    df: DataFrame,
    rules: list[RouteRule],
    *,
    default_sink: str = "sink_default",
    drop_dismatch: bool = False,
    route_col: str = "route",
) -> DataFrame:
    """First-match-exclusive router (aggregator_logstore_router).

    The reference checks `indexArray[0]==0 && indexArray[1]==len(value)`
    (aggregator_router.go:99) — i.e. the regex must span the whole value —
    reproduced with ^(?:pat)$ anchoring. Missing/null key never matches.
    Rules with `between` compile to integer range compares (no per-row
    int→string cast + regex on the hot path).
    """
    expr: Column | None = None
    for r in rules:
        cond = r.condition()
        expr = F.when(cond, F.lit(r.sink)) if expr is None else expr.when(cond, F.lit(r.sink))
    if expr is None:
        expr = F.lit(default_sink)
    elif drop_dismatch:
        expr = expr.otherwise(F.lit(None).cast("string"))
    else:
        expr = expr.otherwise(F.lit(default_sink))
    out = df.withColumn(route_col, expr)
    if drop_dismatch:
        out = out.filter(F.col(route_col).isNotNull())
    return out


@dataclass(frozen=True)
class CopyCondition:
    """C++ Router condition: tag equality (Condition.cpp:105) or event-type
    equality (Condition.cpp:55); `None` condition = unconditional flusher
    (always receives every group, Router.cpp:33)."""

    sink: str
    key: str | None = None
    value: str | None = None

    def to_column(self) -> Column:
        if self.key is None:
            return F.lit(True)
        return F.col(self.key).isNotNull() & (F.col(self.key) == F.lit(self.value))


def route_copy(
    df: DataFrame,
    conditions: list[CopyCondition],
    *,
    route_col: str = "route",
) -> DataFrame:
    """Copy-mode fan-out (C++ Router semantics, Router.cpp:49): a row
    matching k conditions appears k times, once per sink. Rows matching
    nothing are dropped (no flusher received the group).

    One projection builds `array(case...)`, `array_compact` removes
    non-matches, `explode` materializes the copies — no shuffle, no
    repeated scans (vs the naive per-sink `filter` re-scan)."""
    sinks = F.array(
        *[F.when(c.to_column(), F.lit(c.sink)) for c in conditions]
    )
    return (
        df.withColumn("__sinks__", F.array_compact(sinks))
        .filter(F.size("__sinks__") > 0)
        .withColumn(route_col, F.explode("__sinks__"))
        .drop("__sinks__")
    )


def write_routed(
    df: DataFrame,
    base_path: str,
    *,
    route_col: str = "route",
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Multi-sink write: one job, one pass, one dir per sink — the Spark
    equivalent of the reference's per-logstore flusher queues
    (core/pipeline/queue/SenderQueueManager.cpp:91). `partitionBy(route)`
    gives dynamic partition insertion; Iceberg/parquet file sizing handles
    the reference's 1024-log/3MiB group caps physically
    (plugins/aggregator/baseagg/aggregator_base.go:26-29)."""
    df.write.mode(mode).partitionBy(route_col).format(fmt).save(base_path)
