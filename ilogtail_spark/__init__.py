"""ilogtail_spark — a PySpark-native log/telemetry pipeline engine.

A from-scratch reimplementation of the capabilities of alibaba/ilogtail
(reference snapshot 2024-12-20) as an idiomatic Spark DataFrame engine:

    parse  → enrich → route → aggregate → sinks

The reference is a native agent (C++/Go) whose "query" is a YAML pipeline
config — a static DAG of inputs → processors → aggregators/router →
flushers.  Here every reference plugin becomes a declarative DataFrame
transformation compiled by :mod:`ilogtail_spark.plans.pipeline`; channel /
queue machinery is replaced by Spark's shuffle, aggregator batching by
``groupBy``, the router by predicate-driven multi-sink writes.

Design rules (enforced throughout):
  * DataFrame/SQL only on the hot path — zero per-row Python.
  * Vectorized pandas/Arrow UDFs only where built-ins cannot express the
    semantics (dynamic JSON flatten, grok-on-regexp2 fallback).
  * Every operator cites the reference file:line whose semantics it
    reproduces so parity can be audited.
"""

__version__ = "0.1.0"
