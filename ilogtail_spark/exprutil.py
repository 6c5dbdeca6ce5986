"""Expression-level plan hygiene helpers.

`pin` addresses the column-expression analog of the guide's duplicated-
UDF problem (§4.4): Catalyst's CollapseProject / PushDownPredicates
substitute a derived column's DEFINING EXPRESSION into every operator
that references it. For a cheap expression that is free; for a parse
chain (synthesize line → anchored regex rewrite → split) it multiplies
the dominant per-row cost by the reference count — prometheus_series'
plan carried 15 copies of the transcripts text-gen + sentinel regex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pin(col: Column) -> Column:
    """Pin an expensive derived expression to a single evaluation site.

    Wraps the column in a plan-level NONDETERMINISTIC no-op (`shuffle`
    of a one-element array): the optimizer then refuses to inline the
    defining expression into downstream operators or to duplicate it
    under pushed-down filters, so it is evaluated once per row in one
    Project — the pure-expression analog of `udf.asNondeterministic()`
    (optimization guide §4.4). Semantically a no-op: shuffling a
    single-element array has exactly one possible outcome, so the value
    is deterministic even under task retries.

    Trade-off (same as §4.4): a pinned column also blocks legitimate
    filter pushdown THROUGH itself, so pin only expressions whose
    re-evaluation demonstrably dominates (parse chains), never as a
    blanket.

    Implementation notes (each alternative was tried and failed):
      * the no-op must be WHOLE-STAGE-CODEGEN — `shuffle(array(col))[0]`
        is nondeterministic but Shuffle is CodegenFallback, dropping the
        whole subtree to interpreted evaluation;
      * `when(rand() >= -1, col)` is simplified away by the optimizer
        (the pin vanishes and inlining returns);
      * the pinned column must be REFERENCED BY NAME (withColumn then
        F.col) — embedding the pinned tree into every consumer copies a
        nondeterministic tree per site, which also defeats runtime
        subexpression elimination.
    `element_at(array(col), int(rand()*0)+1)` survives optimization,
    codegens, and always evaluates to `col` (index is always 1).
    """
    return F.element_at(F.array(col), (F.rand() * 0).cast("int") + 1)
