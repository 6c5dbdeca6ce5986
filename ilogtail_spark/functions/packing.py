"""Greedy sequence packing: assign documents to token-budget bins.

The sample-packing step of an LLM training-data pipeline: concatenate
documents into fixed-budget training sequences with minimal padding.
Greedy first-fit-in-order is the standard streaming formulation: walk
the documents in a deterministic order, accumulate token counts, open a
new bin whenever the next document would overflow the budget (an
oversized document gets a bin of its own).

Packing is inherently sequential WITHIN an ordering, so the scale shape
is: parallel across groups (source/shard — thousands at 100 TB),
sequential inside a group via one Arrow-batched ``applyInPandas``. The
per-group state is two integers, the group's rows arrive sorted by the
explicit order column, and the output adds (bin_id, bin_fill). Unlike
most Python-kernel operators this one is fully oracle-checkable: the
DuckDB twin replays the same greedy walk with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pack_greedy(
    df: DataFrame,
    *,
    group_col: str = "source",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    max_tokens: int,
) -> DataFrame:
    """Greedy first-fit-in-order packing per group.

    Output columns: group_col, order_col, token_col, ``bin_id`` (0-based
    per group), ``bin_fill`` (cumulative tokens in the bin AFTER this
    doc). Deterministic: the walk order is ``order_col`` ascending.
    """
    in_schema = df.select(group_col, order_col, token_col).schema
    out_schema = T.StructType(
        list(in_schema)
        + [
            T.StructField("bin_id", T.IntegerType()),
            T.StructField("bin_fill", T.LongType()),
        ]
    )

    def _pack(pdf):  # type: ignore[no-untyped-def]
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bins, fills = [], []
        bin_id, acc = 0, 0
        first = True
        for tok in pdf[token_col]:
            tok = int(tok)
            if not first and acc + tok > max_tokens:
                bin_id += 1
                acc = 0
            acc += tok
            first = False
            bins.append(bin_id)
            fills.append(acc)
        pdf["bin_id"] = bins
        pdf["bin_fill"] = fills
        return pdf

    return (
        df.select(group_col, order_col, token_col)
        .groupBy(group_col)
        .applyInPandas(_pack, out_schema)
    )
