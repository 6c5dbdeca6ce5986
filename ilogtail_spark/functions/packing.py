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


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping fixed-token-count chunks — the
    RAG/embedding-prep primitive (chunk i starts at token
    i·(chunk_tokens − overlap); the final chunk is the remainder, and a
    doc at or under the budget yields exactly one chunk). Emits
    (id, chunk_idx, start_tok, n_tok, chunk_text).

    Pure column expressions: tokenize once, compute the chunk-start
    sequence, slice per start, ONE posexplode — no shuffle at all, so
    at 100 TB chunking fuses with the scan and the downstream embed/
    index stage sets the parallelism. Chunk boundaries are token
    arithmetic (deterministic, oracle-checkable), not byte offsets.
    """
    from ilogtail_spark.partitioning import spread_for_expansion

    df = spread_for_expansion(df, id_col)

    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    from pyspark.sql import functions as F

    from ilogtail_spark.functions.textstats import tokens

    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / step),
    # as integer arithmetic: 1 + (max(n - chunk_tokens, 0) + step - 1) / step
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - chunk_tokens, F.lit(0)) + step - 1) / step
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * step).alias("start_tok"),
            F.least(F.lit(chunk_tokens), n - i * step).alias("n_tok"),
            F.array_join(
                F.slice(toks, i * step + 1, chunk_tokens), " "
            ).alias("chunk_text"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "c"),
    ).select(
        id_col,
        "chunk_idx",
        F.col("c.start_tok").alias("start_tok"),
        F.col("c.n_tok").alias("n_tok"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
