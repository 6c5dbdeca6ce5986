"""Write-time data layout: Z-order clustering for multi-column skipping.

Parquet readers prune row groups / files from footer min-max statistics,
but a sort on one key destroys locality on every other key. Interleaving
the key bits (Morton / Z-order) keeps BOTH columns' value ranges narrow
inside each file, so point/range predicates on EITHER column skip most
of the data — the standard lakehouse trick (Delta OPTIMIZE ZORDER BY,
Iceberg sort orders) rebuilt from first principles as pure column
expressions.

Everything here is whole-stage-codegen bit arithmetic (shift/mask/sum);
the write is one range repartition + in-partition sort — exactly the
shuffle a plain global sort would cost, with strictly better skipping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(*cols: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low `bits` of each column into one long.

    Column i contributes its bit b at output position ``b * n + i`` —
    the textbook Z-curve. `bits * n_cols` must fit a signed 64-bit long
    (≤ 62 to stay clear of the sign). Values are masked to `bits`
    first, so callers should pre-scale/rank columns whose range exceeds
    2^bits (ranking preserves order, which is all Z-order needs).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 62:
        raise ValueError(f"bits*n_cols = {bits * n} exceeds a signed long")
    mask = (1 << bits) - 1
    out: Column | None = None
    for i, c in enumerate(cs):
        v = c.cast("long").bitwiseAND(F.lit(mask))
        for b in range(bits):
            term = F.shiftleft(
                F.shiftrightunsigned(v, b).bitwiseAND(F.lit(1)), b * n + i
            )
            out = term if out is None else out.bitwiseOR(term)
    assert out is not None
    return out


def zorder_sql_expr(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as portable SQL (Spark SQL and DuckDB
    both parse it) — this is what keeps the operator oracle-checkable."""
    n = len(cols)
    mask = (1 << bits) - 1
    terms = []
    for i, c in enumerate(cols):
        v = f"(cast({c} AS bigint) & {mask})"
        for b in range(bits):
            terms.append(f"((({v} >> {b}) & 1) << {b * n + i})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    *,
    bits: int = 16,
    normalize: bool = True,
    format: str = "parquet",
) -> None:
    """Cluster `df` on the Z-curve of `cols` and write `n_files` files.

    ``repartitionByRange`` on the z-key gives globally disjoint z-ranges
    per file (range exchange, sampled bounds); ``sortWithinPartitions``
    tightens row-group stats inside each file. Cost: ONE shuffle — the
    same as any global sort — so at 100 TB this replaces, not adds to,
    the final write stage. Readers then prune on footer min/max for
    every z-ordered column (asserted file-by-file in
    tests/test_layout.py via parquet footer statistics).

    `normalize` min-max scales every column onto the full ``2^bits``
    grid first (one O(1)-row stats aggregate, driver-side literals).
    Without it a narrow column's bits all land in the LOW interleave
    positions and the curve degenerates to a sort on the wide column —
    measured on the events table: user_id spans 4 bits vs event_id's
    10, and raw interleave left user_id probes reading 8/8 files;
    normalized, both columns prune (tests/test_layout.py pins it).
    """
    mask = (1 << bits) - 1
    zcols: list[Column] = []
    if normalize:
        stats = df.agg(
            *[F.min(c).cast("long").alias(f"mn{i}") for i, c in enumerate(cols)],
            *[F.max(c).cast("long").alias(f"mx{i}") for i, c in enumerate(cols)],
        ).first()
        for i, c in enumerate(cols):
            mn, mx = stats[f"mn{i}"], stats[f"mx{i}"]
            span = max(mx - mn, 1)
            zcols.append(
                ((F.col(c).cast("long") - F.lit(mn)) * F.lit(mask) / F.lit(span))
                .cast("long")
            )
    else:
        zcols = [F.col(c) for c in cols]
    z = zorder_key(*zcols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(format)
        .mode("overwrite")
        .save(path)
    )
