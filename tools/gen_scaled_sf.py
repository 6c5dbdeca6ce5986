"""Build a scaled-up copy of a testdata SF dir for perf measurement only.

The driver's round-end MEASUREMENT may run at a larger, driver-generated
scale factor (BENCH_r07.json: sf1.0 = 10x sf0.1) that is not present on
disk between rounds. This tool replicates each table K times with
deterministic key shifts so per-query timings can be taken at that scale
locally. It is NOT used by bench.py or any query; outputs land under
/tmp and are never read unless SPARK_GRAFT_SF_DIR points at them.

Scaling rules (K replicas, replica 0 = original rows):
- id/key columns that define entity identity or join edges between the
  scaled fact tables (custkey/orderkey/partkey/suppkey/doc_id/vec_id/
  event_id/user_id) are shifted by i * OFFSET per replica, so each
  replica is a self-consistent copy and join fan-outs are preserved.
- nationkey/regionkey keep their values (they join to the unscaled
  dimension tables nation/region).
- documents.text gets a deterministic ' r{i}' suffix for i>0 (n_chars
  updated) so the distinct-text count scales like the row count instead
  of every doc acquiring exactly K exact duplicates, which would distort
  the dedup-family group-size distribution.
- everything else is copied verbatim.

Each table is written as ONE parquet file, mirroring the driver layout
(single file per table => identical scan-split granularity).

Usage: python tools/gen_scaled_sf.py [src_dir] [dst_dir] [K]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 100_000_000

SHIFT_COLS = {
    "c_custkey", "o_custkey", "o_orderkey", "l_orderkey", "l_partkey",
    "p_partkey", "l_suppkey", "s_suppkey", "doc_id", "vec_id",
    "event_id", "user_id",
}

DIM_TABLES = {"nation", "region"}


def scale_table(src: str, dst: str, k: int, name: str) -> None:
    t = pq.read_table(src)
    if name in DIM_TABLES or k <= 1:
        pq.write_table(t, dst, compression="snappy")
        return
    parts = [t]
    for i in range(1, k):
        cols = []
        for field in t.schema:
            col = t.column(field.name)
            if field.name in SHIFT_COLS:
                col = pc.add(col, pa.scalar(i * OFFSET, type=field.type))
            elif name == "documents" and field.name == "text":
                col = pc.binary_join_element_wise(
                    pc.cast(col, pa.string()), f" r{i}", ""
                )
            elif name == "documents" and field.name == "n_chars":
                col = pc.add(col, pa.scalar(len(f" r{i}"), type=field.type))
            cols.append(col)
        parts.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(parts).combine_chunks()
    pq.write_table(out, dst, compression="snappy")


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0_scaled"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst_dir, exist_ok=True)
    for fn in sorted(os.listdir(src_dir)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        scale_table(os.path.join(src_dir, fn), os.path.join(dst_dir, fn), k, name)
        print(f"{name}: {pq.read_metadata(os.path.join(dst_dir, fn)).num_rows} rows")
    open(os.path.join(dst_dir, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
