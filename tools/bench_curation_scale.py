"""Round-6 curation family at 200x the test fixture: gopher_rules,
line_dedup, corpus_diff, count-min sketch, HLL distinct — timed on the
same deterministic 1M-doc corpus as tools/bench_dedup_scale.py (reuses
its generator and parquet cache). The point is shuffle-shape evidence:
per-doc rule bundles must stay scan-bound, the line-dedup aggregate
must collapse hot lines map-side, the sketches must beat their exact
twins' state size without losing wall-clock.

Prints one JSON line per op; paste the summary into SCALE.md.
Usage: python tools/bench_curation_scale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_dedup_scale import gen_docs  # noqa: E402  (same corpus cache)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from ilogtail_spark.functions.dedup import corpus_diff, line_dedup
    from ilogtail_spark.functions.textstats import (
        cms_estimate,
        count_min_sketch,
        gopher_rules,
        hll_estimate,
        hll_sketch,
        tokens,
    )
    from ilogtail_spark.session import get_spark

    spark = get_spark(app_name="curation_scale", master="local[32]",
                      shuffle_partitions=64,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    path = gen_docs(spark, n_docs)
    docs = spark.read.parquet(path)
    n = docs.count()

    def timed(name, fn, **extra):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(json.dumps({"op": name, "n_docs": n, "sec": round(dt, 1),
                          "result_rows": out,
                          "docs_per_sec": round(n / dt), **extra}))

    # per-doc rule bundle: must be scan-bound (zero-exchange projection).
    # The synthetic vocabulary has no English stopwords, so the
    # stopword floor is disabled — this row measures throughput of the
    # other six rules, not selectivity.
    timed(
        "gopher_rules_keep_count",
        lambda: gopher_rules(
            docs, min_words=10, min_stopword_hits=0
        ).filter("keep").count(),
    )

    # line dedup over pages: 10 docs -> one page, so the corpus holds
    # n/10 pages x 10 lines with planted duplicate lines (the exact-dup
    # docs). Hot-line skew is the failure mode this measures.
    pages = docs.groupBy((F.col("doc_id") / 10).cast("long").alias("page_id")).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda x: x["text"],
            ),
            "\n",
        ).alias("text")
    )
    timed(
        "line_dedup_pages",
        lambda: line_dedup(pages, id_col="page_id").count(),
        n_pages=n // 10,
    )

    # RAG chunking: ~40-token docs at 32/8 → ~2 chunks per doc; pure
    # scan-fused explode, so this row measures raw projection throughput
    from ilogtail_spark.functions.packing import chunk_documents

    timed(
        "chunk_documents_32_8",
        lambda: chunk_documents(docs, chunk_tokens=32, overlap=8).count(),
    )

    # snapshot diff: v2 drops ~6%, edits ~8%, adds ~3%
    v2 = (
        docs.filter(F.col("doc_id") % 17 != 3)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 13 == 5,
                F.concat(F.col("text"), F.lit(" edited")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 29 == 7).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" appended")).alias("text"),
            )
        )
    )
    timed("corpus_diff_delta", lambda: corpus_diff(docs, v2).count())

    # count-min sketch over ~40M token occurrences: the sketch is 4x4096
    # counters regardless of the 50k vocabulary
    t0 = time.time()
    sketch = count_min_sketch(docs, depth=4, width=4096).localCheckpoint(
        eager=True
    )
    sk_rows = sketch.count()
    print(json.dumps({"op": "cms_build_d4w4096", "n_docs": n,
                      "sec": round(time.time() - t0, 1),
                      "sketch_rows": sk_rows}))
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    top = tf.orderBy(F.desc("tf"), "token").limit(30)
    t0 = time.time()
    est = cms_estimate(sketch, top, depth=4, width=4096)
    rows = est.collect()
    over = [r for r in rows if r["cms_count"] < r["tf"]]
    print(json.dumps({"op": "cms_estimate_top30", "n_docs": n,
                      "sec": round(time.time() - t0, 1),
                      "underestimates": len(over),
                      "max_rel_over": round(max(
                          (r["cms_count"] - r["tf"]) / r["tf"] for r in rows
                      ), 4)}))

    # HLL vs exact distinct per source (5 groups x ~200k distinct):
    # same answer class, bounded state
    timed(
        "exact_distinct_per_source",
        lambda: docs.groupBy("source")
        .agg(F.countDistinct("text").alias("d"))
        .count(),
    )
    t0 = time.time()
    sk = hll_sketch(docs, "text", p=12, group_cols=("source",))
    est_rows = hll_estimate(sk, p=12, group_cols=("source",)).collect()
    exact_rows = {
        r["source"]: r["d"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct("text").alias("d"))
        .collect()
    }
    errs = [
        abs(r["approx_distinct"] - exact_rows[r["source"]])
        / exact_rows[r["source"]]
        for r in est_rows
    ]
    print(json.dumps({"op": "hll_p12_per_source", "n_docs": n,
                      "sec": round(time.time() - t0, 1),
                      "max_rel_err": round(max(errs), 4),
                      "registers_per_group": 1 << 12}))
    spark.stop()


if __name__ == "__main__":
    main()
