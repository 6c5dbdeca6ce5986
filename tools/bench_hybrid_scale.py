"""Hybrid retrieval at 1M documents: reuse the dedup-bench corpus
(doc_id, text) and derive an aligned 64-dim embedding per doc in pure
SQL (xxhash64 mix — the same random-vector recipe as
bench_ann_scale.py, which proved LCG/affine recipes produce
corpus-wide cos≈1 artifacts). Times the three retrieval tiers and the
RRF fusion end-to-end on local[32].

Usage: python tools/bench_hybrid_scale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from ilogtail_spark.functions.retrieval import (
        bm25_corpus_stats,
        bm25_topk,
        hybrid_topk,
    )
    from ilogtail_spark.functions.similarity import brute_force_topk
    from ilogtail_spark.session import get_spark
    from tools.bench_dedup_scale import gen_docs

    spark = get_spark(app_name="hybrid_scale", master="local[32]",
                      shuffle_partitions=64,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(gen_docs(spark, n_docs))
    emb = docs.select(
        F.col("doc_id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), "
            "i -> cast(pmod(xxhash64(doc_id, i), 1000) / 1000.0 AS float))"
        ).alias("embedding"),
    )
    n = docs.count()
    terms = ["w100", "w2000", "w30000"]

    def timed(name, fn):
        t0 = time.time()
        rows = fn()
        print(json.dumps({"op": name, "n_docs": n,
                          "sec": round(time.time() - t0, 1),
                          "result_rows": rows}))

    stats = bm25_corpus_stats(docs, terms)
    timed("bm25_prestats",
          lambda: bm25_topk(docs, terms, topk=50, stats=stats).count())
    timed("dense_brute",
          lambda: brute_force_topk(
              emb, emb.filter("vec_id = 12345"), k=50).count())
    timed("hybrid_rrf",
          lambda: hybrid_topk(docs, emb, terms, 12345,
                              topk=20, n_candidates=50).count())
    spark.stop()


if __name__ == "__main__":
    main()
