"""Similarity family at 1M embeddings (the fixture has ~500 vectors):
deterministic 64-dim corpus with ~1% planted duplicate vectors, timing
the ANN tiers end-to-end on local[32].

Bucket-count rule surfaced by this benchmark: hyperplane LSH has
2^n_planes buckets TOTAL, and the within-bucket work is Σ bucket² for
the pair form (and bucket-sized candidate lists for top-k). The small
fixture setting (8 planes → 256 buckets) is quadratic at 10^6 vectors;
scale runs use 16 planes → 65,536 buckets. Same class of setting as
simhash's band_bits — documented in SCALE.md.

Usage: python tools/bench_ann_scale.py [n_vecs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/tmp/ilogtail_spark_emb_scale"


def gen_embeddings(spark, n: int) -> str:
    """Deterministic 64-dim float vectors (LCG per (id, i)); every
    101st vector duplicates its predecessor (planted near-dup)."""
    from pyspark.sql import functions as F

    marker = f"{DATA}_{n}"
    if os.path.exists(f"{marker}/_SUCCESS"):
        return marker
    (
        spark.range(n)
        .withColumn(
            "seed",
            F.when(F.col("id") % 101 == 0, F.col("id") - 1).otherwise(F.col("id")),
        )
        .select(
            F.col("id").alias("vec_id"),
            # xxhash64 mixing per (seed, i): an affine-in-seed LCG makes
            # every vector a modular SHIFT of every other (cosine ≈ 1
            # corpus-wide — measured 69M false near-dup pairs at 100k);
            # a real mixer gives the intended near-orthogonal cloud
            F.expr(
                "transform(sequence(0, 63), i -> cast("
                "(xxhash64(seed, i) % 65536) / 65536.0"
                " AS float))"
            ).alias("embedding"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(marker)
    )
    return marker


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from ilogtail_spark.functions.similarity import (
        brute_force_topk,
        brute_force_topk_int8,
        embedding_cosine_pairs_lsh,
        ivf_topk,
        lsh_bucket_topk,
        train_centroids,
    )
    from ilogtail_spark.session import get_spark

    spark = get_spark(app_name="ann_scale", master="local[32]",
                      shuffle_partitions=64,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    path = gen_embeddings(spark, n_vecs)
    emb = spark.read.parquet(path)
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 3)

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(json.dumps({"op": name, "n_vecs": n, "sec": round(dt, 1),
                          "result_rows": out,
                          "vecs_per_sec": round(n / dt)}))

    timed("brute_force_topk", lambda: brute_force_topk(emb, queries, k=5).count())
    timed("ann_int8_brute", lambda: brute_force_topk_int8(emb, queries, k=5).count())
    timed(
        "ann_lsh_16planes",
        lambda: lsh_bucket_topk(emb, queries, k=5, n_planes=16, dim=64).count(),
    )
    cents = train_centroids(emb, 64, sample_rows=4096, iters=5)
    timed(
        "ann_ivf_64lists",
        lambda: ivf_topk(emb, queries, k=5, n_centroids=64, n_probes=4,
                         centroids=cents).count(),
    )
    timed(
        "embedding_dup_lsh_16planes",
        lambda: embedding_cosine_pairs_lsh(
            emb, threshold=0.999, n_planes=16, dim=64
        ).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
