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
        "ann_ivf_64lists_arrow",
        lambda: ivf_topk(emb, queries, k=5, n_centroids=64, n_probes=4,
                         centroids=cents).count(),
    )
    if n <= 250_000:
        # the interpreted-HOF expression twin: 64 centroid cosines per
        # vector re-evaluated per row — ~370s at 1M (r4 measurement), so
        # only re-timed at sub-1M sizes; it remains the oracle twin, not
        # the production path
        timed(
            "ann_ivf_64lists_expr",
            lambda: ivf_topk(emb, queries, k=5, n_centroids=64, n_probes=4,
                             centroids=cents, assign="expr").count(),
        )
    timed(
        "embedding_dup_lsh_16planes",
        lambda: embedding_cosine_pairs_lsh(
            emb, threshold=0.999, n_planes=16, dim=64
        ).count(),
    )

    # ------------------------------------------------------------------
    # OR-amplification recall at cos≈0.9 (the moderate-threshold ANN
    # regime single-table LSH cannot serve): plant 20 neighbors per
    # query at target cosine 0.9 (v' = 2.065·v + w, w an independent
    # random vector — cos = a/√(a²+1) for near-orthogonal w of equal
    # norm), take brute-force top-20 as truth, and measure recall as
    # tables grow. Theory at θ = 25.8°: per-table collision
    # (1−θ/π)^8 ≈ 0.29; OR over T tables 1−(1−0.29)^T → 0.75 at T=4,
    # 0.94 at T=8. Signature cost is linear in tables×planes.
    # ------------------------------------------------------------------
    import hashlib
    import math

    a = 0.9 / math.sqrt(1 - 0.9 * 0.9)
    qrows = sorted(queries.collect(), key=lambda r: r["vec_id"])

    def noise(tag: str, i: int) -> float:
        h = hashlib.md5(f"annrecall:{tag}:{i}".encode()).digest()
        return int.from_bytes(h[:8], "big") / float(2**64) * 2.0 - 1.0

    planted = []
    for qi, r in enumerate(qrows):
        v = [float(x) for x in r["embedding"]]
        # scale noise to the query's norm so cos lands near the target
        vn = math.sqrt(sum(x * x for x in v))
        for j in range(20):
            w = [noise(f"{qi}:{j}", i) for i in range(64)]
            wn = math.sqrt(sum(x * x for x in w))
            planted.append(
                (n + qi * 20 + j,
                 [a * v[i] + (vn / wn) * w[i] for i in range(64)])
            )
    corpus2 = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>")
    ).localCheckpoint(eager=True)
    truth_rows = brute_force_topk(corpus2, queries, k=20).collect()
    truth = {(r["q_id"], r["n_id"]) for r in truth_rows}
    mean_cos = sum(r["cos_sim"] for r in truth_rows) / max(len(truth_rows), 1)
    for n_tables in (1, 4, 8):
        t0 = time.time()
        got_rows = lsh_bucket_topk(
            corpus2, queries, k=20, n_planes=8, n_tables=n_tables, dim=64
        ).collect()
        dt = time.time() - t0
        got = {(r["q_id"], r["n_id"]) for r in got_rows}
        print(json.dumps({
            "op": f"ann_lsh_recall_8planes_x{n_tables}tables",
            "n_vecs": n, "sec": round(dt, 1),
            "recall_top20": round(len(got & truth) / max(len(truth), 1), 3),
            "truth_mean_cos": round(mean_cos, 4),
        }))
    # IVF recall on the same truth set: 64 lists / n_probes probed —
    # recall is bounded by how often a true neighbor's list is probed
    cents2 = train_centroids(corpus2, 64, sample_rows=4096, iters=5)
    for n_probes in (4, 8):
        t0 = time.time()
        got_rows = ivf_topk(corpus2, queries, k=20, n_centroids=64,
                            n_probes=n_probes, centroids=cents2).collect()
        dt = time.time() - t0
        got = {(r["q_id"], r["n_id"]) for r in got_rows}
        print(json.dumps({
            "op": f"ann_ivf_recall_64lists_x{n_probes}probes",
            "n_vecs": n, "sec": round(dt, 1),
            "recall_top20": round(len(got & truth) / max(len(truth), 1), 3),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
