"""Dedup/similarity family at 200x the test fixture: generate a 1M-doc
synthetic corpus (deterministic arithmetic text, ~1% planted near-dups)
and time the scale-path operators end-to-end on local[32]. The sf0.1
fixture has 5,000 docs — fine for correctness, useless as scale
evidence; this run shows the shuffle shapes hold when the corpus is
document-shaped and big enough that a wasted exchange would dominate.

Prints one JSON line per op; paste the summary into SCALE.md.
Usage: python tools/bench_dedup_scale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/tmp/ilogtail_spark_docs_scale"



def gen_docs(spark, n_docs: int) -> str:
    """Deterministic document corpus: ~40-token texts from modular
    word picks; every 97th doc is a REPEAT of the previous doc (exact
    dup), every 89th differs from its neighbor by one token (near-dup).
    Pure SQL — no Python on workers."""
    from pyspark.sql import functions as F

    marker = f"{DATA}_{n_docs}"
    if os.path.exists(f"{marker}/_SUCCESS"):
        return marker
    base = (
        spark.range(n_docs)
        .withColumn(
            "seed",
            # dup classes: exact dups share the seed of the run leader
            F.when(F.col("id") % 97 == 0, F.col("id") - 1)
            .otherwise(F.col("id")),
        )
        .withColumn(
            "text",
            # ~50k-token vocabulary, and the token SEQUENCE mixes two
            # coprime seed residues (CRT: distinct mod 49999*31991 ≈
            # 1.6e9) so every unplanted doc's text is unique. A single
            # residue would make the whole text a function of
            # seed mod p — only p distinct texts, i.e. an accidental
            # ~20x-replicated corpus (measured and discarded).
            F.expr(
                "array_join(transform(sequence(0, 39), "
                "i -> concat('w', cast(((seed % 49999) * (i + 1) "
                "+ (seed % 31991) * (i * i + 1) + i * 7) "
                "% 49999 AS string))), ' ')"
            ),
        )
        .withColumn(
            "text",
            # near-dups: append one distinguishing token
            F.when(
                F.col("id") % 89 == 0,
                F.concat(F.col("text"), F.lit(" tailtok"),
                         (F.col("id") % 7).cast("string")),
            ).otherwise(F.col("text")),
        )
        .select(
            F.col("id").alias("doc_id"),
            "text",
            F.element_at(
                F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("lang"),
            F.concat(F.lit("src-"), (F.col("id") % 5).cast("string")).alias(
                "source"
            ),
        )
    )
    base.repartition(64).write.mode("overwrite").parquet(marker)
    return marker


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from ilogtail_spark.functions.dedup import (
        connected_components_star,
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from ilogtail_spark.session import get_spark

    spark = get_spark(app_name="dedup_scale", master="local[32]",
                      shuffle_partitions=64,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    path = gen_docs(spark, n_docs)
    docs = spark.read.parquet(path)
    n = docs.count()

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(json.dumps({"op": name, "n_docs": n, "sec": round(dt, 1),
                          "result_rows": out,
                          "docs_per_sec": round(n / dt)}))

    timed("exact_dedup", lambda: exact_dedup(docs).count())
    timed("minhash_lsh", lambda: minhash_lsh_pairs(docs, threshold=0.5).count())

    # LSH bucket-size histogram audit (the codebase's standing lesson —
    # a correlated hash family shows up as mega-buckets long before it
    # biases estimates): with md5-derived permutation coefficients the
    # max band bucket should be the planted-dup group size, not 10^3+.
    from pyspark.sql import functions as F

    from ilogtail_spark.functions.dedup import minhash_bands, minhash_signatures

    t0 = time.time()
    hist = (
        minhash_bands(minhash_signatures(docs))
        .groupBy("band", "bucket")
        .count()
    )
    st = hist.agg(
        F.max("count").alias("mx"),
        F.expr("percentile_approx(count, 0.999)").alias("p999"),
        F.count(F.lit(1)).alias("n_buckets"),
    ).first()
    print(json.dumps({
        "op": "minhash_band_histogram", "n_docs": n,
        "sec": round(time.time() - t0, 1),
        "max_bucket": st["mx"], "p999_bucket": st["p999"],
        "n_buckets": st["n_buckets"],
    }))
    timed(
        "ngram_jaccard_maxdf",
        lambda: ngram_jaccard_pairs(
            docs, threshold=0.5, max_df=150
        ).count(),
    )
    timed(
        "dedup_clusters_star",
        lambda: connected_components_star(
            minhash_lsh_pairs(docs, threshold=0.5)
        ).count(),
    )
    from ilogtail_spark.functions.dedup import duplicate_spans

    timed(
        "duplicate_spans_k8",
        lambda: duplicate_spans(docs, k=8, min_docs=2).count(),
    )
    # decontamination at scale: a 1k-doc held-out set against the full
    # corpus, exact inverted-index join vs the Bloom pre-filtered path.
    # The bloom row's win is shuffle VOLUME (only candidate grams reach
    # the confirm join) — on this box the exact join's test side
    # already broadcasts, so wall-clock parity is the expected result;
    # the tier exists for the regime where the test side cannot.
    from ilogtail_spark.functions.dedup import (
        bloom_contamination,
        ngram_contamination,
    )

    train = docs.filter(F.col("doc_id") % 997 != 0)
    test = docs.filter(F.col("doc_id") % 997 == 0)
    timed(
        "contamination_exact",
        lambda: ngram_contamination(train, test, n=8, min_shared=1).count(),
    )
    timed(
        "contamination_bloom",
        lambda: bloom_contamination(
            train, test, n=8, min_shared=1, n_bits=1 << 20, n_hashes=5
        ).count(),
    )
    # continuous ingestion: index the corpus once (the write-time cost),
    # then flag a ~0.5% arriving batch — the per-batch probe must be
    # O(batch), nowhere near the index-build cost
    from ilogtail_spark.functions.dedup import dedup_index, incremental_dedup

    i_corpus = docs.filter(F.col("doc_id") % 211 != 0)
    i_batch = docs.filter(F.col("doc_id") % 211 == 0)
    t0 = time.time()
    ex_idx, bk_idx = dedup_index(i_corpus)
    ex_idx = ex_idx.localCheckpoint(eager=True)
    bk_idx = bk_idx.localCheckpoint(eager=True)
    print(json.dumps({"op": "dedup_index_build", "n_docs": n,
                      "sec": round(time.time() - t0, 1)}))
    timed(
        "incremental_dedup_probe",
        lambda: incremental_dedup(i_batch, ex_idx, bk_idx).count(),
    )
    # retrieval family over the same corpus: BM25 inline vs
    # write-time-stats literal path, and the vocabulary heavy hitters
    from ilogtail_spark.functions.retrieval import (
        bm25_corpus_stats,
        bm25_topk,
    )
    from ilogtail_spark.functions.textstats import vocab_topk

    q_terms = ["w100", "w2000", "w30000"]
    timed(
        "bm25_topk_inline",
        lambda: bm25_topk(docs, q_terms, topk=20).count(),
    )
    stats = bm25_corpus_stats(docs, q_terms)
    timed(
        "bm25_topk_prestats",
        lambda: bm25_topk(docs, q_terms, topk=20, stats=stats).count(),
    )
    timed("vocab_topk", lambda: vocab_topk(docs, top_k=50).count())
    # the WIDE simhash form (60-bit hash, 15-bit bands -> 32768
    # buckets per band) is the 10^5+ setting; the 32/4 default is a
    # small-corpus form (16 buckets per band -> quadratic past ~10^4)
    timed(
        "simhash_60_15",
        lambda: simhash_pairs(
            docs, max_hamming=3, bits=60, band_bits=15
        ).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
