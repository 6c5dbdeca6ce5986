"""Corpus-snapshot state round-trip (plans/snapshot.py): every
write-time artifact survives a session restart — build state, wipe the
session catalog (the part of a restart that actually loses anything:
the in-memory catalog; the data and commit records are on disk), load
from the commit payload alone, probe with identical output. Plus the
plan guarantee the bucketed index exists for: the probe join must NOT
re-shuffle the index side.

Restart simulation: `DROP TABLE` on the external bucketed tables
removes the catalog entries without touching data — exactly the state
a brand-new SparkSession starts from (fresh in-memory catalog, same
disk). The loader must re-register from the checkpoint payload.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.functions.dedup import (
    bloom_bitmap,
    bloom_contamination,
    dedup_index,
    incremental_dedup,
)
from ilogtail_spark.plans.snapshot import CorpusSnapshot


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def snap_dir(tmp_path):
    return str(tmp_path / "snapshot")


class TestDedupIndexRoundTrip:
    def test_reload_probe_identical_after_catalog_wipe(
        self, spark, docs, snap_dir
    ):
        corpus = docs.filter(F.col("doc_id") % 5 != 0)
        batch = docs.filter(F.col("doc_id") % 5 == 0)
        ex, bk = dedup_index(corpus)
        direct = _rows(
            incremental_dedup(batch, ex, bk).select(
                "doc_id", "exact_dup", "near_dup"
            )
        )

        snap = CorpusSnapshot(spark, snap_dir)
        snap.write_dedup_index(
            ex, bk, params={"n": 3, "num_hashes": 64, "bands": 16}
        )
        for part in ("exact", "bands"):
            spark.sql(f"DROP TABLE IF EXISTS {snap._table('latest', part)}")

        # a separate CorpusSnapshot instance — nothing carried over but
        # the path, as after a restart
        ex2, bk2, params = CorpusSnapshot(spark, snap_dir).load_dedup_index()
        assert params == {"n": 3, "num_hashes": 64, "bands": 16}
        reloaded = _rows(
            incremental_dedup(batch, ex2, bk2).select(
                "doc_id", "exact_dup", "near_dup"
            )
        )
        assert reloaded == direct and len(reloaded) > 0

    def test_uncommitted_state_refused(self, spark, snap_dir):
        with pytest.raises(ValueError, match="no committed"):
            CorpusSnapshot(spark, snap_dir).load_dedup_index()

    def test_bucketed_probe_no_index_shuffle(self, spark, docs, snap_dir):
        """The reason the index is written BUCKETED on its join keys:
        the probe equi-joins must read it pre-distributed. Pinned two
        ways: (a) both index scans are bucketed scans; (b) the same
        probe against a plain-parquet reload of the same files costs
        exactly two more Exchanges — the index-side shuffles bucketing
        removes. (Broadcast and auto-bucketed-scan heuristics disabled
        so the shuffle-join regime — the regime that exists at corpus
        scale, where the index outgrows any broadcast ceiling — is
        what's planned.)"""
        corpus = docs.filter(F.col("doc_id") % 5 != 0)
        batch = docs.filter(F.col("doc_id") % 5 == 0)
        ex, bk = dedup_index(corpus)
        snap = CorpusSnapshot(spark, snap_dir)
        snap.write_dedup_index(ex, bk)

        old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        old_abs = spark.conf.get(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        )
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                "false",
            )
            ex2, bk2, _ = snap.load_dedup_index()

            def n_exchanges(df):
                # AQE's toString appends '== Initial Plan ==' — count
                # only the final plan
                plan = df._jdf.queryExecution().executedPlan().toString()
                final = plan.split("== Initial Plan ==")[0]
                return final.count("Exchange hashpartitioning"), plan

            bucketed_n, bplan = n_exchanges(
                incremental_dedup(batch, ex2, bk2)
            )
            assert bplan.count("Bucketed: true") == 2

            plain_ex = spark.read.parquet(f"{snap_dir}/latest/exact")
            plain_bk = spark.read.parquet(f"{snap_dir}/latest/bands")
            plain_n, _ = n_exchanges(
                incremental_dedup(batch, plain_ex, plain_bk)
            )
            assert bucketed_n == plain_n - 2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                old_abs,
            )


class TestDriverStateRoundTrip:
    def test_bm25_stats_identical_plan_literals(self, spark, docs, snap_dir):
        from ilogtail_spark.functions.retrieval import (
            bm25_corpus_stats,
            bm25_topk,
        )

        terms = ["spark", "vector", "customer"]
        stats = bm25_corpus_stats(docs, terms)
        snap = CorpusSnapshot(spark, snap_dir)
        snap.write_bm25_stats(stats)
        loaded = CorpusSnapshot(spark, snap_dir).load_bm25_stats()
        assert loaded == stats
        assert isinstance(loaded["n_docs"], int)
        assert all(isinstance(c, int) for c in loaded["df"].values())
        assert _rows(bm25_topk(docs, terms, topk=20, stats=loaded)) == _rows(
            bm25_topk(docs, terms, topk=20, stats=stats)
        )

    def test_centroids_identical_probe(self, spark, snap_dir):
        import os

        from ilogtail_spark.functions.similarity import (
            ivf_topk,
            train_centroids,
        )

        emb = spark.read.parquet(
            os.path.join("/root/testdata/sf0.001", "embeddings.parquet")
        )
        cents = train_centroids(emb, 8, sample_rows=64, iters=3)
        snap = CorpusSnapshot(spark, snap_dir)
        snap.write_centroids(cents)
        loaded = CorpusSnapshot(spark, snap_dir).load_centroids()
        assert loaded == cents
        qs = emb.filter(F.col("vec_id") < 2)
        assert _rows(ivf_topk(emb, qs, centroids=loaded)) == _rows(
            ivf_topk(emb, qs, centroids=cents)
        )


class TestBloomBitmapRoundTrip:
    def test_probe_reloaded_bitmap_identical(self, spark, docs, snap_dir):
        train = docs.filter(F.col("doc_id") % 29 != 0)
        test = docs.filter(F.col("doc_id") % 29 == 0)
        kw = dict(n=8, n_bits=1 << 16, n_hashes=5)
        fresh = _rows(bloom_contamination(train, test, min_shared=2, **kw))

        snap = CorpusSnapshot(spark, snap_dir)
        snap.write_bloom_bitmap(bloom_bitmap(test, **kw), **kw)
        bm, params = CorpusSnapshot(spark, snap_dir).load_bloom_bitmap()
        assert params == kw
        reloaded = _rows(
            bloom_contamination(
                train,
                test,
                min_shared=2,
                n=params["n"],
                n_bits=params["n_bits"],
                n_hashes=params["n_hashes"],
                bitmap=bm,
            )
        )
        assert reloaded == fresh and len(reloaded) > 0


class TestIncrementalExtension:
    def test_merge_bm25_stats_bit_identical(self, spark, docs):
        from ilogtail_spark.functions.retrieval import (
            bm25_corpus_stats,
            merge_bm25_stats,
        )

        terms = ["spark", "vector", "customer"]
        full = bm25_corpus_stats(docs, terms)
        merged = merge_bm25_stats(
            bm25_corpus_stats(docs.filter(F.col("doc_id") % 3 == 0), terms),
            bm25_corpus_stats(docs.filter(F.col("doc_id") % 3 == 1), terms),
            bm25_corpus_stats(docs.filter(F.col("doc_id") % 3 == 2), terms),
        )
        # bit-identical, not approximately equal — avgdl re-derives
        # from the exact integer sums
        assert merged == full

    def test_merge_with_empty_batch(self, spark, docs):
        from ilogtail_spark.functions.retrieval import (
            bm25_corpus_stats,
            merge_bm25_stats,
        )

        terms = ["spark"]
        full = bm25_corpus_stats(docs, terms)
        empty = bm25_corpus_stats(docs.filter(F.lit(False)), terms)
        assert merge_bm25_stats(full, empty) == full
        assert merge_bm25_stats(empty, empty)["avgdl"] == 0.0

    def test_extend_flags_dup_of_accepted_doc(self, spark):
        """A batch-2 document duplicating a batch-1 ACCEPTED document is
        flagged only because the index was extended — the planted case
        extension exists for. A duplicate of a batch-1 REJECTED
        document must flag too (its twin already sat in the base
        corpus)."""
        from ilogtail_spark.functions.dedup import (
            dedup_index,
            extend_dedup_index,
            incremental_dedup,
        )

        base = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon")],
            "doc_id long, text string",
        )
        b1 = spark.createDataFrame(
            [
                (10, "zeta eta theta iota kappa"),       # novel -> accepted
                (11, "alpha beta gamma delta epsilon"),  # dup of base -> rejected
            ],
            "doc_id long, text string",
        )
        ex0, bk0 = dedup_index(base)
        p1 = incremental_dedup(b1, ex0, bk0)
        kept = p1.filter(~F.col("exact_dup") & ~F.col("near_dup")).drop(
            "exact_dup", "near_dup"
        )
        assert [r["doc_id"] for r in kept.collect()] == [10]
        ex1, bk1 = extend_dedup_index(ex0, bk0, kept)

        b2 = spark.createDataFrame(
            [
                (20, "zeta eta theta iota kappa"),       # dup of ACCEPTED b1 doc
                (21, "alpha beta gamma delta epsilon"),  # dup of base twin
                (22, "lambda mu nu xi omicron"),         # novel
            ],
            "doc_id long, text string",
        )
        flags = {
            r["doc_id"]: (r["exact_dup"], r["near_dup"])
            for r in incremental_dedup(b2, ex1, bk1).collect()
        }
        assert flags[20] == (True, True)   # caught ONLY via extension
        assert flags[21] == (True, True)
        assert flags[22] == (False, False)
        # without extension doc 20 would sail through — the control
        flags0 = {
            r["doc_id"]: r["exact_dup"]
            for r in incremental_dedup(b2, ex0, bk0).collect()
        }
        assert flags0[20] is False

    def test_durable_append_matches_functional_extension(
        self, spark, docs, snap_dir
    ):
        """CorpusSnapshot.append_dedup_index == extend_dedup_index
        through disk: probe flags identical, index still bucketed."""
        from ilogtail_spark.functions.dedup import (
            dedup_index,
            extend_dedup_index,
            incremental_dedup,
        )

        base = docs.filter(F.col("doc_id") % 5 >= 2)
        b1 = docs.filter(F.col("doc_id") % 5 == 1)
        b2 = docs.filter(F.col("doc_id") % 5 == 0)

        ex0, bk0 = dedup_index(base)
        p1 = incremental_dedup(b1, ex0, bk0)
        kept = p1.filter(~F.col("exact_dup") & ~F.col("near_dup")).drop(
            "exact_dup", "near_dup"
        )
        ex1, bk1 = extend_dedup_index(ex0, bk0, kept)
        want = _rows(
            incremental_dedup(b2, ex1, bk1).select(
                "doc_id", "exact_dup", "near_dup"
            )
        )

        snap = CorpusSnapshot(spark, snap_dir)
        snap.write_dedup_index(ex0, bk0)
        exd, bkd = dedup_index(kept)
        snap.append_dedup_index(exd, bkd)
        ex2, bk2, _ = snap.load_dedup_index()
        got = _rows(
            incremental_dedup(b2, ex2, bk2).select(
                "doc_id", "exact_dup", "near_dup"
            )
        )
        assert got == want
        plan = ex2.groupBy("h").count()._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan


class TestCompaction:
    def test_compact_shrinks_and_preserves_probe(self, spark, docs, snap_dir):
        """After duplicate-accumulating appends (a replayed batch),
        compaction must shrink the index, keep it bucketed, and leave
        probe output byte-identical — the membership-test guarantee."""
        corpus = docs.filter(F.col("doc_id") % 5 != 0)
        batch = docs.filter(F.col("doc_id") % 5 == 0)
        ex, bk = dedup_index(corpus)
        snap = CorpusSnapshot(spark, snap_dir)
        snap.write_dedup_index(ex, bk)
        # simulate a replayed append: the same delta lands twice
        delta_ex, delta_bk = dedup_index(batch.limit(20))
        snap.append_dedup_index(delta_ex, delta_bk)
        snap.append_dedup_index(delta_ex, delta_bk)

        ex1, bk1, _ = snap.load_dedup_index()
        before = _rows(
            incremental_dedup(batch, ex1, bk1).select(
                "doc_id", "exact_dup", "near_dup"
            )
        )
        shrink = snap.compact_dedup_index()
        assert shrink["exact"][1] < shrink["exact"][0]
        assert shrink["bands"][1] < shrink["bands"][0]

        ex2, bk2, _ = snap.load_dedup_index()
        after = _rows(
            incremental_dedup(batch, ex2, bk2).select(
                "doc_id", "exact_dup", "near_dup"
            )
        )
        assert after == before
        plan = (
            ex2.groupBy("h").count()
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Bucketed: true" in plan
        # staging dirs cleaned up
        import os

        assert not any(
            name.startswith("_compact_")
            for name in os.listdir(f"{snap_dir}/latest")
        )
