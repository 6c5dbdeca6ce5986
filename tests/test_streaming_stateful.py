"""Streaming stateful multiline merge — cross-micro-batch buffer semantics."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from ilogtail_spark.streaming.stateful import stream_merge_multiline

IN_DIR = "/tmp/ilogtail_spark_stateful_in"
CKPT = "/tmp/ilogtail_spark_stateful_ckpt"


class TestStreamMergeMultiline:
    def test_merge_across_micro_batches(self, spark):
        shutil.rmtree(IN_DIR, ignore_errors=True)
        shutil.rmtree(CKPT, ignore_errors=True)

        # three sequential file drops — the tail-a-file arrival model of the
        # reference: later lines land in later micro-batches, so record A's
        # tail and record B's head cross a batch boundary
        batches = [
            [("c1", 0, "2024-01-01 start A"), ("c1", 1, "  cont A1")],
            [("c1", 2, "2024-01-02 start B"), ("c1", 3, "  cont B1"),
             ("c2", 0, "2024-01-05 solo D")],
            [("c1", 4, "2024-01-03 start C"),  # C stays pending (no next begin)
             ("c2", 1, "  cont D1"), ("c2", 2, "2024-01-06 start E")],
        ]
        import time as _time

        for i, rows in enumerate(batches):
            spark.createDataFrame(
                rows, "conv_id string, line_no int, text string"
            ).coalesce(1).write.mode("append").parquet(IN_DIR)
            _time.sleep(1.1)  # distinct modTimes → deterministic file order

        src = (
            spark.readStream.schema("conv_id string, line_no int, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(IN_DIR)
        )
        merged = stream_merge_multiline(src, begin_regex=r"^\d{4}-", timeout_ms=2000)
        q = (
            merged.writeStream.format("memory")
            .queryName("merged_out")
            .option("checkpointLocation", CKPT)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

        def rows():
            return {
                (r["conv_id"], r["merged"])
                for r in spark.sql("select * from merged_out").collect()
            }

        # poll until the idle-timeout flush (TimeoutFlushManager analog)
        # has emitted the pending records, then stop the query
        got = set()
        for _ in range(60):
            q.awaitTermination(2)
            got = rows()
            if any("start C" in m for _, m in got) and any(
                "start E" in m for _, m in got
            ):
                break
        q.stop()
        q.awaitTermination(30)

        # records completed by a following begin-mark (cross-batch buffers)
        assert ("c1", "2024-01-01 start A\n  cont A1") in got
        assert ("c1", "2024-01-02 start B\n  cont B1") in got
        assert ("c2", "2024-01-05 solo D\n  cont D1") in got
        # records with no following begin-mark flush via idle timeout
        assert ("c1", "2024-01-03 start C") in got
        assert ("c2", "2024-01-06 start E") in got


class TestStreamMergePartialLogs:
    IN2 = "/tmp/ilogtail_spark_flag_in"
    CK2 = "/tmp/ilogtail_spark_flag_ckpt"

    def test_flag_merge_across_micro_batches(self, spark):
        import time as _time

        from ilogtail_spark.streaming.stateful import stream_merge_partial_logs

        shutil.rmtree(self.IN2, ignore_errors=True)
        shutil.rmtree(self.CK2, ignore_errors=True)
        # P-run split across two micro-batches; its F line arrives later;
        # a final P with no F ever → idle-timeout flush, flagged partial
        batches = [
            [("c1", 0, "Exce", True, "t0", "stdout")],
            [("c1", 1, "ption", True, "t1", "stdout"),
             ("c1", 2, " in main", False, "t2", "stdout")],
            [("c1", 3, "dangling", True, "t3", "stdout")],
        ]
        schema = ("conv_id string, line_no int, content string, "
                  "is_partial boolean, _time_ string, _source_ string")
        for rows_b in batches:
            spark.createDataFrame(rows_b, schema).coalesce(1).write.mode(
                "append").parquet(self.IN2)
            _time.sleep(1.1)

        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.IN2)
        )
        merged = stream_merge_partial_logs(src, timeout_ms=2000)
        q = (
            merged.writeStream.format("memory").queryName("flag_out")
            .option("checkpointLocation", self.CK2)
            .outputMode("append").trigger(availableNow=True).start()
        )

        def rows():
            return {
                (r["content"], r["is_partial"], r["_time_"])
                for r in spark.sql("select * from flag_out").collect()
            }

        got = set()
        for _ in range(60):
            q.awaitTermination(2)
            got = rows()
            if any(c == "dangling" for c, _, _ in got):
                break
        q.stop()
        q.awaitTermination(30)

        # no separator; _time_ from the FIRST part; closed at the F line
        assert ("Exception in main", False, "t0") in got
        # never-closed run flushed by idle timeout, flagged partial
        assert ("dangling", True, "t3") in got


class TestStreamRateLimit:
    IN_DIR = "/tmp/ilogtail_spark_test_ratelimit_in"
    CKPT = "/tmp/ilogtail_spark_test_ratelimit_ckpt"

    def test_token_bucket_walk(self):
        from ilogtail_spark.streaming.stateful import token_bucket_walk

        # limit 2/s: full bucket of 2, +2 tokens per second elapsed
        kept, tokens, last = token_bucket_walk(
            [0.0, 0.0, 0.0, 0.5, 1.0], limit=2, per_seconds=1
        )
        # t=0: 2->1 keep; 2nd: 1->0 keep; 3rd: 0 drop;
        # t=0.5: +1 token -> keep; t=1.0: +1 -> keep
        assert kept == [True, True, False, True, True]

    def test_cross_batch_budget(self, spark):
        import shutil
        import time as _time

        from ilogtail_spark.streaming.stateful import (
            rate_limit_token_bucket,
            stream_rate_limit,
        )

        shutil.rmtree(self.IN_DIR, ignore_errors=True)
        shutil.rmtree(self.CKPT, ignore_errors=True)

        # key 'a' bursts 4 events at t=0 split ACROSS two batches: with
        # limit 2/s only the first two survive, proving the bucket state
        # crosses the batch boundary (a per-batch limiter would pass 3)
        batches = [
            [("a", 0, 0.0), ("a", 1, 0.0), ("b", 0, 0.0)],
            [("a", 2, 0.0), ("a", 3, 0.5), ("b", 1, 10.0)],
        ]
        for rows in batches:
            spark.createDataFrame(rows, "key string, ord long, ts double") \
                .coalesce(1).write.mode("append").parquet(self.IN_DIR)
            _time.sleep(1.1)

        src = (
            spark.readStream.schema("key string, ord long, ts double")
            .option("maxFilesPerTrigger", 1)
            .parquet(self.IN_DIR)
        )
        q = (
            stream_rate_limit(src, limit=2, per_seconds=1)
            .writeStream.format("memory").queryName("rate_out")
            .option("checkpointLocation", self.CKPT)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {(r["key"], r["ord"])
               for r in spark.sql("select * from rate_out").collect()}
        # a: ord 0,1 keep (bucket 2->0), ord 2 at t=0 drop, ord 3 at
        # t=0.5 (+1 token) keep; b: both keep
        assert got == {("a", 0), ("a", 1), ("a", 3), ("b", 0), ("b", 1)}

        # batch twin sees the same data in one pass -> identical output
        flat = [r for rows in batches for r in rows]
        bdf = spark.createDataFrame(flat, "key string, ord long, ts double")
        batch_got = {(r["key"], r["ord"])
                     for r in rate_limit_token_bucket(
                         bdf, limit=2, per_seconds=1).collect()}
        assert batch_got == got


class TestStreamExactDedup:
    IN_DIR = "/tmp/ilogtail_spark_sdedup_in"
    CKPT = "/tmp/ilogtail_spark_sdedup_ckpt"

    def test_duplicates_dropped_across_micro_batches(self, spark):
        import shutil
        import time as _time

        from ilogtail_spark.streaming.stateful import stream_exact_dedup

        shutil.rmtree(self.IN_DIR, ignore_errors=True)
        shutil.rmtree(self.CKPT, ignore_errors=True)

        # the same text arrives again in a LATER micro-batch — only the
        # first copy may survive, which requires cross-batch state
        batches = [
            [(0, "2024-01-01 00:00:00", "hello world"),
             (1, "2024-01-01 00:00:01", "unique one")],
            [(2, "2024-01-01 00:00:02", "hello world"),   # dup of row 0
             (3, "2024-01-01 00:00:03", "unique two"),
             (4, "2024-01-01 00:00:03", "unique two")],   # in-batch dup
            [(5, "2024-01-01 00:00:04", "unique one"),    # dup of row 1
             (6, "2024-01-01 00:00:05", "unique three")],
        ]
        for rows in batches:
            spark.createDataFrame(
                rows, "row_id long, ts_s string, text string"
            ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s") \
                .coalesce(1).write.mode("append").parquet(self.IN_DIR)
            _time.sleep(1.1)

        src = (
            spark.readStream.schema("row_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(self.IN_DIR)
        )
        q = (
            stream_exact_dedup(src, "text", event_time_col="ts",
                               watermark="1 hour")
            .writeStream.format("memory").queryName("sdedup_out")
            .option("checkpointLocation", self.CKPT)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {r["row_id"]: r["text"]
               for r in spark.sql("select * from sdedup_out").collect()}
        assert got == {0: "hello world", 1: "unique one",
                       3: "unique two", 6: "unique three"}


class TestStreamingCuration:
    """End-to-end STREAMING curation composition: file-source stream →
    cross-batch exact dedup (JVM state store) → the same flagship
    parse→enrich→route pipeline spec as batch → idempotent per-batch
    routed sink. Parity: per-route counts must equal the batch twin
    (keep-first-arrival dedup, then the same pipeline)."""

    IN_DIR = "/tmp/ilogtail_spark_scur_in"
    OUT = "/tmp/ilogtail_spark_scur_out"

    def test_stream_matches_batch_twin(self, spark):
        import shutil
        import time as _time

        from pyspark.sql.window import Window

        from ilogtail_spark.gen import gen_transcripts
        from ilogtail_spark.plans.pipeline import FLAGSHIP_SPEC, build_pipeline
        from ilogtail_spark.streaming.stateful import stream_exact_dedup

        shutil.rmtree(self.IN_DIR, ignore_errors=True)
        shutil.rmtree(self.OUT, ignore_errors=True)

        base = gen_transcripts(spark, 40).cache()
        # plant cross-batch duplicates: batch 2 re-sends batch 1's texts
        # under fresh conv ids (dup texts, later event time)
        dup = (
            base.filter("turn_idx <= 1")
            .withColumn("conv_id", F.concat(F.lit("redo-"), F.col("conv_id")))
            .withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 SECONDS"))
        )
        batches = [base, dup]
        for b in batches:
            b.coalesce(1).write.mode("append").parquet(self.IN_DIR)
            _time.sleep(1.1)

        schema = spark.read.parquet(self.IN_DIR).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.IN_DIR)
        )
        deduped = stream_exact_dedup(src, "text", event_time_col="ts",
                                     watermark="1 hour")

        def _sink(batch_df, batch_id):
            routed = build_pipeline(batch_df, FLAGSHIP_SPEC).withColumn(
                "batch_id", F.lit(batch_id)
            )
            (routed.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id", "route").parquet(f"{self.OUT}/routed"))

        q = (deduped.writeStream.foreachBatch(_sink)
             .option("checkpointLocation", f"{self.OUT}/_ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)

        got = {r["route"]: r["cnt"]
               for r in spark.read.parquet(f"{self.OUT}/routed")
               .groupBy("route").agg(F.count(F.lit(1)).alias("cnt")).collect()}

        # batch twin: keep the FIRST arrival per text (event-time order,
        # conv_id tiebreak), then the identical pipeline
        all_rows = batches[0].unionAll(batches[1])
        w = Window.partitionBy(F.md5("text")).orderBy("ts", "conv_id", "turn_idx")
        kept = (all_rows.withColumn("__rn__", F.row_number().over(w))
                .filter("__rn__ = 1").drop("__rn__"))
        want = {r["route"]: r["cnt"]
                for r in build_pipeline(kept, FLAGSHIP_SPEC)
                .groupBy("route").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        assert got == want and sum(got.values()) > 0


class TestStreamingIncrementalDedup:
    """Continuous-ingestion deployment shape of `incremental_dedup`: a
    file-source stream of arriving batches, each micro-batch probed
    against the STATIC write-time index inside foreachBatch. Validates
    the index relations survive across micro-batches (localCheckpoint),
    and that per-doc flags equal the batch twin — flags depend only on
    the index, so streaming order must not change them. (Cross-batch
    dups WITHIN the stream are `stream_exact_dedup`'s job, composable
    upstream of this probe.)"""

    IN_DIR = "/tmp/ilogtail_spark_sincr_in"
    OUT = "/tmp/ilogtail_spark_sincr_out"

    def test_stream_flags_match_batch_twin(self, spark):
        import shutil
        import time as _time

        from ilogtail_spark.functions.dedup import (
            dedup_index,
            incremental_dedup,
        )

        shutil.rmtree(self.IN_DIR, ignore_errors=True)
        shutil.rmtree(self.OUT, ignore_errors=True)

        corpus = spark.createDataFrame(
            [(i, f"corpus doc number {i} with some shared words here")
             for i in range(20)],
            "doc_id long, text string",
        )
        ex, bk = dedup_index(corpus)
        ex = ex.localCheckpoint(eager=True)
        bk = bk.localCheckpoint(eager=True)

        b1 = spark.createDataFrame(
            [(100, "corpus doc number 3 with some shared words here"),
             (101, "corpus doc number 3 with some shared words also"),
             (102, "totally novel arrival nothing indexed matches it")],
            "doc_id long, text string",
        )
        b2 = spark.createDataFrame(
            [(200, "corpus doc number 7 with some shared words here"),
             (201, "another novel arrival entirely distinct again yes")],
            "doc_id long, text string",
        )
        for b in (b1, b2):
            b.coalesce(1).write.mode("append").parquet(self.IN_DIR)
            _time.sleep(1.1)

        schema = spark.read.parquet(self.IN_DIR).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.IN_DIR)
        )

        def _sink(batch_df, batch_id):
            (incremental_dedup(batch_df, ex, bk)
             .withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(f"{self.OUT}/flags"))

        q = (src.writeStream.foreachBatch(_sink)
             .option("checkpointLocation", f"{self.OUT}/_ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)

        got = {r["doc_id"]: (r["exact_dup"], r["near_dup"])
               for r in spark.read.parquet(f"{self.OUT}/flags").collect()}
        want = {r["doc_id"]: (r["exact_dup"], r["near_dup"])
                for r in incremental_dedup(b1.unionAll(b2), ex, bk).collect()}
        assert got == want
        assert got[100] == (True, True) and got[200] == (True, True)
        assert got[101] == (False, True)  # one-token edit: near only
        assert got[102] == (False, False) and got[201] == (False, False)


class TestStreamingCurationIngest:
    """The GROWING-index durable curation loop (`curation_ingest_sink`):
    each micro-batch probes the on-disk snapshot, writes accepted rows,
    and appends their index delta — so a duplicate of a document
    accepted in an EARLIER batch is rejected (the static-index twin
    above cannot do that), and a brand-new stream over the same
    snapshot keeps rejecting it after a 'restart'."""

    IN_DIR = "/tmp/ilogtail_spark_scur_in"
    IN_DIR2 = "/tmp/ilogtail_spark_scur_in2"
    OUT = "/tmp/ilogtail_spark_scur_out"

    def _run_stream(self, spark, in_dir, ckpt):
        from ilogtail_spark.streaming.stateful import curation_ingest_sink

        schema = spark.read.parquet(in_dir).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            src.writeStream.foreachBatch(
                curation_ingest_sink(f"{self.OUT}/snap", f"{self.OUT}/kept")
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    def test_cross_batch_and_cross_restart_dedup(self, spark):
        import shutil
        import time as _time

        from ilogtail_spark.functions.dedup import dedup_index
        from ilogtail_spark.plans.snapshot import CorpusSnapshot

        for d in (self.IN_DIR, self.IN_DIR2, self.OUT):
            shutil.rmtree(d, ignore_errors=True)

        corpus = spark.createDataFrame(
            [(i, f"corpus doc number {i} with some shared words here")
             for i in range(20)],
            "doc_id long, text string",
        )
        snap = CorpusSnapshot(spark, f"{self.OUT}/snap")
        ex, bk = dedup_index(corpus)
        snap.write_dedup_index(
            ex, bk, params={"n": 3, "num_hashes": 64, "bands": 16}
        )

        b1 = spark.createDataFrame(
            [(100, "a totally novel arrival nothing indexed matches it"),
             (101, "corpus doc number 3 with some shared words here")],
            "doc_id long, text string",
        )
        b2 = spark.createDataFrame(
            # exact dup of doc 100 — accepted in the PREVIOUS batch;
            # only the growing index can catch it
            [(200, "a totally novel arrival nothing indexed matches it"),
             (201, "some other fresh document with different words too")],
            "doc_id long, text string",
        )
        for b in (b1, b2):
            b.coalesce(1).write.mode("append").parquet(self.IN_DIR)
            _time.sleep(1.1)

        self._run_stream(spark, self.IN_DIR, f"{self.OUT}/_ckpt1")
        kept = {r["doc_id"] for r in
                spark.read.parquet(f"{self.OUT}/kept").collect()}
        assert kept == {100, 201}  # 101 = corpus dup; 200 = batch-1 dup

        # 'restart': a brand-new stream (new source dir, new streaming
        # checkpoint, fresh CorpusSnapshot instance) over the SAME
        # snapshot — doc 300 duplicates doc 201, accepted before the
        # restart, and must still be rejected from disk state alone
        b3 = spark.createDataFrame(
            [(300, "some other fresh document with different words too"),
             (301, "yet another genuinely new arrival for the corpus")],
            "doc_id long, text string",
        )
        b3.coalesce(1).write.mode("append").parquet(self.IN_DIR2)
        self._run_stream(spark, self.IN_DIR2, f"{self.OUT}/_ckpt2")
        kept2 = {r["doc_id"] for r in
                 spark.read.parquet(f"{self.OUT}/kept").collect()}
        assert 301 in kept2 and 300 not in kept2


class TestStreamSessionize:
    """Native session_window streaming sessionization vs the batch
    gaps-and-islands twin (off-boundary gaps, so semantics coincide)."""

    IN_DIR = "/tmp/ilogtail_spark_ssess_in"

    def test_matches_batch_sessionize(self, spark):
        import shutil
        import time as _time

        from ilogtail_spark.functions.conversations import sessionize
        from ilogtail_spark.streaming.stateful import stream_sessionize

        shutil.rmtree(self.IN_DIR, ignore_errors=True)

        # c1: turns at 0,5,10 then a 500s jump (> gap 300); c2 one session
        rows = [
            ("c1", 0, "2024-01-01 00:00:00"),
            ("c1", 1, "2024-01-01 00:00:05"),
            ("c1", 2, "2024-01-01 00:00:10"),
            ("c1", 3, "2024-01-01 00:08:30"),
            ("c2", 0, "2024-01-01 00:00:00"),
            ("c2", 1, "2024-01-01 00:01:00"),
        ]
        for i in range(0, len(rows), 2):  # two rows per micro-batch file
            spark.createDataFrame(
                rows[i : i + 2], "conv_id string, turn_idx int, ts_s string"
            ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s") \
                .coalesce(1).write.mode("append").parquet(self.IN_DIR)
            _time.sleep(0.2)

        src = (
            spark.readStream.schema("conv_id string, turn_idx int, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(self.IN_DIR)
        )
        q = (
            stream_sessionize(src, 300, watermark=None)
            .writeStream.format("memory").queryName("ssess_out")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {
            (r["conv_id"], r["start_s"]): (r["n_turns"], r["last_s"])
            for r in spark.sql("select * from ssess_out").collect()
        }

        batch_in = spark.createDataFrame(
            [(c, i, t) for c, i, t in rows], "conv_id string, turn_idx int, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        want = {
            (r["conv_id"], r["start_s"]): (r["n_turns"], r["end_s"])
            for r in sessionize(batch_in, gap_s=300).collect()
        }
        assert got == want
        assert len(want) == 3  # c1 split into two sessions, c2 one


class TestStreamSchemaDrift:
    IN_DIR = "/tmp/ilogtail_spark_sdrift_in"
    CKPT = "/tmp/ilogtail_spark_sdrift_ckpt"

    def test_each_key_alerts_exactly_once_across_batches(self, spark):
        import shutil
        import time as _time

        from ilogtail_spark.streaming.stateful import stream_schema_drift

        shutil.rmtree(self.IN_DIR, ignore_errors=True)
        shutil.rmtree(self.CKPT, ignore_errors=True)

        batches = [
            [(0, "2024-01-01 00:00:00", '{"a": 1}'),
             (1, "2024-01-01 00:00:01", '{"a": 2, "b": 1}'),
             (2, "2024-01-01 00:00:02", "plain text, no json")],
            [(3, "2024-01-01 01:00:00", '{"a": 3}'),        # known keys only
             (4, "2024-01-01 01:00:01", '{"c": 1}')],       # NEW key c
            [(5, "2024-01-01 02:00:00", '{"b": 9, "c": 9}')],  # nothing new
        ]
        for rows in batches:
            spark.createDataFrame(
                rows, "row_id long, ts_s string, text string"
            ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s") \
                .coalesce(1).write.mode("append").parquet(self.IN_DIR)
            _time.sleep(1.1)

        src = (
            spark.readStream.schema("row_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(self.IN_DIR)
        )
        q = (
            stream_schema_drift(src, "text", event_time_col="ts")
            .writeStream.format("memory").queryName("sdrift_out")
            .option("checkpointLocation", self.CKPT)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {r["key"] for r in spark.sql("select * from sdrift_out").collect()}
        assert got == {"a", "b", "c"}
        # exactly one alert per key — the cross-batch re-appearances of
        # a and b in batches 2/3 must NOT re-emit
        n = spark.sql("select count(*) n from sdrift_out").first()["n"]
        assert n == 3
