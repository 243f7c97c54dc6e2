"""Tests: checkpoint-resume audit runs, streaming validation, multimodal
plumbing."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from valico_spark.operators.validate import validate_dataframe
from valico_spark.plans.audit import AuditRun
from valico_spark.rulesets import DOCS_RULESET


class TestAuditRun:
    def test_full_run_and_metrics(self, spark, docs_df, tmp_path):
        run = AuditRun(spark, str(tmp_path), "run1", n_buckets=4)
        process = lambda df: validate_dataframe(df, DOCS_RULESET,
                                                mode="columns")
        metrics = run.run(docs_df, "doc_id", process)
        assert len(metrics) == 4
        assert sum(m["docs"] for m in metrics) == docs_df.count()
        assert run.pending_buckets() == []
        # violation rows landed in the audit sink
        v = run.violations()
        assert v.count() > 0
        assert set(v.columns) >= {"doc_id", "code", "path"}

    def test_resume_skips_completed(self, spark, docs_df, tmp_path):
        run = AuditRun(spark, str(tmp_path), "run2", n_buckets=4)
        process = lambda df: validate_dataframe(df, DOCS_RULESET,
                                                mode="columns")
        # simulate a crash after two buckets: process only pending[:2]
        for b in run.pending_buckets()[:2]:
            bucket_expr = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(4))
            subset = docs_df.where(bucket_expr == b)
            validated = process(subset)
            run._commit(b, {"bucket": b, "docs": validated.count(),
                            "valid_docs": 0, "violations": 0,
                            "wall_sec": 0, "run_id": "run2",
                            "committed_at": 0})
        assert len(run.pending_buckets()) == 2
        resumed = AuditRun(spark, str(tmp_path), "run2", n_buckets=4)
        metrics = resumed.run(docs_df, "doc_id", process)
        assert len(metrics) == 2  # only the pending buckets ran
        assert resumed.pending_buckets() == []

    def test_metrics_df_shape(self, spark, docs_df, tmp_path):
        run = AuditRun(spark, str(tmp_path), "run3", n_buckets=2)
        run.run(docs_df, "doc_id",
                lambda df: validate_dataframe(df, DOCS_RULESET,
                                              mode="columns"))
        mdf = run.metrics_df()
        assert mdf.count() == 2
        assert {f.name for f in mdf.schema} >= {
            "run_id", "bucket", "docs", "valid_docs", "violations"}

    def test_catalog_table_requires_iceberg_runtime(self, spark,
                                                    tmp_path):
        from valico_spark.plans.audit import iceberg_available

        # this container has no iceberg-spark-runtime jar: the gated
        # path must fail fast at construction, not mid-scan
        assert not iceberg_available(spark)
        with pytest.raises(RuntimeError, match="Iceberg"):
            AuditRun(spark, str(tmp_path), "run4",
                     catalog_table="audit.validated")


class TestStreaming:
    def test_stream_matches_batch(self, spark, docs_df, tmp_path):
        from valico_spark.streaming.validate_stream import (
            stream_docs_validation,
        )

        docs_dir = str(tmp_path / "docs_stream")
        docs_df.limit(500).repartition(4).write.parquet(docs_dir)

        q = stream_docs_validation(
            spark, docs_dir, DOCS_RULESET,
            checkpoint_dir=str(tmp_path / "ckpt"),
            out_table="stream_counts")
        try:
            q.processAllAvailable()
            got = {r["valid"]: r["n"] for r in
                   spark.sql("select * from stream_counts").collect()}
        finally:
            q.stop()

        batch_df = spark.read.parquet(docs_dir)
        batch = {r["valid"]: r["n"] for r in
                 validate_dataframe(batch_df, DOCS_RULESET, mode="columns")
                 .groupBy("valid").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
        assert got == batch

    def test_windowed_counts_plan(self, spark):
        from valico_spark.streaming.validate_stream import (
            windowed_violation_counts, with_validation,
        )

        df = spark.createDataFrame(
            [("2024-01-01 00:00:10", "x"), ("2024-01-01 00:00:30", None)],
            ["ts_s", "name"]).withColumn(
                "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        ruleset = {"type": "object", "required": ["name"]}
        validated = with_validation(df, ruleset)
        out = windowed_violation_counts(validated, "ts").collect()
        by_code = {r["code"]: r["n"] for r in out}
        assert by_code.get("required") == 1


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media_payloads(self, spark):
        import pyarrow.parquet as pq

        from valico_spark.operators.multimodal import generate_media_payloads

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "payloads.parquet")
            pq.write_table(generate_media_payloads(200), path)
            yield spark.read.parquet(path).cache()

    def test_payload_stats_jvm_side(self, media_payloads):
        from valico_spark.operators.multimodal import payload_stats

        out = payload_stats(media_payloads)
        rows = out.select("payload_bytes", "sniffed_type").collect()
        assert all(r["payload_bytes"] >= 68 for r in rows)
        assert all(r["sniffed_type"] == "application/x-fake" for r in rows)

    def test_byte_histogram_features(self, media_payloads):
        from valico_spark.operators.multimodal import byte_histogram_features

        feats = byte_histogram_features(media_payloads).collect()
        assert len(feats) == 200
        for r in feats[:10]:
            assert r["n_bytes"] > 0
            assert len(r["histogram"]) == 16
            assert 0.0 < r["entropy"] <= 4.0 + 1e-9

    def test_decode_stub_shapes(self, media_payloads):
        from valico_spark.operators.multimodal import decode_image

        out = decode_image(media_payloads.limit(20)).collect()
        assert len(out) == 20
        for r in out:
            assert r["width"] == 64 and r["height"] == 64
            assert len(r["pixels"]) == 64 * 64
            assert r["decoder"] == "fake-v1"
        # determinism
        again = decode_image(media_payloads.limit(20)).collect()
        assert [r["pixels"][:5] for r in out] == \
               [r["pixels"][:5] for r in again]
        # exact tiling semantics: pixel j == payload[j % len] / 255
        payload = {r["media_ref"]: r["payload"]
                   for r in media_payloads.limit(20).collect()}
        for r in out[:5]:
            raw = payload[r["media_ref"]]
            for j in (0, 1, len(raw), 64 * 64 - 1):
                assert abs(r["pixels"][j] - raw[j % len(raw)] / 255.0) < 1e-6

    def test_sample_frames(self, spark):
        from valico_spark.operators.multimodal import sample_frames

        payload = bytes(range(256)) * 20  # 5120 bytes = 5 frames of 1024
        df = spark.createDataFrame(
            [("m1", bytearray(payload)), ("m2", bytearray(b"short")),
             ("m3", None)],
            "media_ref string, payload binary")
        out = sample_frames(df, frame_bytes=1024, every_k=2, max_frames=8)
        rows = sorted((r["media_ref"], r["frame_idx"], bytes(r["frame"]))
                      for r in out.collect())
        # m1: frames 0, 2, 4; m2/m3: too short / null -> no rows
        assert [(m, i) for m, i, _ in rows] == \
               [("m1", 0), ("m1", 2), ("m1", 4)]
        assert rows[0][2] == payload[0:1024]
        assert rows[1][2] == payload[2048:3072]
        # bounded fan-out: max_frames caps amplification
        big = spark.createDataFrame(
            [("b", bytearray(bytes(100) * 1024))],  # 100 frames
            "media_ref string, payload binary")
        capped = sample_frames(big, frame_bytes=1024, every_k=1,
                               max_frames=8)
        assert capped.count() == 8

    def test_decode_stub_null_payload(self, spark):
        from valico_spark.operators.multimodal import decode_image

        df = spark.createDataFrame(
            [("m1", bytearray(b"FAKEabc")), ("m2", None)],
            "media_ref string, payload binary")
        rows = {r["media_ref"]: r for r in decode_image(df).collect()}
        assert rows["m2"]["width"] == 0 and rows["m2"]["pixels"] == []
        assert rows["m2"]["decoder"] == "null"
        assert rows["m1"]["decoder"] == "fake-v1"
        assert len(rows["m1"]["pixels"]) == 64 * 64


class TestStreamingDedup:
    def test_dedup_stream_drops_duplicates(self, spark, tmp_path):
        import time as _time

        from valico_spark.streaming.validate_stream import dedup_stream

        src = tmp_path / "src"
        src.mkdir()
        df = spark.createDataFrame(
            [(1, "k1", "2024-01-01 10:00:00"),
             (2, "k2", "2024-01-01 10:00:01"),
             (3, "k1", "2024-01-01 10:00:02"),   # duplicate key
             (4, "k3", "2024-01-01 10:00:03")],
            "event_id long, key string, ts_s string"
        ).select("event_id", "key",
                 F.col("ts_s").cast("timestamp").alias("ts"))
        df.coalesce(1).write.parquet(str(src / "batch1"))
        stream = (spark.readStream.schema(df.schema)
                  .parquet(str(src / "*")))
        deduped = dedup_stream(stream, ["key"], "ts")
        q = (deduped.writeStream.format("memory")
             .queryName("dedup_sink")
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("SELECT key FROM dedup_sink").collect()
        keys = sorted(r["key"] for r in got)
        assert keys == ["k1", "k2", "k3"]


class TestStreamingDrift:
    def _events(self, spark):
        rows = []
        # window 1 matches the reference mix (8 a : 4 b); window 2 drifts
        # (all b) and adds a category the reference lacks
        for i in range(8):
            rows.append((f"2024-01-01 00:00:{10+i:02d}", "a"))
        for i in range(4):
            rows.append((f"2024-01-01 00:00:{30+i:02d}", "b"))
        for i in range(6):
            rows.append((f"2024-01-01 00:01:{10+i:02d}", "b"))
        rows.append(("2024-01-01 00:01:20", "novel"))
        return spark.createDataFrame(rows, ["ts_s", "cat"]).withColumn(
            "ts", F.col("ts_s").cast("timestamp")).drop("ts_s")

    def _reference(self, spark):
        return spark.createDataFrame(
            [("a",)] * 2 + [("b",)], ["cat"])

    def test_stream_counts_plus_finisher_match_batch_chi_square(
            self, spark, tmp_path):
        from valico_spark.operators.drift import chi_square
        from valico_spark.streaming.drift_stream import (
            chi_square_by_window, reference_shares,
            windowed_category_counts,
        )

        ev = self._events(spark)
        src = str(tmp_path / "drift_src")
        ev.write.parquet(src)
        stream = (spark.readStream.schema(ev.schema).parquet(src))
        counts = windowed_category_counts(stream, "ts", "cat",
                                          window="1 minute")
        # complete mode: on this bounded source the watermark never
        # passes the last window's end, so append would emit nothing;
        # production feeds use append and windows emit as they close
        q = (counts.writeStream.format("memory")
             .queryName("drift_counts").outputMode("complete")
             .option("checkpointLocation", str(tmp_path / "drift_ckpt"))
             .start())
        try:
            q.processAllAvailable()
            streamed = spark.sql("select * from drift_counts")
            ref = self._reference(spark)
            got = {str(r.window_start): (round(r.statistic, 9), r.df,
                                         r.n_obs)
                   for r in chi_square_by_window(
                       streamed, reference_shares(ref, "cat")).collect()}
        finally:
            q.stop()

        # batch ground truth: drift.chi_square per window slice
        batch = {}
        for start, lo, hi in ((" 00:00:00", "00:00:00", "00:01:00"),
                              (" 00:01:00", "00:01:00", "00:02:00")):
            sl = ev.where(
                (F.col("ts") >= f"2024-01-01 {lo}")
                & (F.col("ts") < f"2024-01-01 {hi}"))
            r = chi_square(sl, self._reference(spark), "cat").collect()[0]
            batch["2024-01-01" + start] = (round(r.statistic, 9), r.df,
                                           r.n_obs)
        assert got == batch
        # drifted window carries a much larger statistic
        assert got["2024-01-01 00:01:00"][0] > \
            got["2024-01-01 00:00:00"][0]

    def test_invalid_streaks_state_spans_micro_batches(
            self, spark, tmp_path):
        """applyInPandasWithState streak monitor: a run of consecutive
        failures split across two micro-batches (maxFilesPerTrigger=1)
        must still be detected — state carries (streak, last_id) over
        the batch boundary; open tail runs stay in state unemitted."""
        import os
        import time

        from valico_spark.streaming.streaks import invalid_streaks

        cols = ["user_id", "ts_s", "event_id", "valid"]
        batch1 = [(1, "2024-01-01 00:00:01", 101, False),
                  (1, "2024-01-01 00:00:02", 102, False),
                  (2, "2024-01-01 00:00:01", 201, False),
                  (2, "2024-01-01 00:00:02", 202, False),
                  (2, "2024-01-01 00:00:03", 203, True)]
        batch2 = [(1, "2024-01-01 00:00:03", 103, False),
                  (1, "2024-01-01 00:00:04", 104, True),
                  (1, "2024-01-01 00:00:05", 105, False)]
        src = tmp_path / "streak_src"
        src.mkdir()

        def write_one(rows, name, mtime):
            df = (spark.createDataFrame(rows, cols)
                  .withColumn("ts", F.col("ts_s").cast("timestamp"))
                  .drop("ts_s").coalesce(1))
            d = str(tmp_path / ("stage_" + name))
            df.write.parquet(d)
            part = [f for f in os.listdir(d)
                    if f.endswith(".parquet")][0]
            dst = str(src / name)
            os.rename(os.path.join(d, part), dst)
            os.utime(dst, (mtime, mtime))

        # mtime order fixes micro-batch order (FileStreamSource sorts
        # unseen files by modification time)
        now = time.time()
        write_one(batch1, "a.parquet", now - 120)
        write_one(batch2, "b.parquet", now - 60)

        schema = ("user_id bigint, event_id bigint, valid boolean, "
                  "ts timestamp")
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src)))
        out = invalid_streaks(stream, "user_id", "ts", "event_id",
                              min_len=3)
        q = (out.writeStream.outputMode("append").format("memory")
                .queryName("streaks_mb")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True).start())
        q.awaitTermination()
        got = [(r.key, r.streak_len, r.last_invalid_id)
               for r in spark.table("streaks_mb").collect()]
        # user 1: 101,102 (batch 1) + 103 (batch 2) close at 104 ->
        # one run of 3 ending at 103. user 2's run of 2 < min_len;
        # user 1's trailing 105 is an open tail (stays in state).
        assert got == [(1, 3, 103)]

    def test_invalid_streaks_group_larger_than_arrow_batch(
            self, spark, tmp_path):
        """A group bigger than arrow maxRecordsPerBatch reaches the
        stateful function as SEVERAL pandas chunks whose cross-chunk
        order is arbitrary; streaks must be evaluated on the globally
        (time, id)-sorted group, not chunk-by-chunk (ADVICE r4). Rows
        are written in DESCENDING time order and the batch size forced
        to 10, so the per-chunk-sort bug would scan later times first
        and mis-split the runs."""
        from valico_spark.streaming.streaks import invalid_streaks

        rows = []
        for i in range(35, 0, -1):  # descending time order on disk
            valid = not (1 <= i <= 5 or 7 <= i <= 9)
            rows.append((1, f"2024-01-01 00:00:{i:02d}", 100 + i, valid))
        src = tmp_path / "big_group_src"
        (spark.createDataFrame(rows,
                               ["user_id", "ts_s", "event_id", "valid"])
              .withColumn("ts", F.col("ts_s").cast("timestamp"))
              .drop("ts_s").coalesce(1)
              .write.parquet(str(src)))
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
        try:
            schema = ("user_id bigint, event_id bigint, valid boolean, "
                      "ts timestamp")
            stream = spark.readStream.schema(schema).parquet(str(src))
            out = invalid_streaks(stream, "user_id", "ts", "event_id",
                                  min_len=3)
            q = (out.writeStream.outputMode("append").format("memory")
                    .queryName("streaks_chunks")
                    .option("checkpointLocation", str(tmp_path / "ckpt2"))
                    .trigger(availableNow=True).start())
            q.awaitTermination()
            q.stop()
            got = sorted((r.key, r.streak_len, r.last_invalid_id)
                         for r in spark.table("streaks_chunks").collect())
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)
            spark.catalog.dropTempView("streaks_chunks")
        # ids 101-105 invalid (closed by 106), 107-109 invalid (closed
        # by 110); the rest valid — exactly two runs on the sorted group
        assert got == [(1, 3, 109), (1, 5, 105)]

    def test_contributions_grid_and_haldane(self, spark):
        """Per-(window, category) terms: reference categories absent
        from a window appear with o=0 and full expected mass; observed
        categories missing from the reference get Haldane e=0.5; terms
        sum to chi_square_by_window's statistic."""
        from valico_spark.operators.drift import chi_square
        from valico_spark.streaming.drift_stream import (
            chi_square_contributions, reference_shares,
            windowed_category_counts,
        )

        ev = self._events(spark)
        counts = windowed_category_counts(ev, "ts", "cat",
                                          window="1 minute")
        terms = chi_square_contributions(
            counts, reference_shares(self._reference(spark), "cat"))
        rows = {(str(r.window_start), r.cat): r
                for r in terms.collect()}
        # window 2 has no 'a' observations but 'a' is 2/3 of the
        # reference: expected = (2/3) * 7 observed, o = 0
        w2a = rows[("2024-01-01 00:01:00", "a")]
        assert w2a.o == 0 and abs(w2a.e - (2 / 3) * 7) < 1e-12
        # 'novel' is absent from the reference: Haldane e = 0.5
        w2n = rows[("2024-01-01 00:01:00", "novel")]
        assert w2n.o == 1 and w2n.e == 0.5
        # terms sum to the batch statistic per window
        stat = sum(r.contrib for (w, _), r in rows.items()
                   if w == "2024-01-01 00:01:00")
        sl = ev.where(F.col("ts") >= "2024-01-01 00:01:00")
        batch = chi_square(sl, self._reference(spark),
                           "cat").collect()[0]
        assert abs(stat - batch.statistic) < 1e-9


class TestStreamIncrementalDedup:
    """stream_minhash_dedup: candidates per micro-batch against a
    growing on-disk band index; durable state = the index table."""

    def test_two_runs_grow_the_index(self, spark, tmp_path):
        from valico_spark.streaming.incremental_dedup import (
            stream_minhash_dedup)

        src = str(tmp_path / "src")
        idx = str(tmp_path / "idx")
        pairs = str(tmp_path / "pairs")
        ckpt = str(tmp_path / "ckpt")
        schema = "doc_id long, text string"
        shared = ("the quick brown fox jumps over the lazy dog "
                  "again and again and then once more for luck")

        b1 = spark.createDataFrame([(1, shared), (2, shared)], schema)
        b1.write.parquet(src)
        q = stream_minhash_dedup(
            spark.readStream.schema(b1.schema).parquet(src),
            idx, pairs, ckpt)
        q.awaitTermination()
        q.stop()
        got1 = {(r.a_id, r.b_id, r.vs)
                for r in spark.read.parquet(pairs).collect()}
        assert got1 == {(1, 2, "batch")}

        # second run, same checkpoint: only the NEW file is processed,
        # and the first run's docs are now history
        b2 = spark.createDataFrame(
            [(3, shared),
             (4, "completely different unique content over here")],
            schema)
        b2.write.mode("append").parquet(src)
        q2 = stream_minhash_dedup(
            spark.readStream.schema(b1.schema).parquet(src),
            idx, pairs, ckpt)
        q2.awaitTermination()
        q2.stop()
        got2 = {(r.a_id, r.b_id, r.vs)
                for r in spark.read.parquet(pairs).collect()}
        assert got2 == {(1, 2, "batch"),
                        (1, 3, "history"), (2, 3, "history")}
        # the index holds band rows for every banded doc of both runs
        index = spark.read.parquet(idx)
        assert ({r.doc_id for r in index.collect()} == {1, 2, 3, 4})
        # partitioned by ingest batch: replay overwrites, never dupes
        assert ({r.ingest_batch for r in
                 index.select("ingest_batch").distinct().collect()}
                == {0, 1})
