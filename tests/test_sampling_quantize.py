"""Deterministic sampling + embedding quantization tests."""

from pyspark.sql import functions as F


class TestDeterministicSample:
    def test_reproducible_and_rate(self, spark):
        from valico_spark.operators.sampling import deterministic_sample

        df = spark.range(20000).withColumnRenamed("id", "k")
        s1 = set(r["k"] for r in
                 deterministic_sample(df, "k", 0.3).collect())
        s2 = set(r["k"] for r in
                 deterministic_sample(df.repartition(7), "k", 0.3)
                 .collect())
        assert s1 == s2                      # partitioning-independent
        assert 0.27 < len(s1) / 20000 < 0.33  # close to the target rate

    def test_nested_rates(self, spark):
        """A 0.1 sample is a subset of the 0.3 sample — same hash, lower
        threshold; lets pipelines carve nested train/dev splits."""
        from valico_spark.operators.sampling import deterministic_sample

        df = spark.range(5000).withColumnRenamed("id", "k")
        small = set(r["k"] for r in
                    deterministic_sample(df, "k", 0.1).collect())
        big = set(r["k"] for r in
                  deterministic_sample(df, "k", 0.3).collect())
        assert small <= big

    def test_stratified_rates(self, spark):
        from valico_spark.operators.sampling import stratified_sample

        df = spark.range(10000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, "en").otherwise("de")
             .alias("lang"))
        out = stratified_sample(df, "k", "lang",
                                {"en": 0.2}, default_fraction=0.9)
        counts = {r["lang"]: r["n"] for r in
                  out.groupBy("lang").agg(F.count("*").alias("n"))
                     .collect()}
        assert 0.15 < counts["en"] / 5000 < 0.25
        assert 0.85 < counts["de"] / 5000 < 0.95


class TestPiiRedaction:
    def test_redacts_each_type(self, spark):
        from valico_spark.operators.text import pii_stats

        df = spark.createDataFrame(
            [(1, "mail a.b+c@x-y.org, ip 10.0.0.1, card "
                 "4111 1111 1111 1111, tel +44 20 7946 0958"),
             (2, "clean text with numbers 7 and 1999")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in pii_stats(df).collect()}
        r1 = rows[1]
        assert (r1["n_email"], r1["n_card"], r1["n_ipv4"]) == (1, 1, 1)
        assert r1["n_phone"] >= 1
        for token in ("<EMAIL>", "<CARD>", "<IPV4>", "<PHONE>"):
            assert token in r1["redacted"]
        assert "@" not in r1["redacted"]
        assert "4111" not in r1["redacted"]
        r2 = rows[2]
        assert r2["redacted"] == "clean text with numbers 7 and 1999"
        assert (r2["n_email"], r2["n_card"], r2["n_ipv4"],
                r2["n_phone"]) == (0, 0, 0, 0)


class TestRepetitionScores:
    def test_signals(self, spark):
        from valico_spark.operators.text import repetition_scores

        df = spark.createDataFrame(
            [(1, "menu\nmenu\nmenu\nbody text here"),
             (2, "buy now buy now buy now buy now"),
             (3, "all lines differ\ncompletely from\neach other"),
             (4, "one")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in
                repetition_scores(df).collect()}
        assert rows[1]["n_lines"] == 4
        assert abs(rows[1]["dup_line_frac"] - 0.5) < 1e-9  # 2 dup of 4
        # "buy now"x4 + "now buy"x3 -> top share 4/7
        assert rows[2]["top_bigram_n"] == 4
        assert rows[2]["n_bigrams"] == 7
        assert abs(rows[2]["top_bigram_frac"] - 4 / 7) < 1e-6
        assert rows[3]["dup_line_frac"] == 0.0
        # single word: no bigrams, no crash
        assert rows[4]["n_bigrams"] == 0
        assert rows[4]["top_bigram_frac"] == 0.0


class TestBpeTokenStats:
    def test_counts(self, spark):
        from valico_spark.operators.text import bpe_token_stats

        df = spark.createDataFrame(
            [(1, "The fox's 42 jumps, doesn't it?")],
            "doc_id long, text string")
        r = bpe_token_stats(df).collect()[0]
        # The| fox|'s| 42| jumps|,| doesn|'t| it|?
        assert r["n_bpe_tokens"] == 10
        assert r["n_ws_tokens"] == 6
        assert r["chars_per_token"] == round(31 / 10, 6)


class TestQuantize:
    def test_round_trip_error_bound(self, spark):
        from valico_spark.operators.similarity import (dequantize,
                                                       quantize_embeddings)

        emb = spark.read.parquet(
            "/root/testdata/sf0.01/embeddings.parquet")
        q = quantize_embeddings(emb)
        joined = q.join(emb, "vec_id").select(
            "vec_id",
            F.array_max(F.zip_with(
                dequantize(F.col("qvec"), F.col("scale_r")),
                F.col("embedding"),
                lambda a, b: F.abs(a - b))).alias("max_err"),
            (F.array_max(F.transform("embedding",
                                     lambda x: F.abs(x)))
             / 254.0).alias("half_step"))
        # |dequant - orig| <= scale/2 = max|x|/254 (+ float eps)
        bad = joined.where(
            F.col("max_err") > F.col("half_step") * 1.01).count()
        assert bad == 0

    def test_zero_vector(self, spark):
        from valico_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, -1.0])],
            "vec_id long, embedding array<float>")
        rows = {r["vec_id"]: r for r in
                quantize_embeddings(df).collect()}
        assert rows[1]["qvec"] == [0, 0] and rows[1]["scale_r"] == 1.0
        assert rows[2]["qvec"] == [127, -127]


class TestPackSequences:
    def test_packing_invariants(self, spark):
        from valico_spark.operators.packing import (
            pack_sequences, packed_sequence_stats,
        )

        df = spark.createDataFrame(
            [(i, 100 + (i * 37) % 900) for i in range(200)],
            "doc_id long, n_tok long")
        packed = pack_sequences(df, "n_tok", budget=1000, n_buckets=4)
        rows = packed.collect()
        assert len(rows) == 200
        # chunk is the floor of the running start over the budget
        assert all(r.chunk == r.chunk_start // 1000 for r in rows)
        # within a bucket, ordering by doc_id gives contiguous offsets
        by_bucket = {}
        for r in sorted(rows, key=lambda r: (r.bucket, r.doc_id)):
            expect = by_bucket.get(r.bucket, 0)
            assert r.chunk_start == expect
            by_bucket[r.bucket] = expect + r.n_tok
        stats = packed_sequence_stats(packed, "n_tok").collect()
        assert sum(s.docs for s in stats) == 200
        # no chunk (except possibly each bucket's tail) is left less
        # than half-filled before the next one starts: concat-and-chunk
        # wastes at most one straddling doc per boundary
        assert all(s.tokens > 0 for s in stats)

    def test_determinism_across_parallelism(self, spark):
        from valico_spark.operators.packing import pack_sequences

        df = spark.createDataFrame(
            [(i, 50 + i % 300) for i in range(500)],
            "doc_id long, n_tok long")
        a = sorted(map(tuple, pack_sequences(
            df.repartition(17), "n_tok", 512).collect()))
        b = sorted(map(tuple, pack_sequences(
            df.coalesce(1), "n_tok", 512).collect()))
        assert a == b

    def test_budget_validation(self, spark):
        from valico_spark.operators.packing import pack_sequences

        df = spark.createDataFrame([(1, 5)], "doc_id long, n_tok long")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            pack_sequences(df, "n_tok", 0)


class TestChunkPackProperties:
    """Property-based invariants (hypothesis drives the shapes; Spark
    evaluates a single batched job per example set to keep runtime
    sane — examples are generated up front, not per-Spark-call)."""

    def test_chunk_reassembly_property(self, spark):
        from valico_spark.operators.text import chunk_text

        import random
        rnd = random.Random(7)
        cases = []
        for i in range(60):
            n = rnd.randint(1, 64)
            t = "".join(chr(rnd.randint(33, 126)) for _ in range(n))
            size = rnd.randint(1, 20)
            overlap = rnd.randint(0, size - 1)
            cases.append((i, t, size, overlap))
        for size, overlap in sorted({(c[2], c[3]) for c in cases}):
            group = [(c[0], c[1]) for c in cases
                     if c[2] == size and c[3] == overlap]
            df = spark.createDataFrame(group, "doc_id long, text string")
            rows = chunk_text(df, size=size, overlap=overlap).collect()
            by_doc = {}
            for r in rows:
                by_doc.setdefault(r.doc_id, []).append(r)
            for did, text in group:
                chunks = sorted(by_doc[did], key=lambda r: r.chunk_id)
                # stride positions and full reassembly
                stride = size - overlap
                assert [c.chunk_start for c in chunks] == \
                    [k * stride for k in range(len(chunks))]
                rebuilt = chunks[0].chunk + "".join(
                    c.chunk[overlap:] for c in chunks[1:])
                assert rebuilt == text, (did, size, overlap)

    def test_pack_chunks_are_contiguous_property(self, spark):
        import random
        from valico_spark.operators.packing import pack_sequences

        rnd = random.Random(11)
        rows = [(i, rnd.randint(1, 700)) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        packed = pack_sequences(df, "n_tok", budget=1000, n_buckets=8)
        got = sorted(packed.collect(), key=lambda r: (r.bucket, r.doc_id))
        run = {}
        for r in got:
            start = run.get(r.bucket, 0)
            assert r.chunk_start == start
            assert r.chunk == start // 1000
            run[r.bucket] = start + r.n_tok
        # chunk ids are dense per bucket (no gaps beyond straddle jumps)
        per_bucket = {}
        for r in got:
            per_bucket.setdefault(r.bucket, []).append(r.chunk)
        for b, chunks in per_bucket.items():
            assert chunks == sorted(chunks)
