"""Sessionization + connected-components (dedup clustering) tests."""

from pyspark.sql import functions as F


class TestSessionize:
    def test_gap_boundary_merges_at_exact_gap(self, spark):
        from valico_spark.operators.sessions import sessionize

        df = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", 1.0),
             (1, "2024-01-01 10:30:00", 2.0),    # exactly gap: same session
             (1, "2024-01-01 11:00:00.000001", 3.0),  # gap+1us: new session
             (2, "2024-01-01 10:00:00", 9.0)],
            "user_id long, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = sessionize(df, gap="30 minutes", agg_value_col="value")
        rows = sorted(((r["user_id"], r["n_events"], r["max_value"])
                       for r in out.collect()))
        assert rows == [(1, 1, 3.0), (1, 2, 2.0), (2, 1, 9.0)]

    def test_session_bounds_are_event_times(self, spark):
        from valico_spark.operators.sessions import sessionize

        df = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00")],
            "user_id long, ts string").withColumn(
                "ts", F.to_timestamp("ts"))
        r = sessionize(df).collect()[0]
        assert str(r["session_start"]) == "2024-01-01 10:00:00"
        # last = max event ts, NOT window end (which pads the gap)
        assert str(r["session_last"]) == "2024-01-01 10:10:00"


class TestSessionizePlanShape:
    def test_single_exchange_with_partial_agg(self, spark):
        """The 100-TB contract: map-side partial session aggregation,
        exactly ONE shuffle (on the session key), pruned scan."""
        from valico_spark.operators.sessions import sessionize

        df = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", 1.0)],
            "user_id long, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        plan = sessionize(df, agg_value_col="value") \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "partial_min" in plan  # map-side combine before the shuffle

    def test_streaming_sessionize_matches_batch(self, spark, tmp_path):
        """The same sessionize expression runs under Structured Streaming
        with a watermark (session state evicted past it)."""
        import time as _time

        from valico_spark.operators.sessions import sessionize

        src = tmp_path / "src"
        src.mkdir()
        rows = [(1, "2024-01-01 10:00:00", 1.0),
                (1, "2024-01-01 10:10:00", 2.0),
                (1, "2024-01-01 12:00:00", 3.0),
                (2, "2024-01-01 10:00:00", 4.0)]
        batch = spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        batch.write.mode("overwrite").parquet(str(src / "p"))

        stream = (spark.readStream.schema(batch.schema)
                  .parquet(str(src / "p"))
                  .withWatermark("ts", "1 hour"))
        out = sessionize(stream, agg_value_col="value")
        q = (out.writeStream.format("memory").queryName("sess_test")
                .outputMode("complete").start())
        try:
            q.processAllAvailable()
            got = sorted((r["user_id"], r["n_events"], r["max_value"])
                         for r in spark.sql(
                             "select * from sess_test").collect())
        finally:
            q.stop()
        want = sorted((r["user_id"], r["n_events"], r["max_value"])
                      for r in sessionize(batch,
                                          agg_value_col="value").collect())
        assert got == want


class TestJaccardPrefix:
    def test_matches_brute_force(self, spark):
        """Prefix filtering is exact: same pairs as the all-pairs
        brute-force Jaccard over word shingles."""
        import itertools

        from valico_spark.operators.dedup import jaccard_pairs_prefix

        base = ("the quick brown fox jumps over the lazy dog and runs "
                "far away into the deep dark forest tonight").split()
        docs = []
        for i in range(12):
            words = list(base)
            if i % 3 == 0:
                words[i % len(words)] = f"tok{i}"   # near-dup of base
            elif i % 3 == 1:
                words = [f"w{i}_{j}" for j in range(18)]  # unique doc
            docs.append((i, " ".join(words)))
        df = spark.createDataFrame(docs, "doc_id long, text string")

        got = sorted((r["a_id"], r["b_id"], round(r["jaccard"], 6))
                     for r in jaccard_pairs_prefix(
                         df, threshold=0.5, w=3).collect())

        def shingles(t):
            ws = t.split()
            return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

        want = []
        for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
            sa, sb = shingles(ta), shingles(tb)
            if not sa or not sb:
                continue
            j = len(sa & sb) / max(len(sa | sb), 1)
            if j >= 0.5:
                want.append((min(ia, ib), max(ia, ib), round(j, 6)))
        assert got == sorted(want)
        assert len(got) > 0  # the near-dups actually pair up


class TestConnectedComponents:
    def test_chain_and_triangle(self, spark):
        from valico_spark.operators.graph import connected_components

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4),           # chain -> comp 1
             (10, 11), (11, 12), (10, 12),     # triangle -> comp 10
             (20, 21)],                        # pair -> comp 20
            "a_id long, b_id long")
        comp = {r["id"]: r["comp"]
                for r in connected_components(pairs).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1,
                        10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_dedup_clusters_sizes(self, spark):
        from valico_spark.operators.graph import dedup_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], "a_id long, b_id long")
        rows = {r["doc_id"]: (r["component"], r["cluster_size"])
                for r in dedup_clusters(pairs).collect()}
        assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3),
                        5: (5, 2), 6: (5, 2)}

    def test_long_chain_converges(self, spark):
        from valico_spark.operators.graph import connected_components

        n = 12  # diameter > a couple of iterations
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "a_id long, b_id long")
        comp = {r["id"]: r["comp"]
                for r in connected_components(pairs).collect()}
        assert set(comp.values()) == {0}
        assert len(comp) == n + 1


class TestSelectRepresentatives:
    def test_keep_highest_score_ties_to_min_id(self, spark):
        from valico_spark.operators.graph import select_representatives

        clusters = spark.createDataFrame(
            [(1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2)],
            "doc_id long, component long, cluster_size long")
        scored = spark.createDataFrame(
            [(1, 5.0), (2, 9.0), (3, 9.0), (10, 1.0), (11, 1.0)],
            "doc_id long, q double")
        out = {r.doc_id: r.keep for r in select_representatives(
            clusters, scored, "q").collect()}
        # component 1: score tie between 2 and 3 -> min id 2 survives
        assert out == {1: False, 2: True, 3: False,
                       10: True, 11: False}


class TestStarVsHashMin:
    def test_random_graphs_equivalent(self, spark):
        """large/small-star (default) and HashMin produce identical
        (id, comp) tables on random graphs."""
        import random

        from valico_spark.operators.graph import connected_components

        rnd = random.Random(7)
        for trial in range(3):
            n = 60
            edges = [(rnd.randrange(n), rnd.randrange(n))
                     for _ in range(70)]
            pairs = spark.createDataFrame(edges, "a_id long, b_id long")
            star = {(r["id"], r["comp"]) for r in connected_components(
                pairs, algorithm="star").collect()}
            hm = {(r["id"], r["comp"]) for r in connected_components(
                pairs, algorithm="hashmin", max_iter=80).collect()}
            assert star == hm, (trial, star ^ hm)

    def test_long_chain_logarithmic_rounds(self, spark):
        """A 64-node chain (diameter 63) must converge within the star
        bound ~log2(n) + slack — where HashMin would need 63 rounds."""
        from valico_spark.operators.graph import connected_components

        n = 63
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "a_id long, b_id long")
        comp = {r["id"]: r["comp"] for r in connected_components(
            pairs, algorithm="star", max_iter=12).collect()}
        assert set(comp.values()) == {0}
        assert len(comp) == n + 1
