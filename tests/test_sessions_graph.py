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
