"""Training-export tier lane (operators/export.py): mixture math,
deterministic mixture sampling, global shuffle, shard writing — all
pinned for cross-partitioning determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from valico_spark.operators.export import (
    deterministic_shuffle, mixture_rates, mixture_sample, shard_column,
    write_shards,
)


def _corpus(spark):
    # 3 sources with very different token masses: web dominates,
    # books is mid, wiki is scarce
    return (spark.range(0, 6000)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.col("id") % 6 < 4, "web")
                     .when(F.col("id") % 6 == 4, "books")
                     .otherwise("wiki").alias("source"),
                    F.when(F.col("id") % 6 < 4, 100)
                     .when(F.col("id") % 6 == 4, 200)
                     .otherwise(50).cast("long").alias("n_tokens")))


class TestMixtureMath:
    def test_max_feasible_rule(self):
        # wiki is binding: t/w = 50k/0.25 = 200k < web 400k/0.5=800k,
        # books 200k/0.25=800k
        rates = mixture_rates(
            {"web": 400_000, "books": 200_000, "wiki": 50_000},
            {"web": 0.5, "books": 0.25, "wiki": 0.25})
        assert rates["wiki"]["rate"] == 1.0
        assert rates["wiki"]["target_tokens"] == 50_000
        assert rates["web"]["target_tokens"] == 100_000
        assert rates["web"]["rate"] == pytest.approx(0.25)
        assert rates["books"]["rate"] == pytest.approx(0.25)

    def test_weights_normalized_and_zero_dropped(self):
        rates = mixture_rates({"a": 100, "b": 100},
                              {"a": 2.0, "b": 2.0, "c": 0.0})
        assert set(rates) == {"a", "b"}
        assert rates["a"]["weight"] == pytest.approx(0.5)

    def test_null_token_sum_is_missing_not_crash(self):
        # F.sum over an all-null group returns None — must raise the
        # diagnostic error, not TypeError on None <= 0
        with pytest.raises(ValueError, match="no tokens"):
            mixture_rates({"a": 100, "b": None}, {"a": 0.5, "b": 0.5})

    def test_missing_source_raises(self):
        with pytest.raises(ValueError, match="no tokens"):
            mixture_rates({"a": 100}, {"a": 0.5, "typo": 0.5})
        with pytest.raises(ValueError, match="positive weight"):
            mixture_rates({"a": 100}, {"a": 0.0})


class TestMixtureProperties:
    """Driver-side mixture math holds for ANY corpus/weights (pure
    python — no Spark in the loop, so hypothesis can hammer it)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.dictionaries(
        st.sampled_from([f"s{i}" for i in range(8)]),
        st.tuples(st.integers(min_value=1, max_value=10**12),
                  st.floats(min_value=0.001, max_value=100.0)),
        min_size=1, max_size=8))
    @settings(max_examples=200, deadline=None)
    def test_invariants(self, spec):
        counts = {s: t for s, (t, _) in spec.items()}
        weights = {s: w for s, (_, w) in spec.items()}
        rates = mixture_rates(counts, weights)
        wsum = sum(weights.values())
        # every rate is a valid downsampling fraction
        assert all(0 < i["rate"] <= 1.0 for i in rates.values())
        # at least one source is binding (max feasible corpus)
        assert any(i["rate"] > 1.0 - 1e-9 for i in rates.values())
        # targets never exceed availability
        assert all(i["target_tokens"] <= i["available_tokens"]
                   for i in rates.values())
        # target masses follow the normalized weights exactly
        # (up to the int() floor on each target)
        total = sum(i["target_tokens"] for i in rates.values())
        if total > 0:
            for s, i in rates.items():
                assert abs(i["target_tokens"] / (total or 1)
                           - weights[s] / wsum) <= 8 / max(total, 1) \
                    + 1e-9 + weights[s] / wsum * 8 / max(total, 1)


class TestMixtureSample:
    def test_achieves_targets_and_reports(self, spark):
        docs = _corpus(spark)
        sampled, report = mixture_sample(
            docs, {"web": 0.5, "books": 0.25, "wiki": 0.25})
        rep = {r.source: r for r in report.collect()}
        # wiki: 1000 docs * 50 = 50k tokens, binding -> rate 1.0
        assert rep["wiki"].rate == 1.0
        assert rep["wiki"].achieved_tokens == 50_000
        # the realized masses track the targets (hash sampling is
        # exact in expectation; 1000+ docs per source keeps it tight)
        for s in ("web", "books"):
            assert rep[s].achieved_tokens == pytest.approx(
                rep[s].target_tokens, rel=0.12)
        # downsampling-only: nothing repeated, sample is a subset
        assert sampled.count() == sampled.select("doc_id").distinct().count()
        assert sampled.join(docs, "doc_id", "left_anti").count() == 0

    def test_deterministic_across_partitionings(self, spark):
        docs = _corpus(spark)
        a = sorted(r.doc_id for r in mixture_sample(
            docs.repartition(17),
            {"web": 0.5, "books": 0.5})[0].collect())
        b = sorted(r.doc_id for r in mixture_sample(
            docs.coalesce(1),
            {"web": 0.5, "books": 0.5})[0].collect())
        assert a == b and len(a) > 0

    def test_unweighted_sources_dropped(self, spark):
        docs = _corpus(spark)
        sampled, _ = mixture_sample(docs, {"wiki": 1.0})
        assert (sampled.select("source").distinct().collect()
                == [("wiki",)] or
                [r.source for r in
                 sampled.select("source").distinct().collect()]
                == ["wiki"])


class TestShuffleAndShards:
    def test_shuffle_is_permutation_and_layout_invariant(self, spark):
        docs = _corpus(spark)
        a = [r.doc_id for r in
             deterministic_shuffle(docs.repartition(13)).collect()]
        b = [r.doc_id for r in
             deterministic_shuffle(docs.coalesce(1)).collect()]
        assert a == b
        assert sorted(a) == list(range(6000))
        assert a[:100] != sorted(a)[:100]  # actually shuffled
        c = [r.doc_id for r in
             deterministic_shuffle(docs, seed=1).collect()]
        assert c != a and sorted(c) == sorted(a)

    def test_write_shards_balanced_exact_and_deterministic(
            self, spark, tmp_path):
        docs = _corpus(spark)
        path = str(tmp_path / "shards")
        manifest = write_shards(docs, path, n_shards=8)
        rows = manifest.collect()
        assert [r.shard for r in rows] == list(range(8))
        assert sum(r.n_rows for r in rows) == 6000
        # hash balance: no shard more than 25% off the mean
        assert max(r.n_rows for r in rows) < 6000 / 8 * 1.25
        assert min(r.n_rows for r in rows) > 6000 / 8 * 0.75
        # every row exactly once, shard assignment reproducible
        back = spark.read.parquet(path)
        assert back.count() == 6000
        assert (back.where(F.col("shard")
                           != shard_column("doc_id", 8, 0)).count()
                == 0)

    def test_write_shards_empty_corpus(self, spark, tmp_path):
        """All-dropped corpus: the manifest read-back must return an
        empty frame, not crash on schema inference over zero files."""
        docs = _corpus(spark).where(F.lit(False))
        manifest = write_shards(docs, str(tmp_path / "empty"), 4)
        assert manifest.collect() == []
