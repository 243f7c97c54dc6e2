"""AQE skew-join demonstration: the north rule names "AQE skew-join
hints" as one of the two skew mitigations (with salting, operators/
skew.py). Session defaults enable ``spark.sql.adaptive.skewJoin``
(session.py), but enabled != engaged — this lane PROVES the runtime
split actually fires on this engine's own join path by building a
hot-key child table, forcing the sort-merge strategy, and asserting
the executed adaptive plan marks the join ``skew=true`` while the
orphan result stays exactly correct.

Reference analogue: none (the reference validates one document at a
time); this is the cross-document referential check's (relational.py
``orphans``) behavior under the skewed-prefix scenario the north rule
calls out.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from valico_spark.operators.relational import orphans

# AQE confs are runtime-settable; everything here is set/restored per
# test so the shared session is untouched afterwards.
_SKEW_CONF = {
    # force shuffle joins: both static and adaptive broadcast off
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # fire the skew split at test scale: the hot partition (~ tens of
    # MB with the payload column) must exceed BOTH the absolute
    # threshold and factor x median partition size
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    # keep coalescing from merging the split partitions straight back
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256k",
    "spark.sql.shuffle.partitions": "8",
}


@pytest.fixture()
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    for k, v in _SKEW_CONF.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_child(spark):
    """400k rows; key 0 holds 300k of them (one hot shuffle partition),
    keys 0..999 share the rest uniformly. The payload pads rows so the
    hot partition's shuffle bytes clear the lowered skew threshold."""
    return (spark.range(0, 400_000)
            .select(F.when(F.col("id") < 300_000, F.lit(0))
                     .otherwise((F.col("id") % 1000).cast("long"))
                     .alias("k"),
                    F.col("id").alias("row_id"),
                    F.repeat(F.lit("x"), 120).alias("payload")))


def test_skew_split_fires_and_orphans_exact(skew_conf):
    spark = skew_conf
    child = _skewed_child(spark)
    parent = spark.range(0, 500).select(F.col("id").alias("k"))

    o = orphans(child, "k", parent, "k")
    # collect o ITSELF (not a derived count() query) so THIS DataFrame's
    # adaptive plan runs to final and can be inspected afterwards
    rows = o.collect()
    # orphan keys are 500..999: only ids in [300000, 400000) reach
    # them, 100 rows per key -> 500 * 100 exactly
    assert len(rows) == 50_000

    plan = o._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # the left-anti join must be sort-merge (broadcast is disabled) and
    # the hot child partition must have been split by OptimizeSkewedJoin
    assert "SortMergeJoin" in plan
    assert "skew=true" in plan, (
        "AQE skew-join did not engage; plan head:\n" + plan[:2000])


def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    """Runtime bloom-filter join pruning (the other runtime shuffle-
    volume lever next to AQE): when one join side carries a selective
    filter, Spark builds a bloom filter from it and injects a
    ``might_contain`` predicate on the other side BELOW that side's
    shuffle — at 100 TB this drops never-matching fact rows at the scan
    instead of shuffling them. Session defaults leave
    ``runtime.bloomFilter.enabled`` on; this pins that it ENGAGES on a
    plain filtered-dimension inner equi-join over parquet (the
    decontamination / dimension-enrichment shape). NOTE it cannot apply
    to the referential LEFT ANTI join — pruning non-matching rows there
    would delete exactly the orphans the check reports — so the skew
    rail above, not this one, is the anti-join's lever.
    """
    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    confs = {
        # the application-side scan must look big enough to be worth
        # filtering; lower the bar at test scale
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "10KB",
        # force a shuffle join: with broadcast, the probe side already
        # prunes against the build hash table and no bloom is injected
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(0, 200_000).select(
            (F.col("id") % 50_000).alias("k"),
            F.repeat(F.lit("y"), 40).alias("pay"))
        dim = spark.range(0, 2_000).select(
            (F.col("id") * 7).alias("k"), F.col("id").alias("v"))
        fact.write.mode("overwrite").parquet(str(tmp_path / "fact"))
        dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
        f = spark.read.parquet(str(tmp_path / "fact"))
        d = (spark.read.parquet(str(tmp_path / "dim"))
                  .where(F.col("k") % 2 == 0))  # the selective side
        j = f.join(d, "k")
        rows = j.collect()
        # ground truth: dim keys are 7i (i<2000) with 7i even; fact has
        # 4 rows per key < 50000
        want = 4 * sum(1 for i in range(2000)
                       if (7 * i) % 2 == 0 and 7 * i < 50_000)
        assert len(rows) == want
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan, (
            "runtime bloom filter did not engage; plan head:\n"
            + plan[:1500])
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_skew_split_preserves_anti_join_semantics(skew_conf):
    """Split partitions must not duplicate or drop anti-join rows: the
    orphan ROW SET (not just the count) matches the unsplit truth."""
    spark = skew_conf
    child = _skewed_child(spark)
    parent = spark.range(0, 500).select(F.col("id").alias("k"))

    got = sorted(r.row_id for r in
                 orphans(child, "k", parent, "k").select("row_id")
                 .collect())
    # ground truth computed without a join: id % 1000 >= 500 for the
    # uniform tail, never for the hot range
    want = sorted(i for i in range(300_000, 400_000) if i % 1000 >= 500)
    assert got == want
