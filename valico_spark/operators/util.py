"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_group_size(df: DataFrame, keys: list[str], max_size: int,
                   op_name: str, hint: str) -> DataFrame:
    """Plan-assert that no group keyed on ``keys`` holds more than
    ``max_size`` rows — the mega-bucket safety rail for banded/blocked
    pair joins. On a web corpus the dominant near-dup class is EXACT
    duplicates at 10^3-10^6 copies; those share every band bucket, so one
    hot bucket would yield O(c^2) candidate pairs and kill the job at
    100x even though the design is otherwise bucketed. This guard makes
    that failure LOUD at the bucket stage instead of silent at the join.

    Cost shape: a window count partitioned on ``keys`` — evaluated under
    the SAME hash partitioning the downstream self-join shuffles on, so
    it adds no extra corpus-wide exchange (unlike a groupBy + join-back,
    whose |groups| relation can itself be corpus-sized for band keys).
    The ``assert_true`` filter is non-prunable by Catalyst; rows pass
    through unchanged, so exact oracles are unaffected until the cap
    actually fires.
    """
    w = Window.partitionBy(*keys)
    n = F.count(F.lit(1)).over(w)
    msg = F.concat(
        F.lit(f"{op_name}: group ("),
        *sum([[F.col(k).cast("string"), F.lit(",")] for k in keys], []),
        F.lit(f") exceeds max_group_size={max_size} with "),
        F.col("__grp_n").cast("string"), F.lit(" rows — " + hint))
    return (df.withColumn("__grp_n", n)
              .where(F.assert_true(F.col("__grp_n") <= F.lit(max_size),
                                   msg).isNull())
              .drop("__grp_n"))


def ensure_min_partitions(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition when the input has (much) fewer partitions
    than the cluster has slots.

    At warehouse scale the scan naturally yields thousands of splits and
    this is a no-op; on small local files a single split would serialize
    every downstream map stage (signatures, per-pair set algebra) onto one
    core. The repartition shuffles only the small input, never derived
    pair tables.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
