"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
