"""Bucketed-table layout for zero-shuffle co-located joins.

At 100 TB the uniqueness / referential / dedup-verify joins are the
dominant shuffles. Writing both sides bucketed (and sorted) by the join
key turns them into zero-Exchange sort-merge joins: each bucket pair
joins locally, no repartitioning of either table, ever (SURVEY §4 item
4; the Iceberg equivalent is a bucket partition transform).

``write_bucketed`` + ``bucketed_join_ready`` are the engine-level
primitives; tests assert the physical plan of a bucketed-bucketed join
carries NO Exchange operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int, sort: bool = True) -> None:
    """Materialize ``df`` as a bucketed (optionally sorted) table.

    Bucket count is a layout contract: both sides of a co-located join
    must use the SAME count. Pick it so a bucket of the larger table
    fits an executor's memory (e.g. 100 TB / 32k buckets ≈ 3 GB)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a stale managed-table location without a catalog entry (e.g. from a
    # previous session's warehouse dir) blocks creation — clear it
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[5:]
    if warehouse:
        shutil.rmtree(f"{warehouse.rstrip('/')}/{table.lower()}",
                      ignore_errors=True)
    w = (df.write.mode("overwrite")
           .bucketBy(n_buckets, keys[0], *keys[1:]))
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan repartitions anything — the property
    bucketed layouts exist to eliminate."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
