"""Structured Streaming validation.

The compiled violations Column is a pure row-local expression, so the
exact same plan runs on a streaming DataFrame — ``readStream`` →
``with_validation`` → ``writeStream`` — with watermark-windowed violation
aggregation for late data. This is the streaming lift of the reference's
one-document-at-a-time walker.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from valico_spark.compiler.columns import compile_ruleset
from valico_spark.compiler.pyvalidator import DRAFT7


def with_validation(stream_df: DataFrame, ruleset: Any,
                    version: int = DRAFT7) -> DataFrame:
    """Append violations + valid to a streaming (or batch) DataFrame."""
    viol = compile_ruleset(ruleset, stream_df.schema, version=version)
    return (stream_df
            .withColumn("violations", viol)
            .withColumn("valid", F.size("violations") == 0))


def windowed_violation_counts(validated: DataFrame, time_col: str,
                              window: str = "1 minute",
                              watermark: str = "5 minutes") -> DataFrame:
    """Per-window, per-code violation counts with a watermark for late
    data — the streaming audit metric stream."""
    return (validated
            .withWatermark(time_col, watermark)
            .select(F.col(time_col),
                    F.explode_outer("violations").alias("v"))
            .groupBy(F.window(time_col, window).alias("w"),
                     F.col("v.code").alias("code"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "code", "n"))


def dedup_stream(stream_df: DataFrame, keys: list[str], time_col: str,
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key within the
    watermark horizon. ``dropDuplicatesWithinWatermark`` bounds the state
    store (keys older than the watermark are evicted), which is what
    makes this viable on an unbounded 100 TB/day feed — an unbounded
    ``dropDuplicates`` would grow state forever."""
    return (stream_df
            .withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def stream_docs_validation(spark, docs_dir: str, ruleset: Any,
                           checkpoint_dir: str, out_table: str):
    """File-source streaming pipeline: watch ``docs_dir`` for parquet,
    validate each micro-batch, maintain verdict counts in the ``out_table``
    in-memory sink. Returns the StreamingQuery."""
    static = spark.read.parquet(docs_dir)
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", "4")
              .parquet(docs_dir))
    validated = with_validation(stream, ruleset)
    counts = (validated
              .groupBy("valid")
              .agg(F.count(F.lit(1)).alias("n")))
    return (counts.writeStream
            .outputMode("complete")
            .format("memory")
            .queryName(out_table)
            .option("checkpointLocation", checkpoint_dir)
            .start())
