"""Streaming distribution-drift monitoring.

Chi-square drift per event-time window against a static reference
distribution. The split mirrors what scales on an unbounded feed:

* the ONLY stateful streaming operator is the per-(window, category)
  count — watermark-bounded state, map-side combined, shuffle size =
  (#windows in flight) x (category cardinality);
* the statistic itself is a stateless view over that tiny counts
  relation (B categories per window), applied by the consumer — in
  ``foreachBatch``, a downstream job, or the parity test — so no
  chained stateful aggregation is needed and the counts stream stays
  replayable/auditable on its own.

Semantics are pinned 1:1 against the batch operator
``valico_spark.operators.drift.chi_square`` (Haldane 0.5
pseudo-expected for categories absent from the reference; expected
scaled to each window's observed total) by
tests/test_audit_streaming_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_shares(reference: DataFrame, value_col: str) -> DataFrame:
    """Category shares of the (static, small) reference distribution —
    compute once, reuse for every window."""
    counts = reference.groupBy(F.col(value_col).alias("cat")) \
                      .agg(F.count(F.lit(1)).alias("e_raw"))
    total = counts.agg(F.sum("e_raw")).collect()[0][0] or 1
    return counts.select(
        "cat", (F.col("e_raw") / F.lit(float(total))).alias("e_share"))


def windowed_category_counts(stream_df: DataFrame, time_col: str,
                             value_col: str, window: str = "1 minute",
                             watermark: str = "5 minutes") -> DataFrame:
    """Watermarked per-(event-time window, category) counts — the
    stateful half of streaming drift. Works identically on a batch
    DataFrame (window assignment is the same expression)."""
    from pyspark.sql import types as T

    # watermarks require TIMESTAMP; parquet tables often carry
    # TIMESTAMP_NTZ (the driver's events table does) — cast in place,
    # window boundaries are unchanged
    field = stream_df.schema[time_col].dataType
    if isinstance(field, T.TimestampNTZType):
        stream_df = stream_df.withColumn(
            time_col, F.col(time_col).cast("timestamp"))
    return (stream_df
            .withWatermark(time_col, watermark)
            .groupBy(F.window(time_col, window).alias("w"),
                     F.col(value_col).alias("cat"))
            .agg(F.count(F.lit(1)).alias("o"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "cat", "o"))


def chi_square_contributions(counts: DataFrame,
                             shares: DataFrame) -> DataFrame:
    """Per-(window, category) chi-square terms from the counts relation:
    observed ``o``, expected ``e`` = share * window_total (Haldane 0.5
    for categories missing from the reference), and the Pearson term
    ``(o-e)^2/e``. Reference categories absent from a window appear
    with ``o = 0`` and their full expected mass.

    Exposed separately from :func:`chi_square_by_window` because the
    per-category terms are each a single float expression (portable
    bit-for-bit across engines), whereas the summed statistic depends
    on float accumulation order — so exact cross-engine oracles check
    this relation and consumers sum it.
    """
    # renamed projections avoid self-join attribute conflicts (wins,
    # totals, and the grid all derive from the same counts relation)
    wins = (counts.select(F.col("window_start").alias("ws"),
                          F.col("window_end").alias("we"))
                  .distinct())
    totals = (counts.groupBy(F.col("window_start").alias("tws"),
                             F.col("window_end").alias("twe"))
                    .agg(F.sum("o").alias("n_obs")))
    # full category grid per window: every reference category appears in
    # every window (zero observed allowed), plus observed-only cats
    ref_grid = wins.crossJoin(
        shares.select(F.col("cat").alias("rcat"), "e_share"))
    grid = (ref_grid.join(
                counts,
                (F.col("ws") == F.col("window_start"))
                & (F.col("we") == F.col("window_end"))
                & (F.col("rcat") == F.col("cat")), "full_outer")
            .select(F.coalesce("ws", "window_start").alias("w_start"),
                    F.coalesce("we", "window_end").alias("w_end"),
                    F.coalesce("rcat", "cat").alias("g_cat"),
                    F.coalesce("o", F.lit(0)).alias("o"), "e_share"))
    grid = grid.join(totals, (F.col("w_start") == F.col("tws"))
                     & (F.col("w_end") == F.col("twe")))
    e = F.when(F.col("e_share").isNotNull(),
               F.col("e_share") * F.col("n_obs")).otherwise(F.lit(0.5))
    return (grid.withColumn("e", e)
                .select(F.col("w_start").alias("window_start"),
                        F.col("w_end").alias("window_end"),
                        F.col("g_cat").alias("cat"),
                        F.col("o").cast("long").alias("o"),
                        F.col("e"),
                        ((F.col("o") - F.col("e")) ** 2 / F.col("e"))
                        .alias("contrib")))


def chi_square_by_window(counts: DataFrame,
                         shares: DataFrame) -> DataFrame:
    """Stateless finisher: Pearson chi-square per window from the counts
    relation, matching ``drift.chi_square`` exactly — expected =
    share * window_total, Haldane 0.5 for categories missing from the
    reference, reference categories absent from a window contribute
    their full expected mass.
    """
    terms = chi_square_contributions(counts, shares)
    return (terms.groupBy("window_start", "window_end")
                 .agg(F.sum("contrib").alias("statistic"),
                      (F.count(F.lit(1)) - 1).cast("long").alias("df"),
                      F.sum("o").cast("long").alias("n_obs")))
