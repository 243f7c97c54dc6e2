"""Event sessionization (batch + streaming-compatible).

The reference has no notion of sessions; this is part of the
training-data-pipeline surface: gap-based sessions are the standard
unit for per-user event rollups before feature extraction.

Spark-first shape: ``F.session_window`` is a native groupBy key — the
gap-merge happens inside one hash-aggregate per key partition (no
window-function sort over the whole table, no Python). The same
expression works under Structured Streaming with a watermark, where the
state store holds open sessions (bounded by the gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(df: DataFrame, ts_col: str = "ts",
               key_cols: tuple[str, ...] = ("user_id",),
               gap: str = "30 minutes",
               agg_value_col: str | None = None) -> DataFrame:
    """Gap-based sessions per key: events belong to one session while
    each is within ``gap`` of the previous (equivalently: a new session
    starts when ts - prev_ts > gap).

    Returns one row per (key, session) with
    ``session_start``/``session_last`` (min/max event time — NOT the
    session_window end, which pads the gap), ``n_events``, and
    ``max_value`` when ``agg_value_col`` is given. Order-independent
    aggregates only, so results are bit-stable at any parallelism.
    """
    aggs = [F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_last"),
            F.count(F.lit(1)).alias("n_events")]
    if agg_value_col:
        aggs.append(F.max(agg_value_col).alias("max_value"))
    return (df.groupBy(*key_cols, F.session_window(ts_col, gap))
              .agg(*aggs)
              .drop("session_window"))
