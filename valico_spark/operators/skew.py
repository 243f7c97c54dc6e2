"""Skew handling: salted repartitioning + two-stage salted aggregation.

Hot ``doc_id`` prefixes and oversized span arrays (the generator seeds
both; north_rule names both) concentrate work in single shuffle
partitions. Two mitigations compose with AQE's skew-join splitting:

* ``salted_repartition`` — spread rows of the same hot key across
  ``n_salts`` partitions for map-heavy stages (validation is key-agnostic
  so correctness is unaffected);
* ``salted_count`` — two-stage aggregation: partial count per
  (key, salt) then final sum per key. The first shuffle carries at most
  ``n_salts`` rows per hot key; associative aggregates lose nothing.
* ``length_capped_split`` — split documents with oversized span arrays
  into bounded chunks before per-span work, so one mega-document cannot
  straggle a task (chunk results re-aggregate by doc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key: str, n_salts: int = 16,
                       num_partitions: int | None = None) -> DataFrame:
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                  F.lit(n_salts))
    out = df.withColumn("__salt", salt)
    if num_partitions:
        out = out.repartition(num_partitions, F.col(key), F.col("__salt"))
    else:
        out = out.repartition(F.col(key), F.col("__salt"))
    return out.drop("__salt")


def salted_count(df: DataFrame, keys: list[str],
                 n_salts: int = 16) -> DataFrame:
    """groupBy(keys).count() with a salted pre-aggregation.

    Functionally identical to the plain count (Spark's partial
    aggregation usually suffices; the explicit salt guards degenerate
    cases where map-side combine is disabled or the key set per mapper is
    too large to combine)."""
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys],
                             F.monotonically_increasing_id()),
                  F.lit(n_salts))
    partial = (df.withColumn("__salt", salt)
                 .groupBy(*keys, "__salt")
                 .agg(F.count(F.lit(1)).alias("__partial")))
    return (partial.groupBy(*keys)
                   .agg(F.sum("__partial").alias("count")))


def length_capped_split(df: DataFrame, array_col: str,
                        max_len: int = 64) -> DataFrame:
    """Split rows whose array exceeds ``max_len`` into multiple rows of
    bounded chunks; adds ``__chunk`` (0-based). Per-span map work then has
    bounded per-row cost; re-aggregate chunk results on the original key +
    flatten, or treat chunks independently for pure per-span checks."""
    n_chunks = F.ceil(F.size(F.col(array_col)) / F.lit(max_len)).cast("int")
    chunk_ids = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    exploded = df.withColumn("__chunk", F.explode(chunk_ids))
    sliced = exploded.withColumn(
        array_col,
        F.slice(F.col(array_col), F.col("__chunk") * max_len + 1, max_len))
    return sliced


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join resilient to hot keys: the LEFT (large, skewed) side
    gets a random salt per row; the RIGHT side is replicated across all
    ``n_salts`` salt values, so one hot key's rows spread over
    ``n_salts`` shuffle partitions instead of one straggler.

    Complements AQE's skew-join (which splits oversized partitions at
    runtime): explicit salting also covers aggregations-after-join and
    engines/stages where AQE cannot re-plan. The right side must be the
    smaller relation — its shuffle volume multiplies by ``n_salts``.
    Join-key NULLs behave as in a plain equi-join (never match).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                  F.lit(n_salts)).cast("int")
    l = left.withColumn("__salt", salt)
    r = (right.withColumn(
            "__salts",
            F.sequence(F.lit(0), F.lit(n_salts - 1)))
          .withColumn("__salt", F.explode(F.col("__salts")))
          .drop("__salts"))
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
