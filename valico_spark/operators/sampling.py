"""Deterministic (hash-based) sampling for training-data pipelines.

``df.sample()`` is seed-dependent on partitioning and Spark version —
useless when a 100 TB pipeline must reproduce a sample across reruns,
engines, and audits. Hash-based sampling keys the keep/drop decision on
the ROW (a key column), not on RNG state: the same row is always in or
out, any engine computes the same sample, and joining two tables
sampled on the same key keeps referential integrity.

The hash is a Lehmer LCG step on the key modulo the Mersenne prime
2^31-1 — pure integer arithmetic (no overflow for any int64 key), so a
SQL oracle reproduces it exactly; cryptographic quality is not needed
for rate control, uniformity is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M31 = 2147483647   # 2^31 - 1
_LEHMER = 48271     # MINSTD multiplier


def sample_hash(key: Column) -> Column:
    """Uniform-ish value in [0, 2^31-1) derived deterministically from
    an integer key.

    TWO Lehmer steps, not one: a single ``k*48271 mod M31`` does not
    wrap for k < 44486, so small sequential ids map monotonically and a
    threshold test selects a contiguous prefix instead of a sample (the
    effective two-step multiplier 48271² mod M31 wraps every ~12 ids).
    Each intermediate stays below 2^47 — no int64 overflow for any key.
    """
    h = F.pmod(F.pmod(key.cast("long"), F.lit(_M31)) * F.lit(_LEHMER),
               F.lit(_M31))
    return F.pmod(h * F.lit(_LEHMER), F.lit(_M31))


def deterministic_sample(df: DataFrame, key_col: str,
                         fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by key hash —
    reproducible across runs, partitionings, and engines."""
    return df.where(sample_hash(F.col(key_col))
                    < F.lit(int(fraction * _M31)))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample dominant
    languages, keep the long tail whole). Strata not listed get
    ``default_fraction``."""
    thr: Column = F.lit(int(default_fraction * _M31))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == F.lit(value),
                     F.lit(int(frac * _M31))).otherwise(thr)
    return df.where(sample_hash(F.col(key_col)) < thr)
