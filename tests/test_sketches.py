"""t-digest quantile sketch (operators/sketches.py).

Accuracy is asserted in RANK space (the t-digest's actual guarantee):
for estimate x of quantile q, the true data rank of x must be within
eps of q. Ties make "the rank of x" an interval [P(v<x), P(v<=x)] —
any q inside it is exact, so the tie-aware error is the distance from
q to that interval (0 when inside).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from valico_spark.operators.sketches import (TDigest, tdigest_of,
                                             tdigest_quantiles)

QS = [0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999]


def _rank_err(data: np.ndarray, est: float, q: float) -> float:
    lo, hi = float((data < est).mean()), float((data <= est).mean())
    return 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))


@pytest.mark.parametrize("dist", ["lognormal", "normal", "fewdistinct"])
def test_digest_accuracy(dist):
    rng = np.random.default_rng(7)
    data = {"lognormal": rng.lognormal(0, 2, 100_000),
            "normal": rng.normal(0, 1, 100_000),
            "fewdistinct": rng.integers(0, 5, 100_000).astype(float)
            }[dist]
    d = TDigest.of(data, delta=200)
    assert d.n == len(data)
    for q in QS:
        assert _rank_err(data, d.quantile(q), q) <= 0.005, (dist, q)
    # the whole point of the k1 scale function: tails are SHARP
    for q in (0.001, 0.999):
        assert _rank_err(data, d.quantile(q), q) <= 0.001, (dist, q)


def test_merge_matches_whole():
    rng = np.random.default_rng(11)
    data = rng.lognormal(0, 1, 60_000)
    merged = TDigest.of(data[:20_000], 200)
    merged.merge(TDigest.of(data[20_000:40_000], 200))
    merged.merge(TDigest.of(data[40_000:], 200))
    assert merged.n == len(data)
    for q in QS:
        assert _rank_err(data, merged.quantile(q), q) <= 0.005, q


def test_digest_edges():
    assert math.isnan(TDigest(200).quantile(0.5))
    single = TDigest.of(np.array([42.0]), 200)
    assert single.quantile(0.0) == single.quantile(1.0) == 42.0
    two = TDigest.of(np.array([0.0, 10.0]), 200)
    assert two.quantile(0.0) == 0.0 and two.quantile(1.0) == 10.0
    assert 0.0 < two.quantile(0.5) < 10.0
    nan_in = TDigest.of(np.array([1.0, np.nan, 3.0]), 200)
    assert nan_in.n == 2
    with pytest.raises(ValueError):
        TDigest(10)
    with pytest.raises(ValueError):
        TDigest.of(np.array([1.0]), 200).quantile(1.5)
    # centroid count stays O(delta) no matter the input size
    big = TDigest.of(np.random.default_rng(3).normal(0, 1, 200_000), 100)
    assert len(big.means) < 200


def test_spark_tdigest_matches_exact(spark):
    df = spark.range(100_000).select(
        F.exp(F.randn(seed=7)).alias("v"))
    data = df.toPandas()["v"].to_numpy()
    # two different physical layouts must both satisfy the rank bound
    for parts in (2, 16):
        d = tdigest_of(df.repartition(parts), "v", delta=200)
        assert d.n == len(data)
        for q in QS:
            assert _rank_err(data, d.quantile(q), q) <= 0.005, (parts, q)


def test_spark_tdigest_nulls_and_empty(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,), (None,)],
                               "v double")
    d = tdigest_of(df, "v")
    assert d.n == 2 and d.quantile(0.5) == 2.0
    empty = spark.createDataFrame([], "v double")
    assert math.isnan(tdigest_quantiles(empty, "v", [0.5])[0])


def test_spark_tdigest_int_column(spark):
    df = spark.range(10_000).select((F.col("id") % 100).alias("v"))
    d = tdigest_of(df, "v", delta=100)
    data = np.arange(10_000) % 100
    for q in (0.1, 0.5, 0.9):
        assert _rank_err(data, d.quantile(q), q) <= 0.02, q
