"""Property-based tests (SURVEY §5.4) with hypothesis: fold/rebin/
rotate/scrunch algebraic invariants."""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.fold import fold, rotate
from lofar_bf_pulsar_scripts_spark.operators.raster import rebin

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    shift=st.integers(min_value=-100, max_value=100),
    nbins=st.integers(min_value=2, max_value=64),
)
@_settings
def test_rotate_inverse_property(spark, shift, nbins):
    df = spark.createDataFrame(
        [(b, float(b * b % 17)) for b in range(nbins)], "bin int, profile double"
    )
    back = rotate(rotate(df, shift, nbins), -shift, nbins)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


@given(
    k=st.integers(min_value=2, max_value=5),
    m=st.integers(min_value=2, max_value=4),
)
@_settings
def test_rebin_composition_counts(spark, k, m):
    # rebin(k) then rebin(m) over blocks == rebin(k*m) for COUNTS
    # always, and for sums (mean*count) by associativity
    n = 240
    df = spark.createDataFrame(
        [(i, float((i * 7) % 13)) for i in range(n)],
        "sample_idx long, value double",
    )
    once = rebin(df, k * m)
    r1 = rebin(df, k).select(
        F.col("block").alias("sample_idx"),
        (F.col("value") * F.col("npts")).alias("sum1"),
        "npts",
    )
    twice = (
        r1.groupBy(F.floor(F.col("sample_idx") / m).cast("bigint").alias("block"))
        .agg(F.sum("sum1").alias("sum2"), F.sum("npts").alias("npts"))
    )
    a = {r["block"]: (r["value"] * r["npts"], r["npts"]) for r in once.collect()}
    b = {r["block"]: (r["sum2"], r["npts"]) for r in twice.collect()}
    assert set(a) == set(b)
    for blk in a:
        assert a[blk][1] == b[blk][1]
        assert a[blk][0] == pytest.approx(b[blk][0], rel=1e-12)


@given(periods=st.integers(min_value=1, max_value=9))
@_settings
def test_fold_total_mass_conserved(spark, periods):
    # sum(profile * npts) over bins == sum(value): folding never loses
    # or duplicates samples, for any period
    n = 500
    df = spark.createDataFrame(
        [((i * 0.0317), float(1 + (i % 5))) for i in range(n)],
        "t double, value double",
    )
    prof = fold(df, period=float(periods) * 0.77, nbins=16)
    total = prof.select(
        F.sum(F.col("profile") * F.col("npts")).alias("s"),
        F.sum("npts").alias("n"),
    ).first()
    assert total["n"] == n
    expected = sum(1 + (i % 5) for i in range(n))
    assert total["s"] == pytest.approx(expected, rel=1e-12)
