"""Tests for polyco time-varying fold (S11), autocorrelation (W7),
bilinear interpolation (J8)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.acf import acf_1d, acf_2d, half_power_width
from lofar_bf_pulsar_scripts_spark.operators.fold import fold
from lofar_bf_pulsar_scripts_spark.operators.interp import bilinear_interp
from lofar_bf_pulsar_scripts_spark.operators.polyco import (
    POLYCO_SEGMENT_SCHEMA,
    attach_polyco,
    polyco_fold,
)


def _series(spark, n=5000, tsamp=0.0100317):  # incommensurate with bin
    # edges: polyco's (t/60)*60/P and fold's t/P differ by 1 ulp, so a
    # sample exactly on a bin edge would flip bins between the two paths
    return spark.createDataFrame(
        [(i * tsamp, 1.0 + (i % 7)) for i in range(n)], "t double, value double"
    )


def test_polyco_constant_f0_equals_fixed_fold(spark):
    # one segment, zero drift coeffs, rphase 0 -> identical to fold(P)
    P = 1.25
    segs = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0 / P, [0.0], 1e6)], POLYCO_SEGMENT_SCHEMA
    )
    df = _series(spark)
    a = {r["bin"]: (r["profile"], r["npts"]) for r in polyco_fold(df, segs, 50).collect()}
    b = {r["bin"]: (r["profile"], r["npts"]) for r in fold(df, P, 50).collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][1] == b[k][1]
        assert a[k][0] == pytest.approx(b[k][0], rel=1e-12)


def test_polyco_freq_derivative(spark):
    # phase poly c2*dt means freq = f0 + c2/60
    segs = spark.createDataFrame(
        [(0, 0.0, 0.0, 2.0, [0.0, 0.6], 1e6)], POLYCO_SEGMENT_SCHEMA
    )
    df = spark.createDataFrame([(120.0, 1.0)], "t double, value double")
    row = attach_polyco(df, segs).first()
    assert row["freq_hz"] == pytest.approx(2.0 + 0.6 / 60.0, rel=1e-12)
    # phase at dt=2min: 2*60*2.0 + 0.6*2 = 241.2
    assert row["phase"] == pytest.approx(241.2, rel=1e-12)


def test_polyco_segment_selection(spark):
    segs = spark.createDataFrame(
        [
            (0, 0.0, 0.0, 1.0, [0.0], 100.0),
            (1, 1000.0, 0.5, 1.0, [0.0], 100.0),
        ],
        POLYCO_SEGMENT_SCHEMA,
    )
    df = spark.createDataFrame([(10.0, 1.0), (990.0, 1.0)], "t double, value double")
    rows = {r["t"]: r["seg_id"] for r in attach_polyco(df, segs).collect()}
    assert rows[10.0] == 0 and rows[990.0] == 1


def test_acf_1d_matches_numpy(spark):
    rng = np.random.RandomState(13)
    x = rng.normal(0, 1, 300) + np.sin(np.arange(300) / 5.0) * 3
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(x)], "bin int, profile double"
    )
    lags = [1, 2, 5, 10]
    got = {r["lag"]: (r["acf"], r["npairs"]) for r in acf_1d(df, lags).collect()}
    for lag in lags:
        expected = float(np.sum(x[:-lag] * x[lag:]))
        assert got[lag][0] == pytest.approx(expected, rel=1e-9)
        assert got[lag][1] == 300 - lag
    hp = half_power_width(acf_1d(df, list(range(1, 20)))).first()
    # sin period 2*pi*5 ~ 31; half-power of its ACF ~ period/4 ~ 8
    assert 3 <= hp["half_power_lag"] <= 12


def test_acf_2d_matches_numpy(spark):
    rng = np.random.RandomState(17)
    m = rng.normal(0, 1, (12, 10))
    rows = [
        (int(t), int(f), float(m[t, f]))
        for t in range(12)
        for f in range(10)
    ]
    df = spark.createDataFrame(rows, "time_bin int, chan int, value double")
    got = {
        (r["dt"], r["df_"]): (r["acf"], r["npairs"])
        for r in acf_2d(df, [0, 1, 2], [0, 1]).collect()
    }
    for dt in (0, 1, 2):
        for dfl in (0, 1):
            a = m[: 12 - dt if dt else 12, : 10 - dfl if dfl else 10]
            b = m[dt:, dfl:]
            expected = float(np.sum(a * b))
            assert got[(dt, dfl)][0] == pytest.approx(expected, rel=1e-9), (dt, dfl)
            assert got[(dt, dfl)][1] == (12 - dt) * (10 - dfl)


def test_bilinear_interp_matches_numpy(spark):
    # separable grid v = 3*gx + 7*gy -> bilinear interp is exact
    grid = spark.createDataFrame(
        [(x, y, float(3 * x + 7 * y)) for x in range(10) for y in range(10)],
        "gx int, gy int, gval double",
    )
    pts = spark.createDataFrame(
        [(0, 2.5, 3.25), (1, 0.0, 0.0), (2, 8.9, 8.9), (3, 20.0, -5.0)],
        "pid int, x double, y double",
    )
    got = {r["pid"]: r["interp"] for r in bilinear_interp(pts, grid).collect()}
    assert got[0] == pytest.approx(3 * 2.5 + 7 * 3.25, rel=1e-12)
    assert got[1] == pytest.approx(0.0, abs=1e-12)
    assert got[2] == pytest.approx(3 * 8.9 + 7 * 8.9, rel=1e-12)
    assert got[3] == pytest.approx(3 * 9 + 7 * 0, rel=1e-12)  # clamped


def test_polyco_long_ephemeris_broadcast_join(spark):
    # 500 segments (a multi-week observation at one segment/hour) must
    # NOT inline a 500-element literal array: the plan switches to a
    # broadcast bucket join with a constant-size expression tree.
    import numpy as np

    tmids = [3600.0 * i for i in range(500)]
    segs = spark.createDataFrame(
        [(i, tm, 0.1 * i, 1.0 + 1e-4 * i, [0.0], 3600.0) for i, tm in enumerate(tmids)],
        POLYCO_SEGMENT_SCHEMA,
    )
    # samples inside, on the edges of, and far outside the ephemeris
    ts = [0.0, 1799.9, 1800.1, 45_000.3, 499 * 3600.0 - 1.0, 499 * 3600.0 + 9e5]
    df = spark.createDataFrame([(t, 1.0) for t in ts], "t double, value double")
    out = attach_polyco(df, segs)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    got = {r["t"]: r["seg_id"] for r in out.collect()}
    arr = np.array(tmids)
    for t in ts:
        d = np.abs(t - arr)
        assert got[t] == int(np.flatnonzero(d == d.min())[0]), t


def test_polyco_long_and_literal_paths_agree(spark):
    # the two strategies must produce identical segment assignment and
    # phases on the same ephemeris
    from lofar_bf_pulsar_scripts_spark.operators import polyco as P

    segs_rows = [
        (i, 600.0 * i + 0.5 * (i % 3), 0.01 * i, 2.0 + 1e-3 * i, [0.1, -0.02 * i], 600.0)
        for i in range(40)
    ]
    segs = spark.createDataFrame(segs_rows, POLYCO_SEGMENT_SCHEMA)
    df = spark.createDataFrame(
        [(7.3 * i, float(i % 11)) for i in range(900)], "t double, value double"
    )
    joined = attach_polyco(df, segs).orderBy("t").collect()  # 40 > limit
    old_limit = P.LITERAL_SEGMENT_LIMIT
    P.LITERAL_SEGMENT_LIMIT = 1000
    try:
        literal = attach_polyco(df, segs).orderBy("t").collect()
    finally:
        P.LITERAL_SEGMENT_LIMIT = old_limit
    assert len(joined) == len(literal) == 900
    for a, b in zip(joined, literal):
        assert a["seg_id"] == b["seg_id"], a["t"]
        assert a["phase"] == pytest.approx(b["phase"], rel=1e-12)
        assert a["freq_hz"] == pytest.approx(b["freq_hz"], rel=1e-12)
