"""Profile statistics vs numpy reference (snr.py:305-320 formulas),
boxcar bank, and island extraction."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.profile import (
    best_boxcar,
    boxcar_bank,
    islands,
    off_window_stats,
    profile_stats,
)


@pytest.fixture(scope="module")
def prof_df(spark):
    rng = np.random.RandomState(42)
    vals = rng.normal(0, 1, 128)
    vals[30:35] += 12.0
    rows = [(int(i), float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "bin int, profile double"), vals


def test_profile_stats_formulas(spark, prof_df):
    df, vals = prof_df
    row = profile_stats(df, on_threshold=2.5).first()
    assert row["nbins"] == 128
    assert row["peak"] == pytest.approx(vals.max())
    assert row["mean"] == pytest.approx(vals.mean())
    weq = vals.sum() / vals.max()
    assert row["weq"] == pytest.approx(weq)
    assert row["profsign"] == pytest.approx(vals.sum() / math.sqrt(abs(weq)))
    assert row["chi2"] == pytest.approx((vals**2).sum() / 127)
    assert row["n_on"] == int((vals > 2.5).sum())


def test_off_window_stats(spark, prof_df):
    df, vals = prof_df
    row = off_window_stats(df, 50, 120, 128).first()
    seg = vals[50:120]
    assert row["off_mean"] == pytest.approx(seg.mean())
    assert row["off_rms"] == pytest.approx(seg.std(ddof=1))
    # wrapping window [120, 138) -> [120,128) U [0,10)
    row = off_window_stats(df, 120, 138, 128).first()
    seg = np.concatenate([vals[120:], vals[:10]])
    assert row["off_n"] == 18
    assert row["off_mean"] == pytest.approx(seg.mean())


def test_boxcar_bank_matches_numpy(spark, prof_df):
    df, vals = prof_df
    got = {r["width"]: (r["best_sum"], r["best_start"]) for r in boxcar_bank(df).collect()}
    for w in [2, 3, 4, 6, 9, 14, 20]:
        sums = np.convolve(vals, np.ones(w), mode="valid")
        assert got[w][0] == pytest.approx(sums.max())
        assert got[w][1] == int(sums.argmax())
    best = best_boxcar(df).first()
    snrs = {w: np.convolve(vals, np.ones(w), "valid").max() / math.sqrt(w)
            for w in [2, 3, 4, 6, 9, 14, 20]}
    assert best["best_width"] == max(snrs, key=snrs.get)


def test_islands(spark):
    vals = [0.0] * 40
    for i in range(5, 9):
        vals[i] = 5.0  # island width 4 @5
    vals[20] = 7.0  # island width 1 @20
    for i in range(30, 33):
        vals[i] = 3.0  # island width 3 @30
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "chan int, value double"
    )
    got = {r["start"]: (r["width"], r["peak"]) for r in islands(df, 2.5).collect()}
    assert got == {5: (4, 5.0), 20: (1, 7.0), 30: (3, 3.0)}


def test_cross_method_mean_rms_agreement(spark):
    # the reference's own validation strategy (snr.py:379-440 prints
    # QQ / Off-window / Polynom estimates side by side for human
    # comparison): on a synthetic profile with a known Gaussian
    # off-pulse baseline, all three independent estimators must agree
    # with the truth within sampling noise.
    import numpy as np

    from lofar_bf_pulsar_scripts_spark.operators.fits import (
        fit_polynomial_baseline,
    )
    from lofar_bf_pulsar_scripts_spark.operators.profile import off_window_stats
    from lofar_bf_pulsar_scripts_spark.operators.qqnorm import qq_stats_sql

    rng = np.random.RandomState(42)
    nbins = 1024
    true_mean, true_rms = 12.0, 1.5
    prof = rng.normal(true_mean, true_rms, nbins)
    prof[480:520] += 40.0  # the pulse sits in [480, 520)
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(prof)], "bin int, profile double"
    )

    # method 1: off-window moments over the pulse-free half
    off = off_window_stats(df, 600, 1024, nbins).first()
    # method 2: QQ regression over the central quantiles (pulse bins
    # are upper-tail outliers the [-1, 1] osm range excludes)
    qq = (
        qq_stats_sql(df.withColumn("g", F.lit(1)), ["g"], value_col="profile")
        .first()
    )
    # method 3: residual rms after a degree-0 polynomial baseline over
    # the off region (snr.py's Polynom method)
    resid = fit_polynomial_baseline(
        df.filter((F.col("bin") < 480) | (F.col("bin") >= 520)),
        degree=0,
        x_col="bin",
        y_col="profile",
    )
    poly = resid.agg(
        F.avg("baseline").alias("m"), F.stddev_samp("profile").alias("s")
    ).first()

    sem = true_rms / np.sqrt(400)  # loose sampling tolerance
    for m, s in [(off["off_mean"], off["off_rms"]),
                 (qq["qq_mean"], qq["qq_rms"]),
                 (poly["m"], poly["s"])]:
        assert abs(m - true_mean) < 8 * sem, (m, true_mean)
        assert abs(s - true_rms) < 0.25, (s, true_rms)
