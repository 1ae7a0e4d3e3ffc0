"""End-to-end tests for the subdyn / pulse_info / dynsp script
pipelines (golden synthetic observations per FIXTURES.md F2/F3)."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.plans.dynsp import (
    dynamic_spectrum_from_cube,
    normalized_dynspec,
    scintillation_widths,
)
from lofar_bf_pulsar_scripts_spark.plans.pulse_info import (
    pulse_info_lines,
    pulse_search,
    spectral_islands,
)
from lofar_bf_pulsar_scripts_spark.plans.subdyn import (
    cleaned_spectrum,
    dynamic_spectrum,
    rfi_report,
)

TMP = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_subdyn_tmp")


def test_subdyn_pipeline_flags_corrupted_channel(spark):
    """F2 golden: noise + one fully corrupted channel (all samples 8
    sigma high -> excluded at the 10% rfilimit) + one channel with a
    short burst (clipped but kept)."""
    os.makedirs(TMP, exist_ok=True)
    try:
        rng = np.random.RandomState(31)
        n = 4000
        for chan in range(4):
            data = rng.normal(0, 100, n)
            if chan == 2:  # bursty channel: 2 blocks out of 40 hot
                data[0:200] += 5000.0
            data = np.clip(data, -32000, 32000).astype("<i2")
            if chan == 1:  # fully corrupted: constant huge offset rows
                data = (rng.normal(8000, 5, n)).astype("<i2")
            data.tofile(os.path.join(TMP, f"obs.sub{chan:04d}"))
        spec = dynamic_spectrum(spark, os.path.join(TMP, "obs.sub*"), nbins=100)
        assert spec.count() == 4 * 40
        # channel 1 is internally FLAT (tiny sigma) -> its own blocks
        # aren't outliers vs itself; the burst channel 2 is the one the
        # per-channel clip catches
        rep = rfi_report(spec, threshold=3.0, rfilimit=0.04)
        bad = {r["chan"] for r in rep.collect()}
        assert 2 in bad
        clean = cleaned_spectrum(spec, threshold=3.0, rfilimit=0.04)
        kept = {r["chan"] for r in clean.select("chan").distinct().collect()}
        assert 2 not in kept and 0 in kept and 3 in kept
    finally:
        shutil.rmtree(TMP, ignore_errors=True)


def test_pulse_info_pipeline(spark):
    rng = np.random.RandomState(33)
    prof = rng.normal(0, 1, 256)
    prof[100:106] += 9.0  # 6-bin pulse
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(prof)], "bin int, value double"
    )
    best = pulse_search(df)
    row = best.first()
    assert 4 <= row["best_width"] <= 9
    assert 97 <= row["best_start"] <= 103
    lines = pulse_info_lines(best).first()
    assert lines["info_line"].split()[0] == str(row["best_width"])

    spec = spark.createDataFrame(
        [(int(i), float(5.0 if 30 <= i < 34 else 0.1)) for i in range(64)],
        "chan int, value double",
    )
    isl = spectral_islands(spec, threshold=2.0).first()
    assert isl["start"] == 30 and isl["width"] == 4


def test_dynsp_pipeline(spark):
    """F3-style cube: per-(subint, chan) gaussian noise with a smooth
    scintle pattern; pipeline should normalize to ~N(0,1) and the ACF
    should detect the scintle correlation scale."""
    rng = np.random.RandomState(35)
    nsub, nchan, nbin = 24, 16, 32
    rows = []
    # scintle pattern: slow sinusoid in both axes
    for s in range(nsub):
        for c in range(nchan):
            gain = 2.0 + np.sin(s / 4.0) + np.cos(c / 3.0)
            for b in range(nbin):
                v = rng.normal(0, 1) + gain * (3.0 if 8 <= b < 12 else 0.0)
                w = 0.0 if (s == 3 and c == 5) else 1.0
                rows.append((s, c, b, float(v), float(w)))
    cube = spark.createDataFrame(
        rows, "subint int, chan int, bin int, value double, weight double"
    )
    weights = cube.select("subint", "chan", "weight").dropDuplicates(
        ["subint", "chan"]
    )
    ds = dynamic_spectrum_from_cube(
        cube.select("subint", "chan", "bin", "value"), weights, on_bins=(8, 12)
    )
    assert ds.count() == nsub * nchan
    normed = normalized_dynspec(ds)
    stats = normed.agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("s")
    ).first()
    assert abs(stats["m"]) < 0.5
    acf, t_hp, f_hp = scintillation_widths(
        normed.select("subint", "chan", "value"),
        time_lags=list(range(0, 16)),
        freq_lags=list(range(0, 13)),
    )
    zero = acf.filter("dt = 0 AND df_ = 0").first()
    assert zero["acf_norm"] == pytest.approx(1.0, rel=1e-9)
    # the sinusoidal scintle has a finite correlation scale in both axes
    t_row, f_row = t_hp.first(), f_hp.first()
    assert t_row["half_power_lag"] is not None
    assert f_row["half_power_lag"] is not None


def test_flatten_bandpass_script(spark):
    # lba-flatten-bandpass.py: per-(subint,chan) QQ normalization with
    # zero-weight channels zeroed; normalized profiles have ~0 mean
    # and ~unit rms measured on the off-pulse.
    import numpy as np

    from lofar_bf_pulsar_scripts_spark.plans.fluxcal import flatten_bandpass

    rng = np.random.RandomState(8)
    rows = []
    nbin = 256
    for s in range(2):
        for c in range(3):
            base = 10.0 * (c + 1)
            w = 0.0 if c == 1 else 1.0
            prof = rng.normal(base, 2.0 * (c + 1), nbin)
            prof[100:110] += 50.0  # pulse
            for b in range(nbin):
                rows.append((s, c, b, float(prof[b]), w))
    cube = spark.createDataFrame(
        rows, "subint int, chan int, bin int, value double, weight double"
    )
    out = flatten_bandpass(cube)
    got = out.groupBy("subint", "chan").agg(
        F.avg(F.when((F.col("bin") < 100) | (F.col("bin") >= 110), F.col("value"))).alias("m"),
        F.stddev_samp(F.when((F.col("bin") < 100) | (F.col("bin") >= 110), F.col("value"))).alias("s"),
        F.sum(F.abs(F.col("value"))).alias("tot"),
    ).collect()
    for r in got:
        if r["chan"] == 1:
            assert r["tot"] == 0.0  # zero-weight channel zeroed
        else:
            assert abs(r["m"]) < 0.15, (r["subint"], r["chan"])
            assert abs(r["s"] - 1.0) < 0.2, (r["subint"], r["chan"])
