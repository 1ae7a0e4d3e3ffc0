"""Tests for fitting operators and the stateful streaming retry
ledger."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.fits import (
    fit_histogram_gaussian,
    fit_polynomial_baseline,
    fit_powerlaw,
)

TMP = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_state_tmp")


def test_fit_powerlaw_recovers_index(spark):
    freqs = np.linspace(110, 190, 40)
    flux = 12.0 * (freqs / 150.0) ** -2.2
    df = spark.createDataFrame(
        [(float(f), float(s)) for f, s in zip(freqs / 150.0, flux)],
        "x double, y double",
    )
    row = fit_powerlaw(df, "x", "y").first()
    assert row["index"] == pytest.approx(-2.2, rel=1e-9)
    assert 10 ** row["log_amp"] == pytest.approx(12.0, rel=1e-9)
    assert row["r2"] == pytest.approx(1.0, abs=1e-9)
    assert row["n_used"] == 40


def test_fit_polynomial_baseline(spark):
    x = np.arange(200, dtype=float)
    y = 0.02 * x**2 - 1.5 * x + 7 + np.sin(x)  # poly + signal
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "bin double, value double"
    )
    out = fit_polynomial_baseline(df, degree=2)
    res = np.array([r["value"] for r in out.orderBy("bin").collect()])
    # residual should be ~ the sine (bounded by 1.2), not the 800-range poly
    assert np.abs(res).max() < 2.0
    assert np.abs(res).max() > 0.5


def test_fit_histogram_gaussian(spark):
    rng = np.random.RandomState(21)
    vals = rng.normal(5.0, 1.5, 20000)
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    row = fit_histogram_gaussian(df, bins=60).first()
    assert row["gauss_mean"] == pytest.approx(5.0, abs=0.05)
    assert row["gauss_sigma"] == pytest.approx(1.5, rel=0.05)
    assert row["n_total"] == 20000
    # on CLEAN Gaussian data the leastsq fit agrees with moments
    frow = fit_histogram_gaussian(df, bins=60, method="fit").first()
    assert frow["gauss_mean"] == pytest.approx(row["gauss_mean"], abs=0.05)
    assert frow["gauss_sigma"] == pytest.approx(row["gauss_sigma"], rel=0.05)


def test_fit_histogram_gaussian_contaminated_tail(spark):
    """Why the reference leastsq-fits instead of taking moments
    (subdyn.py:306-324, snr.py:536-542): an RFI tail drags the
    moments badly but barely moves the peak fit."""
    rng = np.random.RandomState(7)
    clean = rng.normal(0.0, 1.0, 20000)
    rfi = rng.uniform(8.0, 60.0, 1000)  # 5% contamination, far tail
    vals = np.concatenate([clean, rfi])
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")

    mom = fit_histogram_gaussian(df, bins=240).first()
    fit = fit_histogram_gaussian(df, bins=240, method="fit").first()
    # moments are dragged off by the tail...
    assert mom["gauss_mean"] > 0.5
    assert mom["gauss_sigma"] > 3.0
    # ...the fit recovers the underlying population
    assert fit["gauss_mean"] == pytest.approx(0.0, abs=0.1)
    assert fit["gauss_sigma"] == pytest.approx(1.0, rel=0.12)
    assert fit["gauss_amp"] > 0
    # grouped mode: two planted groups with different parameters
    g = spark.createDataFrame(
        [("a", float(v)) for v in rng.normal(2.0, 0.5, 8000)]
        + [("b", float(v)) for v in np.concatenate(
            [rng.normal(-3.0, 2.0, 8000), rng.uniform(20.0, 90.0, 400)]
        )],
        "grp string, value double",
    )
    rows = {
        r["grp"]: r
        for r in fit_histogram_gaussian(
            g, bins=240, group_cols=["grp"], method="fit"
        ).collect()
    }
    assert rows["a"]["gauss_mean"] == pytest.approx(2.0, abs=0.1)
    assert rows["a"]["gauss_sigma"] == pytest.approx(0.5, rel=0.15)
    assert rows["b"]["gauss_mean"] == pytest.approx(-3.0, abs=0.3)
    assert rows["b"]["gauss_sigma"] == pytest.approx(2.0, rel=0.15)


def test_retry_ledger_stateful(spark):
    from lofar_bf_pulsar_scripts_spark.streaming.retry_ledger import retry_ledger

    os.makedirs(TMP, exist_ok=True)
    try:
        src = os.path.join(TMP, "attempts")
        rows = [
            ("a.tar", False), ("a.tar", False), ("a.tar", True),
            ("b.tar", False), ("b.tar", False), ("b.tar", False),
            ("c.tar", True),
        ]
        spark.createDataFrame(rows, "filename string, ok boolean").write.mode(
            "overwrite"
        ).parquet(src)
        stream = spark.readStream.schema("filename string, ok boolean").parquet(src)
        q = (
            retry_ledger(stream, max_retries=3)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("ledger")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {r["filename"]: r for r in spark.table("ledger").collect()}
        assert got["a.tar"]["status"] == "done" and got["a.tar"]["attempts"] == 3
        assert got["b.tar"]["status"] == "dead_letter" and got["b.tar"]["failures"] == 3
        assert got["c.tar"]["status"] == "done" and got["c.tar"]["failures"] == 0
    finally:
        shutil.rmtree(TMP, ignore_errors=True)
