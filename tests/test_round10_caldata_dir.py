"""The caldata-dir knob (VERDICT r9 item 3): one env var —
$SPARK_GRAFT_CALDATA_DIR — routes every Jones/Aeff consumer onto REAL
calibration files on disk, and the file path must match the in-memory
packaged path BIT-IDENTICALLY when the files carry the same values
(the r9 loaders proved parse round-trips; this proves the plans
actually consume them end-to-end with zero code changes)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.caldata import (
    CALDATA_DIR_ENV,
    ensure_wijnholds_cube,
    hamaker_jones_from_radec,
    load_wijnholds_aeff,
    resolve_hamaker_coeffs,
    resolve_wijnholds_aeff,
    synthetic_hamaker_coeffs,
    write_hamaker_coeff_cc,
)


def _jones_rows(spark):
    pts = spark.createDataFrame(
        [(i, 10.0 + 7.0 * i, 120.0 + 3.0 * i, float(i), 130.0 + i)
         for i in range(6)],
        "id long, ra_deg double, dec_deg double, lst_h double, "
        "freq_mhz double",
    )
    out = hamaker_jones_from_radec(
        pts, F.col("ra_deg"), F.col("dec_deg"), F.col("lst_h"),
        F.col("freq_mhz"),
    )
    return {
        r["id"]: tuple(r[c] for c in ("j00_re", "j00_im", "j01_re",
                                      "j01_im", "j10_re", "j10_im",
                                      "j11_re", "j11_im"))
        for r in out.collect()
    }


def test_caldata_dir_hamaker_end_to_end(spark, tmp_path, monkeypatch):
    """hamaker_jones_from_radec with NO coeffs argument resolves the
    DefaultCoeff*.cc file from the caldata dir: a file carrying the
    synthetic coefficients reproduces the packaged path bit-
    identically, and a perturbed file changes the result (proof the
    file is actually read, not silently ignored)."""
    monkeypatch.delenv(CALDATA_DIR_ENV, raising=False)
    baseline = _jones_rows(spark)

    d = tmp_path / "caldata"
    d.mkdir()
    write_hamaker_coeff_cc(
        str(d / "DefaultCoeffHBA.cc"), synthetic_hamaker_coeffs()
    )
    monkeypatch.setenv(CALDATA_DIR_ENV, str(d))
    coeffs, center, rng = resolve_hamaker_coeffs()
    assert coeffs == synthetic_hamaker_coeffs()
    assert (center, rng) == (150.0, 100.0)
    assert _jones_rows(spark) == baseline  # bit-identical, not approx

    # perturbed file -> different Jones (the knob is live)
    d2 = tmp_path / "caldata2"
    d2.mkdir()
    pert = [
        (k, i, j, c0re + (0.25 if (k, i, j) == (0, 0, 0) else 0.0),
         c0im, c1re, c1im)
        for k, i, j, c0re, c0im, c1re, c1im in synthetic_hamaker_coeffs()
    ]
    write_hamaker_coeff_cc(str(d2 / "DefaultCoeffHBA.cc"), pert)
    monkeypatch.setenv(CALDATA_DIR_ENV, str(d2))
    assert _jones_rows(spark) != baseline


def test_caldata_dir_senstable_end_to_end(spark, tmp_path, monkeypatch):
    """resolve_wijnholds_aeff ingests a *senstable*.txt from the
    caldata dir through the full text -> az-mean -> Trec pipeline;
    with the synthetic cube file on disk it must equal the packaged
    parquet dimension to the same 1-ulp contract the packaged-parquet
    pin test documents (test_caldata.py:263-266: the float az-mean's
    summation order is partitioning-dependent)."""
    d = tmp_path / "caldata"
    d.mkdir()
    shutil.copy(
        ensure_wijnholds_cube(),
        d / "lofar_sensitivity_senstable-v02.txt",
    )
    monkeypatch.setenv(CALDATA_DIR_ENV, str(d))
    from_file = {
        (r["freq_mhz"], r["el_deg"]): r["aeff_m2"]
        for r in resolve_wijnholds_aeff(spark).collect()
    }
    monkeypatch.delenv(CALDATA_DIR_ENV)
    packaged = {
        (r["freq_mhz"], r["el_deg"]): r["aeff_m2"]
        for r in load_wijnholds_aeff(spark).collect()
    }
    assert from_file.keys() == packaged.keys()
    for k, v in from_file.items():
        assert packaged[k] == pytest.approx(v, rel=1e-12), k


def test_caldata_dir_fluxcal_plan_end_to_end(spark, tmp_path, monkeypatch):
    """The FULL fluxcal plan from files on disk: calibrate_cube with a
    channel table built by wijnholds_channel_calibration under
    $SPARK_GRAFT_CALDATA_DIR (real-file ingest path) equals the same
    plan on the packaged dimension (1-ulp aeff contract, see
    test_caldata.py:263-266)."""
    from lofar_bf_pulsar_scripts_spark.plans.fluxcal import (
        calibrate_cube,
        wijnholds_channel_calibration,
    )

    channels = spark.createDataFrame(
        [(c, 120.0 + 5.0 * c, 25.0 + 10.0 * c, 20.0 + c, 400.0 + 10.0 * c)
         for c in range(4)],
        "chan int, freq_mhz double, el_deg double, t408 double, "
        "tinst_k double",
    )
    cube = spark.createDataFrame(
        [(s, c, b, float(((s * 31 + c * 17 + b * 7) % 23) - 11))
         for s in range(2) for c in range(4) for b in range(16)],
        "subint int, chan int, bin int, value double",
    )

    def run():
        calib = wijnholds_channel_calibration(spark, channels)
        out = calibrate_cube(cube, calib, off_bin_lo=0, off_bin_hi=8)
        return {
            (r["subint"], r["chan"], r["bin"]): r["flux_mjy"]
            for r in out.collect()
        }

    d = tmp_path / "caldata"
    d.mkdir()
    shutil.copy(
        ensure_wijnholds_cube(),
        d / "lofar_sensitivity_senstable-v02.txt",
    )
    monkeypatch.setenv(CALDATA_DIR_ENV, str(d))
    from_files = run()
    monkeypatch.delenv(CALDATA_DIR_ENV)
    packaged = run()
    assert from_files.keys() == packaged.keys()
    for k, v in from_files.items():
        assert packaged[k] == pytest.approx(v, rel=1e-12, nan_ok=True), k
    assert len(from_files) == 2 * 4 * 16
    assert sum(v is not None for v in from_files.values()) == 2 * 4 * 16
