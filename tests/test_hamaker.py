"""Hamaker element-response Jones evaluation: numpy-replica
equivalence, CasA-table regeneration self-consistency (the
make_casa_beamcorr.py:51-71 loop closed in-engine), and horizon
gating (reference: lofar_gain_hamaker_carozzi.py:121-137)."""
import cmath
import math

import pytest
from pyspark.sql import Row, functions as F

from lofar_bf_pulsar_scripts_spark import caldata
from lofar_bf_pulsar_scripts_spark.caldata import (
    CASA_REF_DEC_RAD,
    CASA_REF_RA_RAD,
    HAMAKER_FREQ_CENTER_MHZ,
    HAMAKER_FREQ_RANGE_MHZ,
    hamaker_carozzi_beamcorr,
    hamaker_element_jones,
    hamaker_jones_from_radec,
    jones_beam_factor,
    make_casa_beamcorr_table,
    synthetic_hamaker_coeffs,
)


def np_jones(theta, phi, freq_mhz, coeffs):
    """Scalar reference implementation of the published expansion."""
    fs = (freq_mhz - HAMAKER_FREQ_CENTER_MHZ) / HAMAKER_FREQ_RANGE_MHZ
    j = [[0j, 0j], [0j, 0j]]
    for k, i, jj, c0re, c0im, c1re, c1im in coeffs:
        tp = theta**i * fs**jj
        p0 = complex(c0re, c0im) * tp
        p1 = complex(c1re, c1im) * tp
        kap = (1 if k % 2 == 0 else -1) * (2 * k + 1)
        ca, sa = math.cos(kap * phi), math.sin(kap * phi)
        j[0][0] += ca * p0
        j[0][1] += sa * p0
        j[1][0] += -sa * p1
        j[1][1] += ca * p1
    return j


def test_element_jones_matches_scalar_replica(spark):
    coeffs = synthetic_hamaker_coeffs()
    assert len(coeffs) == 125
    pts = [
        (0, 0.0, 0.0, 150.0),
        (1, 0.3, 1.1, 120.0),
        (2, 1.2, 4.9, 189.5),
        (3, 0.7, 3.14, 110.0),
        (4, 1.5, 6.0, 175.25),
    ]
    df = spark.createDataFrame(
        pts, "row_id int, theta double, phi double, freq_mhz double"
    )
    out = hamaker_element_jones(
        df, F.col("theta"), F.col("phi"), F.col("freq_mhz")
    )
    got = {r.row_id: r for r in out.collect()}
    for row_id, theta, phi, fmhz in pts:
        j = np_jones(theta, phi, fmhz, coeffs)
        r = got[row_id]
        assert r.j00_re == pytest.approx(j[0][0].real, abs=1e-9)
        assert r.j00_im == pytest.approx(j[0][0].imag, abs=1e-9)
        assert r.j01_re == pytest.approx(j[0][1].real, abs=1e-9)
        assert r.j01_im == pytest.approx(j[0][1].imag, abs=1e-9)
        assert r.j10_re == pytest.approx(j[1][0].real, abs=1e-9)
        assert r.j10_im == pytest.approx(j[1][0].imag, abs=1e-9)
        assert r.j11_re == pytest.approx(j[1][1].real, abs=1e-9)
        assert r.j11_im == pytest.approx(j[1][1].imag, abs=1e-9)


def test_jones_near_identity_at_zenith_center_freq(spark):
    # the fixture's dominant (0,0,0) term makes J ~ I at theta=0,
    # fs=0, so bc_psr = 1/(0.5*(|J00|^2+|J11|^2)) ~ 1
    df = spark.createDataFrame([Row(x=1)])
    out = hamaker_element_jones(
        df, F.lit(0.0), F.lit(0.0), F.lit(150.0)
    ).collect()[0]
    assert out.j00_re == pytest.approx(1.0, abs=0.6)
    assert out.j11_re == pytest.approx(1.0, abs=0.6)
    s = 0.5 * (
        out.j00_re**2 + out.j00_im**2 + out.j01_re**2 + out.j01_im**2
        + out.j10_re**2 + out.j10_im**2 + out.j11_re**2 + out.j11_im**2
    )
    assert 0.2 < 1.0 / s < 5.0


def test_casa_table_regeneration_closes_loop(spark):
    """Regenerate the normalization table from the synthetic
    coefficients via the make_casa_beamcorr.py analog, then run the
    full beam-correction path against THAT table at the reference
    direction/epoch: beamcorr must be exactly 1 (same model, same
    normalization). With real mscorpol coefficients this same code
    path reproduces casa_beamcorr_pkg.py."""
    stations = ["CS002", "DE601"]
    lst = {s: 12.0 for s in stations}
    table = make_casa_beamcorr_table(
        spark, stations, lst, n_freqs=8
    ).cache()
    rows = table.collect()
    assert len(rows) == 2 * 8
    # reference channel comb: freq = chan*(100/512) + (100/1024)
    sub = 100.0 / 512.0
    freqs = sorted({r.freq_mhz for r in rows})
    assert freqs[0] == pytest.approx(51 * sub + sub / 2)
    assert freqs[1] - freqs[0] == pytest.approx(6 * sub)

    src = spark.createDataFrame(
        [(s, f, 12.0) for s in stations for f in freqs],
        "station string, freq_mhz double, lst_h double",
    )
    jones = hamaker_jones_from_radec(
        src,
        ra_deg=F.lit(CASA_REF_RA_RAD * 180.0 / math.pi),
        dec_deg=F.lit(CASA_REF_DEC_RAD * 180.0 / math.pi),
        lst_h=F.col("lst_h"),
        freq_mhz_col=F.col("freq_mhz"),
    )
    out = hamaker_carozzi_beamcorr(jones, table, comb_ok=False)
    for r in out.collect():
        assert r.beamcorr == pytest.approx(1.0, abs=1e-9), r


def test_below_horizon_jones_is_null(spark):
    # dec = -40 deg never rises at LOFAR latitude (52.9N)
    src = spark.createDataFrame([Row(obj=1)])
    out = hamaker_jones_from_radec(
        src,
        ra_deg=F.lit(10.0),
        dec_deg=F.lit(-40.0),
        lst_h=F.lit(12.0),
        freq_mhz_col=F.lit(150.0),
    ).collect()[0]
    assert out.alt_deg < 0
    assert out.j00_re is None and out.j11_im is None


def test_casa_dec_is_circumpolar_any_lst(spark):
    # CasA (dec 58.8 deg) is circumpolar at LOFAR: the regeneration
    # path must be horizon-safe at every LST
    src = spark.createDataFrame(
        [(float(h),) for h in range(0, 24, 3)], "lst_h double"
    )
    out = hamaker_jones_from_radec(
        src,
        ra_deg=F.lit(CASA_REF_RA_RAD * 180.0 / math.pi),
        dec_deg=F.lit(CASA_REF_DEC_RAD * 180.0 / math.pi),
        lst_h=F.col("lst_h"),
        freq_mhz_col=F.lit(150.0),
    ).collect()
    assert all(r.alt_deg > 0 for r in out)
    assert all(r.j00_re is not None for r in out)
