"""Calibration data tables (D7): decode fidelity, lookup semantics,
and plan shape of the packaged Haslam/Tinst/casa_beamcorr/stations
dims (reference: fluxcal/tsky.py, lofar_tinst.py,
casa_beamcorr_pkg.py, lofar_gain_hamaker_carozzi.py:121-137)."""
import math

import pytest
from pyspark.sql import Row, functions as F

from lofar_bf_pulsar_scripts_spark import caldata


def test_haslam_decode_shape_and_known_cells(spark):
    h = caldata.load_haslam(spark)
    assert h.count() == 90 * 180
    # First packed value of the table (tsky.py:15) is l=0,b=0 -> 19.2;
    # the map's bright galactic-plane cells exceed 300 K.
    first = h.filter((F.col("l_idx") == 0) & (F.col("b_idx") == 0)).collect()
    assert first[0].t408_k == pytest.approx(19.2)
    assert h.agg(F.max("t408_k")).first()[0] > 300.0


def test_haslam_cell_indexing_matches_reference(spark):
    # tsky.py:1052-1057: b=int(gb+90.5) clamp 179; l=int(int(gl+0.5)/4),
    # gl>=360 -> 0.
    rows = [
        Row(gl_deg=0.0, gb_deg=-90.0),
        Row(gl_deg=359.4, gb_deg=89.9),
        Row(gl_deg=360.0, gb_deg=0.0),
        Row(gl_deg=123.7, gb_deg=-0.2),
    ]
    df = spark.createDataFrame(rows)
    l_idx, b_idx = caldata.haslam_cell(F.col("gl_deg"), F.col("gb_deg"))
    got = df.select(l_idx.alias("l"), b_idx.alias("b")).collect()

    def ref_cell(gl, gb):
        b = int(gb + 90.5)
        if b >= 180:
            b = 179
        l = 0 if gl >= 360 else int(int(gl + 0.5) / 4)
        return min(l, 89), b

    for r, row in zip(got, rows):
        assert (r.l, r.b) == ref_cell(row.gl_deg, row.gb_deg)


def test_attach_tsky_scales_and_broadcasts(spark):
    df = spark.createDataFrame(
        [Row(gl_deg=0.0, gb_deg=-90.0, freq_mhz=408.0)]
    )
    out = caldata.attach_tsky(df, caldata.load_haslam(spark))
    row = out.collect()[0]
    # at 408 MHz the power law is 1: tsky = 2.7 + t408
    assert row.tsky_k == pytest.approx(2.7 + row.t408_k)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_tinst_poly_matches_reference_eval(spark):
    # lofar_tinst.py:45,53: sum c[ii] * f**(dpoly-ii-1), LBA table
    lba = [
        6.2699888333e-05, -0.019932340239, 2.60625093843, -179.560314268,
        6890.14953844, -140196.209123, 1189842.07708,
    ]
    f = 50.0
    expect = sum(c * f ** (len(lba) - i - 1) for i, c in enumerate(lba))
    got = (
        spark.range(1)
        .select(caldata.tinst_k("LBA", F.lit(f)).alias("t"))
        .first()
        .t
    )
    # Horner vs the reference's power-sum: the big terms cancel
    # (~1e7 -> ~264 K), so agreement is ~5e-10 absolute, not 1e-15.
    assert got == pytest.approx(expect, rel=1e-9)
    with pytest.raises(ValueError):
        caldata.tinst_k("VHF", F.lit(f))


def test_casa_beamcorr_nearest_matches_reference_sort(spark):
    bc = caldata.load_casa_beamcorr(spark)
    # reference (lofar_gain_hamaker_carozzi.py:134-136): stable sort of
    # the station's [freq, factor] pairs by |freq - f0|, take first.
    table = [
        (r.freq_mhz, r.factor)
        for r in bc.filter(F.col("station") == "CS002")
        .orderBy("freq_mhz")
        .collect()
    ]
    # includes exact grid points, a grid MIDPOINT (tie -> lower table
    # frequency, the reference's stable-sort break), out-of-range
    # extrapolation on both sides, and near-boundary offsets — the
    # cases that stress the O(1) index probe's idx +/- 1 window.
    mid = (table[700][0] + table[701][0]) / 2.0
    probes = (
        100.0, 151.337, 299.9, 10.0, 0.5, 500.0,
        table[0][0], table[-1][0], mid,
        mid - 1e-9, mid + 1e-9, table[3][0] + 1e-9,
    )
    for f0 in probes:
        facts = sorted(table, key=lambda arr: abs(f0 - arr[0]))
        df = spark.createDataFrame([Row(station="CS002", freq_mhz=f0)])
        got = caldata.attach_casa_beamcorr(df, bc).first()
        assert got.casa_factor == pytest.approx(facts[0][1], rel=0, abs=0), f0


def test_packaged_casa_comb_ok_content_keyed(spark):
    # the packaged table IS a uniform comb -> True, computed without
    # a Spark job and memoized on the manifest sha256
    assert caldata.packaged_casa_comb_ok() is True
    assert caldata._PACKAGED_COMB_OK  # memo populated
    # an explicit verdict bypasses the in-plan probe but preserves
    # semantics: comb_ok=False forces the exact fold, same answers
    bc = caldata.load_casa_beamcorr(spark)
    df = spark.createDataFrame(
        [Row(station="CS002", freq_mhz=f) for f in (151.337, 10.0, 500.0)]
    )
    fast = {
        r.freq_mhz: r.casa_factor
        for r in caldata.attach_casa_beamcorr(df, bc, comb_ok=True).collect()
    }
    fold = {
        r.freq_mhz: r.casa_factor
        for r in caldata.attach_casa_beamcorr(df, bc, comb_ok=False).collect()
    }
    assert fast == fold


def test_jones_beam_factor_complex_algebra(spark):
    # 1/|0.5 sum J conj(J)| for a known matrix: J00=1+2j, J01=0,
    # J10=3j, J11=-1  ->  s = 5 + 0 + 9 + 1 = 15, bc = 1/7.5
    df = spark.createDataFrame(
        [Row(a=1.0)]
    ).select(
        caldata.jones_beam_factor(
            F.lit(1.0), F.lit(2.0), F.lit(0.0), F.lit(0.0),
            F.lit(0.0), F.lit(3.0), F.lit(-1.0), F.lit(0.0),
        ).alias("bc")
    )
    assert df.first().bc == pytest.approx(1.0 / 7.5)


def test_channel_sefd_table_end_to_end(spark):
    chans = spark.createDataFrame(
        [
            Row(chan=0, freq_mhz=50.0, gl_deg=0.0, gb_deg=0.0),
            Row(chan=1, freq_mhz=150.0, gl_deg=0.0, gb_deg=0.0),
        ]
    )
    out = caldata.channel_sefd_table(chans, caldata.load_haslam(spark))
    rows = {r.chan: r for r in out.collect()}
    # LBA channel uses the LBA poly + LBA aeff; HBA the other branch
    lam50, lam150 = 299.792458 / 50.0, 299.792458 / 150.0
    assert rows[0].aeff_m2 == pytest.approx(48.0 * lam50 * lam50 / 3.0)
    assert rows[1].aeff_m2 == pytest.approx(
        48.0 * 16.0 * min(lam150 * lam150 / 3.0, 1.5625)
    )
    for r in rows.values():
        assert r.tsys_k == pytest.approx(r.tsky_k + r.tinst_k)
        assert r.sefd_jy == pytest.approx(
            2.0 * 1.380649e-16 * 1.0e23 * r.tsys_k / (r.aeff_m2 * 1.0e4)
        )
    # dimension joins must not shuffle the channel side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stations_table(spark):
    st = caldata.load_stations(spark)
    rows = {r.station: r for r in st.collect()}
    # FE-map/stations.txt:12 - Effelsberg in degrees
    assert rows["DE601"].unit == "deg"
    assert rows["DE601"].lat == pytest.approx(50.52483)
    # core stations are metre offsets
    assert any(r.unit == "m" for r in rows.values())


def test_wijnholds_cube_pipeline_matches_numpy(spark, tmp_path):
    # Small synthetic cube in the documented layout (el fastest, az,
    # freq slowest); expected values from a numpy replica of the
    # reference's loadtxt -> reshape -> mean(axis=1) -> t-correction
    # loop (lofar_gain.py:165-214).
    import numpy as np

    nf, naz, nel = 3, 5, 7
    rng = np.random.RandomState(3)
    cube = rng.uniform(0.001, 0.01, (nf, naz, nel))
    flat = cube.ravel()
    path = tmp_path / "gain_cube.txt"
    np.savetxt(path, flat.reshape(-1, 7))

    flow, fstep = 110.0, 5.0
    gtable = cube.mean(axis=1)  # average over azimuths
    for ii in range(nf):
        f = (flow + fstep * ii) * 1.0e6
        lam = 3.0e8 / f
        t = 400.0 + (lam / 0.2008) ** 2.55 + (f / 1e9) ** 1.8 + 2.7
        gtable[ii, :] *= t

    from lofar_bf_pulsar_scripts_spark import caldata

    df = caldata.wijnholds_cube_from_text(spark, str(path))
    out = caldata.wijnholds_aeff_table(df, naz=naz, nel=nel)
    rows = out.collect()
    assert len(rows) == nf * nel
    for r in rows:
        fi = int(round((r.freq_mhz - flow) / fstep))
        el = int(r.el_deg)
        assert r.aeff_m2 == pytest.approx(gtable[fi, el], rel=1e-12), (fi, el)


def test_wijnholds_aeff_bilinear_lookup(spark, tmp_path):
    # compose with the J8 bilinear interpolation: an off-grid (freq,
    # el) request reproduces numpy's separable linear interpolation
    import numpy as np

    nf, naz, nel = 3, 4, 6
    cube = np.fromfunction(
        lambda f, a, e: 0.002 + 0.0001 * e + 0.00001 * a + 0.0005 * f,
        (nf, naz, nel),
    )
    import pandas as pd

    from lofar_bf_pulsar_scripts_spark import caldata

    flat = pd.DataFrame({"idx": range(cube.size), "raw": cube.ravel()})
    table = caldata.wijnholds_aeff_table(
        spark.createDataFrame(flat), naz=naz, nel=nel
    )
    req = spark.createDataFrame([(112.5, 2.25)], "freq_mhz double, el_deg double")
    got = caldata.wijnholds_aeff_lookup(req, table).first()

    gtable = cube.mean(axis=1)
    for ii in range(nf):
        f = (110.0 + 5.0 * ii) * 1.0e6
        lam = 3.0e8 / f
        gtable[ii, :] *= 400.0 + (lam / 0.2008) ** 2.55 + (f / 1e9) ** 1.8 + 2.7
    lo = np.interp(2.25, np.arange(nel), gtable[0])
    hi = np.interp(2.25, np.arange(nel), gtable[1])
    expect = np.interp(112.5, [110.0, 115.0], [lo, hi])
    assert got["aeff_m2"] == pytest.approx(expect, rel=1e-12)


def test_wijnholds_full_dims_packaged_parquet(spark):
    """The packaged wijnholds_aeff.parquet (built by
    tools/build_caldata.py) equals the REAL ingest pipeline run over
    the full-dimension 29x361x91 synthetic cube — same dims as the
    reference's senstable file (lofar_gain.py:165-171)."""
    from lofar_bf_pulsar_scripts_spark import caldata

    cube = caldata.wijnholds_cube_from_text(
        spark, caldata.ensure_wijnholds_cube()
    )
    got = {
        (r.freq_mhz, r.el_deg): r.aeff_m2
        for r in caldata.wijnholds_aeff_table(cube).collect()
    }
    packaged = {
        (r.freq_mhz, r.el_deg): r.aeff_m2
        for r in caldata.load_wijnholds_aeff(spark).collect()
    }
    assert len(got) == 29 * 91 and len(packaged) == 29 * 91
    # azimuth ripple averages to exactly zero; the only divergence is
    # the 1-ulp numpy-vs-JVM libm pow in the Tsys factor
    for k, v in got.items():
        assert packaged[k] == pytest.approx(v, rel=1e-12), k
    # physical scale: Aeff of an HBA station is O(100-1000) m^2
    assert all(50.0 < v < 2000.0 for v in packaged.values())


def test_aeff_arisN_elevation_scaling(spark):
    # arisN = analytic max * sin(EL)^1.39 (lofar_gain.py:460-473);
    # band-average composes through the same midpoint integral the
    # reference uses (lofar_gain.py:642-656 uses nparts+1 endpoint
    # samples; our band_average is midpoint - both converge, compare
    # pointwise here).
    import math as m

    from lofar_bf_pulsar_scripts_spark.functions.astro import (
        aeff_arisN_m2,
        station_nelem,
    )

    df = spark.createDataFrame(
        [("CS002", 150.0, 30.0), ("DE601", 50.0, 90.0), ("RS509", 150.0, 90.0)],
        "station string, freq_mhz double, el_deg double",
    )
    out = {
        (r.station): r.aeff
        for r in df.select(
            "station",
            aeff_arisN_m2(
                station_nelem(F.col("station")), F.col("freq_mhz"), F.col("el_deg")
            ).alias("aeff"),
        ).collect()
    }
    lam150 = 299.792458 / 150.0
    base_hba_48 = 48 * 16.0 * min(lam150 * lam150 / 3.0, 1.5625)
    assert out["CS002"] == pytest.approx(
        base_hba_48 * m.sin(m.radians(30.0)) ** 1.39, rel=1e-12
    )
    # at zenith the scale term is 1
    assert out["RS509"] == pytest.approx(base_hba_48, rel=1e-12)
    lam50 = 299.792458 / 50.0
    assert out["DE601"] == pytest.approx(96 * lam50 * lam50 / 3.0, rel=1e-12)
