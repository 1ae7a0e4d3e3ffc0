"""Dependency-free FITS container parsing (S5): synthetic PSRFITS-like
files round-tripped through the header scan and SUBINT reader, decode
checked against the reference's data*scl+offs (subdyn.py:555)."""
import numpy as np
import pytest

from lofar_bf_pulsar_scripts_spark.sources.fits_h5 import (
    bintable_column,
    parse_fits,
    read_psrfits,
    scan_fits_headers,
)

NCHAN, NSBLK, NROWS = 4, 8, 3


def _card(key: str, value, comment: str = "") -> bytes:
    if isinstance(value, bool):
        v = "T" if value else "F"
        body = f"{key:<8}= {v:>20}"
    elif isinstance(value, str):
        body = f"{key:<8}= '{value:<8}'"
    else:
        body = f"{key:<8}= {value:>20}"
    if comment:
        body += f" / {comment}"
    return body.ljust(80).encode("ascii")


def _header(cards: list[bytes]) -> bytes:
    blob = b"".join(cards) + b"END".ljust(80)
    pad = (-len(blob)) % 2880
    return blob + b" " * pad


def _pad_data(blob: bytes) -> bytes:
    return blob + b"\x00" * ((-len(blob)) % 2880)


def make_psrfits() -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    rng = np.random.RandomState(7)
    scl = rng.uniform(0.5, 2.0, (NROWS, NCHAN)).astype(">f4")
    offs = rng.uniform(-5.0, 5.0, (NROWS, NCHAN)).astype(">f4")
    data = rng.randint(0, 256, (NROWS, NSBLK * NCHAN)).astype("u1")
    naxis1 = NCHAN * 4 * 2 + NSBLK * NCHAN
    primary = _header(
        [
            _card("SIMPLE", True),
            _card("BITPIX", 8),
            _card("NAXIS", 0),
            _card("OBSFREQ", 149.804688, "centre frequency MHz"),
            _card("EXTEND", True),
        ]
    )
    subint = _header(
        [
            _card("XTENSION", "BINTABLE"),
            _card("BITPIX", 8),
            _card("NAXIS", 2),
            _card("NAXIS1", naxis1),
            _card("NAXIS2", NROWS),
            _card("PCOUNT", 0),
            _card("GCOUNT", 1),
            _card("TFIELDS", 3),
            _card("EXTNAME", "SUBINT"),
            _card("TTYPE1", "DAT_SCL"),
            _card("TFORM1", f"{NCHAN}E"),
            _card("TTYPE2", "DAT_OFFS"),
            _card("TFORM2", f"{NCHAN}E"),
            _card("TTYPE3", "DATA"),
            _card("TFORM3", f"{NSBLK * NCHAN}B"),
            _card("NCHAN", NCHAN),
            _card("CHAN_BW", 0.1953125),
            _card("TBIN", 0.01048576),
            _card("NSBLK", NSBLK),
        ]
    )
    rows = b"".join(
        scl[r].tobytes() + offs[r].tobytes() + data[r].tobytes()
        for r in range(NROWS)
    )
    return primary + subint + _pad_data(rows), scl, offs, data


def test_parse_fits_hdus_and_cards():
    buf, scl, offs, data = make_psrfits()
    hdus = parse_fits(buf)
    assert len(hdus) == 2
    assert hdus[0]["hdu_name"] == "PRIMARY"
    assert hdus[0]["cards"]["obsfreq"] == pytest.approx(149.804688)
    assert hdus[1]["hdu_name"] == "SUBINT"
    assert hdus[1]["cards"]["nchan"] == NCHAN
    assert hdus[1]["cards"]["tform3"] == f"{NSBLK * NCHAN}B"
    got = bintable_column(buf, hdus[1], "DAT_SCL")
    np.testing.assert_allclose(got, scl.astype("f8"), rtol=0)
    got = bintable_column(buf, hdus[1], "data")
    np.testing.assert_array_equal(got, data)


def test_parse_fits_rejects_garbage():
    with pytest.raises(ValueError):
        parse_fits(b"\x00" * 2880)


def test_scan_fits_headers(spark, tmp_path):
    buf, *_ = make_psrfits()
    (tmp_path / "obs1.fits").write_bytes(buf)
    (tmp_path / "obs2.fits").write_bytes(buf)
    df = scan_fits_headers(spark, str(tmp_path / "*.fits"))
    rows = df.collect()
    files = {r.obs_file for r in rows}
    assert len(files) == 2
    m = {
        (r.hdu, r.keyword): r.value
        for r in rows
        if r.obs_file == sorted(files)[0]
    }
    assert m[(0, "obsfreq")] == "149.804688"
    assert m[(1, "nchan")] == str(NCHAN)
    assert m[(1, "extname")] == "SUBINT"


def test_read_psrfits_decode_matches_reference(spark, tmp_path):
    from pyspark.sql import functions as F

    buf, scl, offs, data = make_psrfits()
    (tmp_path / "obs.fits").write_bytes(buf)
    df = read_psrfits(spark, str(tmp_path / "obs.fits"))
    # the dat_scl/dat_offs columns ride along per row, so the S5 decode
    # is the bare projection value*scl+offs (subdyn.py:555)
    decoded = df.withColumn(
        "decoded",
        F.col("value").cast("double") * F.col("dat_scl") + F.col("dat_offs"),
    )
    out = decoded.orderBy("subint", "chan", "sample_idx").collect()
    assert len(out) == NROWS * NCHAN * NSBLK
    # reference decode: chandata[r, s*nchan+ch]*scl[r,ch]+offs[r,ch]
    scl8, offs8 = scl.astype("f8"), offs.astype("f8")
    for r in out[:: max(len(out) // 37, 1)]:
        raw = data[r.subint].reshape(NSBLK, NCHAN)[
            r.sample_idx - r.subint * NSBLK, r.chan
        ]
        expect = raw * scl8[r.subint, r.chan] + offs8[r.subint, r.chan]
        assert r.value == raw
        assert r.decoded == pytest.approx(expect, rel=1e-12)


def test_read_psrfits_cube_folded_archive(spark, tmp_path):
    # folded-mode archive (S6): NPOL*NCHAN*NBIN 16-bit data per row,
    # per-(pol,chan) scale/offset, per-chan weights; decode checked
    # against the numpy expression and composed with the fluxcal
    # pscrunch plan.
    npol, nchan, nbin, nrows = 2, 3, 4, 2
    rng = np.random.RandomState(11)
    scl = rng.uniform(0.5, 1.5, (nrows, npol * nchan)).astype(">f4")
    offs = rng.uniform(-2.0, 2.0, (nrows, npol * nchan)).astype(">f4")
    wts = np.array([[1.0, 0.0, 1.0]] * nrows).astype(">f4")
    data = rng.randint(-500, 500, (nrows, npol * nchan * nbin)).astype(">i2")
    naxis1 = (npol * nchan) * 4 * 2 + nchan * 4 + npol * nchan * nbin * 2
    hdr = _header(
        [
            _card("XTENSION", "BINTABLE"),
            _card("BITPIX", 8),
            _card("NAXIS", 2),
            _card("NAXIS1", naxis1),
            _card("NAXIS2", nrows),
            _card("PCOUNT", 0),
            _card("GCOUNT", 1),
            _card("TFIELDS", 4),
            _card("EXTNAME", "SUBINT"),
            _card("TTYPE1", "DAT_SCL"),
            _card("TFORM1", f"{npol * nchan}E"),
            _card("TTYPE2", "DAT_OFFS"),
            _card("TFORM2", f"{npol * nchan}E"),
            _card("TTYPE3", "DAT_WTS"),
            _card("TFORM3", f"{nchan}E"),
            _card("TTYPE4", "DATA"),
            _card("TFORM4", f"{npol * nchan * nbin}I"),
            _card("NPOL", npol),
            _card("NCHAN", nchan),
            _card("NBIN", nbin),
        ]
    )
    primary = _header([_card("SIMPLE", True), _card("BITPIX", 8), _card("NAXIS", 0),
                       _card("EXTEND", True)])
    rows_blob = b"".join(
        scl[r].tobytes() + offs[r].tobytes() + wts[r].tobytes() + data[r].tobytes()
        for r in range(nrows)
    )
    (tmp_path / "archive.ar").write_bytes(primary + hdr + _pad_data(rows_blob))

    from lofar_bf_pulsar_scripts_spark.sources.fits_h5 import read_psrfits_cube

    cube = read_psrfits_cube(spark, str(tmp_path / "archive.ar"))
    got = cube.orderBy("subint", "pol", "chan", "bin").collect()
    assert len(got) == nrows * npol * nchan * nbin
    scl8, offs8 = scl.astype("f8"), offs.astype("f8")
    d = data.astype("f8").reshape(nrows, npol, nchan, nbin)
    for r in got[:: max(len(got) // 23, 1)]:
        pc = r.pol * nchan + r.chan
        expect = d[r.subint, r.pol, r.chan, r.bin] * scl8[r.subint, pc] + offs8[r.subint, pc]
        assert r.value == pytest.approx(expect, rel=1e-12)
        assert r.weight == wts.astype("f8")[r.subint, r.chan]

    # compose with the fluxcal plan: pol-scrunch sums over pol
    from lofar_bf_pulsar_scripts_spark.plans.fluxcal import pscrunch

    ps = {
        (r["subint"], r["chan"], r["bin"]): r["value"]
        for r in pscrunch(cube).collect()
    }
    expect_ps = (d * scl8.reshape(nrows, npol, nchan, 1)
                 + offs8.reshape(nrows, npol, nchan, 1)).sum(axis=1)
    for (s, c, b), v in ps.items():
        assert v == pytest.approx(expect_ps[s, c, b], rel=1e-12)


def test_write_psrfits_cube_roundtrip(spark, tmp_path):
    # K4 sink: write a calibrated cube as a folded PSRFITS archive and
    # read it back — values agree within 16-bit quantization.
    from lofar_bf_pulsar_scripts_spark.sources.fits_h5 import (
        read_psrfits_cube,
        write_psrfits_cube,
    )

    nsub, npol, nchan, nbin = 2, 2, 3, 16
    rng = np.random.RandomState(5)
    rows = []
    vals = rng.normal(50.0, 12.0, (nsub, npol, nchan, nbin))
    for s in range(nsub):
        for p in range(npol):
            for c in range(nchan):
                for b in range(nbin):
                    rows.append((s, p, c, b, float(vals[s, p, c, b]),
                                 1.0 if c != 1 else 0.0))
    cube = spark.createDataFrame(
        rows, "subint int, pol int, chan int, bin int, value double, weight double"
    )
    path = str(tmp_path / "out.ar")
    write_psrfits_cube(cube, path, extra_primary_cards={"OBSFREQ": 149.9})

    back = read_psrfits_cube(spark, path)
    got = {
        (r.subint, r.pol, r.chan, r.bin): (r.value, r.weight)
        for r in back.collect()
    }
    assert len(got) == nsub * npol * nchan * nbin
    for s in range(nsub):
        for p in range(npol):
            for c in range(nchan):
                span = vals[s, p, c].max() - vals[s, p, c].min()
                q = span / 65534.0  # one quantization step
                for b in range(nbin):
                    v, w = got[(s, p, c, b)]
                    assert abs(v - vals[s, p, c, b]) <= q * 0.51
                    assert w == (1.0 if c != 1 else 0.0)


def test_write_psrfits_cube_single_upstream_execution(spark, tmp_path):
    """The size guard and the collect share ONE upstream execution
    (limit-bounded toPandas) — the former separate probe count() ran
    the whole upstream twice per sink call."""
    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.sources.fits_h5 import (
        write_psrfits_cube,
    )

    acc = spark.sparkContext.accumulator(0)

    def counted(its):
        import pandas as pd  # noqa: F401

        for pdf in its:
            acc.add(len(pdf))
            yield pdf

    nsub, npol, nchan, nbin = 1, 1, 2, 8
    rows = [
        (0, 0, c, b, float(c * 10 + b))
        for c in range(nchan)
        for b in range(nbin)
    ]
    base = spark.createDataFrame(
        rows, "subint int, pol int, chan int, bin int, value double"
    ).repartition(2)
    cube = base.mapInPandas(counted, schema=base.schema)
    write_psrfits_cube(cube, str(tmp_path / "one.ar"))
    assert acc.value == len(rows)  # exactly one pass, not two
