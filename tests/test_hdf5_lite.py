"""Dependency-free HDF5 attribute reader (S9) — round-trip against the
minimal spec-conformant writer, read_meta parity with the reference
(lofar_fluxcal.py:151-172), and the Spark metadata scan."""

import os

import pytest

from lofar_bf_pulsar_scripts_spark.sources.hdf5_lite import (
    VlenStr,
    parse_h5_root_attrs,
    read_meta,
    write_minimal_h5,
)

HBA_ATTRS = {
    "FILTER_SELECTION": "HBA_110_190",
    "OBSERVATION_STATIONS_LIST": [
        "CS001HBA0", "CS001HBA1", "CS002HBA0", "CS002HBA1", "RS503HBA",
    ],
    "OBSERVATION_START_UTC": VlenStr("2013-04-23T14:00:00.000000000Z"),
    "CLOCK_FREQUENCY": 200.0,
    "NOF_SUB_ARRAY_POINTINGS": 2,
}


def _write(tmp_path, name, attrs):
    p = os.path.join(str(tmp_path), name)
    write_minimal_h5(p, attrs)
    return p


def test_round_trip_all_types(tmp_path):
    p = _write(tmp_path, "obs.h5", HBA_ATTRS)
    attrs = parse_h5_root_attrs(open(p, "rb").read())
    assert attrs["FILTER_SELECTION"] == "HBA_110_190"
    assert attrs["OBSERVATION_STATIONS_LIST"] == HBA_ATTRS[
        "OBSERVATION_STATIONS_LIST"
    ]
    # vlen string resolved through the global heap
    assert attrs["OBSERVATION_START_UTC"] == "2013-04-23T14:00:00.000000000Z"
    assert attrs["CLOCK_FREQUENCY"] == 200.0
    assert attrs["NOF_SUB_ARRAY_POINTINGS"] == 2


def test_read_meta_hba_halves_substations(tmp_path):
    p = _write(tmp_path, "obs.h5", HBA_ATTRS)
    ncore, flagged, stations = read_meta(open(p, "rb").read())
    # 4 CS ear substations -> 2 coherently-added core stations
    assert ncore == 2
    assert flagged is None
    assert len(stations) == 5


def test_read_meta_lba_and_remote_fallback(tmp_path):
    lba = _write(
        tmp_path,
        "lba.h5",
        {
            "FILTER_SELECTION": "LBA_10_90",
            "OBSERVATION_STATIONS_LIST": ["CS001LBA", "CS002LBA", "CS003LBA"],
        },
    )
    assert read_meta(open(lba, "rb").read())[0] == 3  # LBA not halved
    remote = _write(
        tmp_path,
        "remote.h5",
        {
            "FILTER_SELECTION": "HBA_110_190",
            "OBSERVATION_STATIONS_LIST": ["DE601HBA"],
        },
    )
    # zero core stations falls back to the full station count
    assert read_meta(open(remote, "rb").read())[0] == 1


def test_bad_and_unsupported_files(tmp_path):
    with pytest.raises(ValueError, match="signature"):
        parse_h5_root_attrs(b"not an hdf5 file" + b"\x00" * 100)
    p = _write(tmp_path, "obs.h5", {"A": 1})
    buf = bytearray(open(p, "rb").read())
    buf[8] = 2  # superblock v2 -> clear unsupported-version error
    with pytest.raises(ValueError, match="superblock version 2"):
        parse_h5_root_attrs(bytes(buf))
    # read_meta never raises — the reference returns the zero tuple
    assert read_meta(b"garbage") == (0, None, [])


def test_spark_h5_metadata_scan(spark, tmp_path):
    from lofar_bf_pulsar_scripts_spark.sources.fits_h5 import read_h5_metadata

    _write(tmp_path, "a.h5", HBA_ATTRS)
    _write(
        tmp_path,
        "b.h5",
        {
            "FILTER_SELECTION": "LBA_10_90",
            "OBSERVATION_STATIONS_LIST": ["CS001LBA"],
            "OBSERVATION_START_UTC": "2014-01-01T00:00:00Z",
        },
    )
    out = {
        os.path.basename(r["obs_file"].replace("file:", "")): r
        for r in read_h5_metadata(spark, str(tmp_path) + "/*.h5").collect()
    }
    assert out["a.h5"]["filter_selection"] == "HBA_110_190"
    assert out["a.h5"]["n_stations"] == 5
    assert out["a.h5"]["start_utc"] == "2013-04-23T14:00:00.000000000Z"
    assert out["b.h5"]["stations"] == ["CS001LBA"]
