"""Tests for coordinate/time expressions (§2.8) and report sinks /
validated joins (K2/K3/K5, J7)."""

import math
import os
import shutil

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.functions.coords import (
    altaz_from_equatorial,
    dec_dms_to_deg,
    galactic_from_equatorial,
    gmst_hours,
    julian_day,
    lst_hours,
    mjd_from_jd,
    ra_hms_to_deg,
)
from lofar_bf_pulsar_scripts_spark.plans.reports import (
    materialize,
    rfirep_lines,
    validated_station_join,
    write_report,
)

TMP = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_report_tmp")


def test_sexagesimal_parsing(spark):
    df = spark.createDataFrame(
        [("05:34:31.97", "+22:00:52.1"), ("00:00:00", "-01:30:00")],
        "ra string, dec string",
    )
    rows = df.select(
        ra_hms_to_deg(F.col("ra")).alias("ra_deg"),
        dec_dms_to_deg(F.col("dec")).alias("dec_deg"),
    ).collect()
    # Crab pulsar: RA 05h34m31.97s = 83.63320833 deg, Dec +22d00'52.1"
    assert rows[0]["ra_deg"] == pytest.approx(83.6332083, abs=1e-6)
    assert rows[0]["dec_deg"] == pytest.approx(22.0144722, abs=1e-6)
    assert rows[1]["ra_deg"] == 0.0
    assert rows[1]["dec_deg"] == pytest.approx(-1.5)


def test_julian_day_known_dates(spark):
    df = spark.createDataFrame([(2000, 1, 1), (1858, 11, 17)], "y int, m int, d int")
    rows = df.select(
        julian_day(F.col("y"), F.col("m"), F.col("d")).alias("jd")
    ).collect()
    assert rows[0]["jd"] == pytest.approx(2451544.5)  # J2000 epoch 0h
    assert rows[1]["jd"] == pytest.approx(2400000.5)  # MJD zero point
    mjd = df.select(mjd_from_jd(julian_day(F.col("y"), F.col("m"), F.col("d"))).alias("m")).collect()
    assert mjd[1]["m"] == pytest.approx(0.0)


def test_gmst_j2000(spark):
    # GMST at J2000.0 (MJD 51544.5) is 18.697374558 h (IAU value)
    df = spark.createDataFrame([(51544.5,)], "mjd double")
    row = df.select(gmst_hours(F.col("mjd")).alias("g"),
                    lst_hours(F.col("mjd"), F.lit(6.8667)).alias("l")).first()
    assert row["g"] == pytest.approx(18.697374558, abs=1e-9)
    assert row["l"] == pytest.approx((18.697374558 + 6.8667 / 15) % 24, abs=1e-9)


def test_altaz_zenith_and_horizon(spark):
    # source at dec=lat transiting (ha=0) passes through zenith
    df = spark.createDataFrame([(1,)], "i int")
    alt, az = altaz_from_equatorial(
        F.lit(180.0), F.lit(52.0), F.lit(12.0), F.lit(52.0)
    )
    row = df.select(alt.alias("alt"), az.alias("az")).first()
    assert row["alt"] == pytest.approx(90.0, abs=1e-9)
    # pole star from the pole: alt = 90 at any lst
    alt2, _ = altaz_from_equatorial(F.lit(10.0), F.lit(90.0), F.lit(3.0), F.lit(90.0))
    assert df.select(alt2.alias("a")).first()["a"] == pytest.approx(90.0, abs=1e-9)


def test_visibility_window_azlst_semantics(spark):
    from lofar_bf_pulsar_scripts_spark.functions.coords import (
        LOFAR_LAT_DEG,
        visibility_window,
    )

    df = spark.createDataFrame([(1,)], "i int")

    def vw(ra, dec, el, lat=LOFAR_LAT_DEG):
        col = visibility_window(
            F.lit(float(ra)), F.lit(float(dec)), F.lit(float(lat)),
            F.lit(float(el)),
        )
        return df.select(col.alias("w")).first()["w"]

    # B0329+54-like source at LOFAR (ra 53.25 deg, dec +54.58), el 30:
    # dec > 90 - lat + el? 54.58 < 67.08 -> normal rise/set window
    w = vw(53.2475, 54.5787, 30.0)
    assert not w["never_sets"] and not w["never_above"]
    assert w["el_transit_deg"] == pytest.approx(
        90.0 - abs(LOFAR_LAT_DEG - 54.5787), abs=1e-9
    )
    # closed-form HA check: cos HA = (cos ZA - sin d sin l)/(cos d cos l)
    cos_ha = (
        math.cos(math.radians(60.0))
        - math.sin(math.radians(54.5787)) * math.sin(math.radians(LOFAR_LAT_DEG))
    ) / (
        math.cos(math.radians(54.5787)) * math.cos(math.radians(LOFAR_LAT_DEG))
    )
    ha_h = math.degrees(math.acos(cos_ha)) / 15.0
    assert w["ha_h"] == pytest.approx(ha_h, abs=1e-12)
    ra_h = 53.2475 / 15.0
    assert w["lst_rise_h"] == pytest.approx((ra_h - ha_h) % 24.0, abs=1e-12)
    assert w["lst_set_h"] == pytest.approx((ra_h + ha_h) % 24.0, abs=1e-12)
    # rise/set azimuths straddle North symmetrically (az_rise east of
    # North, az_set west, az_rise + az_set = 720 - 360 = 360 by the
    # atan2 antisymmetry in HA)
    assert w["az_rise_deg"] + w["az_set_deg"] == pytest.approx(360.0, abs=1e-9)
    # forward-port consistency: the alt at LST=lst_rise IS el_min
    alt, _ = altaz_from_equatorial(
        F.lit(53.2475),
        F.lit(54.5787),
        F.lit(float(w["lst_rise_h"])),
        F.lit(LOFAR_LAT_DEG),
    )
    assert df.select(alt.alias("a")).first()["a"] == pytest.approx(
        30.0, abs=1e-9
    )

    # circumpolar above the limit: dec 80 at LOFAR, el 30 (threshold
    # 90 - 52.915 + 30 = 67.08) -> never sets, full-day window
    w = vw(10.0, 80.0, 30.0)
    assert w["never_sets"] and w["ha_h"] == 12.0
    assert w["lst_rise_h"] is None and w["az_rise_deg"] is None

    # southern source never reaching el 30: el_transit = 90-|lat-dec|
    w = vw(100.0, -40.0, 30.0)
    assert w["never_above"] and not w["never_sets"]
    assert w["ha_h"] == 0.0 and w["lst_set_h"] is None
    assert w["el_transit_deg"] == pytest.approx(
        90.0 - abs(LOFAR_LAT_DEG + 40.0), abs=1e-9
    )

    # southern-hemisphere site branch of the never_sets test
    w = vw(10.0, -85.0, 20.0, lat=-52.915111)
    assert w["never_sets"] and w["ha_h"] == 12.0

    # exact-threshold tolerance: dec exactly at 90 - lat + el - 0.001
    w = vw(0.0, 90.0 - LOFAR_LAT_DEG + 30.0 - 0.001, 30.0)
    assert w["never_sets"]


def test_scheduler_consumes_computed_transits(spark):
    from lofar_bf_pulsar_scripts_spark.plans.scheduler import (
        greedy_schedule,
        targets_with_transits,
    )

    targets = spark.createDataFrame(
        [
            # ra 150 deg -> transit LST min = 150*4 = 600
            ("A", 60, 2.0, 150.0, 54.0),
            ("B", 60, 1.0, 150.0, 40.0),   # same transit, conflicts
            ("C", 120, 1.0, 7.5, 60.0),    # transit min 30
            ("D", 30, 3.0, 345.0, 85.0),   # circumpolar, transit 1380
            ("S", 45, 9.0, 200.0, -40.0),  # never above el 30 -> drop
        ],
        "name string, duration_min int, priority double, "
        "ra_deg double, dec_deg double",
    )
    enriched = targets_with_transits(targets)
    rows = {r["name"]: r for r in enriched.collect()}
    assert "S" not in rows  # unobservable target dropped
    assert rows["A"]["transit_min"] == 600
    assert rows["C"]["transit_min"] == 30
    assert rows["D"]["circumpolar"] and rows["D"]["rise_min"] is None
    assert rows["A"]["rise_min"] is not None
    placements = greedy_schedule(enriched)
    byname = {p.name: p for p in placements}
    assert byname["A"].start_min == 600  # higher score takes transit
    assert byname["B"].start_min != 600
    assert byname["D"].transit_min == 1380


def test_galactic_poles(spark):
    df = spark.createDataFrame([(1,)], "i int")
    # north galactic pole (J2000): RA 192.85948, Dec 27.12825 -> b = 90
    l, b = galactic_from_equatorial(F.lit(192.85948), F.lit(27.12825))
    assert df.select(b.alias("b")).first()["b"] == pytest.approx(90.0, abs=1e-6)
    # galactic center: RA 266.405, Dec -28.936 -> l ~ 0, b ~ 0
    l2, b2 = galactic_from_equatorial(F.lit(266.40499), F.lit(-28.93617))
    row = df.select(F.pmod(l2 + 180.0, F.lit(360.0)).alias("l180"), b2.alias("b")).first()
    assert abs(row["b"]) < 0.01
    assert row["l180"] == pytest.approx(180.0, abs=0.01)


def test_rfirep_and_write(spark):
    os.makedirs(TMP, exist_ok=True)
    try:
        fracs = spark.createDataFrame(
            [(0, 0.02, 100), (1, 0.45, 100), (2, 0.11, 100)],
            "chan int, clip_frac double, n int",
        )
        rep = rfirep_lines(fracs, rfilimit=0.1)
        lines = {r["chan"]: r["rfirep_line"] for r in rep.collect()}
        assert set(lines) == {1, 2}
        assert lines[1] == "1\t0.4500"
        out = os.path.join(TMP, "report.rfirep")
        write_report(rep, "rfirep_line", out, header="# chan frac")
        text = []
        for f in os.listdir(out):
            if f.startswith("part-"):
                text += open(os.path.join(out, f)).read().splitlines()
        assert "# chan frac" in text and "1\t0.4500" in text
    finally:
        shutil.rmtree(TMP, ignore_errors=True)


def test_materialize_roundtrip(spark):
    os.makedirs(TMP, exist_ok=True)
    try:
        df = spark.range(100).withColumn("v", F.col("id") * 2.0)
        cached = materialize(df, os.path.join(TMP, "cache.parquet"))
        assert cached.count() == 100
        assert cached.filter("id = 7").first()["v"] == 14.0
    finally:
        shutil.rmtree(TMP, ignore_errors=True)


def test_validated_station_join(spark):
    obs = spark.createDataFrame(
        [("2020-01-01", "CS001"), ("2020-01-01", "CS002"), ("2020-01-01", "RS509")],
        "date string, station string",
    )
    flagged = spark.createDataFrame(
        [
            ("2020-01-01", "CS001HBA0", 3),
            ("2020-01-01", "CS002HBA0", 1),
            ("2020-01-01", "CS002HBA1", 2),
        ],
        "date string, substation string, ntiles int",
    )
    out = {r["station"]: r for r in validated_station_join(obs, flagged).collect()}
    assert out["CS001"]["match_status"] == "ok" and out["CS001"]["ntiles"] == 3
    assert out["CS002"]["match_status"] == "ambiguous"
    assert out["RS509"]["match_status"] == "missing"


def test_flagged_tiles_summary_reference_fixture(spark):
    # the reference's own sample fixture
    # (tiles/lofar_antenna_state/test.txt: 48 HBA sub-stations on
    # 2016-05-23), expected values from a replica of
    # get_flagged_tiles.py:85-139.
    from lofar_bf_pulsar_scripts_spark.plans.reports import flagged_tiles_summary

    counts = {
        "CS002HBA0": 0, "CS002HBA1": 3, "CS003HBA0": 0, "CS003HBA1": 0,
        "CS004HBA0": 4, "CS004HBA1": 1, "CS005HBA0": 5, "CS005HBA1": 2,
        "CS006HBA0": 0, "CS006HBA1": 2, "CS007HBA0": 2, "CS007HBA1": 0,
        "CS001HBA0": 0, "CS001HBA1": 4, "CS011HBA0": 2, "CS011HBA1": 0,
        "CS013HBA0": 1, "CS013HBA1": 0, "CS017HBA0": 4, "CS017HBA1": 3,
        "CS021HBA0": 3, "CS021HBA1": 4, "CS024HBA0": 0, "CS024HBA1": 2,
        "CS026HBA0": 1, "CS026HBA1": 1, "CS028HBA0": 1, "CS028HBA1": 1,
        "CS030HBA0": 2, "CS030HBA1": 6, "CS031HBA0": 1, "CS031HBA1": 1,
        "CS032HBA0": 4, "CS032HBA1": 3, "CS101HBA0": 5, "CS101HBA1": 1,
        "CS103HBA0": 2, "CS103HBA1": 0, "CS201HBA0": 3, "CS201HBA1": 0,
        "CS301HBA0": 4, "CS301HBA1": 4, "CS302HBA0": 6, "CS302HBA1": 2,
        "CS401HBA0": 3, "CS401HBA1": 8, "CS501HBA0": 4, "CS501HBA1": 3,
    }
    df = spark.createDataFrame(
        [(st, n) for st, n in counts.items()], "substation string, ntiles int"
    )
    row = flagged_tiles_summary(df, antenna="HBA").first()

    # reference replica: all 48 sub-stations are CS -> 24 tiles each
    nflagged = sum(counts.values())
    total = 24 * 48
    worst = max(counts.values())
    st_worst = sorted(s for s, n in counts.items() if n == worst)
    assert row["nflagged"] == nflagged
    assert row["total_tiles"] == total
    assert row["fraction"] == pytest.approx(nflagged / total)
    assert row["worst_ntiles"] == worst == 8
    assert row["worst_stations"] == st_worst == ["CS401HBA1"]
    assert row["worst_fraction"] == pytest.approx(8 / 24.0)
    assert row["summary_line"] == "%g %d %d" % (nflagged / total, nflagged, total)


def test_flagged_tiles_summary_lba_and_class_mix(spark):
    from lofar_bf_pulsar_scripts_spark.plans.reports import flagged_tiles_summary

    rows = [("CS001LBA", 2), ("RS509LBA", 5), ("DE601LBA", 5)]
    df = spark.createDataFrame(rows, "substation string, ntiles int")
    row = flagged_tiles_summary(df, antenna="LBA").first()
    # LBA: CS/RS 48 tiles, international 96 (get_flagged_tiles.py:124)
    assert row["total_tiles"] == 48 + 48 + 96
    assert row["nflagged"] == 12
    # tie at 5 between RS and DE; precedence RS -> /48
    assert row["worst_stations"] == ["DE601LBA", "RS509LBA"]
    assert row["worst_fraction"] == pytest.approx(5 / 48.0)


def test_visibility_window_consistent_with_forward_altaz(spark):
    """Exhaustive grid property: for every (dec, el) case, the alt
    computed by the FORWARD az/el port at LST t is >= el_min exactly
    when t lies inside the rise/set arc (circumpolar: always;
    never_above: never) — the inverse and forward ports agree
    everywhere, not just at the tested spot values."""
    from lofar_bf_pulsar_scripts_spark.functions.coords import (
        LOFAR_LAT_DEG,
        visibility_window,
    )

    ra = 123.45
    cases = spark.createDataFrame(
        [(float(d), float(e)) for d in range(-85, 86, 10)
         for e in (10.0, 30.0, 50.0)],
        "dec_deg double, el double",
    )
    vw = visibility_window(
        F.lit(ra), F.col("dec_deg"), F.lit(LOFAR_LAT_DEG), F.col("el")
    )
    with_w = (
        cases.withColumn("w", vw)
        .withColumn("half", F.explode(F.expr("sequence(0, 47)")))
        .withColumn("lst", F.col("half") / 2.0)
    )
    alt, _ = altaz_from_equatorial(
        F.lit(ra), F.col("dec_deg"), F.col("lst"), F.lit(LOFAR_LAT_DEG)
    )
    # in-arc test on the circle: distance from transit (ra/15) <= ha_h
    dist = F.abs(F.pmod(F.col("lst") - F.lit(ra / 15.0) + 12.0, 24.0) - 12.0)
    checked = with_w.select(
        "dec_deg", "el", "lst", alt.alias("alt"), dist.alias("dist"),
        F.col("w.never_sets").alias("ns"),
        F.col("w.never_above").alias("na"),
        F.col("w.ha_h").alias("ha_h"),
    ).withColumn(
        "violation",
        F.when(F.col("ns"), F.col("alt") < F.col("el") - 0.0011)
        .when(F.col("na"), F.col("alt") > F.col("el") + 0.0011)
        # skip points within 0.02 h of the boundary (bin-edge noise)
        .when(F.abs(F.col("dist") - F.col("ha_h")) < 0.02, F.lit(False))
        .otherwise(
            (F.col("alt") >= F.col("el")) != (F.col("dist") < F.col("ha_h"))
        ),
    )
    bad = checked.filter(F.col("violation")).collect()
    assert bad == [], bad[:5]
