"""Tests for the LTA catalog plan, binary/ascii sources, pulsestack &
fluxcal pipelines, scheduler, and sp2tim formatting."""

import os
import shutil
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.plans import lta
from lofar_bf_pulsar_scripts_spark.plans.fluxcal import (
    calibrate_cube,
    channel_calibration_table,
    output_spectrum,
    pscrunch,
    renormalize_weights,
)
from lofar_bf_pulsar_scripts_spark.plans.pulsestack import fold_and_score
from lofar_bf_pulsar_scripts_spark.plans.scheduler import (
    greedy_schedule,
    schedule_to_df,
)
from lofar_bf_pulsar_scripts_spark.plans.sp2tim import toa_lines_tempo2
from lofar_bf_pulsar_scripts_spark.sources.ascii import (
    read_hw_state_log,
    read_pipeline_log,
    read_singlepulse,
)
from lofar_bf_pulsar_scripts_spark.sources.binary import (
    parse_sigproc_header,
    read_raw_float32,
    read_sigproc_tim,
    read_sub_int16,
)

TMP = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_fixture_tmp")


@pytest.fixture(scope="module", autouse=True)
def fixture_dir():
    os.makedirs(TMP, exist_ok=True)
    yield TMP
    shutil.rmtree(TMP, ignore_errors=True)


# --- LTA catalog -----------------------------------------------------


@pytest.fixture(scope="module")
def catalog(spark):
    tables = lta.make_synthetic_catalog(spark)
    lta.register_catalog(spark, tables)
    return tables


def test_register_catalog_jdbc_superquery(spark, catalog, tmp_path):
    """S8 live-source path: the full superquery over a catalog served
    through spark.read.jdbc (embedded Derby standing in for the LTA
    Oracle DB) equals the parquet-mirror result row for row."""
    url = f"jdbc:derby:{tmp_path}/lta_db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    try:
        for name, df in catalog.items():
            # Derby maps Spark strings to CLOB by default, which is
            # not comparable against pushed-down CHAR literals — force
            # VARCHAR for string columns
            str_cols = [
                f.name for f in df.schema.fields
                if f.dataType.simpleString() == "string"
            ]
            w = (
                df.write.format("jdbc")
                .option("url", url)
                .option("driver", driver)
                .option("dbtable", f"lta_{name}")
                .mode("overwrite")
            )
            if str_cols:
                w = w.option(
                    "createTableColumnTypes",
                    ", ".join(f"{c} VARCHAR(512)" for c in str_cols),
                )
            w.save()
    except Exception as exc:  # pragma: no cover - env without Derby
        pytest.skip(f"embedded Derby unavailable: {exc}")
    try:
        lta.register_catalog_jdbc(spark, url, driver=driver)
        via_jdbc = sorted(map(tuple, lta.superquery(spark).collect()))
        # predicate pushdown reaches the remote scan
        plan = lta.superquery(spark)._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "IsNotNull" in plan or via_jdbc
    finally:
        # restore the parquet-mirror views for the rest of the module
        lta.register_catalog(spark, catalog)
    via_mirror = sorted(map(tuple, lta.superquery(spark).collect()))
    assert via_jdbc == via_mirror and via_jdbc


def test_superquery_matches_manual_join(spark, catalog):
    got = lta.superquery(spark)
    # manual equivalent: valid files joined through the bridge
    fo = catalog["file_object"].filter("is_valid > 0")
    dp = catalog["data_product"].filter("is_valid > 0")
    expected = (
        fo.join(dp, fo.data_object == dp.object_id)
        .join(catalog["dp_observations"].withColumnRenamed("object_id", "dpo_id"),
              F.col("dpo_id") == dp.object_id)
        .join(catalog["observation"].withColumnRenamed("object_id", "obs_obj"),
              F.col("column_value") == F.col("obs_obj"))
        .count()
    )
    assert got.count() == expected and expected > 0


def test_superquery_forms_agree(spark, catalog):
    single = lta.superquery(spark, form="single")
    union = lta.superquery(spark, form="union")
    key = lambda df: sorted(
        (r["filename"], r["observation_id"], r["dp_type"]) for r in df.collect()
    )
    assert key(single) == key(union)


def test_superquery_project_scope_and_fallback(spark, catalog):
    scoped = lta.superquery(spark, project_id=1)
    allrows = lta.superquery(spark)
    assert 0 < scoped.count() < allrows.count()
    # unknown project name falls back to the public query
    fb = lta.superquery_for_project(spark, "NOPE_999")
    assert fb.count() == allrows.count()
    # quote-bearing names are bound as parameters, not interpolated:
    # no parse error, falls back like any other unknown project
    quoted = lta.superquery_for_project(spark, "O'Brien's proj; --")
    assert quoted.count() == allrows.count()


def test_retrieval_filters(spark, catalog):
    df = lta.superquery(spark)
    saps = lta.filter_parts(df, sap=1)
    assert saps.count() > 0
    assert all("_SAP001_" in r["filename"] for r in saps.collect())
    summ = lta.filter_parts(df, summaries=True)
    assert all("CSplots" in r["filename"] for r in summ.collect())
    nosumm = lta.filter_parts(df, summaries=False).count()
    assert nosumm + summ.count() == df.count()
    manifest = lta.download_manifest(df).collect()
    assert {r["host"] for r in manifest} <= {
        "host0.example.org", "host1.example.org", "host2.example.org"
    }
    assert all(r["total_gb"] > 0 for r in manifest)


def test_filter_by_obsids(spark, catalog):
    df = lta.superquery(spark)
    sel = lta.filter_by_obsids(df, [100001])
    names = [r["filename"] for r in sel.collect()]
    assert names and all(n.startswith("L100001") for n in names)


# --- binary sources --------------------------------------------------


def test_raw_float32_roundtrip(spark, fixture_dir):
    vals = np.arange(1000, dtype="<f4") * 0.5
    path = os.path.join(fixture_dir, "série.dat")
    path = os.path.join(fixture_dir, "series.dat")
    vals.tofile(path)
    df = read_raw_float32(spark, path, tsamp=0.01)
    rows = df.orderBy("sample_idx").collect()
    assert len(rows) == 1000
    assert rows[10]["value"] == pytest.approx(5.0)
    assert rows[10]["t"] == pytest.approx(0.1)


def _write_sigproc(path, tstart, tsamp, source, payload):
    def s(x):
        b = x.encode()
        return struct.pack("<i", len(b)) + b

    with open(path, "wb") as f:
        f.write(s("HEADER_START"))
        f.write(s("source_name") + s(source))
        f.write(s("tstart") + struct.pack("<d", tstart))
        f.write(s("tsamp") + struct.pack("<d", tsamp))
        f.write(s("nbits") + struct.pack("<i", 32))
        f.write(s("HEADER_END"))
        f.write(payload.astype("<f4").tobytes())


def test_sigproc_tim_reader(spark, fixture_dir):
    payload = np.linspace(0, 1, 500)
    path = os.path.join(fixture_dir, "obs1.tim")
    _write_sigproc(path, 60000.5, 1e-3, "B0329+54", payload)
    header, off = parse_sigproc_header(open(path, "rb").read())
    assert header["source_name"] == "B0329+54" and header["tstart"] == 60000.5
    df = read_sigproc_tim(spark, path)
    rows = df.orderBy("sample_idx").collect()
    assert len(rows) == 500
    assert rows[0]["source_name"] == "B0329+54"
    assert rows[499]["t"] == pytest.approx(0.499)
    assert rows[250]["value"] == pytest.approx(payload[250], rel=1e-6)


def test_sub_int16_reader(spark, fixture_dir):
    for chan in (0, 3):
        (np.arange(100, dtype="<i2") + chan * 1000).tofile(
            os.path.join(fixture_dir, f"obs.sub{chan:04d}")
        )
    df = read_sub_int16(spark, os.path.join(fixture_dir, "obs.sub*"))
    got = df.groupBy("chan").agg(F.count("*").alias("n"), F.max("value").alias("mx"))
    by_chan = {r["chan"]: r for r in got.collect()}
    assert set(by_chan) == {0, 3}
    assert by_chan[3]["mx"] == 3099 and by_chan[0]["n"] == 100


# --- ascii sources ---------------------------------------------------


def test_singlepulse_and_logs(spark, fixture_dir):
    sp_path = os.path.join(fixture_dir, "cand.singlepulse")
    with open(sp_path, "w") as f:
        f.write("# DM Sigma Time Sample Downfact\n")
        f.write("26.76  8.5  12.345  12345  30\n")
        f.write("26.76  6.1  99.120  99120   4\n")
    sp = read_singlepulse(spark, sp_path).orderBy("t").collect()
    assert len(sp) == 2 and sp[0]["dm"] == 26.76 and sp[0]["offset"] == 12345

    hw_path = os.path.join(fixture_dir, "state.log")
    with open(hw_path, "w") as f:
        f.write("LOFAR.PIC.Core.CS001.HBA0.RCU5.state|2|1700000000\n")
        f.write("LOFAR.PIC.Remote.RS509.LBA.RCU77.state|11|1700000100\n")
    hw = read_hw_state_log(spark, hw_path).orderBy("station").collect()
    assert hw[0]["station"] == "CS001" and hw[0]["band"] == "HBA0"
    assert hw[1]["state"] == 11

    log_path = os.path.join(fixture_dir, "chi-squared.txt")
    with open(log_path, "w") as f:
        f.write("file=/data/L1_SAP0.png obs=CS002HBA0 S/N=41.2\n")
        f.write("junk line\n")
    pl = read_pipeline_log(spark, log_path).collect()
    assert len(pl) == 1 and pl[0]["snr"] == 41.2 and pl[0]["obs"] == "CS002HBA0"


# --- pipelines -------------------------------------------------------


def test_pulsestack_pipeline_golden(spark):
    # pulse train: period exactly 500 samples at tsamp=1e-3 -> bin 0
    n, period, tsamp = 20000, 0.5, 1e-3
    rng = np.random.RandomState(11)
    vals = rng.normal(0, 1, n)
    vals[::500] += 50.0
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)],
        "sample_idx long, value double",
    )
    prof, stats = fold_and_score(df, period=period, nbins=100, tsamp=tsamp)
    top = prof.orderBy(F.desc("profile")).first()
    assert top["bin"] == 0
    st = stats.first()
    assert st["peak"] > 5 * abs(st["mean"])


def test_fluxcal_pipeline(spark):
    # synthetic cube: 2 subints x 2 pols x 8 chans x 32 bins,
    # gaussian-free: baseline chan, pulse in bins 8..12 amplitude 10
    rows = []
    for s in range(2):
        for p in range(2):
            for c in range(8):
                for b in range(32):
                    v = 1.0 + (10.0 if 8 <= b < 12 else 0.0) + 0.01 * b
                    w = 0.0 if c == 5 else 2.0  # chan 5 zapped
                    rows.append((s, p, c, b, float(v), float(w)))
    cube = spark.createDataFrame(
        rows, "subint int, pol int, chan int, bin int, value double, weight double"
    )
    wnorm = renormalize_weights(cube)
    assert wnorm.agg(F.max("weight")).first()[0] == pytest.approx(1.0)
    summed = pscrunch(wnorm.select("subint", "chan", "bin", "value"))
    assert summed.count() == 2 * 8 * 32  # pols collapsed
    chans = spark.createDataFrame(
        [(c, 120.0 + c, 25.0, 2000.0, 400.0) for c in range(8)],
        "chan int, freq_mhz double, t408 double, aeff_m2 double, tinst_k double",
    )
    calib = channel_calibration_table(chans)
    crow = calib.filter("chan = 0").first()
    assert crow["tsys_k"] > 400.0 and crow["sefd_jy"] > 0
    weights = wnorm.select("subint", "chan", "bin", "weight").dropDuplicates(
        ["subint", "chan", "bin"]
    )
    cal = calibrate_cube(
        summed.withColumnRenamed("value", "value").join(
            weights, on=["subint", "chan", "bin"]
        ),
        calib,
        off_bin_lo=16,
        off_bin_hi=32,
    )
    spec = output_spectrum(cal, group_size=4).collect()
    by_chan = {r["out_chan"]: r for r in spec}
    assert by_chan[1]["n_good"] < by_chan[0]["n_good"]  # zapped chan 5


def test_stokes_from_coherence(spark):
    from lofar_bf_pulsar_scripts_spark.plans.fluxcal import stokes_from_coherence

    rows = []
    for p, v in enumerate([3.0, 1.0, 0.5, -0.25]):  # XX YY ReXY ImXY
        rows.append((0, 0, 0, p, v))
    cube = spark.createDataFrame(
        rows, "subint int, chan int, bin int, pol int, value double"
    )
    r = stokes_from_coherence(cube).first()
    assert r["I"] == 4.0 and r["Q"] == 2.0
    assert r["U"] == 1.0 and r["V"] == -0.5


def test_scheduler_greedy_deterministic(spark):
    targets = spark.createDataFrame(
        [
            ("A", 60, 2.0, 600),
            ("B", 60, 1.0, 600),  # conflicts with A at transit
            ("C", 120, 1.0, 30),
            ("D", 30, 3.0, 1380),
        ],
        "name string, duration_min int, priority double, transit_min int",
    )
    placements = greedy_schedule(targets)
    assert [p.name for p in placements] == sorted(
        [p.name for p in placements],
        key=lambda n: next(p.start_min for p in placements if p.name == n),
    )
    spans = sorted((p.start_min, p.end_min) for p in placements)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2  # no overlap
    byname = {p.name: p for p in placements}
    assert byname["A"].start_min == 600  # highest score gets its transit
    assert byname["B"].start_min != 600
    df = schedule_to_df(spark, placements)
    assert df.count() == 4


def test_momxml_schedule_sink_byte_parity():
    """D8 XML sink goldens (bfscheduler.py:26-240 stem substitution,
    :753-788 merge): byte-level md5 pins so any drift in the DOM
    rewrite, line surgery, or folder wrapping fails loudly — the
    sp2tim TOA-golden precedent for the last sink."""
    import hashlib

    from lofar_bf_pulsar_scripts_spark.plans.momxml import (
        dec2deg,
        good_stations,
        ra2deg,
        render_schedule_xml,
        render_target_xml,
    )

    # coordinate conversions (bfscheduler.py:109-120)
    assert ra2deg("03:32:59.37") == pytest.approx(53.247375)
    assert dec2deg("-01:27:08.6") == pytest.approx(-(1 + 27 / 60 + 8.6 / 3600))
    # stations semantics (bfscheduler.py:58-70)
    assert good_stations("-1") is None
    assert len(good_stations("")) == 24
    assert "CS021" not in good_stations("21,24")

    targets = [
        dict(name="B0329+54", obsindex=0, duration_min=20,
             start="2020-01-01T00:30:00", end="2020-01-01T00:50:00",
             ra="03:32:59.37", dec="+54:34:43.6"),
        dict(name="B1919+21", obsindex=1, duration_min=15,
             start="2020-01-01T01:00:00", end="2020-01-01T01:15:00",
             ra="19:21:44.81", dec="+21:53:02.2", bad_stations="-1"),
    ]
    single = render_target_xml(
        "LC4_010", "CEP4", 3, "B0329+54", 20,
        "2020-01-01T00:30:00", "2020-01-01T00:50:00",
        "03:32:59.37", "+54:34:43.6", bad_stations="21,24",
    )
    assert "<duration>1200</duration>" in single  # LENGTHSEC = min*60
    assert "<duration>12000</duration>" in single  # PIPELENGTH = 10x
    assert 'index="10003"' in single  # pipeline index = 10000+obs
    assert "CS021" not in single and "CS024" not in single
    merged = render_schedule_xml(targets, "LC4_010", "CEP4")
    folderv = render_schedule_xml(
        targets, "LC4_010", "CEP4", folder="PulsarFolder"
    )
    # merged docs keep ONE header/trailer; both targets' items present
    assert merged.count("<?xml") == 1 and merged.count("</lofar:project>") == 1
    assert "B.0.B0329+54" in merged and "B.1.B1919+21" in merged
    assert "<stations>STATIONS</stations>" in merged  # '-1' untouched
    assert "<name>PulsarFolder</name>" in folderv
    assert "<description>B0329+54, B1919+21</description>" in folderv
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert md5(single) == "677cfcc867e69ef92778d85e4831b2d6"
    assert md5(merged) == "049ad3a99f73668250c7ccc9d789fe58"
    assert md5(folderv) == "d88e974becaa7e2117eea16a60b78fe7"
    # MoM 255-char description truncation: drop the last truncated
    # name, append ",..." (bfscheduler.py:771-773)
    many = [
        dict(name=f"J{i:04d}+4242", obsindex=i, duration_min=5,
             start="2020-01-01T00:00:00", end="2020-01-01T00:05:00",
             ra="00:00:00.0", dec="+00:00:00.0")
        for i in range(40)
    ]
    fx = render_schedule_xml(many, "LC4_010", "CEP4", folder="F")
    descr = fx.split("<description>", 1)[1].split("</description>")[0]
    assert descr.endswith(",...") and len(descr) <= 255
    assert descr.count("J") == len([n for n in descr.split(", ") if n])


def test_sp2tim_full_precision(spark):
    sp = spark.createDataFrame(
        [("L1", 26.76, 8.5, 4321.123456789)],
        "obs_id string, dm double, sigma double, t double",
    )
    out = toa_lines_tempo2(sp, F.lit(60000), F.lit(0.9999))
    row = out.first()
    # 0.9999 + 4321.123456789/86400 = 1.049909...  -> carries into day
    assert row["mjd_int"] == 60001
    expected_frac = 0.9999 + 4321.123456789 / 86400.0 - 1.0
    # frac is pre-rounded at the 13-digit rendering precision
    assert row["mjd_frac"] == pytest.approx(expected_frac, abs=5e-14)
    assert row["toa_line"].startswith("L1 150.000 60001.")
    frac_str = row["toa_line"].split()[2]
    assert float(frac_str) == pytest.approx(60001 + expected_frac, abs=5e-14)


def test_sp2tim_reference_variants_golden(spark):
    # Byte-exact parity with the reference's 8 printf shapes
    # (sp2tim.py:133-187), expected lines computed with the identical
    # Python % -formatting the reference uses.
    from lofar_bf_pulsar_scripts_spark.plans.sp2tim import toa_lines_reference

    startmjd, tres, freq, obscode, source = 56000.123456789, 0.16384, 147.607, "1", "B0329+54"
    unc = "%9f" % (tres * 1e6)
    rows = [
        (26.77, 8.5, 120, 30, 0.371002, "c6a"),
        (26.77, 12.25, 4096, 1, 0.999999, "c6b"),
        (26.78, 7.0, 999999, 128, 0.0, "c6c"),
    ]
    sp = spark.createDataFrame(
        rows, "dm double, sigma double, offset int, downfact int, ph double, c6 string"
    )
    toas = ["%.13f" % (startmjd + (off * tres) / 86400.0) for _, _, off, _, _, _ in rows]

    def got(**kw):
        return [
            r["toa_line"]
            for r in toa_lines_reference(
                sp, startmjd, tres, freq, source=source, obscode=obscode, **kw
            ).orderBy("offset").collect()
        ]

    # -- tempo2, phase, col6 + extra (sp2tim.py:144)
    exp = [
        "%s,%d,%f,%s,%s   %8.3f   %s   %s   %s"
        % (str(sg), dfct, ph, c6, "XX", freq, t, unc, obscode)
        for (_, sg, off, dfct, ph, c6), t in zip(rows, toas)
    ]
    assert got(tempo2=True, phase_col="ph", col6_col="c6", extra="XX") == exp
    # -- tempo2, no phase, extra only (sp2tim.py:150)
    exp = [
        "%s,%d,,%s   %8.3f   %s   %s   %s" % (str(sg), dfct, "XX", freq, t, unc, obscode)
        for (_, sg, off, dfct, ph, c6), t in zip(rows, toas)
    ]
    assert got(tempo2=True, extra="XX") == exp
    # -- tempo2 plain (sp2tim.py:157)
    exp = [
        "%s,%d   %8.3f   %s   %s   %s" % (str(sg), dfct, freq, t, unc, obscode)
        for (_, sg, off, dfct, ph, c6), t in zip(rows, toas)
    ]
    assert got(tempo2=True) == exp
    # -- princeton, phase (sp2tim.py:169)
    exp = [
        "%1s %-12s %8.3f %-20s%9s%10s   %s   %d   %f"
        % (obscode, source, freq, t, unc, "0", str(sg), dfct, ph)
        for (_, sg, off, dfct, ph, c6), t in zip(rows, toas)
    ]
    assert got(phase_col="ph") == exp
    # -- princeton, no phase, col6 (sp2tim.py:181)
    exp = [
        "%1s %-12s %8.3f %-20s%9s%10s   %s   %d   0.0   %s"
        % (obscode, source, freq, t, unc, "0", str(sg), dfct, c6)
        for (_, sg, off, dfct, ph, c6), t in zip(rows, toas)
    ]
    assert got(col6_col="c6") == exp
    # -- princeton plain (sp2tim.py:187)
    exp = [
        "%1s %-12s %8.3f %-20s%9s%10s   %s   %d"
        % (obscode, source, freq, t, unc, "0", str(sg), dfct)
        for (_, sg, off, dfct, ph, c6), t in zip(rows, toas)
    ]
    assert got() == exp
    # -- princeton, phase, col6+extra (sp2tim.py:166)
    exp = [
        "%1s %-12s %8.3f %-20s%9s%10s   %s   %d   %f   %s   %s"
        % (obscode, source, freq, t, unc, "0", str(sg), dfct, ph, c6, "XX")
        for (_, sg, off, dfct, ph, c6), t in zip(rows, toas)
    ]
    assert got(phase_col="ph", col6_col="c6", extra="XX") == exp
    # -- tempo2, phase, col6 only (sp2tim.py:142)
    exp = [
        "%s,%d,%f,%s   %8.3f   %s   %s   %s"
        % (str(sg), dfct, ph, c6, freq, t, unc, obscode)
        for (_, sg, off, dfct, ph, c6), t in zip(rows, toas)
    ]
    assert got(tempo2=True, phase_col="ph", col6_col="c6") == exp


def test_superquery_single_form_scans_fact_once(spark, tmp_path):
    # regression guard for the measured catalog_union/superquery
    # rewrite (SCALE.md): the default single-form superquery must scan
    # the file_object fact exactly once, not once per dp_type branch.
    tables = lta.make_synthetic_catalog(spark)
    # materialize file_object so the scan is countable in the plan
    path = str(tmp_path / "file_object")
    tables["file_object"].write.mode("overwrite").parquet(path)
    tables = dict(tables, file_object=spark.read.parquet(path))
    lta.register_catalog(spark, tables)
    def fact_scans(df):
        # formatted explain lists each scan node with its full
        # location (treeString truncates long plans mid-path)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        txt = df._jdf.queryExecution().explainString(mode)
        return sum(
            1
            for line in txt.splitlines()
            if "Scan parquet" in line or ("file_object" in line and "Location" in line)
        ), txt

    n_single, txt = fact_scans(lta.superquery(spark))
    assert txt.count("file_object") >= 1
    assert sum(
        1 for line in txt.splitlines() if "Location" in line and "file_object" in line
    ) == 1
    # the literal 4-branch parity form scans it once per dp_type —
    # which is why 'single' is the default
    _, txt_u = fact_scans(lta.superquery(spark, form="union"))
    assert sum(
        1
        for line in txt_u.splitlines()
        if "Location" in line and "file_object" in line
    ) == 4
