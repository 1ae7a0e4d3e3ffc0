"""Distributed retrieval executor (lta-retrieve.py semantics): URL
construction, obsid dirs, host-partitioned execution with an injected
fetcher, and the retry manifest."""
import os

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.plans import retrieve as R


def _manifest(spark):
    rows = [
        ("L123456_SAP000_B000_S0_P000_bf.tar", "srm://srm.grid.sara.nl:8443/pnfs/f1"),
        ("L123456_SAP000_B001_S0_P001_bf.tar", "srm://lta-head.lofar.psnc.pl:8443/f2"),
        ("L654321_locus092_17_bf.raw", "srm://dcachepool12.fz-juelich.de:8443/f3"),
        ("L777777_CSplots_summary.tar", "srm://srm.grid.sara.nl:8443/pnfs/f4"),
    ]
    return spark.createDataFrame(rows, "filename string, uri string")


def test_download_url_mirror_mapping(spark):
    got = {
        r.filename: r.url for r in R.retrieval_plan(_manifest(spark)).collect()
    }
    # lta-retrieve.py:210-218 prefix selection
    assert got["L123456_SAP000_B000_S0_P000_bf.tar"].startswith(R.SARA_PREFIX)
    assert got["L123456_SAP000_B001_S0_P001_bf.tar"].startswith(R.POZNAN_PREFIX)
    assert got["L654321_locus092_17_bf.raw"].startswith(R.JUELICH_PREFIX)
    assert got["L123456_SAP000_B000_S0_P000_bf.tar"].endswith(
        "srm://srm.grid.sara.nl:8443/pnfs/f1"
    )


def test_obsid_dir_rule(spark):
    got = {
        r.filename: r.obsid_dir
        for r in R.retrieval_plan(_manifest(spark)).collect()
    }
    # lta-retrieve.py:190-193: '_locus' files take the token after the
    # locus node, others the leading obsid token
    assert got["L654321_locus092_17_bf.raw"] == "17"
    assert got["L123456_SAP000_B000_S0_P000_bf.tar"] == "L123456"
    assert got["L777777_CSplots_summary.tar"] == "L777777"


def test_retrieve_manifest_with_fake_fetcher(spark, tmp_path):
    base = str(tmp_path)

    def fetch(url, dest_dir):
        if "f3" in url:
            return False, 0, "simulated 404"
        d = os.path.join(base, dest_dir)
        os.makedirs(d, exist_ok=True)
        payload = b"x" * (100 + len(url))
        with open(os.path.join(d, url.rsplit("/", 1)[-1]), "wb") as fh:
            fh.write(payload)
        return True, len(payload), None

    m = _manifest(spark)
    res = R.retrieve_manifest(m, fetch, host_parallelism=3)
    rows = {r.filename: r for r in res.collect()}
    assert len(rows) == 4
    assert not rows["L654321_locus092_17_bf.raw"].ok
    assert rows["L654321_locus092_17_bf.raw"].error == "simulated 404"
    ok_rows = [r for r in rows.values() if r.ok]
    assert len(ok_rows) == 3
    for r in ok_rows:
        assert r.nbytes > 100
        assert os.path.isdir(os.path.join(base, r.obsid_dir))

    retry = R.retry_manifest(res, m)
    assert [r.filename for r in retry.collect()] == ["L654321_locus092_17_bf.raw"]


def test_host_partitioning_colocates_mirror(spark):
    plan = R.retrieval_plan(_manifest(spark))
    hosts = {r.download_host for r in plan.collect()}
    assert hosts == {
        "lofar-download.grid.surfsara.nl",
        "lta-download.lofar.psnc.pl",
        "lofar-download.fz-juelich.de",
    }
    # same-host rows land in the same partition after the repartition
    part = (
        plan.repartition(3, "download_host")
        .withColumn("pid", F.spark_partition_id())
        .select("download_host", "pid")
        .distinct()
        .collect()
    )
    by_host = {}
    for r in part:
        by_host.setdefault(r.download_host, set()).add(r.pid)
    assert all(len(pids) == 1 for pids in by_host.values())


def test_staged_retrieval_stream_overlap(spark, tmp_path):
    # staging/download overlap (lta-retrieve.py:482-568): two polls of
    # staged URLs with overlap; the overlapping file downloads once.
    import os

    src = str(tmp_path / "staged")
    sink = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    fetched = str(tmp_path / "data")

    def fetch(url, dest_dir):
        d = os.path.join(fetched, dest_dir)
        os.makedirs(d, exist_ok=True)
        name = url.rsplit("/", 1)[-1]
        with open(os.path.join(d, name), "ab") as fh:
            fh.write(b"y")
        return True, 1, None

    m = _manifest(spark)

    def staged_batch(rows, part):
        spark.createDataFrame(
            rows, "filename string, off double"
        ).withColumn(
            "ts",
            F.expr(
                "timestamp_micros(CAST(1700000000000000 + off * 1000000 AS BIGINT))"
            ),
        ).drop("off").write.mode("append").parquet(src)

    # poll 1: two files staged
    staged_batch(
        [("L123456_SAP000_B000_S0_P000_bf.tar", 1.0),
         ("L777777_CSplots_summary.tar", 2.0)], 0)
    stream = spark.readStream.schema("filename string, ts timestamp").parquet(src)
    q = R.staged_retrieval_stream(stream, m, fetch, sink, ckpt, host_parallelism=2)
    try:
        q.processAllAvailable()
        # poll 2: one repeat + one new
        staged_batch(
            [("L777777_CSplots_summary.tar", 3.0),
             ("L123456_SAP000_B001_S0_P001_bf.tar", 4.0)], 1)
        q.processAllAvailable()
    finally:
        q.stop()

    ledger = spark.read.parquet(sink)
    rows = ledger.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.filename, []).append(r)
    # the repeated file downloaded exactly once across both polls
    assert len(by_file["L777777_CSplots_summary.tar"]) == 1
    assert set(by_file) == {
        "L123456_SAP000_B000_S0_P000_bf.tar",
        "L777777_CSplots_summary.tar",
        "L123456_SAP000_B001_S0_P001_bf.tar",
    }
    assert all(r.ok for r in rows)


def test_transfer_waves_modes(spark):
    # cluster-copy.py concurrency schemes as wave assignment
    rows = [(f"L1_P{i:03d}.raw", f"node{i % 3}") for i in range(9)]
    plan = spark.createDataFrame(rows, "filename string, obsid_dir string")

    all_w = R.transfer_waves(plan, "all").select("wave").distinct().collect()
    assert [r.wave for r in all_w] == [0]

    mx = R.transfer_waves(plan, "max_n", max_in_flight=4).collect()
    waves = {}
    for r in mx:
        waves.setdefault(r.wave, []).append(r.filename)
    assert sorted(waves) == [0, 1, 2]
    assert all(len(v) <= 4 for v in waves.values())
    assert sum(len(v) for v in waves.values()) == 9

    pn = R.transfer_waves(plan, "per_node").collect()
    per = {}
    for r in pn:
        per.setdefault((r.obsid_dir, r.wave), []).append(r.filename)
    # one file per node per wave
    assert all(len(v) == 1 for v in per.values())
    assert max(w for (_, w) in per) == 2  # 3 files per node -> 3 waves

    import pytest as _pt

    with _pt.raises(ValueError):
        R.transfer_waves(plan, "bogus")
