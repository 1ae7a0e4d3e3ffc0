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
