"""Regression tests for the code-review findings (NULL handling,
pattern safety, collision guards, rounding carry, linear detrend)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.asof import asof_join
from lofar_bf_pulsar_scripts_spark.operators.dedup import (
    candidate_pairs,
    exact_duplicate_groups,
    lsh_buckets,
    minhash_signature,
)
from lofar_bf_pulsar_scripts_spark.operators.robust import detrend_normalize
from lofar_bf_pulsar_scripts_spark.plans import lta
from lofar_bf_pulsar_scripts_spark.plans.reports import validated_station_join
from lofar_bf_pulsar_scripts_spark.plans.sp2tim import toa_lines_tempo2


def test_exact_dedup_null_columns_do_not_collide(spark):
    df = spark.createDataFrame(
        [(0, "x", None), (1, None, "x"), (2, "x", None)],
        "doc_id long, a string, b string",
    )
    groups = exact_duplicate_groups(df, ["a", "b"], "doc_id").collect()
    assert len(groups) == 2  # (x, NULL) twice; (NULL, x) once
    dups = [g for g in groups if g["n_dups"] == 2]
    assert len(dups) == 1 and dups[0]["keep_id"] == 0


def test_lsh_excludes_shingleless_docs(spark):
    docs = spark.createDataFrame(
        [(0, "one two"), (1, "a b"), (2, "x"),  # all < 3 tokens
         (3, "the quick brown fox jumps")],
        "doc_id long, text string",
    )
    sigs = minhash_signature(docs, num_hashes=4)
    buckets = lsh_buckets(sigs, "doc_id", bands=2, rows_per_band=2)
    ids = {r["doc_id"] for r in buckets.select("doc_id").distinct().collect()}
    assert ids == {3}  # short docs excluded, no shared '' bucket
    pairs = candidate_pairs(buckets, "doc_id").collect()
    assert pairs == []


def test_filter_by_obsids_empty_and_prefix(spark):
    tables = lta.make_synthetic_catalog(spark)
    lta.register_catalog(spark, tables)
    df = lta.superquery(spark)
    assert lta.filter_by_obsids(df, []).count() == 0
    # 10000 must not prefix-match L100001_*
    assert lta.filter_by_obsids(df, [10000]).count() == 0
    assert lta.filter_by_obsids(df, [100001]).count() > 0


def test_asof_join_rejects_column_collision(spark):
    left = spark.createDataFrame([("A", 1.0, 2.0)], "sym string, t double, px double")
    right = spark.createDataFrame([("A", 0.5, 3.0)], "sym string, qt double, px double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["sym"], "t", "qt", ["px"])


def test_detrend_linear_mode_removes_slope(spark):
    rng = np.random.RandomState(41)
    n = 2000
    # strong linear drift inside each 1000-sample chunk
    vals = rng.normal(0, 1, n) + np.arange(n) * 0.05
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)],
        "sample_idx long, value double",
    )
    lin = detrend_normalize(df, detrendlen=1000, fast=False)
    res = np.array(
        [r["value"] for r in lin.orderBy("sample_idx").collect()]
    )
    # linear mode: residuals are flat — no correlation with index
    halves = abs(res[:500].mean() - res[500:1000].mean())
    assert halves < 0.5
    fastres = np.array(
        [r["value"] for r in detrend_normalize(df, detrendlen=1000, fast=True)
         .orderBy("sample_idx").collect()]
    )
    fast_halves = abs(fastres[:500].mean() - fastres[500:1000].mean())
    assert halves < fast_halves  # median mode leaves the in-chunk trend


def test_sp2tim_rounding_carry(spark):
    # frac so close to 1.0 that %.13f would round it up
    sp = spark.createDataFrame(
        [("L1", 1.0, 1.0, 0.0)], "obs_id string, dm double, sigma double, t double"
    )
    out = toa_lines_tempo2(sp, F.lit(60000), F.lit(0.99999999999999995)).first()
    assert out["mjd_int"] == 60001
    assert out["mjd_frac"] == 0.0
    assert " 60001.0000000000000 " in out["toa_line"]


def test_validated_join_custom_payload(spark):
    obs = spark.createDataFrame([("d", "CS001")], "date string, station string")
    flagged = spark.createDataFrame(
        [("d", "CS001HBA0", 7, "x")],
        "date string, substation string, bad_count int, note string",
    )
    row = validated_station_join(obs, flagged).first()
    assert row["match_status"] == "ok"
    assert row["bad_count"] == 7 and row["note"] == "x"


# --- round-6 advice fixes --------------------------------------------


def test_mg_reduce_merge_trim_preserves_heavy_hitter():
    """The merge trim must decrement by the k-th LARGEST counter
    (bound n/k), not the (k-1)-th: with k=4 and counts
    {a:10, b:4, c:4, d:4, e:1}, n=23 so n/k=5.75 — item b/c/d at 4
    may go, but the old (k-1)-th-largest cut (=4) also subtracted 4
    from everyone, evicting any item at exactly the cut and dragging
    a's bound down by 4 > what the n/k proof allows once counts sit
    in (n/k, n/(k-1)]. Adversarial case: {a:7, b:6, c:6, d:2, e:2},
    n=23, k=4 -> n/k=5.75 < 6 <= n/(k-1)=7.67: b and c MUST survive."""
    from lofar_bf_pulsar_scripts_spark.operators.sketches import _mg_reduce

    merged = _mg_reduce({"a": 7, "b": 6, "c": 6, "d": 2, "e": 2}, k=4)
    assert len(merged) <= 3
    # cut = 4th largest = 2 -> decrement bounded by n/k
    assert merged == {"a": 5, "b": 4, "c": 4}
    for item in ("a", "b", "c"):
        assert item in merged


def test_casa_beamcorr_nonuniform_grid_falls_back_to_exact_fold(spark):
    from pyspark.sql import Row

    from lofar_bf_pulsar_scripts_spark import caldata

    # deliberately NON-uniform grid: the O(1) comb probe would pick a
    # wrong row for 118.0 (uniform delta ~ (200-100)/3 = 33.3 puts
    # idx near 1, but the true nearest of {100,105,110,200} is 110)
    bc = spark.createDataFrame(
        [
            Row(station="XX001", freq_mhz=f, factor=10.0 * f)
            for f in (100.0, 105.0, 110.0, 200.0)
        ]
    )
    df = spark.createDataFrame(
        [Row(station="XX001", freq_mhz=f) for f in (118.0, 102.4, 102.5, 199.0, 500.0)]
    )
    got = {
        r["freq_mhz"]: r["casa_factor"]
        for r in caldata.attach_casa_beamcorr(df, bc).collect()
    }
    assert got[118.0] == 1100.0
    assert got[102.4] == 1000.0
    assert got[102.5] == 1000.0  # tie -> lower table frequency
    assert got[199.0] == 2000.0
    assert got[500.0] == 2000.0


def test_casa_beamcorr_single_row_grid_returns_that_row(spark):
    from pyspark.sql import Row

    from lofar_bf_pulsar_scripts_spark import caldata

    bc = spark.createDataFrame([Row(station="XX001", freq_mhz=150.0, factor=7.0)])
    df = spark.createDataFrame([Row(station="XX001", freq_mhz=1.0)])
    got = caldata.attach_casa_beamcorr(df, bc).first()
    assert got["casa_factor"] == 7.0


def test_bloom_positions_rejects_m_beyond_hash_range(spark):
    from lofar_bf_pulsar_scripts_spark.operators.dedup import bloom_positions

    with pytest.raises(ValueError, match="2\\^28"):
        bloom_positions(F.lit("x"), (1 << 28) + 1)
    # at the ceiling it's fine
    bloom_positions(F.lit("x"), 1 << 28)


def test_training_shards_publish_no_bookkeeping_columns(spark, tmp_path):
    from lofar_bf_pulsar_scripts_spark.plans.lake import write_training_shards

    df = spark.range(50).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("payload")
    )
    out = str(tmp_path / "shards")
    manifest = write_training_shards(df, out, docs_per_shard=20).collect()
    cols = set(spark.read.parquet(out).columns)
    assert cols == {"doc_id", "payload", "shard"}
    assert [r["n_docs"] for r in manifest] == [20, 20, 10]
    assert [(r["min_rank"], r["max_rank"]) for r in manifest] == [
        (1, 20), (21, 40), (41, 50)
    ]


def test_caldata_manifest_staleness_check(tmp_path, monkeypatch):
    import shutil

    from lofar_bf_pulsar_scripts_spark import caldata

    fake = tmp_path / "data"
    shutil.copytree(caldata.DATA_DIR, fake)
    # corrupt one artifact without refreshing the manifest
    p = fake / "tinst_poly.parquet"
    p.write_bytes(p.read_bytes() + b"\x00")
    monkeypatch.setattr(caldata, "DATA_DIR", str(fake))
    monkeypatch.setattr(caldata, "_MANIFEST_OK", set())
    with pytest.raises(ValueError, match="does not match"):
        caldata._verify_packaged("tinst_poly.parquet")
    # untouched artifacts still verify
    assert caldata._verify_packaged("stations.parquet").endswith("stations.parquet")
