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
