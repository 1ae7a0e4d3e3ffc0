"""Round-11 pipeline fixes: cardinality-dispatched grouped_cumsum
(the sketch_exact_check small-SF regression knob) and the
group_value_buckets driver-state cap (round-10 ADVICE)."""

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
    group_value_buckets,
    grouped_cumsum,
)


def _toy(spark):
    rows = [
        ("a", v % 7, 1) for v in range(200)
    ] + [("b", v % 5, 2) for v in range(100)]
    return spark.createDataFrame(rows, "grp string, v int, c int")


def _canon(df):
    return sorted(
        (r.grp, r.v, r.c, r.cum)
        for r in df.select("grp", "v", "c", "cum").collect()
    )


def test_grouped_cumsum_none_equals_bucketed(spark):
    """n_buckets=None (plain per-group RANGE window) must agree
    row-for-row with the bucketed form on integer sums, heavy ties
    included — the dispatch can never change values."""
    df = _toy(spark)
    a = _canon(grouped_cumsum(df, ["grp"], "v", "c", n_buckets=8))
    b = _canon(grouped_cumsum(df, ["grp"], "v", "c", n_buckets=None))
    assert a == b


def test_grouped_cumsum_auto_dispatch(spark):
    """"auto" takes the window form at or below the threshold (no __b
    machinery in the plan) and the bucketed form above it — and both
    branches agree with each other."""
    df = _toy(spark)
    small = grouped_cumsum(
        df, ["grp"], "v", "c", n_buckets="auto", auto_threshold=10_000
    )
    big = grouped_cumsum(
        df, ["grp"], "v", "c", n_buckets="auto", auto_threshold=1
    )
    assert _canon(small) == _canon(big)
    # the small branch is the plain window: one job, no offsets join
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan[:800]


def test_group_value_buckets_caps_group_cardinality(spark):
    """A high-cardinality grouping must fail fast with an actionable
    message, not degrade the driver with a per-group map literal."""
    df = spark.range(10_000).select(
        F.col("id").cast("string").alias("grp"),
        (F.col("id") % 13).cast("int").alias("v"),
    )
    with pytest.raises(ValueError, match="LOW-cardinality"):
        group_value_buckets(df, ["grp"], "v", 4)


def test_grouped_cumsum_rejects_bad_n_buckets(spark):
    df = _toy(spark)
    with pytest.raises(Exception):
        grouped_cumsum(df, ["grp"], "v", "c", n_buckets="always")
