"""Property-based tests (SURVEY §5.4) with hypothesis: fold/rebin/
rotate/scrunch algebraic invariants."""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.fold import fold, rotate
from lofar_bf_pulsar_scripts_spark.operators.raster import rebin

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    shift=st.integers(min_value=-100, max_value=100),
    nbins=st.integers(min_value=2, max_value=64),
)
@_settings
def test_rotate_inverse_property(spark, shift, nbins):
    df = spark.createDataFrame(
        [(b, float(b * b % 17)) for b in range(nbins)], "bin int, profile double"
    )
    back = rotate(rotate(df, shift, nbins), -shift, nbins)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


@given(
    k=st.integers(min_value=2, max_value=5),
    m=st.integers(min_value=2, max_value=4),
)
@_settings
def test_rebin_composition_counts(spark, k, m):
    # rebin(k) then rebin(m) over blocks == rebin(k*m) for COUNTS
    # always, and for sums (mean*count) by associativity
    n = 240
    df = spark.createDataFrame(
        [(i, float((i * 7) % 13)) for i in range(n)],
        "sample_idx long, value double",
    )
    once = rebin(df, k * m)
    r1 = rebin(df, k).select(
        F.col("block").alias("sample_idx"),
        (F.col("value") * F.col("npts")).alias("sum1"),
        "npts",
    )
    twice = (
        r1.groupBy(F.floor(F.col("sample_idx") / m).cast("bigint").alias("block"))
        .agg(F.sum("sum1").alias("sum2"), F.sum("npts").alias("npts"))
    )
    a = {r["block"]: (r["value"] * r["npts"], r["npts"]) for r in once.collect()}
    b = {r["block"]: (r["sum2"], r["npts"]) for r in twice.collect()}
    assert set(a) == set(b)
    for blk in a:
        assert a[blk][1] == b[blk][1]
        assert a[blk][0] == pytest.approx(b[blk][0], rel=1e-12)


@given(periods=st.integers(min_value=1, max_value=9))
@_settings
def test_fold_total_mass_conserved(spark, periods):
    # sum(profile * npts) over bins == sum(value): folding never loses
    # or duplicates samples, for any period
    n = 500
    df = spark.createDataFrame(
        [((i * 0.0317), float(1 + (i % 5))) for i in range(n)],
        "t double, value double",
    )
    prof = fold(df, period=float(periods) * 0.77, nbins=16)
    total = prof.select(
        F.sum(F.col("profile") * F.col("npts")).alias("s"),
        F.sum("npts").alias("n"),
    ).first()
    assert total["n"] == n
    expected = sum(1 + (i % 5) for i in range(n))
    assert total["s"] == pytest.approx(expected, rel=1e-12)


@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=10),
    buckets=st.sampled_from([1, 4, 16, 64]),
)
@_settings
def test_global_rank_is_permutation_and_bucket_invariant(
    spark, n, seed, buckets
):
    from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
        global_rank,
        hex_prefix_bucket,
        shuffle_key,
    )

    df = spark.range(n).select(F.col("id").alias("doc_id"))
    keyed = df.withColumn("__k", shuffle_key(F.col("doc_id"), seed))
    got = {
        r["doc_id"]: r["rank"]
        for r in global_rank(
            keyed, ["__k", "doc_id"],
            bucket=hex_prefix_bucket(F.col("__k"), buckets),
        ).collect()
    }
    # exact permutation of 1..n
    assert sorted(got.values()) == list(range(1, n + 1))
    # rank order equals the key order (bucket count must not matter)
    by_key = [
        r["doc_id"] for r in keyed.orderBy("__k", "doc_id").collect()
    ]
    assert [got[d] for d in by_key] == list(range(1, n + 1))


@given(nb=st.sampled_from([2, 8, 32, 256]))
@_settings
def test_hex_prefix_bucket_is_monotone(spark, nb):
    from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
        hex_prefix_bucket,
        shuffle_key,
    )

    df = spark.range(500).select(
        shuffle_key(F.col("id"), 1).alias("k")
    ).withColumn("b", hex_prefix_bucket(F.col("k"), nb))
    rows = df.orderBy("k").collect()
    bs = [r["b"] for r in rows]
    assert bs == sorted(bs)          # monotone in key order
    assert all(0 <= b < nb for b in bs)


def test_sketch_estimates_within_published_bounds(spark):
    """Quantitative check for the rows-only approx_sketches gate: the
    HLL distinct estimate stays within 3x the configured relative
    standard deviation (Spark default rsd = 0.05), and the GK
    percentile_approx(accuracy=1000) result respects its published
    rank guarantee (rank error <= n/accuracy) against the exact
    sorted values."""
    import math

    from lofar_bf_pulsar_scripts_spark.tables import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.01")
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", F.lit(0.95), F.lit(1000)).alias(
                "p95"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("users"))
        .collect()
    }
    assert approx and set(approx) == set(exact)
    vals_by_type = {}
    for r in ev.select("event_type", "value").collect():
        vals_by_type.setdefault(r["event_type"], []).append(r["value"])
    for etype, a in approx.items():
        rel = abs(a["approx_users"] - exact[etype]["users"]) / exact[etype][
            "users"
        ]
        assert rel <= 3 * 0.05, (etype, rel)  # 3 sigma of default rsd
        vals = sorted(vals_by_type[etype])
        n = len(vals)
        assert n == a["n"]
        # GK rank guarantee at accuracy=1000: rank error <= ceil(n *
        # 1/accuracy); +1 covers duplicate-value rank boundaries
        tol = math.ceil(n / 1000) + 1
        target = math.ceil(0.95 * n)
        lo = vals[max(0, target - tol - 1)]
        hi = vals[min(n - 1, target + tol - 1)]
        assert lo <= a["p95"] <= hi, (etype, lo, a["p95"], hi)


def test_misra_gries_guarantees(spark):
    """The two classical MG guarantees against exact counts on a
    Zipf-like corpus, plus the k-counter memory bound."""
    import pytest
    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.operators.sketches import misra_gries

    # Zipf-ish: item i appears ~ N/(i+1) times, shuffled deterministically
    n_items, reps = 200, 12000
    df = (
        spark.range(reps)
        .select(
            F.floor(
                F.pow(F.lit(float(n_items)), F.pmod(F.xxhash64("id"), 10000) / 10000.0)
            ).cast("long").cast("string").alias("item")
        )
    )
    exact = {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    n = sum(exact.values())
    k = 32
    summary = dict(misra_gries(df, "item", k=k))
    # memory bound: at most k-1 survivors
    assert len(summary) <= k - 1
    # guarantee 1: every item with true freq > n/k is present
    for item, cnt in exact.items():
        if cnt > n / k:
            assert item in summary, (item, cnt, n / k)
    # guarantee 2: reported counts lower-bound truth by at most n/k
    for item, est in summary.items():
        assert est <= exact[item]
        assert exact[item] - est <= n / k
    with pytest.raises(ValueError):
        misra_gries(df, "item", k=1)
