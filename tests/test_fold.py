"""Golden + property tests for the fold family (SURVEY §5.3/§5.4).

Golden: a pulse train at known period folds to a delta profile in the
expected bin. Property: fold is invariant under time translation by
k*P (pulsestack.py fold semantics are purely phase-based).
"""

import math

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.fold import (
    fold,
    fold_events,
    fold_subints,
    rotate,
)

P = 1.25
NBINS = 50


def make_series(spark, n=10_000, amp=10.0):
    # Deterministic series: baseline 1.0, pulse amp where phase falls in
    # bin 7. tsamp incommensurate with the bin width so no sample sits
    # on a bin boundary (fp-translation-safe).
    tsamp = P / NBINS * 0.317456
    df = spark.range(n).select(
        (F.col("id") * tsamp).alias("t"),
        F.lit(1.0).alias("value"),
    )
    on = (F.pmod(F.col("t") / P, 1.0) * NBINS).cast("int") == 7
    return df.withColumn("value", F.when(on, amp).otherwise(F.col("value")))


def test_fold_delta_profile(spark):
    df = make_series(spark)
    prof = fold(df, period=P, nbins=NBINS).orderBy("bin").collect()
    assert len(prof) == NBINS
    by_bin = {r["bin"]: r["profile"] for r in prof}
    assert by_bin[7] == pytest.approx(10.0)
    for b, v in by_bin.items():
        if b != 7:
            assert v == pytest.approx(1.0)
    total = sum(r["npts"] for r in prof)
    assert total == 10_000


def test_fold_translation_invariance(spark):
    df = make_series(spark, n=6000)
    base = {r["bin"]: r["profile"] for r in fold(df, P, NBINS).collect()}
    shifted = df.withColumn("t", F.col("t") + F.lit(7 * P))
    shift_prof = {r["bin"]: r["profile"] for r in fold(shifted, P, NBINS).collect()}
    assert set(base) == set(shift_prof)
    for b in base:
        assert base[b] == pytest.approx(shift_prof[b], rel=1e-9)


def test_fold_events_counts(spark):
    # events at exact phase 0.5 + uniform grid background
    n_bg, n_pulse = 1000, 200
    bg = spark.range(n_bg).select((F.col("id") * 0.037).alias("t"))
    pulse = spark.range(n_pulse).select((F.col("id") * P + 0.5 * P).alias("t"))
    counts = {
        r["bin"]: r["nevents"]
        for r in fold_events(bg.union(pulse), P, NBINS).collect()
    }
    assert counts[NBINS // 2] >= n_pulse
    assert sum(counts.values()) == n_bg + n_pulse


def test_fold_subints_partition_of_fold(spark):
    df = make_series(spark, n=9000)
    sub = fold_subints(df, P, NBINS, dump_time=5.0)
    # summing subint (sum = profile*npts) over windows == global fold
    glob = (
        sub.select("bin", (F.col("profile") * F.col("npts")).alias("s"), "npts")
        .groupBy("bin")
        .agg((F.sum("s") / F.sum("npts")).alias("profile"))
    )
    base = {r["bin"]: r["profile"] for r in fold(df, P, NBINS).collect()}
    got = {r["bin"]: r["profile"] for r in glob.collect()}
    for b in base:
        assert got[b] == pytest.approx(base[b], rel=1e-12)


def test_rotate_roundtrip(spark):
    df = make_series(spark, n=3000)
    prof = fold(df, P, NBINS)
    back = rotate(rotate(prof, 13, NBINS), -13, NBINS)
    a = {r["bin"]: r["profile"] for r in prof.collect()}
    b = {r["bin"]: r["profile"] for r in back.collect()}
    assert a == b


def test_rotate_shifts_peak(spark):
    df = make_series(spark, n=3000)
    prof = rotate(fold(df, P, NBINS), 5, NBINS)
    top = prof.orderBy(F.desc("profile")).first()
    assert top["bin"] == (7 + 5) % NBINS


def test_period_search_finds_planted_period(spark):
    """Events planted strictly periodic at P concentrate in one phase
    bin, so sum_sq peaks at P among the trials; a uniform scatter
    scores near the flat-profile floor n^2/nbins."""
    import pytest
    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.operators.fold import period_search

    P = 1_000_000  # 1 s in us
    n = 400
    planted = spark.range(n).select((F.col("id") * P + 123).alias("ts_us"))
    trials = [P - 2_000, P - 1_000, P, P + 1_000, P + 2_000]
    out = {r["period_us"]: r for r in period_search(planted, trials, nbins=16).collect()}
    # at the true period every event lands in ONE bin: sum_sq = n^2
    assert int(out[P]["sum_sq"]) == n * n
    assert out[P]["n_occupied_bins"] == 1
    # every detuned trial spreads the events (smaller sum_sq)
    for p in trials:
        if p != P:
            assert int(out[p]["sum_sq"]) < n * n
        assert out[p]["n_events"] == n
    with pytest.raises(ValueError):
        period_search(planted, [], nbins=16)
    with pytest.raises(ValueError):
        period_search(planted, trials, nbins=1)
