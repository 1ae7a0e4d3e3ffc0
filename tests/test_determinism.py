"""Aggregation-order determinism for the exact-mode operators.

A 1000-executor cluster differs from local[32] (and from DuckDB) in
the ORDER partial aggregates combine — float sums are not associative,
so order can flip the last ulp and, after rounding, a compared digit.
The integer-quantized exact modes exist to kill that class of bug:
these tests assert byte-identical (repr-level) results when the same
input is partitioned completely differently, which is exactly the
degree of freedom a cluster resize exercises.
"""

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.fits import fit_powerlaw
from lofar_bf_pulsar_scripts_spark.operators.qqnorm import qq_stats_sql
from lofar_bf_pulsar_scripts_spark.operators.robust import (
    sigma_clip,
    trimmed_block_stats,
)
from lofar_bf_pulsar_scripts_spark.operators.session import session_stats


def _events(spark, n=4000):
    # hash-spread doubles with many near-boundary values
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.col("id"), 7)).alias("grp"),
        (
            F.sin(F.col("id").cast("double")) * 250.0
            + 250.0
            + F.col("id").cast("double") / 997.0
        ).alias("value"),
        (F.col("id") * 31_415_926_535 % 86_400_000_000).alias("ts_us"),
    )


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


def _assert_partition_invariant(build):
    """build(df) -> result DataFrame; input repartitioned 3 ways."""
    outs = []
    for parts in (1, 7, 64):
        outs.append(_canon(build(parts)))
    assert outs[0] == outs[1] == outs[2]


def test_trimmed_stats_exact_partition_invariant(spark):
    ev = _events(spark)

    def build(parts):
        df = ev.repartition(parts)
        return trimmed_block_stats(
            df, ["grp"], value_col="value", exact_scale=1e3
        )

    _assert_partition_invariant(build)


def test_sigma_clip_exact_partition_invariant(spark):
    ev = _events(spark)

    def build(parts):
        df = ev.repartition(parts)
        out = sigma_clip(
            df, ["grp"], value_col="value", threshold=1.5, rfilimit=None,
            exact_scale=1e3,
        )
        return out.select("event_id", F.round("level", 6).alias("level"))

    _assert_partition_invariant(build)


def test_qq_exact_partition_invariant(spark):
    ev = _events(spark)

    def build(parts):
        df = ev.repartition(parts)
        out = qq_stats_sql(
            df, ["grp"], value_col="value", exact_scales=(1e3, 1e6)
        )
        return out.select(
            "grp",
            F.round("qq_mean", 6).alias("qq_mean"),
            F.round("qq_rms", 6).alias("qq_rms"),
        )

    _assert_partition_invariant(build)


def test_powerlaw_exact_partition_invariant(spark):
    ev = _events(spark).select(
        "grp",
        (F.lit(1.0) + F.pmod(F.col("event_id"), 171)).alias("x"),
        (F.col("value") + 1.0).alias("y"),
    )

    def build(parts):
        df = ev.repartition(parts)
        out = fit_powerlaw(df, "x", "y", group_cols=["grp"], exact_scale=1e6)
        return out.select(
            "grp",
            F.round("index", 6).alias("index"),
            F.round("log_amp", 6).alias("log_amp"),
            F.round("r2", 6).alias("r2"),
            "n_used",
        )

    _assert_partition_invariant(build)


def test_exact_modes_match_float_semantics(spark):
    """The exact modes exist for determinism, not different math: at
    milli/micro quantization their results must agree with the
    engine-native float aggregates to well within the output rounding
    quantum (1e-6)."""
    ev = _events(spark)
    f = trimmed_block_stats(ev, ["grp"], value_col="value")
    e = trimmed_block_stats(ev, ["grp"], value_col="value", exact_scale=1e3)
    ff = {r["grp"]: (r["trim_mean"], r["trim_std"]) for r in f.collect()}
    ee = {r["grp"]: (r["trim_mean"], r["trim_std"]) for r in e.collect()}
    assert ff.keys() == ee.keys()
    for g in ff:
        # quantization error: <=5e-4 per value at 1e3 scale
        assert abs(ff[g][0] - ee[g][0]) < 1e-3
        assert abs(ff[g][1] - ee[g][1]) < 1e-3

    pf = fit_powerlaw(
        ev.select("grp", (F.col("value") + 1.0).alias("x"),
                  (F.col("value") * 2.0 + 3.0).alias("y")),
        "x", "y", group_cols=["grp"],
    ).collect()
    pe = fit_powerlaw(
        ev.select("grp", (F.col("value") + 1.0).alias("x"),
                  (F.col("value") * 2.0 + 3.0).alias("y")),
        "x", "y", group_cols=["grp"], exact_scale=1e6,
    ).collect()
    ff2 = {r["grp"]: (r["index"], r["log_amp"], r["r2"]) for r in pf}
    ee2 = {r["grp"]: (r["index"], r["log_amp"], r["r2"]) for r in pe}
    for g in ff2:
        for a, b in zip(ff2[g], ee2[g]):
            assert abs(a - b) < 1e-4


def test_session_stats_integer_partition_invariant(spark):
    ev = _events(spark)

    def build(parts):
        df = ev.repartition(parts)
        return session_stats(
            df, ["grp"], order_col="ts_us", gap=3_600_000_000,
            tiebreak_col="event_id",
        )

    _assert_partition_invariant(build)


def test_kmeans_assign_update_partition_invariant(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [
        (int(i), [float(x) for x in rng.normal(0, 1, 12)]) for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from lofar_bf_pulsar_scripts_spark.operators.similarity import (
        kmeans_assign,
        kmeans_update,
    )

    cents = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("int").alias("cid"), "embedding"
    )

    def build(parts):
        df = emb.repartition(parts)
        return kmeans_update(kmeans_assign(df, cents))

    _assert_partition_invariant(build)


def test_tfidf_partition_invariant(spark):
    from lofar_bf_pulsar_scripts_spark.operators.text import tfidf_top_terms

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon word"),
            F.pmod(F.col("id"), 17).cast("string"),
            F.lit(" zeta word"),
            F.pmod(F.col("id"), 5).cast("string"),
        ).alias("text"),
    )

    def build(parts):
        return tfidf_top_terms(docs.repartition(parts), top_k=3)

    _assert_partition_invariant(build)


def test_global_rank_partition_invariant(spark):
    from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
        global_rank,
        hex_prefix_bucket,
        shuffle_key,
    )

    base = spark.range(3000).select(F.col("id").alias("doc_id"))

    def build(parts):
        keyed = base.repartition(parts).withColumn(
            "__k", shuffle_key(F.col("doc_id"), 9)
        )
        return global_rank(
            keyed, ["__k", "doc_id"],
            bucket=hex_prefix_bucket(F.col("__k"), 32),
        ).select("doc_id", "rank")

    _assert_partition_invariant(build)


def test_qq_bucketed_rank_matches_window_rank(spark):
    """The bucketed rank (rank_buckets=B) must reproduce the window
    form bit-identically under exact_scales: ranks move only within
    ties, tied values contribute identical integer regression terms.
    Includes duplicated values (ties spanning would-be boundaries) and
    a group smaller than the bucket count."""
    ev = _events(spark).withColumn(
        "value", F.round(F.col("value"), 1)  # force many exact ties
    )
    tiny = spark.range(3).select(
        F.col("id").alias("event_id"),
        F.lit(99).alias("grp"),
        (F.col("id") * 1.5).alias("value"),
        F.lit(0).alias("ts_us"),
    )
    df = ev.unionByName(tiny)

    def run(buckets):
        out = qq_stats_sql(
            df, ["grp"], value_col="value", exact_scales=(1e3, 1e6),
            rank_buckets=buckets,
            # the size-adaptive switch (bucket_min_rows) would send a
            # fixture-sized input to the window form -- force the
            # bucketed path so the parity claim stays tested
            bucket_min_rows=0,
        )
        return _canon(
            out.select(
                "grp",
                F.round("qq_mean", 6).alias("qq_mean"),
                F.round("qq_rms", 6).alias("qq_rms"),
            )
        )

    window_form = run(None)
    assert run(8) == window_form
    assert run(32) == window_form


def test_qq_bucketed_rank_partition_invariant(spark):
    ev = _events(spark)

    def build(parts):
        df = ev.repartition(parts)
        out = qq_stats_sql(
            df, ["grp"], value_col="value", exact_scales=(1e3, 1e6),
            rank_buckets=16, bucket_min_rows=0,
        )
        return out.select(
            "grp",
            F.round("qq_mean", 6).alias("qq_mean"),
            F.round("qq_rms", 6).alias("qq_rms"),
        )

    _assert_partition_invariant(build)


def test_grouped_rank_n_is_a_true_per_group_rank(spark):
    """Ranks are a permutation of 1..n per group with ties ordered
    arbitrarily but values non-decreasing along the rank."""
    from lofar_bf_pulsar_scripts_spark.operators.qqnorm import (
        _grouped_rank_n,
    )

    ev = _events(spark, n=500)
    out = _grouped_rank_n(ev, ["grp"], "value", 8)
    rows = out.select("grp", "value", "__i", "__n").collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.grp, []).append((r["__i"], r.value, r["__n"]))
    for grp, items in by_grp.items():
        items.sort()
        n = len(items)
        assert [i for i, _, _ in items] == list(range(1, n + 1))
        assert all(nn == n for _, _, nn in items)
        vals = [v for _, v, _ in items]
        assert vals == sorted(vals)


def test_grouped_cumsum_matches_window_form(spark):
    """grouped_cumsum must equal the plain per-group RANGE-frame
    cumulative window row-for-row, tied order values included."""
    from pyspark.sql import Window

    from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
        grouped_cumsum,
    )

    df = _events(spark, n=3000).select(
        "grp",
        F.round(F.col("value"), 0).alias("v"),  # heavy ties
        (F.pmod(F.col("event_id"), 13) + 1).alias("c"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expect = _canon(df.withColumn("cum", F.sum("c").over(w)))
    for buckets in (1, 8, 64):
        got = _canon(
            grouped_cumsum(df, ["grp"], "v", "c", n_buckets=buckets)
        )
        assert got == expect, f"buckets={buckets}"


def test_grouped_cumsum_partition_invariant(spark):
    from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
        grouped_cumsum,
    )

    ev = _events(spark).select(
        "grp", F.col("value").alias("v"), F.lit(1).alias("c")
    )

    def build(parts):
        return grouped_cumsum(
            ev.repartition(parts), ["grp"], "v", "c", n_buckets=16
        )

    _assert_partition_invariant(build)


def test_bucketed_forms_handle_null_order_values(spark):
    """NULL order values take bucket -1 (the NULLS FIRST position):
    ranks/cumsums must match the window forms row-for-row even when a
    group mixes NULLs and values."""
    from pyspark.sql import Window

    from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
        grouped_cumsum,
    )
    from lofar_bf_pulsar_scripts_spark.operators.qqnorm import (
        _grouped_rank_n,
    )

    df = _events(spark, n=800).select(
        "grp",
        F.when(F.pmod(F.col("event_id"), 5) == 0, F.lit(None)).otherwise(
            F.round(F.col("value"), 0)
        ).alias("v"),
        F.lit(1).alias("c"),
    )
    # rank: per-group permutation with NULLs occupying the lowest ranks
    ranked = _grouped_rank_n(df, ["grp"], "v", 8)
    rows = ranked.select("grp", "v", "__i", "__n").collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.grp, []).append((r["__i"], r.v))
    for grp, items in by_grp.items():
        items.sort(key=lambda t: t[0])
        n = len(items)
        assert [i for i, _ in items] == list(range(1, n + 1))
        null_ranks = [i for i, v in items if v is None]
        assert null_ranks == list(range(1, len(null_ranks) + 1)), grp
        vals = [v for _, v in items if v is not None]
        assert vals == sorted(vals)
    # cumsum: row-for-row identical to the window form (Spark windows
    # order NULLS FIRST by default, matching bucket -1)
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expect = _canon(df.withColumn("cum", F.sum("c").over(w)))
    got = _canon(grouped_cumsum(df, ["grp"], "v", "c", n_buckets=8))
    assert got == expect


def test_grouped_cumsum_null_and_colliding_group_keys(spark):
    """Round-10 review fixes, pinned: a NULL group must NOT merge with
    the empty string (concat_ws dropped null args), multi-column keys
    ('a', NULL) / (NULL, 'a') must stay distinct, and a float sum_col
    must work at all (the int-0 offset seed crashed createDataFrame
    under the double schema)."""
    from pyspark.sql import Window

    from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
        grouped_cumsum,
    )

    df = spark.createDataFrame(
        [
            (None, None, 2.0, 1),
            (None, None, 4.0, 1),
            ("", "", 2.0, 1),
            ("", "", 4.0, 1),
            ("a", None, 1.0, 1),
            (None, "a", 1.0, 1),
            ("a", "a", 3.0, 1),
        ],
        "g1 string, g2 string, v double, c int",
    )
    w = (
        Window.partitionBy("g1", "g2")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expect = _canon(df.withColumn("cum", F.sum("c").over(w)))
    got = _canon(grouped_cumsum(df, ["g1", "g2"], "v", "c", n_buckets=4))
    assert got == expect

    # float sum_col: dyadic values make every partial sum exact, so
    # the bucketed form must equal the window form bit-for-bit here
    fdf = df.withColumn("c", F.col("c") * F.lit(0.5))
    expectf = _canon(fdf.withColumn("cum", F.sum("c").over(w)))
    gotf = _canon(grouped_cumsum(fdf, ["g1", "g2"], "v", "c", n_buckets=4))
    assert gotf == expectf


def test_grouped_cumsum_rejects_decimal_before_any_job(spark):
    import pytest as _pytest

    from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
        grouped_cumsum,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1)], "g string, v double, c int"
    ).withColumn("c", F.col("c").cast("decimal(10,2)"))
    with _pytest.raises(TypeError, match="decimal"):
        grouped_cumsum(df, ["g"], "v", "c")
