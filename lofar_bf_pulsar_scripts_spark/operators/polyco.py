"""Polyco-driven time-varying fold (SURVEY §2.1 S11, §7.3 hard item 2).

The reference folds with a period re-evaluated per block from a TEMPO
polyco ephemeris (/root/reference/pulsestack.py:43-44,463-483,577-578
via the external ``polycos`` module). The polyco format is public
(TEMPO/TEMPO2 documentation): an ephemeris is a set of segments, each
valid around a mid-time TMID with reference phase RPHASE, reference
spin frequency F0 and Chebyshev-free polynomial COEFFs such that, with
dt = (t - tmid) in MINUTES:

    phase(t) = RPHASE + dt*60*F0 + c1 + c2*dt + c3*dt^2 + ...
    freq(t)  = F0 + (1/60) * (c2 + 2*c3*dt + 3*c4*dt^2 + ...)   [Hz]

Spark design: the segment table is tiny (one row per ~hour of
ephemeris) -> broadcast; each sample picks the nearest-TMID segment
(J4 nearest-key pattern), then phase is a pure column polynomial
(Horner) — the fold stays a map-side projection + small hash
aggregation even with a drifting period.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F, types as T

POLYCO_SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("seg_id", T.IntegerType(), False),
        T.StructField("tmid", T.DoubleType(), False),  # seconds (same clock as t)
        T.StructField("rphase", T.DoubleType(), False),
        T.StructField("f0", T.DoubleType(), False),  # Hz
        T.StructField("coeffs", T.ArrayType(T.DoubleType()), False),
        T.StructField("span_s", T.DoubleType(), False),
    ]
)


def _horner(coeffs: Column, x: Column) -> Column:
    """Evaluate sum_i coeffs[i] * x^i (i from 0) via a reverse fold."""
    return F.aggregate(
        F.reverse(coeffs), F.lit(0.0), lambda acc, c: acc * x + c
    )


def polyco_phase(t: Column, tmid: Column, rphase: Column, f0: Column, coeffs: Column) -> Column:
    dt_min = (t - tmid) / F.lit(60.0)
    return rphase + dt_min * F.lit(60.0) * f0 + _horner(coeffs, dt_min)


def polyco_freq(t: Column, tmid: Column, f0: Column, coeffs: Column) -> Column:
    """Instantaneous spin frequency: F0 + d(poly)/dt / 60."""
    dt_min = (t - tmid) / F.lit(60.0)
    deriv = F.aggregate(
        F.reverse(F.slice(coeffs, 2, F.greatest(F.size(coeffs) - 1, F.lit(0)))),
        F.struct(F.lit(0.0).alias("acc"), (F.size(coeffs) - 1).cast("double").alias("i")),
        lambda st, c: F.struct(
            (st["acc"] * dt_min + c * st["i"]).alias("acc"),
            (st["i"] - 1).alias("i"),
        ),
        lambda st: st["acc"],
    )
    return f0 + deriv / F.lit(60.0)


#: Above this many segments the literal-array plan is abandoned for a
#: broadcast bucket join: a 500-element literal struct array is an
#: O(N_seg) expression PER ROW and a Catalyst tree that blows codegen
#: limits long before a 100x scale-up.
LITERAL_SEGMENT_LIMIT = 32


def _nearest_in_array(arr: Column, t: Column) -> Column:
    """Fold an ascending-tmid array of segment structs down to the one
    nearest t (strict <, so ties keep the earlier segment — the same
    tie-break as the literal path)."""
    return F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, s: F.when(
            F.abs(t - s["tmid"]) < F.abs(t - acc["tmid"]), s
        ).otherwise(acc),
    )


def _bucketed_candidates(spark, segs, width: float):
    """Dimension table (bucket -> ascending array of candidate segment
    structs). Each segment lands in buckets floor(tmid/W)-1..+1; with
    W >= the max adjacent-tmid gap, every sample's nearest segment is
    guaranteed inside its own (clamped) bucket's candidate list."""
    from collections import defaultdict

    by_bucket: dict[int, list] = defaultdict(list)
    for r in segs:
        b0 = int(math.floor(float(r["tmid"]) / width))
        for db in (-1, 0, 1):
            by_bucket[b0 + db].append(r)
    rows = [
        (
            b,
            [
                (
                    float(r["tmid"]),
                    float(r["rphase"]),
                    float(r["f0"]),
                    [float(c) for c in r["coeffs"]],
                    int(r["seg_id"]),
                )
                for r in sorted(cands, key=lambda r: r["tmid"])
            ],
        )
        for b, cands in by_bucket.items()
    ]
    seg_struct = T.StructType(
        [
            T.StructField("tmid", T.DoubleType(), False),
            T.StructField("rphase", T.DoubleType(), False),
            T.StructField("f0", T.DoubleType(), False),
            T.StructField("coeffs", T.ArrayType(T.DoubleType()), False),
            T.StructField("seg", T.IntegerType(), False),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("__bucket", T.LongType(), False),
            T.StructField("__cands", T.ArrayType(seg_struct), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def attach_polyco(
    df: DataFrame,
    segments: DataFrame,
    t_col: str = "t",
) -> DataFrame:
    """Assign each sample the nearest-TMID segment and compute its
    phase/freq columns.

    Short ephemerides (<= LITERAL_SEGMENT_LIMIT segments — the common
    case, one row per ~hour of observation) are collected into a
    LITERAL struct array and the nearest pick is a map-side fold over
    that array: no join, no groupBy, no shuffle of the fact table at
    all (the groupBy-on-fact alternative would re-shuffle 100 TB to
    deduplicate the cross join).

    Longer ephemerides (multi-week observations: 10^2-10^3 segments)
    switch to a broadcast bucket join: segments are bucketed on
    floor(tmid/W) with W = the max adjacent-tmid gap, each segment
    replicated into its three neighbouring buckets dimension-side, and
    every sample hash-joins its clamped bucket against that broadcast
    dim, then folds over the O(1)-length candidate array. Same
    zero-fact-shuffle property, constant-size Catalyst plan regardless
    of ephemeris length."""
    segs = sorted(segments.collect(), key=lambda r: r["tmid"])
    if not segs:
        raise ValueError("empty polyco segment table")
    t = F.col(t_col)

    if len(segs) > LITERAL_SEGMENT_LIMIT:
        spark = df.sparkSession
        tmids = [float(r["tmid"]) for r in segs]
        width = max(
            max((b - a) for a, b in zip(tmids, tmids[1:])),
            max(float(r["span_s"]) for r in segs)
            if "span_s" in segments.columns
            else 0.0,
            1.0,
        )
        bmin = int(math.floor(tmids[0] / width))
        bmax = int(math.floor(tmids[-1] / width))
        dim = _bucketed_candidates(spark, segs, width)
        bucket = F.least(
            F.greatest(F.floor(t / F.lit(width)), F.lit(bmin)), F.lit(bmax)
        ).cast("long")
        joined = df.withColumn("__bucket", bucket).join(
            F.broadcast(dim), "__bucket", "inner"
        )
        best = _nearest_in_array(F.col("__cands"), t)
        return joined.withColumn("__b", best).select(
            *df.columns,
            F.col("__b.seg").alias("seg_id"),
            polyco_phase(
                t, F.col("__b.tmid"), F.col("__b.rphase"), F.col("__b.f0"),
                F.col("__b.coeffs"),
            ).alias("phase"),
            polyco_freq(
                t, F.col("__b.tmid"), F.col("__b.f0"), F.col("__b.coeffs")
            ).alias("freq_hz"),
        )

    lit_seg = lambda r: F.struct(
        F.lit(float(r["tmid"])).alias("tmid"),
        F.lit(float(r["rphase"])).alias("rphase"),
        F.lit(float(r["f0"])).alias("f0"),
        F.array(*[F.lit(float(c)) for c in r["coeffs"]]).alias("coeffs"),
        F.lit(int(r["seg_id"])).alias("seg"),
    )
    if len(segs) == 1:
        best = lit_seg(segs[0])
    else:
        arr = F.array(*[lit_seg(r) for r in segs[1:]])
        best = F.aggregate(
            arr,
            lit_seg(segs[0]),
            lambda acc, s: F.when(
                F.abs(t - s["tmid"]) < F.abs(t - acc["tmid"]), s
            ).otherwise(acc),
        )
    return df.withColumn("__b", best).select(
        *df.columns,
        F.col("__b.seg").alias("seg_id"),
        polyco_phase(
            t, F.col("__b.tmid"), F.col("__b.rphase"), F.col("__b.f0"),
            F.col("__b.coeffs"),
        ).alias("phase"),
        polyco_freq(t, F.col("__b.tmid"), F.col("__b.f0"), F.col("__b.coeffs")).alias(
            "freq_hz"
        ),
    )


def polyco_fold(
    df: DataFrame,
    segments: DataFrame,
    nbins: int,
    t_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Fold with a drifting period: bin = floor(frac(phase)*nbins).
    One broadcast nearest-segment pick + one hash aggregation — the
    same shuffle shape as the fixed-period fold (A4)."""
    ph = attach_polyco(df, segments, t_col)
    binned = ph.withColumn(
        "bin",
        F.least(
            F.floor(F.pmod(F.col("phase"), F.lit(1.0)) * F.lit(nbins)).cast("int"),
            F.lit(nbins - 1),
        ),
    )
    return binned.groupBy("bin").agg(
        F.avg(F.col(value_col)).alias("profile"),
        F.count(F.col(value_col)).alias("npts"),
    )
