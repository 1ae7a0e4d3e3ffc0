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


def attach_polyco(
    df: DataFrame,
    segments: DataFrame,
    t_col: str = "t",
) -> DataFrame:
    """Assign each sample the nearest-TMID segment and compute its
    phase/freq columns.

    An ephemeris is tiny by construction (one row per ~hour), so it is
    collected into a LITERAL struct array and the nearest pick is a
    map-side fold over that array — no join, no groupBy, no shuffle of
    the fact table at all (the groupBy-on-fact alternative would
    re-shuffle 100 TB to deduplicate the cross join)."""
    segs = sorted(segments.collect(), key=lambda r: r["tmid"])
    if not segs:
        raise ValueError("empty polyco segment table")
    lit_seg = lambda r: F.struct(
        F.lit(float(r["tmid"])).alias("tmid"),
        F.lit(float(r["rphase"])).alias("rphase"),
        F.lit(float(r["f0"])).alias("f0"),
        F.array(*[F.lit(float(c)) for c in r["coeffs"]]).alias("coeffs"),
        F.lit(int(r["seg_id"])).alias("seg"),
    )
    t = F.col(t_col)
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
