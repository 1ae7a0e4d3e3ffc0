"""Profile statistics & pulse search (SURVEY §2.4 A7, §2.5 W3/W5/W6).

Formulas from /root/reference/snr.py:305-377 (the reference computes
these in one numpy pass over the folded profile; here they are one
partial+final aggregation — a single job over a <= nbins-row frame, or
grouped by observation for many profiles at once):

  peak      = max(prof)                       (snr.py:308)
  mean      = mean(prof)
  Weq       = sum(prof) / peak                (snr.py:312)
  profsign  = sum(prof) / sqrt(Weq)           (snr.py:313)
  chi2      = sum(prof^2) / (nbins - 1)       (snr.py:314)
  n_on      = count(prof > thres)             (snr.py:316-320)

Off-window stats (W3, /root/reference/dynsp.py:188-192): mean/std over
a phase-bin range, possibly wrapping past nbins.

Boxcar matched-filter bank (W5, /root/reference/pulse_info.py:114-117,
169-187): convolve the profile with np.ones(w) for a bank of widths,
score max(sum)/sqrt(w), pick the best width — expressed as ranking
windows over the profile, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def profile_stats(
    df: DataFrame,
    value_col: str = "profile",
    group_cols: list[str] | None = None,
    on_threshold: float | None = None,
) -> DataFrame:
    """One-pass statistics suite over a folded profile.

    With ``group_cols`` computes the suite per group (e.g. per obs_id /
    subint); otherwise returns a single row.
    """
    v = F.col(value_col)
    aggs = [
        F.count(v).alias("nbins"),
        F.max(v).alias("peak"),
        F.avg(v).alias("mean"),
        F.sum(v).alias("total"),
        F.sum(v * v).alias("__sumsq"),
    ]
    if on_threshold is not None:
        aggs.append(
            F.sum(F.when(v > F.lit(float(on_threshold)), 1).otherwise(0)).alias("n_on")
        )
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    out = (
        grouped.agg(*aggs)
        .withColumn("weq", F.col("total") / F.col("peak"))
        .withColumn("profsign", F.col("total") / F.sqrt(F.abs(F.col("weq"))))
        .withColumn("chi2", F.col("__sumsq") / (F.col("nbins") - F.lit(1)))
        .drop("__sumsq")
    )
    return out


def off_window_stats(
    df: DataFrame,
    bin_lo: int,
    bin_hi: int,
    nbins: int,
    bin_col: str = "bin",
    value_col: str = "profile",
    group_cols: list[str] | None = None,
    exact_scale: float | None = None,
) -> DataFrame:
    """Mean/stddev over phase-bin window [bin_lo, bin_hi), wrapping if
    bin_hi > nbins (W3; dynsp.py:188-192, lofar_fluxcal.py:218-220).

    ``exact_scale`` switches to deterministic integer-quantized moments
    (see robust._exact_moments) for cross-engine bit-parity."""
    b = F.col(bin_col)
    if bin_hi <= nbins:
        mask = (b >= F.lit(bin_lo)) & (b < F.lit(bin_hi))
    else:  # wrap past the end: [bin_lo, nbins) U [0, bin_hi - nbins)
        mask = (b >= F.lit(bin_lo)) | (b < F.lit(bin_hi - nbins))
    sel = df.filter(mask)
    grouped = sel.groupBy(*group_cols) if group_cols else sel.groupBy()
    if exact_scale is None:
        return grouped.agg(
            F.avg(F.col(value_col)).alias("off_mean"),
            F.stddev_samp(F.col(value_col)).alias("off_rms"),
            F.count(F.col(value_col)).alias("off_n"),
        )
    from .robust import _exact_moments

    vq = F.floor(F.col(value_col) * F.lit(float(exact_scale)) + F.lit(0.5))
    n = F.count(vq)
    mean, std = _exact_moments(vq, n, exact_scale, sample=True)
    return grouped.agg(
        mean.alias("off_mean"), std.alias("off_rms"), n.alias("off_n")
    )


def boxcar_bank(
    df: DataFrame,
    widths: list[int] | None = None,
    order_col: str = "bin",
    value_col: str = "profile",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Boxcar matched-filter bank (W5, pulse_info.py:114-117,169-187).

    For each width w, the best boxcar sum over any w consecutive bins,
    scored sum/sqrt(w); returns one row per width with (width, best_sum,
    snr_w, best_start). The per-width pass is a running-sum ranking
    window — whole-stage-codegen'd, no UDF; the bank sizes (default
    {2,3,4,6,9,14,20}, pulse_info.py:68) keep the union small.
    """
    widths = widths or [2, 3, 4, 6, 9, 14, 20]
    group_cols = group_cols or []
    # Single pass: all per-width frame sums are window expressions over
    # ONE ordering (Spark sorts once; each distinct frame is evaluated
    # over the same sorted runs — no extra shuffle per width), then the
    # bank is unpivoted with stack() and reduced by one aggregation.
    # Profiles are small per group, so the per-group sort is in-memory.
    sums = []
    for w in widths:
        win = (
            Window.partitionBy(*group_cols)
            .orderBy(order_col)
            .rowsBetween(0, w - 1)
        )
        sums.append(
            F.when(
                F.count(F.col(value_col)).over(win) == w,
                F.sum(F.col(value_col)).over(win),
            ).alias(f"__box_{w}")
        )
    wide = df.select(
        *group_cols, F.col(order_col).alias("start_bin"), *sums
    )
    stack_args = ", ".join(f"{w}, __box_{w}" for w in widths)
    long = wide.selectExpr(
        *group_cols,
        "start_bin",
        f"stack({len(widths)}, {stack_args}) AS (width, box_sum)",
    ).filter(F.col("box_sum").isNotNull())
    # deterministic under sum ties: highest sum, then smallest start
    best = (
        long.groupBy(*group_cols, "width")
        .agg(
            F.max(
                F.struct(
                    F.col("box_sum").alias("s"),
                    (-F.col("start_bin")).alias("neg_start"),
                )
            ).alias("__b")
        )
        .select(
            *group_cols,
            "width",
            (-F.col("__b.neg_start")).alias("best_start"),
            F.col("__b.s").alias("best_sum"),
            (F.col("__b.s") / F.sqrt(F.col("width").cast("double"))).alias("snr_w"),
        )
    )
    return best


def best_boxcar(df: DataFrame, **kwargs) -> DataFrame:
    """Best (width, start) across the bank — argmax of snr_w
    (pulse_info.py:169-187 picks the best-scoring width)."""
    group_cols = kwargs.get("group_cols") or []
    bank = boxcar_bank(df, **kwargs)
    grouped = bank.groupBy(*group_cols) if group_cols else bank.groupBy()
    # deterministic under snr ties: highest snr, then smallest width
    return grouped.agg(
        F.max(
            F.struct(
                F.col("snr_w").alias("s"),
                (-F.col("width")).alias("neg_w"),
                F.col("best_start").alias("st"),
            )
        ).alias("__b")
    ).select(
        *group_cols,
        (-F.col("__b.neg_w")).alias("best_width"),
        F.col("__b.st").alias("best_start"),
        F.col("__b.s").alias("best_snr"),
    )


def islands(
    df: DataFrame,
    threshold: float,
    order_col: str = "chan",
    value_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Friends-of-friends island extraction (W6,
    /root/reference/pulse_info.py:201-217,246-262).

    The reference iteratively takes the global argmax and expands
    left/right while >= threshold; the fixpoint it reaches is exactly
    "maximal runs of consecutive above-threshold indices". That closed
    form is a gap-sessionization: flag rows > threshold, start a new
    island when the index gap to the previous flagged row exceeds 1,
    island id = running count of starts. One window + one aggregation.

    Returns (group_cols..., island_id, start, width, peak, total).
    """
    group_cols = group_cols or []
    flagged = df.filter(F.col(value_col) > F.lit(float(threshold)))
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    with_gap = flagged.withColumn(
        "__new_island",
        F.when(
            F.col(order_col) - F.lag(F.col(order_col), 1).over(w) == 1, 0
        ).otherwise(1),
    ).withColumn(
        "island_id",
        F.sum("__new_island").over(
            Window.partitionBy(*group_cols).orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_gap.groupBy(*group_cols, "island_id")
        .agg(
            F.min(order_col).alias("start"),
            (F.max(order_col) - F.min(order_col) + 1).alias("width"),
            F.max(value_col).alias("peak"),
            F.sum(value_col).alias("total"),
        )
    )
