"""Robust statistics layer (SURVEY §2.4 A2, §2.5 W1/W8).

Semantics:
  trimmed_block_stats — per block, sort and keep the lower half, then
      mean/std of that half (outlier-resistant baseline estimate,
      /root/reference/subdyn.py:426-427,552-556). Expressed as
      median-filter + conditional aggregate — no per-group sort
      materialization, one hash aggregation over percentile sketches.
  sigma_clip — level = (x - mean_blk)/rms_blk, mask |level| > thresh
      (6 sigma default, /root/reference/subdyn.py:19,423-469); a group
      whose clipped fraction exceeds rfilimit (10%, subdyn.py:20,
      :464-467) is dropped entirely.
  detrend_normalize — piecewise per-chunk baseline removal + robust
      sigma normalization (/root/reference/pulsestack.py:47-97):
      chunks of ``detrendlen`` samples; fast path subtracts the chunk
      median (pulsestack.py:57-62); sigma from the inner 95% with the
      1.148 correction (pulsestack.py:68-76); outlier chunks get the
      median sigma (pulsestack.py:79-91 gap heuristic approximated by
      a median-absolute-deviation cut — documented deviation).

All operators are two-phase: a per-group aggregate (small result)
joined back to the samples. The join side is the aggregate — broadcast
when the group count is modest, shuffle-on-group-key otherwise; both
avoid moving the fact table twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .raster import block_id

# 1/0.871: correction from std of the 5%-trimmed distribution to the
# true sigma of a Gaussian (pulsestack.py:68-76).
TRIM_STD_CORRECTION = 1.148


def _exact_moments(vq, n, scale: float, sample: bool):
    """Deterministic (mean, std) from integer-quantized sums.

    ``vq`` must be an integer column; the sums are associative/exact,
    and the returned doubles are fixed expressions over them — the
    same result on any engine and any aggregation order (the oracle
    SQL mirrors these expressions verbatim). Engine-native avg/stddev
    (Welford) are order-dependent in the last ulp, which is enough to
    flip a rounded digit across engines.
    """
    # Sum in DECIMAL(38,0): DuckDB's sum(BIGINT) auto-widens to
    # HUGEINT (int128) so the mirroring oracles are already exact; a
    # plain long sum on the Spark side would wrap (ANSI: throw) first
    # — vq^2 ~ 1e10 at scale 1e3 crosses int64 near 1e9 rows/group.
    # decimal(38,0) matches DuckDB's headroom; the single double
    # conversion below is correctly rounded on both engines.
    vd = vq.cast("decimal(19,0)")
    s1 = F.sum(vd).cast("double")
    s2 = F.sum((vd * vd).cast("decimal(38,0)")).cast("double")
    denom = (n - F.lit(1)) if sample else n
    mean = (s1 / n) / F.lit(float(scale))
    std = F.sqrt((s2 - s1 * s1 / n) / denom) / F.lit(float(scale))
    return mean, std


def trimmed_block_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    exact_scale: float | None = None,
) -> DataFrame:
    """Mean/std of the lower half (values <= group median) per group
    (A2, subdyn.py:426-427).

    With ``exact_scale`` the stats are computed from integer-quantized
    sums (floor(v*scale+0.5)) — bit-deterministic across engines and
    aggregation orders; without it, engine-native avg/stddev_pop.
    """
    med = df.groupBy(*group_cols).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("__med")
    )
    joined = df.join(med, on=group_cols)
    lower = F.col(value_col) <= F.col("__med")
    if exact_scale is None:
        return joined.groupBy(*group_cols).agg(
            F.avg(F.when(lower, F.col(value_col))).alias("trim_mean"),
            F.stddev_pop(F.when(lower, F.col(value_col))).alias("trim_std"),
            F.count(F.when(lower, F.col(value_col))).alias("trim_n"),
        )
    vq = F.when(
        lower,
        F.floor(F.col(value_col) * F.lit(float(exact_scale)) + F.lit(0.5)),
    )
    n = F.count(vq)
    mean, std = _exact_moments(vq, n, exact_scale, sample=False)
    return joined.groupBy(*group_cols).agg(
        mean.alias("trim_mean"), std.alias("trim_std"), n.alias("trim_n")
    )


def group_zscore(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    level_col: str = "level",
    exact_scale: float | None = None,
) -> DataFrame:
    """Attach level = (x - group mean)/group stddev (subdyn.py:423-447).

    ``exact_scale`` switches the group moments to deterministic
    integer-quantized sums (see _exact_moments)."""
    if exact_scale is None:
        stats = df.groupBy(*group_cols).agg(
            F.avg(F.col(value_col)).alias("__m"),
            F.stddev_samp(F.col(value_col)).alias("__s"),
        )
    else:
        vq = F.floor(
            F.col(value_col) * F.lit(float(exact_scale)) + F.lit(0.5)
        )
        n = F.count(vq)
        mean, std = _exact_moments(vq, n, exact_scale, sample=True)
        stats = df.groupBy(*group_cols).agg(
            mean.alias("__m"), std.alias("__s")
        )
    return (
        df.join(stats, on=group_cols)
        .withColumn(level_col, (F.col(value_col) - F.col("__m")) / F.col("__s"))
        .drop("__m", "__s")
    )


def sigma_clip(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    threshold: float = 6.0,
    rfilimit: float | None = 0.1,
    replacement: float = 0.0,
    exact_scale: float | None = None,
) -> DataFrame:
    """Sigma-clip mask (W8, subdyn.py:423-469,574-590).

    Samples with |level| > threshold are replaced by ``replacement``
    (the reference writes zeros back into the subband files,
    subdyn.py:208-249). If ``rfilimit`` is set, groups whose clipped
    fraction >= rfilimit are dropped entirely (subdyn.py:464-467).
    Returns the input columns plus (level, clipped).
    """
    leveled = group_zscore(df, group_cols, value_col, exact_scale=exact_scale)
    clipped = leveled.withColumn(
        "clipped", (F.abs(F.col("level")) > F.lit(float(threshold))).cast("int")
    ).withColumn(
        value_col,
        F.when(F.col("clipped") == 1, F.lit(float(replacement))).otherwise(
            F.col(value_col)
        ),
    )
    if rfilimit is not None:
        frac = clipped.groupBy(*group_cols).agg(
            F.avg(F.col("clipped")).alias("__clip_frac")
        )
        clipped = (
            clipped.join(frac, on=group_cols)
            .filter(F.col("__clip_frac") < F.lit(float(rfilimit)))
            .drop("__clip_frac")
        )
    return clipped


def clipped_fraction(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    threshold: float = 6.0,
) -> DataFrame:
    """Per-group clipped fraction — the .rfirep report row
    (subdyn.py:455-467,605-611)."""
    leveled = group_zscore(df, group_cols, value_col)
    return leveled.groupBy(*group_cols).agg(
        F.avg((F.abs(F.col("level")) > F.lit(float(threshold))).cast("double")).alias(
            "clip_frac"
        ),
        F.count(F.lit(1)).alias("n"),
    )


def sorted_gap_cut(
    df: DataFrame,
    value_col: str = "__sigma",
    group_cols: list[str] | None = None,
    upper_fraction: float = 0.5,
) -> DataFrame:
    """The reference's sorted-gap outlier heuristic
    (pulsestack.py:79-91): sort the per-chunk sigmas, look at
    consecutive gaps in the UPPER part of the sorted sequence, and cut
    at the largest gap — everything above it is an outlier chunk.

    Returns per group: (hicut — the sigma value just below the largest
    upper-half gap; n_above — chunks above it). If the upper half has
    no gaps (fewer than 2 points), hicut is the max (nothing cut).
    One window pass over the (tiny) per-chunk table.
    """
    from pyspark.sql import Window

    group_cols = group_cols or []
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    nw = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        F.col(value_col).alias("__s"),
        F.row_number().over(w).alias("__i"),
        F.count(F.lit(1)).over(
            nw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("__n"),
        (F.col(value_col) - F.lag(value_col, 1).over(w)).alias("__gap"),
        F.lag(value_col, 1).over(w).alias("__prev"),
    )
    # pulsestack.py:86 scans gaps sort[n/2+1:] - sort[n/2:-1]: the
    # first admissible gap has lower edge at 0-based index n/2, which
    # is 1-based __i >= floor(n*uf) + 2 here (__gap at __i spans
    # sorted positions __i-2 -> __i-1).
    upper = ranked.filter(
        (F.col("__i") > F.floor(F.col("__n") * F.lit(float(upper_fraction))) + 1)
        & F.col("__gap").isNotNull()
    )
    # numpy argmax takes the FIRST maximum: tie-break toward the
    # smallest sorted index via the negated rank in the max-struct.
    best = upper.groupBy(*group_cols).agg(
        F.max(
            F.struct(
                F.col("__gap").alias("g"),
                (-F.col("__i")).alias("negi"),
                F.col("__prev").alias("cut"),
                F.col("__i").alias("i"),
            )
        ).alias("__b")
    )
    cuts = best.select(
        *group_cols,
        F.col("__b.cut").alias("hicut"),
        (F.col("__b.i")).alias("__cut_rank"),
    )
    joined = (
        ranked.join(cuts, on=group_cols)
        if group_cols
        else ranked.crossJoin(F.broadcast(cuts))
    )
    return (
        joined.groupBy(*group_cols, "hicut")
        .agg(
            F.sum(
                F.when(F.col("__s") > F.col("hicut"), 1).otherwise(0)
            ).alias("n_above"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


def detrend_normalize(
    df: DataFrame,
    detrendlen: int = 1000,
    idx_col: str = "sample_idx",
    value_col: str = "value",
    group_cols: list[str] | None = None,
    fast: bool = True,
    exact_scale: float | None = None,
) -> DataFrame:
    """Piecewise detrend + robust normalization (W1,
    pulsestack.py:47-97). Fast path (median subtract, the 2x-speedup
    mode at pulsestack.py:57-62) is the default; sigma per chunk from
    the central 95% with the 1.148 trim correction; chunks whose sigma
    is an outlier (> 3 MAD from the median sigma — approximating the
    sorted-gap heuristic at pulsestack.py:79-91) get the median sigma.

    Three small aggregations over chunk keys + one broadcastable join
    back; the fact table is touched twice (once to build chunk stats,
    once to apply) — at 100 TB both passes are scan+map only.
    """
    group_cols = group_cols or []
    chunk = block_id(F.col(idx_col), detrendlen).alias("__chunk")
    with_chunk = df.withColumn("__chunk", chunk)

    v = F.col(value_col)
    # fast path: subtract the chunk median (pulsestack.py:57-62);
    # accurate path: subtract a per-chunk LINEAR fit (the reference's
    # scipy.signal.detrend) — slope/intercept via the regression
    # aggregates, evaluated per sample below.
    aggs = [
        F.percentile(v, F.lit(0.5)).alias("__med"),
        F.percentile(v, F.lit(0.025)).alias("__lo"),
        F.percentile(v, F.lit(0.975)).alias("__hi"),
    ]
    if not fast:
        aggs += [
            F.regr_slope(v, F.col(idx_col).cast("double")).alias("__slope"),
            F.regr_intercept(v, F.col(idx_col).cast("double")).alias("__icept"),
        ]
    per_chunk = with_chunk.groupBy(*group_cols, "__chunk").agg(*aggs)

    # sigma of the central 95%, corrected (pulsestack.py:68-76): std of
    # values within [lo, hi], times 1.148. With exact_scale the std
    # derives from integer-quantized sums (see _exact_moments) so the
    # per-chunk sigma — and everything normalized by it — is
    # bit-deterministic across engines and aggregation orders.
    centered = with_chunk.join(per_chunk, on=[*group_cols, "__chunk"])
    trimmed = centered.filter((v >= F.col("__lo")) & (v <= F.col("__hi")))
    if exact_scale is None:
        sig_expr = F.stddev_samp(v) * F.lit(TRIM_STD_CORRECTION)
    else:
        vq = F.floor(v * F.lit(float(exact_scale)) + F.lit(0.5))
        _, std = _exact_moments(vq, F.count(vq), exact_scale, sample=True)
        sig_expr = std * F.lit(TRIM_STD_CORRECTION)
    sig = (
        trimmed.groupBy(*group_cols, "__chunk")
        .agg(sig_expr.alias("__sigma"))
    )
    # outlier chunks -> median sigma (pulsestack.py:84-91). MAD needs
    # the median first, so two window stages — but both run over the
    # tiny per-chunk sigma frame under ONE partitioning with ZERO
    # joins. (The previous agg+broadcast-join form launched a separate
    # broadcast-build job per statistic, each re-deriving sig — and
    # its fact-table upstream — from scratch; that was the r3 bench
    # regression.) With no group_cols the window is a single partition,
    # acceptable because the frame is chunk-cardinality (n/detrendlen).
    from pyspark.sql import Window

    wspec = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    sig_fixed = (
        sig.withColumn(
            "__med_sigma",
            F.percentile(F.col("__sigma"), F.lit(0.5)).over(wspec),
        )
        .withColumn(
            "__mad_sigma",
            F.percentile(
                F.abs(F.col("__sigma") - F.col("__med_sigma")), F.lit(0.5)
            ).over(wspec),
        )
        .withColumn(
            "__sigma",
            F.when(
                F.abs(F.col("__sigma") - F.col("__med_sigma"))
                > 3 * F.col("__mad_sigma"),
                F.col("__med_sigma"),
            ).otherwise(F.col("__sigma")),
        )
        .select(*group_cols, "__chunk", "__sigma")
    )
    # baseline per sample: chunk median (fast) or the chunk's linear
    # fit evaluated at this sample's index (accurate mode); the sigma
    # estimate stays percentile-clipped on the raw values in both
    # modes (documented approximation — the in-chunk trend is small
    # relative to the clip width at the reference's chunk length).
    base = (
        F.col("__med")
        if fast
        else F.col("__icept") + F.col("__slope") * F.col(idx_col).cast("double")
    )
    drop_cols = ["__chunk", "__med", "__lo", "__hi", "__sigma"]
    if not fast:
        drop_cols += ["__slope", "__icept"]
    out = (
        centered.join(sig_fixed, on=[*group_cols, "__chunk"])
        .withColumn(value_col, (v - base) / F.col("__sigma"))
        .drop(*drop_cols)
    )
    return out
