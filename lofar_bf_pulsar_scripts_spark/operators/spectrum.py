"""Flux-spectrum aggregation & auto off-window search (SURVEY §2.4
A8/A9, §2.5 W4).

  spectrum_over_channel_groups — sum/mean profiles over [spleft,
      spright) channel blocks and subints, excluding zapped cells,
      with error propagation sqrt(sum err^2)/n_good
      (/root/reference/fluxcal/lofar_fluxcal.py:800-891;
      lofar_psrflux.py:594-648)
  auto_off_window — rotate peak to the edge, flag >2.5 sigma bins,
      trim single-bin islands, pad, derive on/off masks
      (/root/reference/snr.py:70-146). Implemented with lag/lead
      windows — the "trim 1-bin islands" step is exactly a
      neighbor-vote expression.

Both are one or two hash aggregations over small keys — at 100 TB the
cube's (out_chan) key space is ~nchan/g, so partial aggregation
collapses everything map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def spectrum_over_channel_groups(
    cube: DataFrame,
    group_size: int,
    chan_col: str = "chan",
    value_col: str = "value",
    weight_col: str = "weight",
    err_col: str | None = None,
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """Per out-channel block: zap-aware flux mean and error.

    flux = mean(value) over cells with weight > 0;
    flux_err = sqrt(sum(err^2))/n_good when err_col given
    (lofar_fluxcal.py:820-891 error propagation).
    """
    extra = extra_group_cols or []
    good = F.col(weight_col) > 0
    aggs = [
        F.avg(F.when(good, F.col(value_col))).alias("flux"),
        F.sum(F.when(good, F.col(value_col))).alias("flux_sum"),
        F.sum(good.cast("int")).alias("n_good"),
        F.count(F.lit(1)).alias("n_cells"),
    ]
    if err_col is not None:
        aggs.append(
            (
                F.sqrt(F.sum(F.when(good, F.col(err_col) * F.col(err_col))))
                / F.sum(good.cast("int"))
            ).alias("flux_err")
        )
    return (
        cube.groupBy(
            *extra,
            F.floor(F.col(chan_col) / F.lit(int(group_size))).cast("int").alias("out_chan"),
        )
        .agg(*aggs)
    )


def rfi_zap_fraction(
    cube: DataFrame,
    weight_col: str = "weight",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """A9: zapped fraction 1 - sum(w>0)/n (lofar_fluxcal.py:433-435)."""
    sel = cube.groupBy(*group_cols) if group_cols else cube.groupBy()
    return sel.agg(
        (
            F.lit(1.0)
            - F.sum((F.col(weight_col) > 0).cast("double")) / F.count(F.lit(1))
        ).alias("rfi_frac"),
        F.count(F.lit(1)).alias("n_cells"),
    )


def auto_off_window(
    profile: DataFrame,
    nbins: int,
    bin_col: str = "bin",
    value_col: str = "profile",
    threshold_sigma: float = 2.5,
    pad_fraction: float = 0.15,
    exact_scale: float | None = None,
) -> DataFrame:
    """W4 (snr.py:104-146, deterministic closed form):

    1. rotate so the global peak sits at bin 0 (peak at the window
       edge, snr.py:104-110);
    2. flag bins > mean + threshold_sigma * rms (initial moments);
    3. trim islands of width 1 — a flagged bin with both neighbors
       unflagged is unflagged (trim_bins, snr.py:70-99);
    4. pad: any bin within pad_fraction*nbins (circularly) of a
       flagged bin is also on-window;
    5. off-window = remaining bins.

    Returns (bin, value, is_on INT) in original bin numbering.
    """
    peak = profile.agg(
        F.max(
            F.struct(F.col(value_col).alias("v"), (-F.col(bin_col)).alias("nb"))
        ).alias("p")
    ).select((-F.col("p.nb")).alias("peak_bin"))
    rotated = profile.crossJoin(F.broadcast(peak)).withColumn(
        "__rbin", F.pmod(F.col(bin_col) - F.col("peak_bin"), F.lit(nbins))
    )
    if exact_scale is None:
        stats = rotated.agg(
            F.avg(value_col).alias("m"), F.stddev_samp(value_col).alias("s")
        )
    else:
        # deterministic flag threshold: moments from integer-quantized
        # sums (see robust._exact_moments) so the >2.5-sigma cut cannot
        # flip across engines/aggregation orders
        from .robust import _exact_moments

        vq = F.floor(
            F.col(value_col) * F.lit(float(exact_scale)) + F.lit(0.5)
        )
        mean, std = _exact_moments(vq, F.count(vq), exact_scale, sample=True)
        stats = rotated.agg(mean.alias("m"), std.alias("s"))
    flagged = rotated.crossJoin(F.broadcast(stats)).withColumn(
        "__flag",
        (
            F.col(value_col) > F.col("m") + F.lit(threshold_sigma) * F.col("s")
        ).cast("int"),
    )
    w = Window.orderBy("__rbin")
    trimmed = flagged.withColumn(
        "__flag",
        F.when(
            (F.col("__flag") == 1)
            & (F.coalesce(F.lag("__flag", 1).over(w), F.lit(0)) == 0)
            & (F.coalesce(F.lead("__flag", 1).over(w), F.lit(0)) == 0)
            # the rotated peak at __rbin=0 is always genuinely on
            & (F.col("__rbin") != 0),
            0,
        ).otherwise(F.col("__flag")),
    )
    # circular pad: a bin is on-window iff some flagged bin lies within
    # pad_fraction*nbins circular distance (profiles are small — the
    # flagged-bin list is a broadcast scalar array).
    pad = max(int(nbins * pad_fraction), 0)
    flagged_bins = trimmed.filter(F.col("__flag") == 1).agg(
        F.collect_list("__rbin").alias("__fb")
    )
    padded = trimmed.crossJoin(F.broadcast(flagged_bins)).withColumn(
        "is_on",
        F.exists(
            F.col("__fb"),
            lambda fb: F.least(
                F.pmod(F.col("__rbin") - fb, F.lit(nbins)),
                F.pmod(fb - F.col("__rbin"), F.lit(nbins)),
            )
            <= F.lit(pad),
        ).cast("int"),
    )
    return padded.select(bin_col, value_col, F.col("is_on"))
