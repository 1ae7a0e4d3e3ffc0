"""Core raster operators (SURVEY §2.4 A1/A3/A9/A11, §2.2 P8/P9).

Semantics:
  rebin      — block mean over fixed windows of k samples
               (/root/reference/subdyn.py:423; pulsestack.py:692;
               snr.py:49-53 reshape-and-mean)
  scrunch    — sum/mean collapse along cube axes: pscrunch (sum pols),
               fscrunch, tscrunch, bscrunch
               (/root/reference/dynsp.py:152-156; spspectra.py:101-104;
               fluxcal/lofar_fluxcal.py:385-453)
  zap_weights— zero samples whose (subint, chan) weight is 0
               (/root/reference/dynsp.py:178-179; pulse_info.py:152-153)
  repair_nonfinite — NaN/Inf -> 0 (/root/reference/spspectra.py:20-21)
  rfi_fraction — 1 - sum(w)/(nsub*nchan)
               (/root/reference/fluxcal/lofar_fluxcal.py:433-435)

All are single hash aggregations / projections: map-side combinable,
shuffle key = the collapsed axis ids (small), codegen-friendly. At
100 TB the cube table should be written partitioned by (obs_id) and
bucketed by (subint, chan) so every scrunch variant is co-located.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def block_id(col: Column, k: int) -> Column:
    """Index of the k-sized tumbling block containing ``col``."""
    return F.floor(col / F.lit(int(k))).cast("bigint")


def rebin(
    df: DataFrame,
    k: int,
    idx_col: str = "sample_idx",
    value_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Block mean over tumbling windows of k samples (A1)."""
    group_cols = group_cols or []
    return (
        df.groupBy(*group_cols, block_id(F.col(idx_col), k).alias("block"))
        .agg(
            F.avg(F.col(value_col)).alias("value"),
            F.count(F.col(value_col)).alias("npts"),
        )
    )


def scrunch(
    df: DataFrame,
    keep_axes: list[str],
    value_col: str = "value",
    agg: str = "sum",
    factor_axes: dict[str, int] | None = None,
) -> DataFrame:
    """Generalized scrunch (A3): collapse every axis not in
    ``keep_axes``; optionally first divide a kept axis by a factor
    (fscrunch(k)/tscrunch(k)/bscrunch(k) semantics — groups of k
    adjacent indices merge, lofar_fluxcal.py:437-453).

    agg: 'sum' (pscrunch-style total) or 'avg' (mean collapse).
    """
    factor_axes = factor_axes or {}
    keys = []
    for ax in keep_axes:
        if ax in factor_axes:
            keys.append(block_id(F.col(ax), factor_axes[ax]).alias(ax))
        else:
            keys.append(F.col(ax))
    fn = F.sum if agg == "sum" else F.avg
    return df.groupBy(*keys).agg(
        fn(F.col(value_col)).alias(value_col),
        F.count(F.col(value_col)).alias("npts"),
    )


def zap_weights(
    df: DataFrame,
    weights: DataFrame,
    on: list[str],
    value_col: str = "value",
    weight_col: str = "weight",
) -> DataFrame:
    """Zero out samples whose weight is 0 (P9). ``weights`` is the
    per-(subint, chan) weights matrix — orders of magnitude smaller
    than the cube, so it is broadcast: no shuffle of the fact table."""
    w = F.broadcast(weights.select(*on, weight_col))
    joined = df.join(w, on=on, how="left")
    return joined.withColumn(
        value_col,
        F.when(F.coalesce(F.col(weight_col), F.lit(0.0)) == 0, F.lit(0.0)).otherwise(
            F.col(value_col)
        ),
    )


def repair_nonfinite(df: DataFrame, value_col: str = "value") -> DataFrame:
    """NaN/±Inf -> 0.0 (P8; spspectra.py:20-21, dynsp.py:201-202)."""
    v = F.col(value_col)
    finite = v.isNotNull() & ~F.isnan(v) & (F.abs(v) != F.lit(float("inf")))
    return df.withColumn(value_col, F.when(finite, v).otherwise(F.lit(0.0)))


def rfi_fraction(
    df: DataFrame,
    weight_col: str = "weight",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Zapped fraction 1 - mean(weight>0) (A9; lofar_fluxcal.py:433-435)."""
    sel = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return sel.agg(
        (F.lit(1.0) - F.avg(F.when(F.col(weight_col) > 0, 1.0).otherwise(0.0))).alias(
            "rfi_frac"
        ),
        F.count(F.lit(1)).alias("ncells"),
    )
