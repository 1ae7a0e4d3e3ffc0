"""Autocorrelation (SURVEY §2.5 W7): 1-D profile/series ACF and the
2-D dynamic-spectrum ACF of /root/reference/dynsp.py:232-251,305-345.

The reference computes scipy.correlate2d over the in-memory dyn
spectrum with per-lag boundary normalization. Spark formulations:

* acf_1d — lead-window products over one sort (boxcar-bank shape):
  ACF(L) = sum_i x_i * x_{i+L} / sum_i x_i^2, per requested lag; all
  lags evaluate over a single sorted pass, unpivoted with stack().
* acf_2d — the self-join formulation (SURVEY W7 option b): join the
  raster to itself on (t+dt, f+df) and aggregate per (dt, df). The
  join key is an equi-key (shifted coordinates), so Catalyst executes
  a plain shuffle join — at 100 TB this is the scalable path because
  no per-window matrix is ever materialized; lag count bounds the
  explode factor.

Boundary handling: 'valid' overlap only (pairs that exist), with the
pair count returned so callers can apply the reference's per-lag
energy normalization (dynsp.py:305-345) or an unbiased 1/(N-L) one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


def _widened(df: DataFrame, col: str):
    """decimal(38,0)-widened copy of an integral column; floats pass
    through unchanged.

    ACF inputs are typically quantized-integer BIN SUMS, which grow
    linearly with the data: at the 100x scale probe the pairwise
    product of two int64 bin sums crossed 2^63 and ANSI mode raised
    ARITHMETIC_OVERFLOW (caught by tools/scale_probe.py — the
    count()-pruned bench never executed the product). decimal(38,0)
    gives int128-equivalent headroom, the same engine-width-parity
    treatment as fit_powerlaw / _regr_exact (SCALE.md round 4); the
    public `acf` column is one correctly-rounded double conversion
    at the end."""
    t = df.schema[col].dataType
    c = F.col(col)
    return c.cast("decimal(38,0)") if isinstance(t, _INTEGRAL) else c


def acf_1d(
    df: DataFrame,
    lags: list[int],
    order_col: str = "bin",
    value_col: str = "profile",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-lag autocorrelation of an ordered series. Returns
    (group..., lag, acf, acf_norm, npairs): acf = sum x_i x_{i+L},
    acf_norm = acf / sum x_i^2 (zero-lag normalized)."""
    group_cols = group_cols or []
    base = df.select(
        *group_cols, order_col, _widened(df, value_col).alias("__wv")
    )
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    prods = [
        (F.col("__wv") * F.lead("__wv", lag).over(w)).alias(f"__p_{lag}")
        for lag in lags
    ]
    wide = base.select(*group_cols, F.col("__wv"), *prods)
    stack_args = ", ".join(f"{lag}, __p_{lag}" for lag in lags)
    long = wide.selectExpr(
        *group_cols,
        "__wv",
        f"stack({len(lags)}, {stack_args}) AS (lag, prod)",
    )
    out = long.groupBy(*group_cols, "lag").agg(
        F.sum("prod").alias("__acf"),
        F.count("prod").alias("npairs"),
        F.sum(F.col("__wv") * F.col("__wv")).alias("__e"),
    )
    return out.select(
        *group_cols,
        "lag",
        F.col("__acf").cast("double").alias("acf"),
        (F.col("__acf").cast("double") / F.col("__e").cast("double")).alias(
            "acf_norm"
        ),
        "npairs",
    )


def acf_2d(
    raster: DataFrame,
    time_lags: list[int],
    freq_lags: list[int],
    t_col: str = "time_bin",
    f_col: str = "chan",
    value_col: str = "value",
) -> DataFrame:
    """2-D ACF via self-join: for each (dt, df_) pair, join
    x(t, f) with x(t+dt, f+df_) and sum the products.

    The lag grid is exploded on the LEFT side (small constant factor
    = |time_lags| * |freq_lags|); the join itself is a single equi
    join on the shifted coordinates. Returns (dt, df_, acf, npairs,
    acf_norm) where acf_norm divides by the raster energy."""
    lag_rows = [(int(dt), int(dfl)) for dt in time_lags for dfl in freq_lags]
    lags = raster.sparkSession.createDataFrame(lag_rows, "dt int, df_ int")
    wv = _widened(raster, value_col)
    left = raster.select(
        F.col(t_col).alias("__t"), F.col(f_col).alias("__f"),
        wv.alias("__va"),
    )
    right = raster.select(
        F.col(t_col).alias("__t2"), F.col(f_col).alias("__f2"),
        wv.alias("__vb"),
    )
    expanded = left.crossJoin(F.broadcast(lags)).withColumn(
        "__tt", F.col("__t") + F.col("dt")
    ).withColumn("__ff", F.col("__f") + F.col("df_"))
    joined = expanded.join(
        right,
        (F.col("__tt") == F.col("__t2")) & (F.col("__ff") == F.col("__f2")),
    )
    energy = raster.select(wv.alias("__wv")).agg(
        F.sum(F.col("__wv") * F.col("__wv")).alias("__e")
    )
    out = (
        joined.groupBy("dt", "df_")
        .agg(
            F.sum(F.col("__va") * F.col("__vb")).alias("__acf"),
            F.count(F.lit(1)).alias("npairs"),
        )
        .crossJoin(F.broadcast(energy))
        .select(
            "dt", "df_",
            F.col("__acf").cast("double").alias("acf"),
            "npairs",
            (F.col("__acf").cast("double") / F.col("__e").cast("double"))
            .alias("acf_norm"),
        )
    )
    return out


def half_power_width(
    acf: DataFrame, lag_col: str = "lag", norm_col: str = "acf_norm"
) -> DataFrame:
    """Scintillation-style half-power width: smallest positive lag
    where acf_norm drops below 0.5 (dynsp.py:305-345 extracts row/col
    cuts through the ACF peak and measures their half-power points)."""
    below = acf.filter(
        (F.col(lag_col) > 0) & (F.col(norm_col) < 0.5)
    )
    return below.agg(F.min(F.col(lag_col)).alias("half_power_lag"))
