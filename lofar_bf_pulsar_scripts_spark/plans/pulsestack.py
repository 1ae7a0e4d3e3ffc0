"""pulsestack pipeline (SURVEY §3.3): time series -> detrend -> fold
-> profile + stats, as one declarative composition.

The reference streams blocks and carries fold state across them
(/root/reference/pulsestack.py:553-620); here phase is a per-row
expression so the whole pipeline is scan -> project -> two small
aggregations — embarrassingly parallel (SURVEY §3.3 "the one real
algorithmic win").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.fold import fold, fold_subints
from ..operators.profile import profile_stats
from ..operators.robust import detrend_normalize


def fold_series(
    series: DataFrame,
    period: float,
    nbins: int = 128,
    tsamp: float | None = None,
    t0: float = 0.0,
    detrend: bool = True,
    detrendlen: int = 1000,
    dump_time: float | None = None,
    idx_col: str = "sample_idx",
    value_col: str = "value",
) -> DataFrame:
    """End-to-end fold. ``series`` needs (sample_idx, value[, t]);
    t is derived from tsamp when absent. With ``dump_time`` produces
    sub-integrations (A6), else a single profile (A4)."""
    df = series
    if "t" not in df.columns:
        if tsamp is None:
            raise ValueError("need a t column or tsamp")
        df = df.withColumn("t", F.col(idx_col) * F.lit(float(tsamp)))
    if detrend:
        df = detrend_normalize(
            df, detrendlen=detrendlen, idx_col=idx_col, value_col=value_col
        )
    if dump_time is not None:
        return fold_subints(
            df, period, nbins, dump_time, t_col="t", value_col=value_col, t0=t0
        )
    return fold(df, period, nbins, t_col="t", value_col=value_col, t0=t0)


def fold_and_score(
    series: DataFrame,
    period: float,
    nbins: int = 128,
    **kwargs,
) -> tuple[DataFrame, DataFrame]:
    """Profile + the snr.py statistics suite (§7.1 minimum slice)."""
    prof = fold_series(series, period, nbins, **kwargs)
    stats = profile_stats(prof, value_col="profile")
    return prof, stats
