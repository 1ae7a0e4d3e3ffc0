"""dynsp / spspectra pipeline (SURVEY §2 D3 + W2 + A3 + W7): folded-
archive dynamic-spectrum analysis (/root/reference/dynsp.py,
spspectra.py) as one composition over the D3 cube:

  cube -> weight zap (dynsp.py:178-179) -> bscrunch to per-(subint,
  chan) intensities (dynsp.py:152-156) -> Q-Q normalize per channel
  (dynsp.py:186-224; the 'quick' tscrunch-first variant at :204-224 is
  the ``quick=True`` mode — same accuracy/cost tradeoff the reference
  exposes) -> 2-D ACF + half-power scintillation widths
  (dynsp.py:232-251,305-345).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.acf import acf_2d, half_power_width
from ..operators.qqnorm import qq_normalize
from ..operators.raster import scrunch, zap_weights


def dynamic_spectrum_from_cube(
    cube: DataFrame,
    weights: DataFrame | None = None,
    on_bins: tuple[int, int] | None = None,
) -> DataFrame:
    """(subint, chan, value): per-cell mean over phase bins —
    optionally only the on-pulse window (dynsp.py builds the dynamic
    spectrum from the pulse window minus the off baseline)."""
    df = cube
    if weights is not None:
        df = zap_weights(df, weights, on=["subint", "chan"])
    if on_bins is not None:
        lo, hi = on_bins
        df = df.filter((F.col("bin") >= lo) & (F.col("bin") < hi))
    return scrunch(df, keep_axes=["subint", "chan"], value_col="value", agg="avg")


def normalized_dynspec(
    dynspec: DataFrame, quick: bool = False
) -> DataFrame:
    """Q-Q normalization per channel; ``quick`` normalizes the
    time-scrunched channel profile instead of each (subint, chan)
    sample set (dynsp.py:204-224's speed mode)."""
    if quick:
        per_chan = scrunch(
            dynspec, keep_axes=["chan"], value_col="value", agg="avg"
        )
        return qq_normalize(per_chan, ["chan"], value_col="value")
    return qq_normalize(dynspec, ["chan"], value_col="value")


def scintillation_widths(
    dynspec: DataFrame,
    time_lags: list[int],
    freq_lags: list[int],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """2-D ACF + half-power widths of the time and frequency cuts
    through the peak (dynsp.py:305-345)."""
    acf = acf_2d(
        dynspec,
        time_lags=time_lags,
        freq_lags=freq_lags,
        t_col="subint",
        f_col="chan",
        value_col="value",
    )
    t_cut = acf.filter(F.col("df_") == 0).select(
        F.col("dt").alias("lag"), "acf", "acf_norm", "npairs"
    )
    f_cut = acf.filter(F.col("dt") == 0).select(
        F.col("df_").alias("lag"), "acf", "acf_norm", "npairs"
    )
    return acf, half_power_width(t_cut), half_power_width(f_cut)
