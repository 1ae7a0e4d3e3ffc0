"""pulse_info pipeline (SURVEY W2+W5+W6+K5): single-pulse inspection
(/root/reference/pulse_info.py) as one composition:

  profile (or per-subint profiles) -> Q-Q normalize (pulse_info.py:
  18-40) -> boxcar matched-filter bank, best width
  (pulse_info.py:114-117,169-187) -> friends-of-friends islands over
  the normalized spectrum (pulse_info.py:201-217,246-262) ->
  pulse_info.txt rows (pulse_info.py:100-101,199-215).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.profile import best_boxcar, islands
from ..operators.qqnorm import qq_normalize


def pulse_search(
    profiles: DataFrame,
    group_cols: list[str] | None = None,
    bin_col: str = "bin",
    value_col: str = "value",
    widths: list[int] | None = None,
) -> DataFrame:
    """Normalize per group then run the boxcar bank; returns the best
    (width, start, snr) per group."""
    normed = qq_normalize(profiles, group_cols or [], value_col=value_col) \
        if group_cols else profiles
    return best_boxcar(
        normed,
        widths=widths,
        order_col=bin_col,
        value_col=value_col,
        group_cols=group_cols,
    )


def spectral_islands(
    spectrum: DataFrame,
    threshold: float,
    chan_col: str = "chan",
    value_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Above-threshold islands ranked by peak (pulse_info.py's
    repeated-argmax fixpoint; see operators.profile.islands)."""
    isl = islands(
        spectrum,
        threshold,
        order_col=chan_col,
        value_col=value_col,
        group_cols=group_cols,
    )
    return isl.orderBy(F.desc("peak"))


def pulse_info_lines(best: DataFrame) -> DataFrame:
    """pulse_info.txt rows: 'width start snr' (pulse_info.py:199-215
    layout)."""
    return best.withColumn(
        "info_line",
        F.format_string(
            "%3d %6d %10.4f",
            F.col("best_width").cast("int"),
            F.col("best_start").cast("int"),
            F.col("best_snr"),
        ),
    )
