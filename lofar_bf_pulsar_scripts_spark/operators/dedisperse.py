"""Trial-DM dedispersion search (the prepsubband/DDplan stage that
feeds the reference's folding pipeline).

The reference's shell helpers compute single dispersion delays
(/root/reference/simple-sh-scripts/dide:12-13, dm:12-13, in the
DM/2.41e-4 * (f^-2 - f_ref^-2) seconds convention with f in MHz); a
search pipeline applies that delay per frequency channel for every
trial DM, folds the shifted times, and ranks trials by how sharply
the profile deviates from flat — exactly the structure of
``operators.fold.period_search`` with a per-(trial, channel) time
shift in front.

Engine design: the (trial, channel) -> delay_us table is computed
once on the driver (|trials| x nchan integers — a few hundred) and
broadcast; the corpus pays one equi-join on its channel id, which
fans each event out |trials| ways, then a (dm, bin) aggregation whose
key space is |trials| x nbins.  Partial aggregation collapses that
map-side, so the shuffle carries a few hundred rows regardless of
corpus size — the same 100 TB shape as period_search.  All scoring
arithmetic is exact integer (µs times, DECIMAL(38,0) sum of squared
counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# seconds-convention dispersion constant used throughout the
# reference's helpers (dide:12-13): dt_s = DM / 2.41e-4 * (f^-2 - f_ref^-2)
_DISP_K = 2.41e-4


def dispersion_delay_table(
    trial_dms: list[int],
    nchan: int,
    f_lo_mhz: float,
    chan_bw_mhz: float,
) -> list[tuple[int, int, int]]:
    """(dm, chan, delay_us) rows for every trial DM and channel.

    Delay of channel center f_c relative to the TOP channel center
    (the highest-frequency channel arrives first; dedispersion
    SUBTRACTS the delay from each channel's arrival times so all
    channels align with the top of the band), rounded to integer
    microseconds.  Computed driver-side so the Spark plan and any
    SQL oracle consume the *same* integer literals — no cross-engine
    float-rounding surface.
    """
    if not trial_dms:
        raise ValueError("trial_dms must be non-empty")
    if nchan < 2:
        raise ValueError("nchan must be >= 2")
    f_top = f_lo_mhz + (nchan - 0.5) * chan_bw_mhz
    rows = []
    for dm in trial_dms:
        for c in range(nchan):
            f_c = f_lo_mhz + (c + 0.5) * chan_bw_mhz
            dt_s = (dm / _DISP_K) * (1.0 / (f_c * f_c) - 1.0 / (f_top * f_top))
            rows.append((int(dm), int(c), int(round(dt_s * 1e6))))
    return rows


def shifted_fold_search(
    df: DataFrame,
    shift_rows: list[tuple[int, int, int]],
    period_us: int,
    nbins: int,
    ts_col: str,
    key_col: str,
    trial_col: str,
) -> DataFrame:
    """Shared core of ``dm_search`` and ``fold.accel_search``: a
    driver-computed (trial, key, shift_us) table broadcasts, the
    corpus pays one equi-join on its key column (|trials| fan-out),
    each event time is shifted by -shift_us and folded at
    ``period_us`` (pmod keeps negative shifted times on the phase
    circle), and trials are scored by the exact-integer sum of
    squared bin counts — monotone in the chi^2-against-flat for
    fixed n, as in ``period_search``.  Returns one row per trial:
    (trial_col, n_events, sum_sq DECIMAL(38,0), n_occupied_bins).

    Scale shape: the (trial, bin) aggregation key space is
    |trials| x nbins — partial aggregation collapses it map-side, so
    the shuffle carries a few hundred rows at any corpus size.
    """
    period_us = int(period_us)
    if period_us <= 0:
        raise ValueError("period_us must be positive")
    if nbins < 2:
        raise ValueError("nbins must be >= 2")
    spark = (
        SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    )
    shifts = spark.createDataFrame(
        [(int(t), int(k), int(s)) for t, k, s in shift_rows],
        f"{trial_col} long, __key long, shift_us long",
    )
    shifted = df.select(
        F.col(key_col).cast("long").alias("__key"),
        F.col(ts_col).cast("long").alias("__ts"),
    ).join(F.broadcast(shifts), "__key")
    binned = shifted.select(
        trial_col,
        F.expr(
            f"CAST((pmod(__ts - shift_us, {period_us}) * {int(nbins)}) "
            f"DIV {period_us} AS INT)"
        ).alias("bin"),
    )
    per_bin = binned.groupBy(trial_col, "bin").agg(
        F.count(F.lit(1)).alias("__o")
    )
    return per_bin.groupBy(trial_col).agg(
        F.sum("__o").alias("n_events"),
        F.sum(F.col("__o").cast("decimal(38,0)") * F.col("__o"))
        .cast("decimal(38,0)")
        .alias("sum_sq"),
        F.count(F.lit(1)).alias("n_occupied_bins"),
    )


def dm_search(
    df: DataFrame,
    delay_rows: list[tuple[int, int, int]],
    period_us: int,
    nbins: int = 16,
    ts_col: str = "ts_us",
    chan_col: str = "chan",
) -> DataFrame:
    """Score every trial DM by epoch-folding dedispersed event times.

    ``delay_rows`` is the ``dispersion_delay_table`` output.  For each
    trial DM the channel's dispersion delay is subtracted from the
    event time (aligning all channels to the top of the band), then
    fold + score via ``shifted_fold_search``.  Returns one row per
    trial: (dm, n_events, sum_sq DECIMAL(38,0), n_occupied_bins).
    """
    return shifted_fold_search(
        df, delay_rows, period_us, nbins, ts_col, chan_col, "dm"
    )
