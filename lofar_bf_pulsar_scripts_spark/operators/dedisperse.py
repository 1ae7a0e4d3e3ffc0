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


def single_pulse_search(
    df: DataFrame,
    widths: list[int] | None = None,
    bin_us: int = 3_600_000_000,
    snr_x1000: int = 3000,
    ts_col: str = "ts_us",
) -> DataFrame:
    """Single-pulse search over a (dedispersed) event-time series —
    the single_pulse_search.py stage of the PRESTO-style workflow the
    reference's sp2tim.py single-pulse exports feed (sp2tim.py writes
    per-pulse .tim rows; this is the upstream detector that finds
    them): bin the series, run a bank of boxcar matched filters, keep
    window positions whose Poisson significance clears an S/N
    threshold, and cluster neighbouring detections into one candidate
    per burst.

    All decisions are exact-integer:

    * per-bin counts ``c_b`` with ``b = ts_us div bin_us``;
    * boxcar sum ``s(b, w) = sum c_{b..b+w-1}`` via a RANGE window
      over the *occupied* bins (empty bins contribute zero without
      densifying; a maximal boxcar can always be taken to start on an
      occupied bin, since shifting a window right past a leading
      empty bin never lowers its sum);
    * detection iff ``(s - mu*w) / sqrt(mu*w) >= snr_x1000/1000``
      with ``mu = n/span`` the mean bin rate (span = empty-inclusive
      bin count, n = event total) — the Poisson matched-filter S/N,
      whose sqrt(w) threshold growth is what makes a wide boxcar
      genuinely better for a spread burst (a mean-proportional
      threshold would make every width an identical per-bin rate
      test).  Evaluated in the exact-integer cross-multiplied form
      ``excess > 0 AND excess^2 * 10^6 >= snr_x1000^2 * n * w * span``
      where ``excess = s*span - n*w`` (DECIMAL(38,0) before the
      square: s*span reaches ~1e18 at 100 TB and its square must not
      wrap);
    * per width, detections whose starts are within ``w`` bins merge
      into one island (gap sessionization, the islands() closed
      form); the island reports its peak (max s, ties to earliest b).

    Returns (width, island_id, t_start_bin, t_peak_bin, peak_sum,
    n_cands) — one row per (width, island).

    Scale shape: the per-bin aggregation collapses map-side to at
    most span rows (time-span-bounded, not corpus-bounded); the
    width fan-out and RANGE windows run over that binned series, and
    the global (n, span) scalars ride a 1-row broadcast join.  The
    per-width window is a single partition over the binned series —
    span-bounded; at very long spans partition additionally by a
    coarse epoch with w-bin overlap (same recipe as streaming's
    tumbling dumps).
    """
    from pyspark.sql import Window

    if widths is None:
        widths = [1, 2, 4, 8]
    if not widths or any(w < 1 for w in widths):
        raise ValueError("widths must be a non-empty list of ints >= 1")
    if bin_us < 1:
        raise ValueError("bin_us must be >= 1")
    if snr_x1000 < 1:
        raise ValueError("snr_x1000 must be >= 1")
    bins = (
        df.select(F.expr(f"CAST({ts_col} AS BIGINT) div {int(bin_us)}").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = bins.agg(
        F.sum("c").alias("__n"),
        (F.max("b") - F.min("b") + F.lit(1)).alias("__span"),
    )
    # RANGE frame bounds must be literals, so the bank is a union of
    # one literal-framed window per width (widths is a small constant
    # list); each frame is [b, b + w - 1] over the occupied bins
    banked = None
    for w in sorted(set(int(x) for x in widths)):
        ww = Window.orderBy("b").rangeBetween(0, w - 1)
        part = (
            bins.withColumn("width", F.lit(w).cast("long"))
            .withColumn("s", F.sum("c").over(ww))
        )
        banked = part if banked is None else banked.unionByName(part)
    excess = (
        F.col("s").cast("decimal(38,0)") * F.col("__span")
        - F.col("__n").cast("decimal(38,0)") * F.col("width")
    )
    cands = (
        banked.crossJoin(F.broadcast(totals))
        .filter(
            (excess > 0)
            & (
                excess * excess * F.lit(1_000_000)
                >= F.lit(int(snr_x1000) * int(snr_x1000))
                * F.col("__n").cast("decimal(38,0)")
                * F.col("width")
                * F.col("__span")
            )
        )
        .select("width", "b", "s")
    )
    iw = Window.partitionBy("width").orderBy("b")
    islands = (
        cands.withColumn(
            "__new",
            F.when(
                F.col("b") - F.lag("b").over(iw) > F.col("width"), 1
            ).otherwise(F.when(F.lag("b").over(iw).isNull(), 1).otherwise(0)),
        )
        .withColumn(
            "island_id",
            F.sum("__new").over(
                iw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return islands.groupBy("width", "island_id").agg(
        F.min("b").alias("t_start_bin"),
        F.max(
            F.struct(F.col("s").alias("s"), (-F.col("b")).alias("nb"))
        ).alias("__pk"),
        F.count(F.lit(1)).alias("n_cands"),
    ).select(
        "width",
        "island_id",
        "t_start_bin",
        (-F.col("__pk.nb")).alias("t_peak_bin"),
        F.col("__pk.s").alias("peak_sum"),
        "n_cands",
    )


def subband_delay_tables(
    trial_dms: list[int],
    nominal_dm: int,
    nchan: int,
    nsub: int,
    f_lo_mhz: float,
    chan_bw_mhz: float,
) -> tuple[list[tuple[int, int, int]], list[tuple[int, int, int]]]:
    """Integer delay tables for TWO-STAGE (subband) dedispersion — the
    prepsubband half of the DDplan workflow whose single-delay helpers
    the reference ships (/root/reference/simple-sh-scripts/dide:12-13).

    Brute ``dm_search`` pays a |trials| fan-out on the raw corpus.
    The classic fix splits the delay: within a subband the channel is
    aligned to the subband's top channel at ONE nominal DM; across
    subbands each trial DM only shifts the (already collapsed)
    subband series.  Total delay decomposes as

        dt(chan, dm) ~= dt(chan -> sub_top @ nominal_dm)
                      + dt(sub_top -> band_top @ dm)

    exact at dm == nominal_dm; for other trials the within-subband
    residual (dm - nominal)/K * (f_c^-2 - f_subtop^-2) is the usual
    subband smearing, bounded by the subband width.

    Returns ``(chan_rows, sub_rows)``:

    * ``chan_rows``: (chan, sub, shift_us) — within-subband delay of
      the channel center relative to the subband's top channel center
      at ``nominal_dm``;
    * ``sub_rows``: (dm, sub, shift_us) — delay of the subband's top
      channel center relative to the band top at each trial DM.

    All integers (rounded µs), computed driver-side so Spark and any
    SQL oracle consume identical literals.
    """
    if not trial_dms:
        raise ValueError("trial_dms must be non-empty")
    if nchan < 2 or nsub < 1 or nchan % nsub != 0:
        raise ValueError("nchan must be >= 2 and divisible by nsub")
    m = nchan // nsub
    f_top = f_lo_mhz + (nchan - 0.5) * chan_bw_mhz
    chan_rows = []
    sub_tops = []
    for s in range(nsub):
        f_subtop = f_lo_mhz + ((s + 1) * m - 0.5) * chan_bw_mhz
        sub_tops.append(f_subtop)
        for c in range(s * m, (s + 1) * m):
            f_c = f_lo_mhz + (c + 0.5) * chan_bw_mhz
            dt_s = (nominal_dm / _DISP_K) * (
                1.0 / (f_c * f_c) - 1.0 / (f_subtop * f_subtop)
            )
            chan_rows.append((int(c), int(s), int(round(dt_s * 1e6))))
    sub_rows = []
    for dm in trial_dms:
        for s in range(nsub):
            f_subtop = sub_tops[s]
            dt_s = (dm / _DISP_K) * (
                1.0 / (f_subtop * f_subtop) - 1.0 / (f_top * f_top)
            )
            sub_rows.append((int(dm), int(s), int(round(dt_s * 1e6))))
    return chan_rows, sub_rows


def dedisperse_subbands(
    df: DataFrame,
    chan_rows: list[tuple[int, int, int]],
    tsamp_us: int,
    ts_col: str = "ts_us",
    chan_col: str = "chan",
) -> DataFrame:
    """Stage 1 of subband dedispersion: align every channel to its
    subband's top channel at the nominal DM and collapse the corpus to
    a per-(sub, time-bin) counts series.

    This is the ONLY pass over the raw corpus — the (chan -> sub,
    shift) table is a broadcast of nchan rows, and the (sub, tb)
    aggregation collapses map-side to at most nsub x span/tsamp rows
    (time-span-bounded, not corpus-bounded).  Returns (sub, tb, c).

    Integer contract: tb = (ts - shift) div tsamp with Spark ``div``
    truncation; callers feed non-negative epoch times (shift_us <<
    epoch µs), where truncating and flooring division agree — the
    same nonneg-domain convention the dm_search oracle relies on.
    """
    tsamp_us = int(tsamp_us)
    if tsamp_us < 1:
        raise ValueError("tsamp_us must be >= 1")
    spark = (
        SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    )
    cmap = spark.createDataFrame(
        [(int(c), int(s), int(u)) for c, s, u in chan_rows],
        "__chan long, sub long, shift_us long",
    )
    return (
        df.select(
            F.col(chan_col).cast("long").alias("__chan"),
            F.col(ts_col).cast("long").alias("__ts"),
        )
        .join(F.broadcast(cmap), "__chan")
        .select(
            "sub",
            F.expr(f"(__ts - shift_us) div {tsamp_us}").alias("tb"),
        )
        .groupBy("sub", "tb")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def subband_dm_search(
    df: DataFrame,
    trial_dms: list[int],
    nominal_dm: int,
    nchan: int,
    nsub: int,
    f_lo_mhz: float,
    chan_bw_mhz: float,
    period_us: int,
    nbins: int = 16,
    tsamp_us: int = 1_000_000,
    ts_col: str = "ts_us",
    chan_col: str = "chan",
) -> DataFrame:
    """Two-stage trial-DM search: ``dedisperse_subbands`` (one corpus
    pass) then a per-trial fold of the collapsed subband series.

    Scale shape vs brute ``dm_search``: the |trials| fan-out lands on
    the nsub x span/tsamp binned series instead of the raw corpus, so
    trial count and corpus size decouple — at 100 TB the corpus pays
    one scan + one map-side-collapsing aggregation, and the whole
    trial grid is arithmetic over a few thousand broadcast-joined
    rows.  Time bins enter the fold at their left edge (tb * tsamp) —
    deterministic integers end-to-end; with nsub == nchan and
    tsamp_us == 1 the result is bit-identical to ``dm_search``
    (within-subband shift is 0, the residual vanishes).

    Returns one row per trial: (dm, n_events, sum_sq DECIMAL(38,0),
    n_occupied_bins) — n_occupied_bins counts occupied (phase-bin)
    cells, as in ``dm_search``.
    """
    period_us = int(period_us)
    if period_us <= 0:
        raise ValueError("period_us must be positive")
    if nbins < 2:
        raise ValueError("nbins must be >= 2")
    chan_rows, sub_rows = subband_delay_tables(
        trial_dms, nominal_dm, nchan, nsub, f_lo_mhz, chan_bw_mhz
    )
    sb = dedisperse_subbands(df, chan_rows, tsamp_us, ts_col, chan_col)
    spark = (
        SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    )
    shifts = spark.createDataFrame(
        [(int(d), int(s), int(u)) for d, s, u in sub_rows],
        "dm long, sub long, shift_us long",
    )
    per_bin = (
        sb.join(F.broadcast(shifts), "sub")
        .select(
            "dm",
            F.expr(
                f"CAST((pmod(tb * {int(tsamp_us)} - shift_us, {period_us})"
                f" * {int(nbins)}) DIV {period_us} AS INT)"
            ).alias("bin"),
            "c",
        )
        .groupBy("dm", "bin")
        .agg(F.sum("c").alias("__o"))
    )
    return per_bin.groupBy("dm").agg(
        F.sum("__o").alias("n_events"),
        F.sum(F.col("__o").cast("decimal(38,0)") * F.col("__o"))
        .cast("decimal(38,0)")
        .alias("sum_sq"),
        F.count(F.lit(1)).alias("n_occupied_bins"),
    )
