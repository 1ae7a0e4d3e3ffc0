"""Phase folding (SURVEY §2.4 A4/A5/A6, §2.5 W9).

Semantics from the reference's sample-level fold loop
(/root/reference/pulsestack.py:505-650): for each sample at time t,
``phase = frac((t - t0)/P)``, ``ibin = int(nbins * phase)``; profile is
the per-bin mean (``profile[ibin] += x; counts[ibin] += 1`` then
``profile/counts`` at pulsestack.py:583-650). Event folding
(pulsestack.py:622-650) is the count-only variant. Sub-integration
dumps (pulsestack.py:536-612) tile time into tumbling windows first.

Spark-first design: the reference's carry-across-blocks bookkeeping
(``elapsed_secs/turns``, pulsestack.py:516-619) disappears — phase is a
pure per-row expression, so the fold is one map-side projection plus a
single partial+final hash aggregation on a small key space (nbins or
nbins*nwindows). At 100 TB this is the ideal shape: no wide shuffle —
the shuffle key cardinality is tiny, map-side combine collapses each
input partition to <= nbins rows before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def phase_column(t: Column, period: float, t0: float = 0.0) -> Column:
    """phase in [0,1) of time ``t`` for folding period ``period``."""
    return F.pmod((t - F.lit(float(t0))) / F.lit(float(period)), F.lit(1.0))


def bin_column(t: Column, period: float, nbins: int, t0: float = 0.0) -> Column:
    """Phase-bin index: int(nbins * phase), clamped to nbins-1."""
    raw = F.floor(phase_column(t, period, t0) * F.lit(int(nbins))).cast("int")
    return F.least(raw, F.lit(int(nbins) - 1))


def fold(
    df: DataFrame,
    period: float,
    nbins: int,
    t_col: str = "t",
    value_col: str = "value",
    t0: float = 0.0,
) -> DataFrame:
    """Fold a time series into a per-bin mean profile.

    Returns (bin INT, profile DOUBLE, npts BIGINT), one row per
    populated phase bin.
    """
    return (
        df.select(
            bin_column(F.col(t_col), period, nbins, t0).alias("bin"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy("bin")
        .agg(
            F.avg("__v").alias("profile"),
            F.count("__v").alias("npts"),
        )
    )


def fold_events(
    df: DataFrame,
    period: float,
    nbins: int,
    t_col: str = "t",
    t0: float = 0.0,
) -> DataFrame:
    """Count-only event fold (pulsestack.py:622-650): per-bin counts."""
    return (
        df.select(bin_column(F.col(t_col), period, nbins, t0).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("nevents"))
    )


def fold_subints(
    df: DataFrame,
    period: float,
    nbins: int,
    dump_time: float,
    t_col: str = "t",
    value_col: str = "value",
    t0: float = 0.0,
) -> DataFrame:
    """Sub-integration fold (pulsestack.py:536-612): tumbling time
    windows of ``dump_time`` seconds, per-(window, bin) mean.

    Key space is nwindows*nbins — still tiny relative to input; one
    hash aggregation with map-side combine.
    """
    t = F.col(t_col)
    win = F.floor((t - F.lit(float(t0))) / F.lit(float(dump_time))).cast("bigint")
    return (
        df.select(
            win.alias("subint"),
            bin_column(t, period, nbins, t0).alias("bin"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy("subint", "bin")
        .agg(F.avg("__v").alias("profile"), F.count("__v").alias("npts"))
    )


def rotate(df: DataFrame, shift: int, nbins: int, bin_col: str = "bin") -> DataFrame:
    """Circular profile rotation by ``shift`` bins (W9; semantics of
    /root/reference/snr.py:36-46 bestprof_rotate /
    /root/reference/fluxcal/lofar_fluxcal.py:456-460)."""
    return df.withColumn(
        bin_col, F.pmod(F.col(bin_col) + F.lit(int(shift)), F.lit(int(nbins))).cast("int")
    )


def period_search(
    df: DataFrame,
    trial_periods_us: list[int],
    nbins: int = 16,
    ts_col: str = "ts_us",
) -> DataFrame:
    """Trial-period search by epoch folding (the prepfold/PRESTO
    candidate-scoring core the A4/A5 folds feed): fold the event
    times at every trial period, score each fold's deviation from a
    flat profile, return one row per trial period with the
    engine-exact score ingredients.

    The classical chi^2 statistic against uniformity is
    sum_b (O_b - n/nbins)^2 / (n/nbins) = (nbins/n) sum_b O_b^2 - n —
    for a FIXED event count n this is a monotone function of
    sum_b O_b^2 alone, so the search ranks trial periods by the
    integer ``sum_sq`` exactly (no float chi^2 needed; the caller can
    derive the chi^2 value from (sum_sq, n, nbins) if wanted).

    Everything is integer arithmetic: the phase bin is
    ``((ts mod p) * nbins) DIV p`` (exact for ts, p in microseconds),
    and sum of squared counts is widened to DECIMAL(38,0) (a 100 TB
    corpus puts per-bin counts near 2^36, whose square overflows
    int64 — SCALE.md pitfall 9).

    Scale shape: the trial grid is a constant-array explode (|trials|
    fan-out) feeding a (period, bin) aggregation whose key space is
    |trials| x nbins — partial aggregation collapses it map-side, so
    the shuffle carries a few hundred rows regardless of corpus
    size."""
    if not trial_periods_us:
        raise ValueError("trial_periods_us must be non-empty")
    if nbins < 2:
        raise ValueError("nbins must be >= 2")
    periods = F.array(*[F.lit(int(p)).cast("long") for p in trial_periods_us])
    ts = F.col(ts_col).cast("long")
    binned = df.select(ts.alias("__ts")).select(
        "__ts", F.explode(periods).alias("period_us")
    ).select(
        "period_us",
        F.expr(
            f"CAST((pmod(__ts, period_us) * {int(nbins)}) "
            "DIV period_us AS INT)"
        ).alias("bin"),
    )
    per_bin = binned.groupBy("period_us", "bin").agg(
        F.count(F.lit(1)).alias("__o")
    )
    return per_bin.groupBy("period_us").agg(
        F.sum("__o").alias("n_events"),
        # stays decimal(38,0) end-to-end (DuckDB mirror: HUGEINT) —
        # the comparison layer normalizes Decimal vs int
        F.sum(
            F.col("__o").cast("decimal(38,0)") * F.col("__o")
        ).cast("decimal(38,0)").alias("sum_sq"),
        F.count(F.lit(1)).alias("n_occupied_bins"),
    )


def harmonic_sum(
    periodogram: DataFrame,
    nharm: int = 4,
    period_col: str = "period_us",
    score_col: str = "sum_sq",
) -> DataFrame:
    """Incoherent harmonic summing over a trial-period periodogram
    (the accelsearch-style booster applied after ``period_search``):
    a pulsar with a narrow duty cycle spreads power into harmonics,
    so the score of fundamental P is strengthened by adding the
    scores of P/2, P/3, ... when those periods are in the trial grid.

    Harmonic matching is exact-integer: trial q is the h-th harmonic
    of fundamental p iff ``p % h == 0 and q == p div h`` — grids
    meant for summing should therefore contain exact integer
    sub-multiples of their fundamentals.  Returns one row per
    fundamental: (period_us, n_harm_present, hsum) where hsum is the
    DECIMAL(38,0) sum of the matched harmonics' scores (h=1, the
    fundamental itself, always matches).

    Scale shape: the periodogram is |trials| rows — constant-size
    regardless of the corpus that produced it — so the harmonic join
    is a broadcast equi-join between two constant-size relations; the
    corpus is never touched again.
    """
    if nharm < 1:
        raise ValueError("nharm must be >= 1")
    p = F.col(period_col).cast("long")
    wanted = (
        periodogram.select(p.alias("__p"))
        .withColumn(
            "__h", F.explode(F.array(*[F.lit(h) for h in range(1, nharm + 1)]))
        )
        .filter(F.pmod(F.col("__p"), F.col("__h")) == 0)
        .select(
            "__p",
            F.expr("__p div __h").alias("__hp"),
        )
    )
    scores = periodogram.select(
        p.alias("__hp"),
        F.col(score_col).cast("decimal(38,0)").alias("__s"),
    )
    return (
        wanted.join(F.broadcast(scores), "__hp")
        .groupBy(F.col("__p").alias(period_col))
        .agg(
            F.count(F.lit(1)).alias("n_harm_present"),
            F.sum("__s").cast("decimal(38,0)").alias("hsum"),
        )
    )


def accel_shift_table(
    trial_accs_us_per_day2: list[int],
    n_chunks: int,
    chunk_us: int = 86_400_000_000,
) -> list[tuple[int, int, int]]:
    """(acc, chunk, shift_us) rows for a piecewise-constant
    acceleration search: a linear period drift shifts arrival times
    quadratically, shift(t) = acc/2 * t_days^2, approximated as
    constant within each time chunk (the reference's per-block period
    update, pulsestack.py:155 'period is updated for every block',
    generalized to a TRIAL grid like prepfold's pdot axis).

    Computed driver-side (|trials| x n_chunks integers) so Spark and
    any SQL oracle consume identical literals — the same recipe as
    ``dedisperse.dispersion_delay_table``.
    """
    if not trial_accs_us_per_day2:
        raise ValueError("trial_accs_us_per_day2 must be non-empty")
    if n_chunks < 1:
        raise ValueError("n_chunks must be >= 1")
    day_us = 86_400_000_000
    rows = []
    for acc in trial_accs_us_per_day2:
        for k in range(n_chunks):
            t_mid_days = (k + 0.5) * (chunk_us / day_us)
            rows.append(
                (int(acc), int(k), int(round(0.5 * acc * t_mid_days**2)))
            )
    return rows


def accel_search(
    df: DataFrame,
    shift_rows: list[tuple[int, int, int]],
    period_us: int,
    nbins: int = 16,
    ts_col: str = "ts_us",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Score every trial acceleration by epoch-folding drift-corrected
    event times: subtract the trial's per-chunk shift, fold at the
    base period, score by the exact-integer sum of squared bin counts
    (period_search's statistic).  Returns one row per trial:
    (acc, n_events, sum_sq DECIMAL(38,0), n_occupied_bins).

    Scale shape identical to ``dm_search`` — both delegate to
    ``dedisperse.shifted_fold_search`` (one broadcast shift table,
    one corpus equi-join, map-side-collapsing (trial, bin) agg).
    """
    from .dedisperse import shifted_fold_search

    return shifted_fold_search(
        df, shift_rows, period_us, nbins, ts_col, chunk_col, "acc"
    )


def sift_candidates(
    periodogram: DataFrame,
    nharm: int = 8,
    tol_us: int = 1000,
    period_col: str = "period_us",
    score_col: str = "sum_sq",
) -> DataFrame:
    """Candidate sifting over a trial-period periodogram (the
    PRESTO-sifting analog of the reference's manual candidate vetting
    between its fold and snr stages, pulsestack.py §3.3 feeding
    snr.py): collapse harmonically-related trial periods onto their
    strongest member so the survivor list contains one row per
    physical candidate, not one per harmonic.

    Relatedness is tolerance-banded integer arithmetic: candidates a
    and b (periods pa <= pb) are related iff for some h in 1..nharm,
    ``|h*pa - pb| <= h*tol_us`` — b is (within tol per fold of h) the
    h-th multiple of a.  h=1 merges near-duplicate trial periods.

    Assignment is ONE-LEVEL and deterministic (exactly PRESTO sift's
    greedy shape, not a transitive closure): every candidate maps to
    the highest-scoring member of its related set (self included),
    ties broken by larger period, then the output groups by that
    fundamental:  (period_us, score, n_members, n_self) where
    n_members counts candidates absorbed into this fundamental and
    n_self = 1 iff the fundamental chose itself (a survivor).
    Non-transitivity means a fundamental can itself be absorbed
    elsewhere; n_self exposes that honestly rather than hiding it
    behind an iterative closure the oracle could not express.

    Scale shape: the periodogram is |trials| rows — constant in
    corpus size — so the relatedness self-join is a broadcast join of
    two tiny relations crossed with a constant 1..nharm array; the
    corpus is never touched.
    """
    if nharm < 1:
        raise ValueError("nharm must be >= 1")
    if tol_us < 0:
        raise ValueError("tol_us must be >= 0")
    p = F.col(period_col).cast("long")
    s = F.col(score_col).cast("decimal(38,0)")
    # the self-join consumes the periodogram TWICE; without lineage
    # truncation each branch re-runs the upstream fold (a full corpus
    # scan each) — checkpoint the |trials|-row aggregate so the
    # corpus is folded once (lazy: materializes at first action)
    periodogram = periodogram.localCheckpoint(eager=False)
    cand = periodogram.select(p.alias("__p"), s.alias("__s"))
    other = cand.select(
        F.col("__p").alias("__q"), F.col("__s").alias("__t")
    )
    h = F.explode(
        F.array(*[F.lit(i).cast("long") for i in range(1, nharm + 1)])
    ).alias("__h")
    pairs = (
        cand.select("__p", "__s", h)
        .join(
            F.broadcast(other),
            (
                F.abs(F.col("__h") * F.col("__p") - F.col("__q"))
                <= F.col("__h") * F.lit(int(tol_us))
            )
            | (
                F.abs(F.col("__h") * F.col("__q") - F.col("__p"))
                <= F.col("__h") * F.lit(int(tol_us))
            ),
        )
        .select("__p", "__s", "__q", "__t")
        .distinct()
    )
    # fundamental(c) = argmax over related ∪ {c} by (score, period);
    # the h=1 self-pair guarantees {c} is in the set
    assigned = pairs.groupBy("__p", "__s").agg(
        F.max(
            F.struct(F.col("__t").alias("s"), F.col("__q").alias("p"))
        ).alias("__f")
    )
    return (
        assigned.groupBy(
            F.col("__f.p").alias(period_col),
            F.col("__f.s").alias(score_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(
                F.when(F.col("__p") == F.col("__f.p"), 1).otherwise(0)
            ).alias("n_self"),
        )
    )


def timing_fit(
    df: DataFrame,
    period_us: int,
    x0_us: int,
    ts_col: str = "ts_us",
) -> DataFrame:
    """Timing-residual linear fit (the pdmp/tempo-lite refinement
    step downstream of the reference's folds: snr.py's best-period
    scan and pulsestack.py's per-block period update both exist to
    absorb exactly this residual drift): fold event micro-times at a
    trial period, regress the centered phase residual against elapsed
    time, and report the drift slope — the fractional period error
    dP/P is slope_us_per_s / 1e6.

    Exact-integer core:

    * residual ``r_us = ((ts + P/2) mod P) - P/2`` in [-P/2, P/2)
      (integer µs; inputs after x0 are positive so Spark pmod and
      SQL % agree);
    * elapsed ``x_s = (ts - x0_us) div 1e6`` integer seconds from the
      caller's fixed epoch literal ``x0_us`` (MUST be <= min(ts):
      keeping x nonnegative sidesteps the trunc-vs-floor integer
      division divergence between engines, and centering at the
      observation start keeps sum(x^2) ~ span^2 * n — DECIMAL(38,0)
      safe past 1e12 rows, where uncentered epoch seconds would
      overflow);
    * the five regression sums (n, sx, sr, sxx, sxr) aggregate as
      exact integers (DECIMAL(38,0) for the products); slope and
      intercept derive from them in ONE fixed float expression the
      oracle mirrors verbatim — the only inexact step is the final
      IEEE division + 6 dp round.

    Returns one row: (n, sx, sr, slope_us_per_s, intercept_us).

    Scale shape: a single map-side-collapsing global aggregation of
    five associative integer sums — no wide shuffle at any corpus
    size (the same all-reduce shape as profile_stats).
    """
    p = int(period_us)
    if p < 2:
        raise ValueError("period_us must be >= 2")
    half = p // 2
    ts = F.col(ts_col).cast("long")
    base = df.select(
        (F.pmod(ts + F.lit(half), F.lit(p)) - F.lit(half)).alias("r"),
        F.expr(
            f"(CAST({ts_col} AS BIGINT) - {int(x0_us)}) div 1000000"
        ).alias("x"),
    )
    sums = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("r").alias("sr"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("r"))
        .cast("decimal(38,0)")
        .alias("sxr"),
    )
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("sxr")
        - F.col("sx").cast("decimal(38,0)") * F.col("sr")
    )
    den = (
        F.col("n").cast("decimal(38,0)") * F.col("sxx")
        - F.col("sx").cast("decimal(38,0)") * F.col("sx")
    )
    slope = num.cast("double") / den.cast("double")
    return sums.select(
        "n",
        "sx",
        "sr",
        F.round(slope, 6).alias("slope_us_per_s"),
        F.round(
            (
                F.col("sr").cast("double")
                - slope * F.col("sx").cast("double")
            )
            / F.col("n").cast("double"),
            6,
        ).alias("intercept_us"),
    )


def pulse_energy_hist(
    df: DataFrame,
    period_us: int,
    on_lo: int,
    on_hi: int,
    nbins: int = 16,
    ts_col: str = "ts_us",
) -> DataFrame:
    """Pulse-energy distribution over single rotations — the nulling /
    energy-histogram analysis a single-pulse stack feeds (the
    reference's pulse stacks, /root/reference/pulsestack.py:505-650,
    are exactly the per-rotation × phase matrix this collapses; the
    Ritchings-style nulling fraction reads off the e_on = 0 cell).

    Per rotation r = ts div period: e_on = event count with phase bin
    in [on_lo, on_hi), e_off = the rest.  Rotations with NO events at
    all never reach the aggregation, so the e_on = 0 histogram cell is
    corrected with span - |observed rotations| empty rotations (span =
    max(r) - min(r) + 1 — the observation is contiguous by
    construction; a gapped observation should pass one observation at
    a time, same contract as single_pulse_search's span).

    Returns (e_on, n_rotations, sum_e_off), exact integers.

    Scale shape: the (rotation) aggregation's key space is
    span/period — time-bounded, not corpus-bounded — and collapses
    map-side; the energy histogram is a second tiny aggregation; the
    empty-rotation correction rides a 1-row broadcast of the totals.
    """
    period_us = int(period_us)
    if period_us <= 0:
        raise ValueError("period_us must be positive")
    if nbins < 2:
        raise ValueError("nbins must be >= 2")
    if not 0 <= on_lo < on_hi <= nbins:
        raise ValueError("need 0 <= on_lo < on_hi <= nbins")
    binned = df.select(
        F.expr(f"CAST({ts_col} AS BIGINT) div {period_us}").alias("r"),
        F.expr(
            f"CAST((pmod(CAST({ts_col} AS BIGINT), {period_us})"
            f" * {int(nbins)}) DIV {period_us} AS INT)"
        ).alias("bin"),
    )
    on = (F.col("bin") >= on_lo) & (F.col("bin") < on_hi)
    per_rot = binned.groupBy("r").agg(
        F.sum(F.when(on, 1).otherwise(0)).alias("e_on"),
        F.sum(F.when(on, 0).otherwise(1)).alias("e_off"),
    )
    hist = per_rot.groupBy("e_on").agg(
        F.count(F.lit(1)).alias("n_rotations"),
        F.sum("e_off").alias("sum_e_off"),
    )
    missing = per_rot.agg(
        (
            F.max("r") - F.min("r") + F.lit(1) - F.count(F.lit(1))
        ).alias("n_rotations")
    ).select(
        F.lit(0).cast("long").alias("e_on"),
        "n_rotations",
        F.lit(0).cast("long").alias("sum_e_off"),
    ).filter(F.col("n_rotations") > 0)
    return (
        hist.unionByName(missing)
        .groupBy("e_on")
        .agg(
            F.sum("n_rotations").alias("n_rotations"),
            F.sum("sum_e_off").alias("sum_e_off"),
        )
    )
