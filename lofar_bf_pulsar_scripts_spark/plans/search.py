"""End-to-end blind pulsar search: the composition the reference's
real workflow runs, not just its stages.

The reference pipelines chain dedispersion -> period candidate
scoring -> harmonic boosting -> drift refinement -> final fold
(pulsestack.py's per-block folding loop fed by sp2tim.py-style event
times; PRESTO's prepsubband/accelsearch/prepfold chain is the same
shape).  ``blind_search_summary`` expresses that chain as ONE
collect-free Spark plan over an event stream:

1. joint (DM, period) grid scored by exact-integer epoch folding —
   the corpus pays one broadcast equi-join on its channel id (|DM|
   fan-out) and one constant-array explode (|P| fan-out); the
   (dm, period, bin) aggregation collapses map-side, so the shuffle
   carries |DM| x |P| x nbins rows at any corpus size;
2. incoherent harmonic summing per (dm, fundamental) — a broadcast
   self-join of the CONSTANT-size periodogram (exact-integer
   sub-multiple matching, fold.harmonic_sum's rule);
3. best (dm, period) by harmonic-boosted score (hsum desc, then dm,
   period asc — fully deterministic), kept as a 1-row broadcast
   frame, never collected;
4. trial-drift scoring at the best candidate: dedisperse at best DM
   (the delay table filtered BY THE JOIN to the winning dm), subtract
   each trial acceleration's per-chunk shift
   (fold.accel_shift_table), fold at the winning period — the period
   enters the bin expression as a COLUMN from the 1-row winner frame,
   which is why no stage needs a driver round-trip;
5. final fold at (best dm, best period, best acc): the profile's
   peak bin + count joins the summary.

Returns ONE row: (best_dm, best_period_us, best_hsum, best_acc,
acc_sum_sq, n_events, peak_bin, peak_count) — every field an exact
integer, so the whole pipeline is hash-gateable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def blind_search_summary(
    events: DataFrame,
    delay_rows: list[tuple[int, int, int]],
    trial_periods_us: list[int],
    acc_shift_rows: list[tuple[int, int, int]],
    nbins: int = 16,
    nharm: int = 4,
    ts_col: str = "ts_us",
    chan_col: str = "chan",
    chunk_col: str = "chunk",
) -> DataFrame:
    """One-row blind-search verdict over an event stream (module
    docstring has the stage map).  ``delay_rows`` from
    ``dedisperse.dispersion_delay_table``; ``acc_shift_rows`` from
    ``fold.accel_shift_table`` — both driver-computed integer tables
    small enough to broadcast (|DM| x nchan, |acc| x nchunks)."""
    if nbins < 2:
        raise ValueError("nbins must be >= 2")
    if nharm < 1:
        raise ValueError("nharm must be >= 1")
    spark = (
        SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    )
    delays = spark.createDataFrame(
        [(int(d), int(c), int(u)) for d, c, u in delay_rows],
        "dm long, __chan long, delay_us long",
    )
    accs = spark.createDataFrame(
        [(int(a), int(k), int(s)) for a, k, s in acc_shift_rows],
        "acc long, __chunk long, shift_us long",
    )
    periods = F.array(
        *[F.lit(int(p)).cast("long") for p in trial_periods_us]
    )
    t = events.select(
        F.col(ts_col).cast("long").alias("__ts"),
        F.col(chan_col).cast("long").alias("__chan"),
        F.col(chunk_col).cast("long").alias("__chunk"),
    )

    # -- stage 1: joint (dm, period) periodogram ----------------------
    dd = t.join(F.broadcast(delays), "__chan").select(
        "dm", (F.col("__ts") - F.col("delay_us")).alias("__tdd"), "__chunk"
    )
    joint = (
        dd.select("dm", "__tdd", F.explode(periods).alias("period_us"))
        .select(
            "dm",
            "period_us",
            F.expr(
                f"CAST((pmod(__tdd, period_us) * {int(nbins)}) "
                "DIV period_us AS INT)"
            ).alias("bin"),
        )
        .groupBy("dm", "period_us", "bin")
        .agg(F.count(F.lit(1)).alias("__o"))
        .groupBy("dm", "period_us")
        .agg(
            F.sum(F.col("__o").cast("decimal(38,0)") * F.col("__o"))
            .cast("decimal(38,0)")
            .alias("sum_sq")
        )
    )

    # -- stage 2: harmonic summing per dm (exact sub-multiples) -------
    wanted = (
        joint.select("dm", F.col("period_us").alias("__p"))
        .withColumn(
            "__h",
            F.explode(F.array(*[F.lit(h) for h in range(1, nharm + 1)])),
        )
        .filter(F.pmod(F.col("__p"), F.col("__h")) == 0)
        .select("dm", "__p", F.expr("__p div __h").alias("__hp"))
    )
    scores = joint.select(
        "dm", F.col("period_us").alias("__hp"), F.col("sum_sq").alias("__s")
    )
    hsums = (
        wanted.join(F.broadcast(scores), ["dm", "__hp"])
        .groupBy("dm", F.col("__p").alias("period_us"))
        .agg(F.sum("__s").cast("decimal(38,0)").alias("hsum"))
    )

    # -- stage 3: deterministic winner, kept distributed --------------
    best = F.broadcast(
        hsums.orderBy(
            F.desc("hsum"), F.asc("dm"), F.asc("period_us")
        )
        .limit(1)
        .select(
            F.col("dm").alias("best_dm"),
            F.col("period_us").alias("best_period_us"),
            F.col("hsum").cast("long").alias("best_hsum"),
        )
    )

    # -- stage 4: trial-drift scoring at the winner -------------------
    # the winner filters the DIMENSION side before the corpus join:
    # the corpus fans out 1 x nchan delay rows here, not |DM| x — and
    # the per-(acc, bin) counts below serve BOTH the trial scoring
    # and the final profile peak (one corpus pass for stages 4+5)
    best_delays = F.broadcast(
        delays.join(best, delays["dm"] == best["best_dm"]).select(
            "__chan", "delay_us", "best_dm", "best_period_us", "best_hsum"
        )
    )
    drift = (
        t.join(best_delays, "__chan")
        .join(F.broadcast(accs), "__chunk")
        .select(
            "acc",
            "best_dm",
            "best_period_us",
            "best_hsum",
            (F.col("__ts") - F.col("delay_us") - F.col("shift_us")).alias(
                "__tc"
            ),
        )
    )
    per_bin = (
        drift.select(
            "acc",
            "best_dm",
            "best_period_us",
            "best_hsum",
            F.expr(
                f"CAST((pmod(__tc, best_period_us) * {int(nbins)}) "
                "DIV best_period_us AS INT)"
            ).alias("bin"),
        )
        .groupBy("acc", "best_dm", "best_period_us", "best_hsum", "bin")
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    acc_scores = per_bin.groupBy(
        "acc", "best_dm", "best_period_us", "best_hsum"
    ).agg(
        F.sum("__o").alias("n_events"),
        F.sum(F.col("__o").cast("decimal(38,0)") * F.col("__o"))
        .cast("decimal(38,0)")
        .alias("acc_sum_sq"),
    )
    best_acc = F.broadcast(
        acc_scores.orderBy(F.desc("acc_sum_sq"), F.asc("acc"))
        .limit(1)
        .select(
            "best_dm",
            "best_period_us",
            "best_hsum",
            F.col("acc").alias("best_acc"),
            F.col("acc_sum_sq").cast("long").alias("acc_sum_sq"),
            F.col("n_events").alias("n_events"),
        )
    )

    # -- stage 5: final fold profile peak at (dm, p, acc) -------------
    # reuses stage 4's per-(acc, bin) counts: |acc| x nbins rows, the
    # corpus is not touched again
    final = (
        per_bin.join(
            best_acc.select("best_acc"),
            per_bin["acc"] == F.col("best_acc"),
        )
        .select("bin", "__o")
        .agg(
            F.max(
                F.struct(
                    F.col("__o").alias("c"), (-F.col("bin")).alias("nb")
                )
            ).alias("__pk")
        )
        .select(
            (-F.col("__pk.nb")).cast("long").alias("peak_bin"),
            F.col("__pk.c").alias("peak_count"),
        )
    )
    return best_acc.crossJoin(F.broadcast(final)).select(
        "best_dm",
        "best_period_us",
        "best_hsum",
        "best_acc",
        "acc_sum_sq",
        "n_events",
        "peak_bin",
        "peak_count",
    )
