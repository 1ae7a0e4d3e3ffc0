"""Ordered-sequence analytics over the event stream: conversion
funnels and cohort retention — the classic warehouse workloads a
general analytics engine owes its users, expressed as window/agg
plans with integer-exact outputs.

Both operators consume the µs-truncated epoch-seconds time column
(``tables.ts_seconds``) the rest of the event queries share, so
their oracles compare bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_reach(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "t",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step i+1 only with an
    event of that type STRICTLY AFTER their earliest completion of
    step i (the standard product-analytics semantics — no credit for
    out-of-order events). Returns one row per step: (step_idx, step,
    n_users, sum_user_id) with n_users monotonically non-increasing.

    Plan: a chain of per-step conditional-min aggregations joined on
    the user key — step i is ``ev(type=s_i) ⋈ reached_{i-1}`` filtered
    to t > t_{i-1}, then min per user. Each link is a narrow keyed
    shuffle whose right side only SHRINKS (reached users), and no
    per-user state is ever collected into an array — a bot with 10^7
    events costs its share of the scan, not executor memory (the
    collect_list formulation would OOM exactly there)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col),
        F.col(type_col).alias("__ty"),
        F.col(time_col).alias("__t"),
    ).filter(F.col("__ty").isin(list(steps)))
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, s in enumerate(steps):
        step_ev = ev.filter(F.col("__ty") == s)
        if prev is None:
            cur = step_ev.groupBy(user_col).agg(
                F.min("__t").alias("__prev_t")
            )
        else:
            cur = (
                step_ev.join(prev, user_col)
                .filter(F.col("__t") > F.col("__prev_t"))
                .groupBy(user_col)
                .agg(F.min("__t").alias("__t_next"))
                .withColumnRenamed("__t_next", "__prev_t")
            )
        reached.append(cur)
        prev = cur
    rows = []
    for i, (s, r) in enumerate(zip(steps, reached)):
        rows.append(
            r.agg(
                F.lit(i).cast("int").alias("step_idx"),
                F.lit(s).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
                F.sum(user_col).alias("sum_user_id"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "t",
    max_offset: int | None = None,
) -> DataFrame:
    """Day-cohort retention triangle: users grouped by their first
    active day; (cohort_day, day_offset, n_users, sum_user_id) counts
    how many of each cohort were active ``day_offset`` days later.
    Days are integer epoch-day indices (floor(t / 86400) — exact and
    engine-identical on the shared µs-truncated seconds).

    Plan: per-(user, day) distinct activity (one agg), a per-user min
    day (derived from the same table, broadcast back via a shuffle
    join on user), one final count — no window functions, three
    narrow shuffles on user/cohort keys."""
    act = (
        events.select(
            F.col(user_col),
            F.floor(F.col(time_col) / F.lit(86400.0))
            .cast("long")
            .alias("day"),
        )
        .distinct()
    )
    first = act.groupBy(user_col).agg(F.min("day").alias("cohort_day"))
    joined = act.join(first, user_col).select(
        user_col,
        "cohort_day",
        (F.col("day") - F.col("cohort_day")).alias("day_offset"),
    )
    if max_offset is not None:
        joined = joined.filter(F.col("day_offset") <= max_offset)
    return joined.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(user_col).alias("sum_user_id"),
    )
