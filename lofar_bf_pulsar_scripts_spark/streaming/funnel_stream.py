"""Stateful streaming conversion funnel (§2.9 family): the streaming
dual of ``operators.funnel.funnel_reach`` as an
``applyInPandasWithState`` step tracker — per user, the state is
(stage_reached, t_reached) and each micro-batch advances it through
the step list in strict event-time order.

Semantics: identical to the batch funnel (step i+1 needs an event of
its type STRICTLY after t_i; t_0 is the user's earliest step-0
event) whenever each user's rows arrive in event-time order across
micro-batches — the same honest in-order caveat as
``streaming_asof_join``; within a micro-batch rows are sorted by
(ts, event_id) so single-batch replays are exact unconditionally.
A user who has completed all steps is dead state (never grows).

State per user: two integers — bounded regardless of stream length.
Output: one append row per step REACHED: (user, step_idx, step, t).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def make_funnel_fn(steps: list[str]):
    n_steps = len(steps)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # Per-GROUP Python overhead is the whole cost of this
        # operator at scale (SCALE.md seventh wave): most users
        # advance zero steps in a given micro-batch, so the hot path
        # avoids pd.concat / sort_values / DataFrame construction
        # entirely — the greedy min-chain only ever needs, per step,
        # "min event time of this type strictly after the threshold",
        # which is a vectorized numpy reduction, not a row loop.
        import numpy as np

        stage0, t0 = state.get if state.exists else (0, None)
        stage, t_reached = stage0, t0
        out: list[tuple] = []
        chunks = [c for c in pdfs if len(c)]  # always drain the iterator
        if stage < n_steps and chunks:
            rows = chunks[0] if len(chunks) == 1 else pd.concat(
                chunks, ignore_index=True
            )
            ts_all = rows["__ts"].to_numpy()
            valid = ~pd.isna(ts_all)
            if valid.any():
                ts_all = ts_all[valid].astype("int64", copy=False)
                ty_all = rows["__ty"].to_numpy()[valid]
                while stage < n_steps:
                    cand = ts_all[ty_all == steps[stage]]
                    if stage > 0 or t_reached is not None:
                        cand = cand[cand > t_reached]
                    if cand.size == 0:
                        break
                    t_reached = int(cand.min())
                    out.append((key[0], stage, steps[stage], t_reached))
                    stage += 1
        if (stage, t_reached) != (stage0, t0):
            state.update((stage, t_reached))
        if out:
            yield pd.DataFrame(
                {
                    "user": pd.array([r[0] for r in out], dtype="int64"),
                    "step_idx": pd.array([r[1] for r in out], dtype="int32"),
                    "step": pd.array([r[2] for r in out], dtype=object),
                    "t": pd.array([r[3] for r in out], dtype="int64"),
                }
            )

    return update


def streaming_funnel_joins(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window: str = "365 days",
    watermark: str = "0 seconds",
) -> DataFrame:
    """JVM-only streaming funnel (VERDICT r8 item 8): the greedy
    min-chain restated as CHAINED time-interval stream-stream joins,
    so the whole query lives in the JVM state store — no
    applyInPandasWithState, no Arrow boundary, no Python workers
    (this container has no protobuf runtime, so Spark 4's
    transformWithStateInPandas JVM-state path cannot run; this is
    the chained-join alternative that VERDICT names).

    Equivalence: a step-i event ``x`` is *reachable* iff there is a
    strictly increasing chain of step-0..i events ending at ``x``;
    the greedy tracker's t_i is the MINIMUM reachable step-i time
    (exchange argument), and join stage i emits exactly the
    reachable step-i events, so per-user reach sets — and their min
    times — agree with ``streaming_funnel``. ``window`` is the
    conversion window (the time-range bound every production funnel
    has; it is what lets Spark evict join state at the watermark).
    Set it to the replay's full span for gate-exact unbounded
    semantics.

    Scale shape: each stage is one stream-stream equi-join on the
    user with a time-range condition (state = in-window events per
    side, evicted by watermark), a dropDuplicates on (user, t)
    between stages caps the fan-through at the per-user DISTINCT
    event times (state one row per distinct reachable time), and the
    final dropDuplicates((user, step_idx)) emits each reach exactly
    once — per-user state bounded like the tracker's. Join fan-out
    within a stage is per-user |step i| x |step i+1| inside the
    window — the per-user event-density constant, not a function of
    corpus size.

    Output (append): (user long, step_idx int, step string) — one
    row per (user, step reached).
    """
    from pyspark.sql import functions as F

    if not steps:
        raise ValueError("steps must be non-empty")
    branches = []
    for i, st in enumerate(steps):
        branches.append(
            events.filter(F.col(type_col) == st)
            .select(
                F.col(user_col).cast("long").alias(f"u{i}"),
                F.col(ts_col).alias(f"t{i}"),
            )
            .withWatermark(f"t{i}", watermark)
        )
    reach = [
        branches[0].select(
            F.col("u0").alias("user"),
            F.lit(0).cast("int").alias("step_idx"),
            F.lit(steps[0]).alias("step"),
        )
    ]
    prev = branches[0]
    for i in range(1, len(steps)):
        cond = F.expr(
            f"u{i-1} = u{i} AND t{i} > t{i-1} "
            f"AND t{i} <= t{i-1} + INTERVAL {window}"
        )
        j = (
            prev.join(branches[i], cond)
            .select(f"u{i}", f"t{i}")
            .dropDuplicates([f"u{i}", f"t{i}"])
        )
        reach.append(
            j.select(
                F.col(f"u{i}").alias("user"),
                F.lit(i).cast("int").alias("step_idx"),
                F.lit(steps[i]).alias("step"),
            )
        )
        prev = j
    out = reach[0]
    for r in reach[1:]:
        out = out.unionByName(r)
    return out.dropDuplicates(["user", "step_idx"])


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "__ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Attach the stateful step tracker to a (possibly streaming)
    event frame. ``ts_col`` must be integer epoch units (the caller
    picks the resolution; parity gates use microseconds)."""
    from pyspark.sql import functions as F

    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).cast("long").alias("__ts"),
        F.col(type_col).alias("__ty"),
        F.col(id_col).cast("long").alias("__eid"),
    )
    return ev.groupBy("user").applyInPandasWithState(
        make_funnel_fn(list(steps)),
        outputStructType="user long, step_idx int, step string, t long",
        stateStructType="stage int, t_reached long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
