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
