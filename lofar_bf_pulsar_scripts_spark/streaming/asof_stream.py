"""Stateful streaming as-of join (SURVEY §2.9): the stream-table
temporal join — each event picks up the latest state row with
state.ts <= event.ts for its key — as a custom
``applyInPandasWithState`` operator, making the batch
``operators.asof.asof_join``'s "streaming-compatible" carry-forward
an executed fact rather than a claim.

Semantics and honest limits: within a micro-batch, rows are sorted by
event time and the carried value is exact; ACROSS micro-batches the
operator carries the per-key (last_ts, last_value) state forward, so
results are exact whenever each key's rows arrive in event-time order
across batches (e.g. a per-key-ordered log/Kafka partition — the
reference's hw-state poll stream is exactly this). A state row that
arrives after an event it should have served cannot retroactively
re-emit that event, and a late state row OLDER than the carried one
is dropped (never applied backward) — that reordering window is what
the batch asof_join is for. NULL-valued state rows are skipped
(matching the batch form's ignorenulls carry) and NULL timestamps
are dropped.

State per key: (last_ts, last json-encoded value). Bounded: one row
per key, independent of stream length.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def make_asof_fn(value_col: str):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, last_val = (
            state.get if state.exists else (None, None)
        )
        # drop empty chunks and NULL-ts rows BEFORE concat: an empty
        # chunk's columns default to float64 and the concat upcasts
        # int64 __ts to float64, silently rounding keys above 2^53
        # (observed: composite epoch keys off by 1 on the 1024-spaced
        # float grid). Same trap for a chunk whose own NULLs force a
        # float column.
        chunks = []
        for c in pdfs:
            if len(c):
                c = c[c["__ts"].notna()]
                if len(c):
                    chunks.append(c)
        if not chunks:
            state.update((last_ts, last_val))
            yield pd.DataFrame(
                [], columns=["key", "event_ts", "asof_ts", "asof_value"]
            )
            return
        if len(chunks) == 1:
            rows = chunks[0]
        else:
            rows = pd.concat(chunks, ignore_index=True)
        # VECTORIZED carry-forward in pure numpy (the row-at-a-time
        # loop measured exp 0.91 at 10x — linear Python time per row;
        # a first pandas-Series rewrite LOST at per-user group sizes,
        # where Series construction overhead beats the loop — numpy
        # lexsort + maximum.accumulate wins at every group size).
        # After the (ts, side) sort — side 0 before 1 at the same
        # instant, matching the batch asof_join's inclusive <= — ts is
        # monotone within the batch, so the late-state rule ("a state
        # row OLDER than the carried one never applies") can only
        # trigger against the CARRY-IN state: one scalar compare.  A
        # state row is effective iff side==0, value non-NULL (batch
        # asof ignorenulls semantics) and ts >= the carried-in ts; the
        # value every row sees is then an integer-index forward-fill
        # of the effective rows (int64 end-to-end — a float64 ffill
        # would round composite epoch keys above 2^53), the carry-in
        # filling the leading gap.
        ts = rows["__ts"].to_numpy().astype("int64", copy=False)
        side = rows["__side"].to_numpy()
        val = rows[value_col].to_numpy()
        order = np.lexsort((side, ts))  # mergesort-stable by (ts, side)
        ts, side, val = ts[order], side[order], val[order]
        eff = (side == 0) & ~pd.isna(val)
        if last_ts is not None:
            eff &= ts >= last_ts
        n = len(ts)
        # index of the latest effective state row at or before each
        # position; -1 = none yet (the carry-in serves those)
        src = np.maximum.accumulate(np.where(eff, np.arange(n), -1))
        ev = side == 1
        src_ev = np.maximum(src[ev], 0)
        has = src[ev] >= 0
        carry_in_ts, carry_in_val = last_ts, (
            None if last_val is None else json.loads(last_val)
        )
        # exact int64 ffill: carried ts/value gathered by index, the
        # carry-in (or NULL before any state row ever) filling the rest
        asof_ts_np = ts[src_ev]
        asof_ts_mask = ~has  # True = NULL
        if carry_in_ts is not None:
            asof_ts_np = np.where(has, asof_ts_np, carry_in_ts)
            asof_ts_mask = np.zeros(len(has), dtype=bool)
        asof_val = val[src_ev].astype(object)
        asof_val[~has] = carry_in_val
        if eff.any():
            last_idx = int(np.flatnonzero(eff)[-1])
            last_ts = int(ts[last_idx])
            last_val = json.dumps(val[last_idx])
        state.update((last_ts, last_val))
        yield pd.DataFrame(
            {
                "key": pd.array(
                    np.full(int(ev.sum()), key[0]), dtype="int64"
                ),
                "event_ts": pd.array(ts[ev], dtype="int64"),
                # Int64 extension dtype: NULL before the first state
                # row, exact integers elsewhere
                "asof_ts": pd.arrays.IntegerArray(
                    asof_ts_np.astype("int64"), mask=asof_ts_mask
                ),
                "asof_value": pd.array(asof_val, dtype=object),
            }
        )

    return update


def streaming_asof_joins(
    events: DataFrame,
    states: DataFrame,
    key_col: str,
    event_ts_col: str,
    state_ts_col: str,
    value_col: str,
    horizon: str = "150000 days",
    watermark: str = "0 seconds",
) -> DataFrame:
    """JVM-only streaming as-of join (VERDICT r9 item 1): the
    stream-table temporal join restated as a stream-stream
    time-interval LEFT OUTER join + per-event max — the funnel's own
    winning pattern (``streaming_funnel_joins``), so the whole query
    lives in the JVM state store: no ``applyInPandasWithState``, no
    Arrow boundary, no Python workers on the stream (the tracker form
    measured ~260 k rows/s/node at 100x — the per-row Python state
    boundary was the last perf-weak shape in the repo).

    Plan: each event equi-joins its key's state rows under
    ``state.ts <= event.ts AND state.ts > event.ts - horizon``; a
    per-(key, event_ts) MAX over struct(state_ts, value) then picks
    the latest state row.  Left outer keeps events with no state in
    the horizon (NULL asof_*), matching the batch ``asof_join``'s
    left rows.  NULL-valued state rows are dropped before the join
    (the batch form's ignorenulls carry); NULL timestamps on either
    side are dropped.

    Semantics vs the tracker (``streaming_asof_join``): STRONGER on
    ordering — results are event-time-exact under ANY cross-batch
    arrival order (the tracker needs per-key in-order arrival; a join
    buffers out-of-order rows in the state store until the watermark
    closes them) — and bounded by ``horizon``, the time-range bound
    every production as-of has (it is what lets Spark evict join
    state at the watermark; the tracker's one-row-per-key state is
    the unbounded-lookback trade).  Set ``horizon`` to the replay's
    full span for gate-exact unbounded semantics.

    Emission contract (bounded replay): append-mode outer-NULL rows
    and the final MAX flush only once the watermark PASSES an event,
    so a bounded replay must end with a sentinel row per side beyond
    ``max(real ts) + horizon`` (the registry gate stages one); a live
    stream flushes continuously as the watermark advances.

    Scale shape: one stream-stream join + one aggregation, both
    keyed by (key, time) — state per key bounded by the in-horizon
    row count (per-key event density x horizon, a constant of the
    workload, not of corpus size), join fan-out per event = in-
    horizon state rows for that key.  Ties on state_ts break to the
    larger value (struct max); gates use unique composite state keys
    so the argmax is deterministic.

    Output (append): (key long, event_ts, asof_ts, asof_value) — one
    row per DISTINCT (key, event_ts); duplicate simultaneous events
    collapse (the aggregation is keyed on event identity = its
    timestamp).  ts columns must be TIMESTAMP-typed (the join's
    interval condition and watermark need event-time semantics;
    composite integer keys ride along via ``timestamp_micros``)."""
    from pyspark.sql import functions as F

    ev = (
        events.select(
            F.col(key_col).cast("long").alias("key"),
            F.col(event_ts_col).alias("e_ts"),
        )
        .filter(F.col("e_ts").isNotNull())
        .withWatermark("e_ts", watermark)
    )
    st = (
        states.select(
            F.col(key_col).cast("long").alias("s_key"),
            F.col(state_ts_col).alias("s_ts"),
            F.col(value_col).alias("s_val"),
        )
        .filter(F.col("s_ts").isNotNull() & F.col("s_val").isNotNull())
        .withWatermark("s_ts", watermark)
    )
    j = ev.join(
        st,
        F.expr(
            f"key = s_key AND s_ts <= e_ts "
            f"AND s_ts > e_ts - INTERVAL {horizon}"
        ),
        "leftOuter",
    )
    return (
        j.groupBy("key", "e_ts")
        .agg(F.max(F.struct(F.col("s_ts"), F.col("s_val"))).alias("m"))
        .select(
            "key",
            F.col("e_ts").alias("event_ts"),
            F.col("m.s_ts").alias("asof_ts"),
            F.col("m.s_val").alias("asof_value"),
        )
    )


def streaming_asof_join(
    events: DataFrame,
    states: DataFrame,
    key_col: str,
    event_ts_col: str,
    state_ts_col: str,
    value_col: str,
) -> DataFrame:
    """Union the event stream (side 1) and the state stream (side 0)
    on (key, ts, side, value) and run the stateful carry-forward.
    Both inputs may be streaming frames (a union of two streams is one
    stream). ts columns must be integer-comparable (epoch units).

    Output: (key, event_ts, asof_ts, asof_value) — one row per event,
    NULL asof_* before the first state row, exactly like the batch
    asof_join's left rows."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    key_type = events.schema[key_col].dataType
    if not isinstance(key_type, (T.ByteType, T.ShortType, T.IntegerType,
                                 T.LongType)):
        raise ValueError(
            f"streaming_asof_join: key column {key_col!r} must be an "
            f"integral type (output schema declares `key long`); got "
            f"{key_type.simpleString()}"
        )

    ev = events.select(
        F.col(key_col).alias("key"),
        F.col(event_ts_col).cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("string").alias(value_col),
    )
    st = states.select(
        F.col(key_col).alias("key"),
        F.col(state_ts_col).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(value_col).cast("string").alias(value_col),
    )
    unioned = ev.unionByName(st)
    return unioned.groupBy("key").applyInPandasWithState(
        make_asof_fn(value_col),
        outputStructType=(
            "key long, event_ts long, asof_ts long, asof_value string"
        ),
        stateStructType="last_ts long, last_val string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
