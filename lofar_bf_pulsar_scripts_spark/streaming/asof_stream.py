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
        rows = pd.concat(chunks, ignore_index=True)
        rows["__ts"] = rows["__ts"].astype("int64")
        # mergesort = stable; secondary key __side puts the state row
        # BEFORE an event at the same instant (inclusive <=), matching
        # the batch asof_join's (ts, side) ordering
        rows = rows.sort_values(["__ts", "__side"], kind="mergesort")
        out = []
        # pandas itertuples renames leading-underscore columns — walk
        # the column arrays directly
        for ts, side, val in zip(
            rows["__ts"], rows["__side"], rows[value_col]
        ):
            if pd.isna(ts):
                # a NULL timestamp is unorderable — drop the row
                # rather than crash the query (int(NaN) raises)
                continue
            if side == 0:  # state row
                if pd.isna(val):
                    # match the batch asof_join's ignorenulls
                    # semantics: a NULL-valued state row never
                    # overwrites the carried value
                    continue
                if last_ts is not None and int(ts) < last_ts:
                    # a LATE state row (older than the carried one)
                    # must not poison future events with a stale value
                    continue
                last_ts, last_val = int(ts), json.dumps(val)
            else:  # event row
                out.append(
                    {
                        "key": key[0],
                        "event_ts": int(ts),
                        "asof_ts": last_ts,
                        "asof_value": (
                            None if last_val is None else json.loads(last_val)
                        ),
                    }
                )
        state.update((last_ts, last_val))
        # asof_ts mixes ints with None (events before the first state
        # row): plain DataFrame inference would make the column
        # float64 and round keys above 2^53 — use the NULLABLE Int64
        # extension dtype so values stay exact integers end-to-end.
        yield pd.DataFrame(
            {
                "key": pd.array([r["key"] for r in out], dtype="int64"),
                "event_ts": pd.array(
                    [r["event_ts"] for r in out], dtype="int64"
                ),
                "asof_ts": pd.array(
                    [r["asof_ts"] for r in out], dtype="Int64"
                ),
                "asof_value": pd.array(
                    [r["asof_value"] for r in out], dtype=object
                ),
            }
        )

    return update


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
