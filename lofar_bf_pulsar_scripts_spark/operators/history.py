"""Slowly-changing-dimension history and time-series regularization —
the lakehouse table-maintenance operators (Delta/Iceberg MERGE-style
CDC) a warehouse user expects alongside the analytic ones.

``scd2_history`` builds a type-2 dimension from a change stream;
``resample_ffill`` regularizes an event stream onto a fixed grid with
forward fill. Both are window/agg plans over user-keyed partitions —
narrow shuffles on the entity key, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str = "user_id",
    time_col: str = "t",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: each change row opens
    a version valid from its timestamp until the entity's next change
    (NULL for the current version). Ties on (key, t) keep ONE row
    deterministically (the max by the value tuple) — a change feed
    can deliver duplicates.

    Returns (key, *values, valid_from, valid_to, is_current).
    Plan: one window over (key ORDER BY t) — a single narrow shuffle
    on the entity key; at 100 TB this is the standard MERGE-free CDC
    rebuild (append-only change log in, versioned dim out)."""
    value_cols = value_cols or ["value"]
    # dedupe exact (key, t) collisions deterministically by the
    # ROW-WISE tuple max (one struct max, unpacked) — independent
    # per-column maxes would fabricate a version matching neither
    # source row when value_cols has more than one column
    tup = changes.groupBy(key_col, time_col).agg(
        F.max(F.struct(*value_cols)).alias("__v")
    )
    agg = tup.select(
        key_col,
        time_col,
        *[F.col("__v")[c].alias(c) for c in value_cols],
    )
    w = Window.partitionBy(key_col).orderBy(time_col)
    out = agg.select(
        key_col,
        *value_cols,
        F.col(time_col).alias("valid_from"),
        F.lead(time_col).over(w).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def resample_ffill(
    events: DataFrame,
    step: int = 3600,
    key_col: str = "user_id",
    time_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an irregular event stream onto a fixed ``step``-
    second grid per entity, forward-filling the last observed value:
    (key, slot, value_ffill) for every grid slot from the entity's
    first to last event (slot = floor(t/step), integer-exact).

    Plan: per-(key, slot) last-value pre-aggregation (max by (t,
    value) struct — deterministic under duplicate timestamps), then
    the forward fill runs over OBSERVED slots only (one window on
    the key partition: last(ignorenulls) + lead(slot)), and each
    observed slot interval-explodes to [slot, next_slot) carrying
    its filled value.  The grid therefore materializes map-side in
    the final select — grid-sized data never crosses an exchange and
    there is no grid-vs-observed join (the previous shape windowed
    over the exploded GRID after a (key, slot) join: 10x probe exp
    0.88, output-sized shuffles).  Interval semantics are identical
    to grid-ffill: slots in [obs_i, obs_{i+1}) see the last non-null
    value at or before obs_i, including the NULL-before-first-
    non-null case."""
    slot = F.floor(F.col(time_col) / F.lit(float(step))).cast("long")
    per_slot = (
        events.select(
            F.col(key_col),
            slot.alias("slot"),
            F.struct(F.col(time_col), F.col(value_col)).alias("__tv"),
        )
        .groupBy(key_col, "slot")
        .agg(F.max("__tv")["{}".format(value_col)].alias("__v"))
    )
    w_ord = Window.partitionBy(key_col).orderBy("slot")
    w_fill = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs = per_slot.select(
        F.col(key_col),
        F.col("slot").alias("__lo"),
        F.last("__v", ignorenulls=True).over(w_fill).alias("__vf"),
        (F.coalesce(F.lead("slot").over(w_ord), F.col("slot") + 1) - 1)
        .alias("__hi"),
    )
    return obs.select(
        key_col,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("slot"),
        F.col("__vf").alias("value_ffill"),
    )
