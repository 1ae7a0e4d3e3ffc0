"""As-of and nearest-key joins (SURVEY §2.3 J3/J4/J5).

Spark has no native as-of join; the canonical forms here are:

  asof_latest — "state as of T": filter ts <= T, then one row per key
      by (ts, tiebreak) descending. Semantics of the hardware-state
      lookup (/root/reference/tiles/lofar_antenna_state/getState.py:275-299
      — walk sorted timestamps, last one before the observation start
      wins). Implemented as max_by over a struct — a single hash
      aggregation (partial+final), cheaper than the window row_number
      form because it never materializes per-key sorted runs.

  asof_join — generalized: each left row picks the latest right row
      with right.ts <= left.ts per key. Window form over the unioned
      stream — one shuffle on the key, no range explosion.

  nearest_key_join — each left row picks the right row minimizing
      |left.key - right.key| (J4: flagged-dipole nearest obsid,
      /root/reference/fluxcal/lofar_fluxcal.py:177-197; J5: CasA
      beam-corr nearest frequency,
      /root/reference/fluxcal/lofar_gain_hamaker_carozzi.py:134-136).
      The right side is a small lookup table -> broadcast cross join +
      min(struct(distance, tiebreak, payload)) per left row: no
      shuffle of the left (fact) side beyond its own aggregation key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_latest(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    cutoff,
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Latest row per key with ts <= cutoff (J3).

    Deterministic under timestamp ties via ``tiebreak_col``.
    Returns key_cols + value_cols (each aliased ``last_<name>``) +
    ``last_<ts_col>``.
    """
    ordered = [F.col(ts_col)]
    if tiebreak_col:
        ordered.append(F.col(tiebreak_col))
    payload = F.struct(*ordered, *[F.col(c) for c in value_cols])
    out = (
        df.filter(F.col(ts_col) <= F.lit(cutoff))
        .groupBy(*key_cols)
        .agg(F.max(payload).alias("__last"))
    )
    cols = [F.col(c) for c in key_cols]
    cols.append(F.col(f"__last.{ts_col}").alias(f"last_{ts_col}"))
    for c in value_cols:
        cols.append(F.col(f"__last.{c}").alias(f"last_{c}"))
    return out.select(*cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """For each left row, the latest right row with
    right.ts <= left.ts within the key (stream-table temporal join
    shape, SURVEY §2.9). Union-and-carry-forward: tag both sides, sort
    by time within key, last_value(ignorenulls) carries the most recent
    right payload onto each left row — one shuffle total.
    """
    overlap = set(left.columns) & set(right_value_cols)
    if overlap:
        raise ValueError(
            f"right_value_cols {sorted(overlap)} collide with left columns; "
            "alias the right payload columns before the as-of join"
        )
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            *key_cols,
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in right_value_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    for c in left.columns:
        if c not in rt.columns and c != "__side":
            rt = rt.withColumn(c, F.lit(None))
    for c in right_value_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    unioned = lt.select(rt.columns).unionByName(rt)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c not in ("__side",)],
        F.col("__side").alias("__keep"),
        *[
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    return (
        carried.filter(F.col("__keep") == 1)
        .drop("__keep", "__ts", *right_value_cols)
    )


def nearest_key_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    right_value_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Each left row gains the right row nearest in |left_key - right_key|
    (J4/J5). Right side is broadcast; ties resolve to the smallest
    ``right_tiebreak`` (or smallest right_key). Appends
    ``nearest_<col>`` for each right value column and ``nearest_dist``.
    """
    tiebreak = right_tiebreak or right_key
    r = F.broadcast(
        right.select(
            F.col(right_key).alias("__rkey"),
            F.col(tiebreak).alias("__rtie"),
            *[F.col(c).alias(f"__rv_{c}") for c in right_value_cols],
        )
    )
    dist = F.abs(F.col("__lkey") - F.col("__rkey"))
    choice = F.struct(
        dist.alias("d"),
        F.col("__rtie").alias("tie"),
        *[F.col(f"__rv_{c}").alias(c) for c in right_value_cols],
    )
    # Aggregate over DISTINCT left keys, not left rows: the mapping
    # (distinct_keys x right) stays small, and the fact table then gets
    # the result via a broadcast join — no shuffle of `left` at all.
    mapping = (
        left.select(F.col(left_key).alias("__lkey"))
        .distinct()
        .crossJoin(r)
        .groupBy("__lkey")
        .agg(F.min(choice).alias("__best"))
    )
    out = left.join(
        F.broadcast(mapping), left[left_key] == mapping["__lkey"], "left"
    )
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("__best.d").alias("nearest_dist"))
    for c in right_value_cols:
        sel.append(F.col(f"__best.{c}").alias(f"nearest_{c}"))
    return out.select(*sel)
