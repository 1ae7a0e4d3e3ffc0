"""Gap-based sessionization (SURVEY §2.5 W6 / §2.9 session windows).

The friends-of-friends island grouping
(/root/reference/pulse_info.py:201-217,246-262) is gap-sessionization
over channel index; the same primitive over time implements session
windows (the reference's staging poll loop batches,
/root/reference/LTA/lta-retrieve.py:482-568, is the streaming analog).

One window pass: a row starts a new session when its gap to the
previous row within the key exceeds ``gap``; session id = running
count of starts. Single shuffle on the key; the running sum is
computed within sorted partitions (no extra exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize_by_gap(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    gap: float | int,
    tiebreak_col: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Attach a per-key session id; a new session starts when
    order_col - previous order_col > gap.

    ``gap`` keeps its Python type: pass an int gap with an integer
    order column (e.g. epoch-microseconds BIGINT) and the whole
    comparison stays in exact integer arithmetic — no float rounding
    to diverge across engines."""
    order_exprs = [F.col(order_col)]
    if tiebreak_col:
        order_exprs.append(F.col(tiebreak_col))
    w = Window.partitionBy(*key_cols).orderBy(*order_exprs)
    prev = F.lag(F.col(order_col), 1).over(w)
    gap_lit = F.lit(gap if isinstance(gap, int) else float(gap))
    new_session = F.when(
        prev.isNull() | ((F.col(order_col) - prev) > gap_lit), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("__new", new_session).withColumn(
        session_col, F.sum("__new").over(run)
    ).drop("__new")


def session_stats_native(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap: str = "1 hour",
) -> DataFrame:
    """Per-key session summary via Spark's built-in
    ``F.session_window`` — the same gap-session semantics expressed as
    a native (streaming-capable) session window, so the identical code
    runs under Structured Streaming with watermark-driven state
    cleanup. ``ts_col`` must be a TIMESTAMP column.

    Boundary note vs ``session_stats``: the native window is
    half-open ([start, last+gap)), so an event exactly ``gap`` after
    the previous one starts a NEW session, where the lag-based form's
    strict ``>`` keeps it in the old one. Equal semantics whenever no
    inter-event gap is exactly ``gap`` (generic timestamps)."""
    per_session = df.groupBy(
        *key_cols, F.session_window(F.col(ts_col), gap).alias("__w")
    ).agg(F.count(F.lit(1)).alias("session_len"))
    return per_session.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("session_len").alias("max_session_len"),
        F.sum("session_len").alias("n_rows"),
    )


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    gap: float | int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key session summary: number of sessions, largest session
    size, total rows."""
    s = sessionize_by_gap(df, key_cols, order_col, gap, tiebreak_col)
    per_session = s.groupBy(*key_cols, "session_id").agg(
        F.count(F.lit(1)).alias("session_len")
    )
    return per_session.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("session_len").alias("max_session_len"),
        F.sum("session_len").alias("n_rows"),
    )
