"""asof_join (stream-table temporal join shape, J3 generalized):
every left row picks the latest right row with right.ts <= left.ts."""

import pytest

from lofar_bf_pulsar_scripts_spark.operators.asof import asof_join


def test_asof_join_carry_forward(spark):
    trades = spark.createDataFrame(
        [("A", 1.0, 10), ("A", 5.0, 11), ("A", 9.0, 12), ("B", 2.0, 20)],
        "sym string, t double, qty int",
    )
    quotes = spark.createDataFrame(
        [("A", 0.5, 100.0), ("A", 4.0, 101.0), ("A", 8.0, 103.0),
         ("B", 3.0, 50.0)],
        "sym string, qt double, px double",
    )
    out = asof_join(
        trades,
        quotes,
        key_cols=["sym"],
        left_ts="t",
        right_ts="qt",
        right_value_cols=["px"],
    )
    got = {(r["sym"], r["t"]): r["asof_px"] for r in out.collect()}
    assert got[("A", 1.0)] == 100.0
    assert got[("A", 5.0)] == 101.0
    assert got[("A", 9.0)] == 103.0
    assert got[("B", 2.0)] is None  # no quote yet at t=2
    assert len(got) == 4
