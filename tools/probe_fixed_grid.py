"""Fixed-grid resample probe (VERDICT r6 task 8): scale_probe's 10x
dataset multiplies USERS, so resample_hourly_ffill's 0.66 exponent
tracks its own OUTPUT growth (more users -> more grid cells), not a
per-cell cost. This probe holds the grid CONSTANT — same user set,
same per-user time span — and grows only event DENSITY, isolating
the per-cell cost: if the operator is shaped right, wall time is
~flat, because the per-(key, slot) struct-max pre-aggregation
collapses the extra events map-side before the grid explode or the
window ever see them.

Usage: python tools/probe_fixed_grid.py [--factors 1,10,100]
Prints one JSON line per factor and a summary with the exponent
between the first and last factor.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.history import resample_ffill
from lofar_bf_pulsar_scripts_spark.session import get_spark

N_USERS = 200
SPAN_S = 30 * 86_400  # 30-day window per user
BASE_EVENTS_PER_USER = 50


def build(spark, factor: int):
    """factor x event density, IDENTICAL (user, span) grid: every
    user keeps events pinned at both span edges so lo/hi slots — and
    therefore the exploded grid — are byte-identical at any factor."""
    n = BASE_EVENTS_PER_USER * factor
    return (
        spark.range(N_USERS)
        .select(F.col("id").alias("user_id"))
        .select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("i"),
        )
        .select(
            "user_id",
            # i=0 at t=0 and i=n-1 at t=SPAN_S pin the span; interior
            # points spread deterministically (no RNG: xxhash-mixed)
            F.when(F.col("i") == 0, F.lit(0.0))
            .when(F.col("i") == n - 1, F.lit(float(SPAN_S)))
            .otherwise(
                F.pmod(
                    F.xxhash64("user_id", "i").cast("double"),
                    F.lit(float(SPAN_S)),
                )
            )
            .alias("t"),
            (F.pmod(F.xxhash64("i", "user_id"), F.lit(1000)) / 10.0).alias(
                "value"
            ),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,100")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    spark = get_spark(app_name="probe_fixed_grid")
    results = {}
    for f in factors:
        df = build(spark, f).localCheckpoint(eager=True)  # exclude gen cost
        times = []
        for _ in range(args.repeats + 1):  # first run is warmup
            t0 = time.time()
            resample_ffill(df, step=3600).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.time() - t0)
        best = min(times[1:])
        results[f] = best
        print(
            json.dumps(
                {
                    "factor": f,
                    "events": N_USERS * BASE_EVENTS_PER_USER * f,
                    "grid_cells": N_USERS * (SPAN_S // 3600 + 1),
                    "wall_s": round(best, 3),
                }
            ),
            flush=True,
        )
    lo, hi = min(factors), max(factors)
    ratio = results[hi] / results[lo]
    print(
        json.dumps(
            {
                "summary": True,
                "ratio": round(ratio, 2),
                "exponent": round(math.log(ratio) / math.log(hi / lo), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
