"""Observation scheduler (SURVEY §2.5 W10, D8): greedy interval
packing nearest transit into free gaps
(/root/reference/scheduling/bfscheduler.py:368-466).

Sequential by nature (each placement constrains the next), so it runs
driver-side over a COLLECTED target list — the reference's own scale
(hundreds of targets, bfscheduler.py:605-618). Spark computes the
parallelizable parts (scoring, transit times); the greedy loop is
plain Python on the tiny collected frame (SURVEY §2.5 W10 mapping).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class Placement:
    name: str
    start_min: int
    end_min: int  # exclusive
    transit_min: int


def score_targets(targets: DataFrame) -> DataFrame:
    """Priority-desc, duration-desc ordering (bfscheduler.py:320-324's
    reversed argsort on score)."""
    return targets.withColumn(
        "score",
        F.coalesce(F.col("priority"), F.lit(1.0)) * F.lit(1000.0)
        + F.col("duration_min"),
    ).orderBy(F.desc("score"), "name")


def greedy_schedule(
    targets: DataFrame,
    transit_min_col: str = "transit_min",
    day_minutes: int = 24 * 60,
    tolerance_min: int = 120,
) -> list[Placement]:
    """Greedy placement: highest score first; each target gets the
    free slot whose start is nearest its transit, within tolerance
    (bfscheduler.py:368-466: np.diff over reserved minutes, isdisjoint
    conflict test)."""
    rows = score_targets(targets).collect()
    reserved: set[int] = set()
    placements: list[Placement] = []
    for row in rows:
        dur = int(row["duration_min"])
        transit = int(row[transit_min_col]) % day_minutes
        best: tuple[int, int] | None = None  # (|offset|, start)
        for start in range(
            max(0, transit - tolerance_min),
            min(day_minutes - dur, transit + tolerance_min) + 1,
        ):
            span = range(start, start + dur)
            if reserved.isdisjoint(span):
                off = abs(start - transit)
                if best is None or (off, start) < best:
                    best = (off, start)
        if best is not None:
            start = best[1]
            reserved.update(range(start, start + dur))
            placements.append(
                Placement(row["name"], start, start + dur, transit)
            )
    return sorted(placements, key=lambda p: p.start_min)


def schedule_to_df(spark: SparkSession, placements: list[Placement]) -> DataFrame:
    return spark.createDataFrame(
        [(p.name, p.start_min, p.end_min, p.transit_min) for p in placements],
        "name string, start_min int, end_min int, transit_min int",
    )
