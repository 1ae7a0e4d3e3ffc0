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


def targets_with_transits(
    targets: DataFrame,
    ra_col: str = "ra_deg",
    dec_col: str = "dec_deg",
    lat_deg: float | None = None,
    el_min_deg: float = 30.0,
) -> DataFrame:
    """Compute each target's transit minute and visibility window
    from its catalog coordinates (scheduling/azlst.pl), instead of
    taking ``transit_min`` as a given: transit is at LST = RA/15 h,
    so on the scheduler's LST-minute day transit_min =
    round(ra_deg * 4) mod 1440. Targets that never reach
    ``el_min_deg`` at this site are dropped (they cannot be
    scheduled); circumpolar targets keep the full-day window
    (ha_h = 12). Adds ``transit_min``, ``rise_min``, ``set_min``
    (LST minutes, NULL for circumpolar) and the raw window struct
    fields — pure column trig, no shuffle."""
    from ..functions.coords import LOFAR_LAT_DEG, visibility_window

    lat = LOFAR_LAT_DEG if lat_deg is None else lat_deg
    vw = visibility_window(
        F.col(ra_col),
        F.col(dec_col),
        F.lit(float(lat)),
        F.lit(float(el_min_deg)),
    )
    out = targets.withColumn("__vw", vw).where(~F.col("__vw.never_above"))
    to_min = lambda h: F.round(h * F.lit(60.0)).cast("int") % 1440
    return out.select(
        *targets.columns,
        to_min(F.col(ra_col) / 15.0).alias("transit_min"),
        to_min(F.col("__vw.lst_rise_h")).alias("rise_min"),
        to_min(F.col("__vw.lst_set_h")).alias("set_min"),
        F.col("__vw.never_sets").alias("circumpolar"),
        F.col("__vw.el_transit_deg").alias("el_transit_deg"),
        F.col("__vw.ha_h").alias("ha_h"),
    )


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
