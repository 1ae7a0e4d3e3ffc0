"""Grid interpolation join (SURVEY §2.3 J8): bilinear interpolation of
query points against a dense lookup grid
(/root/reference/fluxcal/lofar_gain.py:84-128 interpolates the
Wijnholds gain cube in (freq, elevation)).

Spark design: the grid is a broadcast dimension table; each query
point joins its 4 surrounding corners via equi-joins on the floored
coordinates (J8 as "2-D bucketed range join"), then the weighted
combination is a projection. The fact side is never shuffled: 4
broadcast hash joins, all map-side.

1-D linear interpolation (np.interp analog, lofar_gain.py:92-127)
falls out of the same helper with one axis fixed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bilinear_interp(
    points: DataFrame,
    grid: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    gx_col: str = "gx",
    gy_col: str = "gy",
    gval_col: str = "gval",
    out_col: str = "interp",
) -> DataFrame:
    """Append ``out_col`` = bilinear interpolation of (x_col, y_col)
    in the integer-indexed grid. Points outside the grid clamp to the
    nearest cell edge (the reference clamps az/el the same way)."""
    gmax_x = grid.agg(F.max(gx_col)).first()[0]
    gmax_y = grid.agg(F.max(gy_col)).first()[0]
    x = F.least(F.greatest(F.col(x_col), F.lit(0.0)), F.lit(float(gmax_x)))
    y = F.least(F.greatest(F.col(y_col), F.lit(0.0)), F.lit(float(gmax_y)))
    x0 = F.least(F.floor(x).cast("int"), F.lit(int(gmax_x) - 1))
    y0 = F.least(F.floor(y).cast("int"), F.lit(int(gmax_y) - 1))
    pts = (
        points.withColumn("__x", x)
        .withColumn("__y", y)
        .withColumn("__x0", x0)
        .withColumn("__y0", y0)
    )
    g = F.broadcast(grid.select(gx_col, gy_col, gval_col))
    for dx in (0, 1):
        for dy in (0, 1):
            corner = g.select(
                F.col(gx_col).alias(f"__cx{dx}{dy}"),
                F.col(gy_col).alias(f"__cy{dx}{dy}"),
                F.col(gval_col).alias(f"__v{dx}{dy}"),
            )
            pts = pts.join(
                F.broadcast(corner),
                (F.col("__x0") + dx == F.col(f"__cx{dx}{dy}"))
                & (F.col("__y0") + dy == F.col(f"__cy{dx}{dy}")),
                "left",
            ).drop(f"__cx{dx}{dy}", f"__cy{dx}{dy}")
    fx = F.col("__x") - F.col("__x0")
    fy = F.col("__y") - F.col("__y0")
    interp = (
        F.col("__v00") * (1 - fx) * (1 - fy)
        + F.col("__v10") * fx * (1 - fy)
        + F.col("__v01") * (1 - fx) * fy
        + F.col("__v11") * fx * fy
    )
    return pts.withColumn(out_col, interp).drop(
        "__x", "__y", "__x0", "__y0", "__v00", "__v10", "__v01", "__v11"
    )
