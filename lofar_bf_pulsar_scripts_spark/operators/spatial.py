"""Sky cross-match: cone-search join via neighbor-cell bucketing.

Matching detections against a source catalog by sky position is the
step downstream of every candidate list the reference produces (its
fluxcal scripts carry per-source RA/DEC through the whole chain, e.g.
/root/reference/fluxcal/lofar_fluxcal.py source tables); the classic
implementation is an all-pairs angular-separation scan.  All-pairs is
a cross join — unusable at 100 TB — so this module implements the
standard bucketed form: tile the sky into fixed cells, explode the
probe side to its 3x3 cell neighborhood, equi-join on the cell key,
then apply the exact separation predicate to the (bounded) candidate
set.  Candidates are bounded by cell occupancy, never |probes| x
|catalog|.

Coordinates are INTEGER milliarcseconds (ra in [0, 1_296_000_000),
dec in [-324_000_000, 324_000_000]) and the separation metric is the
exact-integer cylindrical (flat-sky) form

    sep_sq = min(|dra|, RA_WRAP - |dra|)^2 + ddec^2  <=  radius^2

i.e. the small-radius approximation that drops the cos(dec) RA
compression.  This keeps every comparison exact 64-bit integer
arithmetic (max |dra| = 6.48e8, squared 4.2e17 < 2^63), so the
bucketed join is bit-identical to the naive all-pairs definition —
the property the oracle gate checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

RA_WRAP_MAS = 1_296_000_000  # 360 deg in milliarcsec
DEC_HALF_MAS = 324_000_000  # 90 deg in milliarcsec


def crossmatch_cone(
    probes: DataFrame,
    catalog: DataFrame,
    radius_mas: int,
    cell_mas: int = 3_600_000,
    ra_col: str = "ra_mas",
    dec_col: str = "dec_mas",
) -> DataFrame:
    """Match every probe to every catalog entry within ``radius_mas``.

    ``probes`` and ``catalog`` each need (``ra_col``, ``dec_col``) in
    integer mas plus any id/payload columns; all non-coordinate
    columns pass through with the catalog side suffixed ``_cat``.
    Returns one row per matching (probe, catalog) pair with an exact
    ``sep_sq_mas2`` column.

    ``cell_mas`` must be >= ``radius_mas`` (one-cell neighborhoods
    suffice) and must divide RA_WRAP_MAS exactly (otherwise the seam
    cell is narrower than the radius and a +-1 neighborhood can miss
    across the 0/360 boundary).

    Scale shape: the CATALOG side explodes 9x into its neighbor
    cells, the probe side keeps one row per entry — the 9x fan-out
    lands on the (typically far smaller, often broadcast) catalog
    while the corpus-sized probe stream stays at one row per
    detection.  The join is a plain equi-join on (cell_ra, cell_dec):
    shuffle keyed by cell, candidate pairs bounded by per-cell
    occupancy.  Each matching pair meets in exactly one cell (the
    probe's home cell — the catalog's 9 exploded cells are distinct),
    so no post-join dedup is needed.

    RA is pmod-normalized into [0, wrap) before cell and separation
    arithmetic, so any real-valued RA convention works; dec outside
    [-DEC_HALF_MAS, DEC_HALF_MAS] is not meaningful on a sphere but
    still matches consistently under the documented cylindrical
    metric (cells extend, the metric stays exact).
    """
    radius_mas = int(radius_mas)
    cell_mas = int(cell_mas)
    if radius_mas <= 0:
        raise ValueError("radius_mas must be positive")
    if cell_mas < radius_mas:
        raise ValueError("cell_mas must be >= radius_mas")
    if RA_WRAP_MAS % cell_mas != 0:
        raise ValueError("cell_mas must divide RA_WRAP_MAS (1_296_000_000)")
    n_ra_cells = RA_WRAP_MAS // cell_mas
    if n_ra_cells < 3:
        raise ValueError("cell_mas too large: need >= 3 RA cells for ±1 wrap")

    # pmod-normalized ra in [0, wrap), dec+OFF shifted non-negative
    # for in-domain dec — integer DIV after pmod is the floor cell
    def norm_ra(col: str) -> Column:
        return F.pmod(F.col(col).cast("long"), F.lit(RA_WRAP_MAS))

    def cell_ra_expr(col: str) -> Column:
        return F.expr(
            f"pmod(CAST({col} AS BIGINT), {RA_WRAP_MAS}) div {cell_mas}"
        )

    def cell_dec_expr(col: str) -> Column:
        return F.expr(
            f"(CAST({col} AS BIGINT) + {DEC_HALF_MAS}) div {cell_mas}"
        )

    pro = probes.select(
        *probes.columns,
        cell_ra_expr(ra_col).alias("__cell_ra"),
        cell_dec_expr(dec_col).alias("__cell_dec"),
    )
    deltas = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    cat = (
        catalog.select(
            *[F.col(c).alias(f"{c}_cat") for c in catalog.columns],
            cell_ra_expr(f"{ra_col}").alias("__cra0"),
            cell_dec_expr(f"{dec_col}").alias("__cdec0"),
        )
        .withColumn("__dra", F.explode(deltas))
        .withColumn("__ddec", F.explode(deltas))
        .select(
            *[f"{c}_cat" for c in catalog.columns],
            F.pmod(F.col("__cra0") + F.col("__dra"), F.lit(n_ra_cells)).alias(
                "__cell_ra"
            ),
            (F.col("__cdec0") + F.col("__ddec")).alias("__cell_dec"),
        )
    )
    joined = pro.join(cat, ["__cell_ra", "__cell_dec"])
    dra_raw = F.abs(norm_ra(ra_col) - norm_ra(f"{ra_col}_cat"))
    dra = F.least(dra_raw, F.lit(RA_WRAP_MAS) - dra_raw)
    ddec = F.col(dec_col).cast("long") - F.col(f"{dec_col}_cat").cast("long")
    sep_sq = dra * dra + ddec * ddec
    keep = [c for c in probes.columns] + [
        f"{c}_cat" for c in catalog.columns
    ]
    return (
        joined.withColumn("sep_sq_mas2", sep_sq)
        .filter(F.col("sep_sq_mas2") <= F.lit(radius_mas * radius_mas))
        .select(*keep, "sep_sq_mas2")
    )


def crossmatch_nearest(
    probes: DataFrame,
    catalog: DataFrame,
    radius_mas: int,
    probe_id_col: str,
    cell_mas: int = 3_600_000,
    ra_col: str = "ra_mas",
    dec_col: str = "dec_mas",
) -> DataFrame:
    """Best-match cross-match: each probe keeps only its NEAREST
    in-radius catalog entry (the usual catalog-association semantics;
    ties broken by the smallest catalog coordinates, deterministic).

    Built on ``crossmatch_cone`` — same cell-bounded candidate set —
    followed by a per-probe struct-min (the A13 argmax pattern: a
    partial-aggregating hash agg, no window, no sort), so the
    reduction collapses map-side and the shuffle carries one row per
    matched probe.
    """
    pairs = crossmatch_cone(
        probes, catalog, radius_mas, cell_mas, ra_col, dec_col
    )
    payload = [c for c in pairs.columns if c != probe_id_col]
    best = pairs.groupBy(probe_id_col).agg(
        F.min(
            F.struct(
                F.col("sep_sq_mas2"),
                F.col(f"{ra_col}_cat"),
                F.col(f"{dec_col}_cat"),
                *[
                    F.col(c)
                    for c in payload
                    if c
                    not in ("sep_sq_mas2", f"{ra_col}_cat", f"{dec_col}_cat")
                ],
            )
        ).alias("__b")
    )
    return best.select(
        probe_id_col,
        *[F.col(f"__b.{c}").alias(c) for c in ("sep_sq_mas2",)],
        *[
            F.col(f"__b.{c}").alias(c)
            for c in payload
            if c != "sep_sq_mas2"
        ],
    )
