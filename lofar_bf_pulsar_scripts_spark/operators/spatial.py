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

    Scale shape: probe side explodes 9x into its neighbor cells, the
    catalog keeps one row per entry, and the join is a plain equi-join
    on (cell_ra, cell_dec) — shuffle keyed by cell, candidate pairs
    bounded by per-cell occupancy.  Each matching pair meets in
    exactly one cell (the catalog entry's home cell), so no
    post-join dedup is needed.  For a small catalog Spark broadcasts
    the un-exploded side; for two large sides this is a sort-merge
    join on a uniformly-hashed key.
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

    # ra in [0, wrap), dec+OFF in [0, 2*OFF] — both non-negative, so
    # integer DIV is the floor
    def cell_ra_expr() -> Column:
        return F.expr(f"CAST({ra_col} AS BIGINT) div {cell_mas}")

    def cell_dec_expr() -> Column:
        return F.expr(
            f"(CAST({dec_col} AS BIGINT) + {DEC_HALF_MAS}) div {cell_mas}"
        )

    p_cra, p_cdec = cell_ra_expr(), cell_dec_expr()
    deltas = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    exploded = (
        probes.withColumn("__cra0", p_cra)
        .withColumn("__cdec0", p_cdec)
        .withColumn("__dra", F.explode(deltas))
        .withColumn("__ddec", F.explode(deltas))
        .select(
            *probes.columns,
            F.pmod(F.col("__cra0") + F.col("__dra"), F.lit(n_ra_cells)).alias(
                "__cell_ra"
            ),
            (F.col("__cdec0") + F.col("__ddec")).alias("__cell_dec"),
        )
    )
    c_cra, c_cdec = cell_ra_expr(), cell_dec_expr()
    cat = catalog.select(
        *[F.col(c).alias(f"{c}_cat") for c in catalog.columns],
        c_cra.alias("__cell_ra"),
        c_cdec.alias("__cell_dec"),
    )
    joined = exploded.join(cat, ["__cell_ra", "__cell_dec"])
    dra_raw = F.abs(
        F.col(ra_col).cast("long") - F.col(f"{ra_col}_cat").cast("long")
    )
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
