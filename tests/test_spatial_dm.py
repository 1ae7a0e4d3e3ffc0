"""Sky cross-match, harmonic summing, and trial-DM dedispersion.

The cross-match tests prove the neighbor-cell bucketed join is
bit-identical to the naive all-pairs definition (including the RA
wrap seam and the dec clamp); the dedispersion test proves dm_search
recovers an injected DM from dispersed pulse arrival times.
"""

import random

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.dedisperse import (
    dispersion_delay_table,
    dm_search,
)
from lofar_bf_pulsar_scripts_spark.operators.fold import (
    harmonic_sum,
    period_search,
)
from lofar_bf_pulsar_scripts_spark.operators.spatial import (
    DEC_HALF_MAS,
    RA_WRAP_MAS,
    crossmatch_cone,
)

R = 2_000_000  # radius under test, mas


def _naive_pairs(probes, catalog, radius):
    out = []
    for pid, pra, pdec in probes:
        for cid, cra, cdec in catalog:
            dra = abs(pra - cra)
            dra = min(dra, RA_WRAP_MAS - dra)
            dd = pdec - cdec
            s = dra * dra + dd * dd
            if s <= radius * radius:
                out.append((pid, cid, s))
    return sorted(out)


def test_crossmatch_matches_naive_all_pairs(spark):
    rng = random.Random(7)
    catalog = [
        (i, rng.randrange(RA_WRAP_MAS), rng.randrange(-DEC_HALF_MAS, DEC_HALF_MAS + 1))
        for i in range(120)
    ]
    probes = []
    for i in range(800):
        cid, cra, cdec = catalog[rng.randrange(len(catalog))]
        pra = (cra + rng.randrange(-2 * R, 2 * R + 1)) % RA_WRAP_MAS
        pdec = max(-DEC_HALF_MAS, min(DEC_HALF_MAS, cdec + rng.randrange(-2 * R, 2 * R + 1)))
        probes.append((i, pra, pdec))
    # RA seam: a pair straddling 0/360 that only wrap-aware matching finds
    probes += [(9001, 100, 0), (9002, RA_WRAP_MAS - 100, 0)]
    catalog += [(9101, RA_WRAP_MAS - 50, 0)]
    pdf = spark.createDataFrame(probes, "probe_id long, ra_mas long, dec_mas long")
    cdf = spark.createDataFrame(catalog, "cat_id long, ra_mas long, dec_mas long")
    got = sorted(
        (r.probe_id, r.cat_id_cat, r.sep_sq_mas2)
        for r in crossmatch_cone(pdf, cdf, R).collect()
    )
    assert got == _naive_pairs(probes, catalog, R)
    # the seam pair was actually exercised
    assert any(p == 9001 and c == 9101 for p, c, _ in got)


def test_crossmatch_validates_cell_size(spark):
    df = spark.createDataFrame([(1, 0, 0)], "id long, ra_mas long, dec_mas long")
    with pytest.raises(ValueError):
        crossmatch_cone(df, df, radius_mas=5_000_000, cell_mas=3_600_000)
    with pytest.raises(ValueError):
        # cell >= radius but does NOT divide RA_WRAP_MAS
        crossmatch_cone(df, df, radius_mas=1_000_000, cell_mas=7_000_000)
    with pytest.raises(ValueError):
        # divides, but fewer than 3 RA cells (no ±1 wrap neighborhood)
        crossmatch_cone(df, df, radius_mas=1_000, cell_mas=RA_WRAP_MAS // 2)


def test_crossmatch_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 5_000_000, 5_000_000)],
        "id long, ra_mas long, dec_mas long",
    )
    plan = crossmatch_cone(df, df, R)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_harmonic_sum_hand_case(spark):
    # grid: 1200 with harmonics 600 (h=2), 400 (h=3), 300 (h=4) all
    # present; 700 has only itself (h=2..4 sub-multiples absent)
    gram = spark.createDataFrame(
        [(1200, 10), (600, 20), (400, 30), (300, 40), (700, 5)],
        "period_us long, sum_sq long",
    )
    rows = {
        r.period_us: (r.n_harm_present, int(r.hsum))
        for r in harmonic_sum(gram, nharm=4).collect()
    }
    assert rows[1200] == (4, 10 + 20 + 30 + 40)
    assert rows[700] == (1, 5)
    # 600's h=2 is 300 (present), h=3 -> 200 absent, h=4 -> 150 absent
    assert rows[600] == (2, 20 + 40)


def test_harmonic_sum_skips_non_divisible(spark):
    gram = spark.createDataFrame(
        [(1001, 7), (500, 3)], "period_us long, sum_sq long"
    )
    rows = {r.period_us: r.n_harm_present for r in harmonic_sum(gram, 4).collect()}
    assert rows[1001] == 1  # 1001 % 2, % 3, % 4 all nonzero
    assert rows[500] == 1  # 250 and 125 not in the grid -> only h=1


def test_delay_table_shape_and_monotonicity():
    rows = dispersion_delay_table([0, 100], nchan=16, f_lo_mhz=119.0, chan_bw_mhz=0.625)
    assert len(rows) == 32
    by = {(d, c): u for d, c, u in rows}
    assert all(by[(0, c)] == 0 for c in range(16))  # DM 0: no delay
    assert by[(100, 15)] == 0  # top channel is the alignment reference
    # lower channels are delayed more
    delays = [by[(100, c)] for c in range(16)]
    assert delays == sorted(delays, reverse=True)
    assert delays[0] > 0


def test_dm_search_recovers_injected_dm(spark):
    nchan, p_us, dm_true = 8, 1_000_000, 120
    table = dispersion_delay_table(
        [0, 60, 120, 180], nchan, f_lo_mhz=119.0, chan_bw_mhz=2.5
    )
    delay_true = {c: u for d, c, u in table if d == dm_true}
    rng = random.Random(3)
    rows = []
    for i in range(4000):
        chan = rng.randrange(nchan)
        # narrow pulse: emitted phase in the first 1/10 of the period
        t_emit = (i % 400) * p_us + rng.randrange(p_us // 10)
        rows.append((t_emit + delay_true[chan], chan))  # dispersed arrival
    df = spark.createDataFrame(rows, "ts_us long, chan long")
    scored = {
        r.dm: int(r.sum_sq)
        for r in dm_search(df, table, p_us, nbins=10).collect()
    }
    assert max(scored, key=scored.get) == dm_true


def test_dm_search_validates(spark):
    df = spark.createDataFrame([(0, 0)], "ts_us long, chan long")
    with pytest.raises(ValueError):
        dm_search(df, [(0, 0, 0)], period_us=0)
    with pytest.raises(ValueError):
        dispersion_delay_table([], 8, 119.0, 0.625)


def test_period_search_feeds_harmonic_sum(spark):
    # end-to-end: strong signal at P=1200 with 25% duty cycle puts
    # power into its harmonics; harmonic summing ranks it above a
    # flat-noise trial
    rng = random.Random(11)
    rows = [((i * 1200) + rng.randrange(300),) for i in range(2000)]
    df = spark.createDataFrame(rows, "ts_us long")
    grid = [1200, 600, 400, 300, 1100]
    hs = harmonic_sum(period_search(df, grid, nbins=12), nharm=4)
    got = {r.period_us: int(r.hsum) for r in hs.collect()}
    assert got[1200] > got[1100]


def test_semantic_dedup_drops_min_id_neighbors(spark):
    from lofar_bf_pulsar_scripts_spark.operators.similarity import (
        semantic_dedup,
    )

    # cluster 0: vectors 10, 11 identical (11 dropped), 12 orthogonal;
    # cluster 1: 20 alone
    rows = [
        (10, [1.0, 0.0, 0.0], 0),
        (11, [1.0, 0.0, 0.0], 0),
        (12, [0.0, 1.0, 0.0], 0),
        (20, [0.0, 0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cid long"
    )
    got = {r.cid: r for r in semantic_dedup(df, 0.9).collect()}
    assert (got[0].n_vectors, got[0].n_dropped, got[0].n_kept) == (3, 1, 2)
    assert got[0].sum_dropped_ids == 11
    assert (got[1].n_vectors, got[1].n_dropped) == (1, 0)


def test_semantic_dedup_never_compares_across_clusters(spark):
    from lofar_bf_pulsar_scripts_spark.operators.similarity import (
        semantic_dedup,
    )

    # identical vectors in DIFFERENT clusters are both kept
    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 1)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cid long"
    )
    assert sum(r.n_dropped for r in semantic_dedup(df, 0.5).collect()) == 0


def test_crossmatch_nearest_picks_minimum(spark):
    from lofar_bf_pulsar_scripts_spark.operators.spatial import (
        crossmatch_nearest,
    )

    catalog = [(1, 1000, 0), (2, 2000, 0), (3, 10_000_000, 0)]
    probes = [(100, 1400, 0), (101, 1900, 0), (102, 500_000_000, 0)]
    pdf = spark.createDataFrame(probes, "pid long, ra_mas long, dec_mas long")
    cdf = spark.createDataFrame(catalog, "cat_id long, ra_mas long, dec_mas long")
    got = {
        r.pid: (r.cat_id_cat, r.sep_sq_mas2)
        for r in crossmatch_nearest(pdf, cdf, R, "pid").collect()
    }
    assert got[100] == (1, 400 * 400)   # 1400 is closer to 1000 than 2000
    assert got[101] == (2, 100 * 100)
    assert 102 not in got               # no catalog entry within radius


def test_crossmatch_nearest_tie_breaks_on_catalog_coords(spark):
    from lofar_bf_pulsar_scripts_spark.operators.spatial import (
        crossmatch_nearest,
    )

    # two catalog entries exactly equidistant: keep the smaller ra
    catalog = [(7, 900, 0), (8, 1100, 0)]
    probes = [(1, 1000, 0)]
    pdf = spark.createDataFrame(probes, "pid long, ra_mas long, dec_mas long")
    cdf = spark.createDataFrame(catalog, "cat_id long, ra_mas long, dec_mas long")
    row = crossmatch_nearest(pdf, cdf, R, "pid").collect()[0]
    assert (row.cat_id_cat, row.sep_sq_mas2) == (7, 100 * 100)


def test_accel_search_recovers_injected_drift(spark):
    from lofar_bf_pulsar_scripts_spark.operators.fold import (
        accel_search,
        accel_shift_table,
    )

    # pulses drift quadratically with acc_true; the matching trial
    # un-shifts them into a narrow phase bump
    p_us, acc_true = 1_000_000, 400_000  # µs/day^2
    chunk_us = 43_200_000_000  # half-day chunks
    table = accel_shift_table(
        [-400_000, 0, 400_000, 800_000], n_chunks=60, chunk_us=chunk_us
    )
    shift_true = {k: s for a, k, s in table if a == acc_true}
    rng = random.Random(5)
    rows = []
    for i in range(6000):
        t_emit = rng.randrange(60 * chunk_us)
        chunk = t_emit // chunk_us
        # narrow duty cycle at emission, shifted by the true drift
        t_phase = (t_emit // p_us) * p_us + rng.randrange(p_us // 10)
        rows.append((t_phase + shift_true[chunk], chunk))
    df = spark.createDataFrame(rows, "ts_us long, chunk long")
    scored = {
        r.acc: int(r.sum_sq)
        for r in accel_search(df, table, p_us, nbins=10).collect()
    }
    assert max(scored, key=scored.get) == acc_true


def test_accel_shift_table_quadratic():
    from lofar_bf_pulsar_scripts_spark.operators.fold import (
        accel_shift_table,
    )

    rows = accel_shift_table([1000], n_chunks=4, chunk_us=86_400_000_000)
    by = {k: s for _, k, s in rows}
    # shift(chunk mid t) = 0.5 * acc * t_days^2 at t = 0.5, 1.5, 2.5, 3.5
    assert by[0] == round(0.5 * 1000 * 0.5**2)
    assert by[3] == round(0.5 * 1000 * 3.5**2)
    # zero acceleration -> all-zero shifts
    assert all(s == 0 for _, _, s in accel_shift_table([0], 4))


def test_pagerank_hand_case(spark):
    from lofar_bf_pulsar_scripts_spark.operators.graph import (
        pagerank_iterations,
    )

    # 3-node chain with a cycle: 0->1, 1->2, 2->0; every node has
    # in/out degree 1, so ranks stay uniform at every iteration
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    scale = 10**9
    got = {r.node: r.rank for r in pagerank_iterations(nodes, edges, 2, scale).collect()}
    # r0 = scale//3; r1 = 15*scale//300 + (85*r0)//100 — uniform again
    r0 = scale // 3
    r1 = (15 * scale) // (100 * 3) + (85 * r0) // 100
    r2 = (15 * scale) // (100 * 3) + (85 * r1) // 100
    assert got == {0: r2, 1: r2, 2: r2}


def test_pagerank_sink_and_source(spark):
    from lofar_bf_pulsar_scripts_spark.operators.graph import (
        pagerank_iterations,
    )

    # 0 -> 1, 1 dangling (leaks), 2 isolated (teleport only)
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    scale = 10**9
    got = {r.node: r.rank for r in pagerank_iterations(nodes, edges, 1, scale).collect()}
    tele = (15 * scale) // (100 * 3)
    r0 = scale // 3
    assert got[0] == tele                      # no in-edges
    assert got[1] == tele + (85 * r0) // 100   # receives 0's mass
    assert got[2] == tele                      # isolated
    # total mass never exceeds the initial scale (damped leak)
    assert sum(got.values()) <= scale


def test_pagerank_partition_invariant(spark):
    from lofar_bf_pulsar_scripts_spark.operators.graph import (
        pagerank_iterations,
    )
    import random as _r

    rng = _r.Random(13)
    nodes = spark.createDataFrame([(i,) for i in range(50)], "node long")
    e = [(rng.randrange(50), rng.randrange(50)) for _ in range(200)]
    base = spark.createDataFrame(e, "src long, dst long")
    a = {r.node: r.rank for r in pagerank_iterations(nodes, base, 3).collect()}
    b = {
        r.node: r.rank
        for r in pagerank_iterations(nodes, base.repartition(7), 3).collect()
    }
    assert a == b


def test_blind_search_recovers_planted_triple(spark):
    """End-to-end composition: a dispersed, drifting pulse train
    planted in noise is recovered as the exact (DM, P, drift) grid
    triple by the full dedisperse -> joint period grid -> harmonic
    boost -> drift refinement chain."""
    from lofar_bf_pulsar_scripts_spark.operators.fold import (
        accel_shift_table,
    )
    from lofar_bf_pulsar_scripts_spark.plans.search import (
        blind_search_summary,
    )

    nchan, f_lo, bw = 8, 110.0, 2.5
    dm_grid = [0, 10, 20, 30]
    delay_rows = dispersion_delay_table(dm_grid, nchan, f_lo, bw)
    fundamentals = [999_600, 1_000_800, 1_002_000]
    periods = sorted({f // h for f in fundamentals for h in (1, 2, 3, 4)})
    chunk_us = 43_200_000_000  # half-day blocks
    n_chunks = 40
    acc_grid = [-1000, 0, 1000, 2000]
    shift_rows = accel_shift_table(acc_grid, n_chunks, chunk_us)

    dm_true, p_true, acc_true = 20, 1_000_800, 1000
    delay_true = {c: u for d, c, u in delay_rows if d == dm_true}
    shift_true = {k: s for a, k, s in shift_rows if a == acc_true}
    span = n_chunks * chunk_us
    rng = random.Random(11)
    rows = []
    for _ in range(4000):  # planted train, ~1/12 duty cycle
        t_emit = rng.randrange(span - 10_000_000)
        t_phase = (t_emit // p_true) * p_true + rng.randrange(p_true // 12)
        chan = rng.randrange(nchan)
        chunk = t_phase // chunk_us
        t_raw = t_phase + delay_true[chan] + shift_true[chunk]
        rows.append((t_raw, chan, t_raw // chunk_us))
    for _ in range(4000):  # uniform noise
        t_raw = rng.randrange(span)
        rows.append((t_raw, rng.randrange(nchan), t_raw // chunk_us))
    df = spark.createDataFrame(rows, "ts_us long, chan long, chunk long")

    got = blind_search_summary(
        df, delay_rows, periods, shift_rows, nbins=16, nharm=4
    ).first()
    assert got["best_dm"] == dm_true
    assert got["best_period_us"] == p_true
    assert got["best_acc"] == acc_true
    assert got["n_events"] == 8000
    # the recovered profile is genuinely peaked, not flat
    assert got["peak_count"] > (8000 // 16) * 2


# --------------------------------------------------------------------
# Subband (two-stage) dedispersion
# --------------------------------------------------------------------


def test_subband_delay_tables_decompose_total_delay():
    from lofar_bf_pulsar_scripts_spark.operators.dedisperse import (
        subband_delay_tables,
    )

    trials, nchan, nsub = [0, 120, 240], 8, 4
    chan_rows, sub_rows = subband_delay_tables(
        trials, 120, nchan, nsub, 119.0, 2.5
    )
    assert len(chan_rows) == nchan and len(sub_rows) == len(trials) * nsub
    full = dispersion_delay_table(trials, nchan, 119.0, 2.5)
    cshift = {c: (s, u) for c, s, u in chan_rows}
    sshift = {(d, s): u for d, s, u in sub_rows}
    # at dm == nominal the decomposition is exact up to 1 µs rounding;
    # the top channel of each subband has zero within-sub shift
    for d, c, u in full:
        s, cu = cshift[c]
        if d == 120:
            assert abs((cu + sshift[(d, s)]) - u) <= 1
    m = nchan // nsub
    for s in range(nsub):
        assert cshift[(s + 1) * m - 1][1] == 0


def test_subband_equals_brute_when_one_chan_per_sub(spark):
    from lofar_bf_pulsar_scripts_spark.operators.dedisperse import (
        subband_dm_search,
    )

    trials, nchan, p_us = [0, 60, 120], 8, 1_000_000
    table = dispersion_delay_table(trials, nchan, 119.0, 2.5)
    rng = random.Random(7)
    rows = [
        (rng.randrange(400) * p_us + rng.randrange(p_us), rng.randrange(nchan))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "ts_us long, chan long")
    brute = {
        (r.dm): (r.n_events, int(r.sum_sq), r.n_occupied_bins)
        for r in dm_search(df, table, p_us, nbins=10).collect()
    }
    # nsub == nchan and tsamp_us == 1: within-sub shift is 0, the
    # residual vanishes, and time bins are the exact event times
    two = {
        (r.dm): (r.n_events, int(r.sum_sq), r.n_occupied_bins)
        for r in subband_dm_search(
            df, trials, 60, nchan, nchan, 119.0, 2.5, p_us,
            nbins=10, tsamp_us=1,
        ).collect()
    }
    assert two == brute


def test_subband_recovers_injected_dm(spark):
    from lofar_bf_pulsar_scripts_spark.operators.dedisperse import (
        subband_dm_search,
    )

    nchan, p_us, dm_true = 8, 1_000_000, 120
    table = dispersion_delay_table(
        [0, 60, 120, 180], nchan, f_lo_mhz=119.0, chan_bw_mhz=2.5
    )
    delay_true = {c: u for d, c, u in table if d == dm_true}
    rng = random.Random(3)
    rows = []
    for i in range(4000):
        chan = rng.randrange(nchan)
        t_emit = (i % 400) * p_us + rng.randrange(p_us // 10)
        rows.append((t_emit + delay_true[chan], chan))
    df = spark.createDataFrame(rows, "ts_us long, chan long")
    scored = {
        r.dm: int(r.sum_sq)
        for r in subband_dm_search(
            df, [0, 60, 120, 180], dm_true, nchan, 4, 119.0, 2.5, p_us,
            nbins=10, tsamp_us=p_us // 50,
        ).collect()
    }
    assert max(scored, key=scored.get) == dm_true


def test_subband_validates(spark):
    from lofar_bf_pulsar_scripts_spark.operators.dedisperse import (
        dedisperse_subbands,
        subband_delay_tables,
        subband_dm_search,
    )

    df = spark.createDataFrame([(0, 0)], "ts_us long, chan long")
    with pytest.raises(ValueError):
        subband_delay_tables([0], 0, 8, 3, 119.0, 2.5)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        dedisperse_subbands(df, [(0, 0, 0)], tsamp_us=0)
    with pytest.raises(ValueError):
        subband_dm_search(df, [0], 0, 8, 4, 119.0, 2.5, period_us=0)
