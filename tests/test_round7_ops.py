"""Round-7 second wave: candidate sifting, single-pulse search,
timing-residual fit, positional span dedup — hand-computed cases."""

import pytest
from pyspark.sql import Row, functions as F

from lofar_bf_pulsar_scripts_spark.operators.dedisperse import (
    single_pulse_search,
)
from lofar_bf_pulsar_scripts_spark.operators.dedup import span_dedup_stats
from lofar_bf_pulsar_scripts_spark.operators.fold import (
    sift_candidates,
    timing_fit,
)


# ---- sift_candidates -------------------------------------------------


def _pg(spark, rows):
    return spark.createDataFrame(
        [Row(period_us=p, sum_sq=s) for p, s in rows]
    )


def test_sift_collapses_harmonic_family(spark):
    # 100000 is the fundamental; 50000 = P/2 (h=2 exact), 33333 is
    # P/3 within tolerance (|3*33333 - 100000| = 1 <= 3*tol);
    # 70000 relates to nothing
    pg = _pg(
        spark,
        [(100_000, 900), (50_000, 500), (33_333, 400), (70_000, 300)],
    )
    out = {
        r["period_us"]: r
        for r in sift_candidates(pg, nharm=4, tol_us=10).collect()
    }
    assert set(out) == {100_000, 70_000}
    assert out[100_000]["n_members"] == 3
    assert out[100_000]["n_self"] == 1
    assert out[70_000]["n_members"] == 1
    assert out[70_000]["n_self"] == 1


def test_sift_strongest_member_wins_even_if_harmonic(spark):
    # the HALF-period trial scores highest -> it absorbs the slower
    # fundamental, not vice versa
    pg = _pg(spark, [(100_000, 100), (50_000, 999)])
    out = sift_candidates(pg, nharm=2, tol_us=0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["period_us"] == 50_000
    assert int(r["sum_sq"]) == 999
    assert r["n_members"] == 2


def test_sift_tie_breaks_to_larger_period(spark):
    pg = _pg(spark, [(100_000, 700), (50_000, 700)])
    out = sift_candidates(pg, nharm=2, tol_us=0).collect()
    assert len(out) == 1
    assert out[0]["period_us"] == 100_000


def test_sift_h1_merges_near_duplicates(spark):
    pg = _pg(spark, [(100_000, 10), (100_004, 20), (90_000, 5)])
    out = {
        r["period_us"]: r
        for r in sift_candidates(pg, nharm=1, tol_us=5).collect()
    }
    assert set(out) == {100_004, 90_000}
    assert out[100_004]["n_members"] == 2


def test_sift_rejects_bad_params(spark):
    pg = _pg(spark, [(100, 1)])
    with pytest.raises(ValueError):
        sift_candidates(pg, nharm=0)
    with pytest.raises(ValueError):
        sift_candidates(pg, tol_us=-1)


# ---- single_pulse_search ---------------------------------------------


def _events(spark, ts_list):
    return spark.createDataFrame([Row(ts_us=int(t)) for t in ts_list])


def test_single_pulse_finds_planted_burst(spark):
    # 1 event per bin for bins 0..19 as baseline, plus a 12-event
    # burst in bin 7 -> n=32, span=20, mu=1.6, sigma=1.265; the burst
    # bin's S/N is (13-1.6)/1.265 = 9.0, baseline bins sit below mu
    ts = [b * 1000 + 5 for b in range(20)] + [7 * 1000 + k for k in range(12)]
    out = single_pulse_search(
        _events(spark, ts), widths=[1], bin_us=1000, snr_x1000=3000
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["t_peak_bin"] == 7
    assert r["peak_sum"] == 13
    assert r["n_cands"] == 1


def test_single_pulse_island_merges_adjacent_detections(spark):
    # bursts in bins 7 and 8 -> two width-1 detections (S/N 5.2 and
    # 6.6 at mu=1.9), one island; peak reported at the stronger bin,
    # start at the earlier
    ts = [b * 1000 for b in range(20)]
    ts += [7 * 1000 + k for k in range(8)]
    ts += [8 * 1000 + k for k in range(10)]
    out = single_pulse_search(
        _events(spark, ts), widths=[1], bin_us=1000, snr_x1000=3000
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["t_start_bin"] == 7
    assert r["t_peak_bin"] == 8
    assert r["peak_sum"] == 11
    assert r["n_cands"] == 2


def test_single_pulse_wide_boxcar_catches_spread_burst(spark):
    # burst spread over bins 10..13 (3 extra events each): per-bin
    # S/N is (4-1.6)/1.265 = 1.9 < 3, but the width-4 boxcar at bin
    # 10 integrates to (16-6.4)/2.53 = 3.8 >= 3 — the sqrt(w)
    # threshold growth is exactly why the bank needs wide boxcars
    ts = [b * 1000 for b in range(20)]
    for b in (10, 11, 12, 13):
        ts += [b * 1000 + k + 1 for k in range(3)]
    out = single_pulse_search(
        _events(spark, ts), widths=[1, 4], bin_us=1000, snr_x1000=3000
    ).collect()
    by_width = {}
    for r in out:
        by_width.setdefault(r["width"], []).append(r)
    assert 1 not in by_width
    assert len(by_width[4]) == 1
    r = by_width[4][0]
    assert r["t_peak_bin"] == 10
    assert r["peak_sum"] == 16


def test_single_pulse_peak_tie_breaks_to_earliest_bin(spark):
    # equal bursts in bins 4 and 5 (S/N (6-2)/1.414 = 2.83 each)
    ts = [b * 1000 for b in range(10)]
    ts += [4 * 1000 + k for k in range(5)]
    ts += [5 * 1000 + k for k in range(5)]
    out = single_pulse_search(
        _events(spark, ts), widths=[1], bin_us=1000, snr_x1000=2000
    ).collect()
    assert len(out) == 1
    assert out[0]["t_peak_bin"] == 4


def test_single_pulse_rejects_bad_params(spark):
    df = _events(spark, [0])
    with pytest.raises(ValueError):
        single_pulse_search(df, widths=[])
    with pytest.raises(ValueError):
        single_pulse_search(df, widths=[0])
    with pytest.raises(ValueError):
        single_pulse_search(df, bin_us=0)
    with pytest.raises(ValueError):
        single_pulse_search(df, snr_x1000=0)


# ---- timing_fit ------------------------------------------------------


def test_timing_fit_recovers_planted_drift(spark):
    # events strictly periodic at P*(1 + 2e-5): folding at P leaves a
    # residual ramp r(t) ~ (dP/P) * t, i.e. slope 20 us/s
    p = 1_000_000
    dp = 20  # us per period -> dP/P = 2e-5 -> 20 us per second
    ts = [k * (p + dp) for k in range(2000)]
    r = timing_fit(_events(spark, ts), p, x0_us=0).first()
    assert r["n"] == 2000
    assert abs(r["slope_us_per_s"] - 20.0) < 0.5
    assert abs(r["intercept_us"]) < 2000  # wraps excluded: ramp stays < P/2


def test_timing_fit_zero_drift_is_flat(spark):
    p = 1_000_000
    ts = [k * p + 1234 for k in range(500)]
    r = timing_fit(_events(spark, ts), p, x0_us=0).first()
    assert r["slope_us_per_s"] == 0.0
    assert r["intercept_us"] == 1234.0


def test_timing_fit_exact_sums(spark):
    # hand-computable 3-point fit: x = 0, 1, 2 s; r = 10, 20, 30 us
    p = 1_000_000
    ts = [0 + 10, 1_000_000 + 20, 2_000_000 + 30]
    r = timing_fit(_events(spark, ts), p, x0_us=0).first()
    assert r["n"] == 3
    assert r["sx"] == 3
    assert r["sr"] == 60
    assert r["slope_us_per_s"] == 10.0
    assert r["intercept_us"] == 10.0


def test_timing_fit_rejects_bad_period(spark):
    with pytest.raises(ValueError):
        timing_fit(_events(spark, [0]), 1, 0)


# ---- span_dedup_stats ------------------------------------------------


def test_span_dedup_counts_shared_spans(spark):
    shared = "a b c d"  # k=3 -> spans 'a b c', 'b c d' shared
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=shared + " x"),
            Row(doc_id=1, text=shared + " y"),
            Row(doc_id=2, text="p q r s t"),
        ]
    )
    out = {r["doc_id"]: r for r in span_dedup_stats(df, k=3).collect()}
    # doc 0: spans {'a b c','b c d','c d x'}; first two shared
    assert out[0]["n_spans"] == 3
    assert out[0]["n_dup_spans"] == 2
    assert out[0]["dup_fraction"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[2]["n_dup_spans"] == 0


def test_span_dedup_short_and_null_docs_report_zeros(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="only two"),
            Row(doc_id=1, text=None),
            Row(doc_id=2, text="a b c d e"),
        ]
    )
    out = {r["doc_id"]: r for r in span_dedup_stats(df, k=3).collect()}
    assert out[0]["n_spans"] == 0 and out[0]["dup_fraction"] == 0.0
    assert out[1]["n_spans"] == 0
    assert out[2]["n_spans"] == 3
    assert out[2]["n_dup_spans"] == 0


def test_span_dedup_repeated_span_within_one_doc_not_duplicated(spark):
    # 'a b c' occurs twice inside doc 0 but in no other doc ->
    # cross-document frequency is 1, so it is NOT a duplicate
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b c a b c"),
            Row(doc_id=1, text="z z z z"),
        ]
    )
    out = {r["doc_id"]: r for r in span_dedup_stats(df, k=3).collect()}
    assert out[0]["n_spans"] == 4
    assert out[0]["n_dup_spans"] == 0


# ---- pulse_energy_hist -----------------------------------------------


def _ts(spark, ts):
    return spark.createDataFrame([Row(ts_us=t) for t in ts])


def test_pulse_energy_hist_hand_computed(spark):
    from lofar_bf_pulsar_scripts_spark.operators.fold import (
        pulse_energy_hist,
    )

    # P=10, nbins=5 (bin width 2), on window bins [1,3) i.e. ts%10
    # in [2,6).  rot 0: ts 0(off),3(on),5(on) -> e_on=2,e_off=1;
    # rot 1: ts 12(on) -> e_on=1; rot 3: ts 30(off) -> e_on=0,
    # e_off=1.  rot 2 is empty -> restored into the e_on=0 cell.
    out = {
        r["e_on"]: r
        for r in pulse_energy_hist(
            _ts(spark, [0, 3, 5, 12, 30]), 10, 1, 3, nbins=5
        ).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[0]["n_rotations"] == 2 and out[0]["sum_e_off"] == 1
    assert out[1]["n_rotations"] == 1 and out[1]["sum_e_off"] == 0
    assert out[2]["n_rotations"] == 1 and out[2]["sum_e_off"] == 1


def test_pulse_energy_hist_no_gap_no_correction(spark):
    from lofar_bf_pulsar_scripts_spark.operators.fold import (
        pulse_energy_hist,
    )

    # every rotation occupied, every event on-window -> no e_on=0 row
    out = pulse_energy_hist(
        _ts(spark, [2, 12, 22]), 10, 1, 3, nbins=5
    ).collect()
    assert len(out) == 1
    assert out[0]["e_on"] == 1 and out[0]["n_rotations"] == 3


def test_pulse_energy_hist_rejects_bad_params(spark):
    from lofar_bf_pulsar_scripts_spark.operators.fold import (
        pulse_energy_hist,
    )

    with pytest.raises(ValueError):
        pulse_energy_hist(_ts(spark, [0]), 0, 1, 3)
    with pytest.raises(ValueError):
        pulse_energy_hist(_ts(spark, [0]), 10, 3, 3, nbins=5)
    with pytest.raises(ValueError):
        pulse_energy_hist(_ts(spark, [0]), 10, 1, 6, nbins=5)
