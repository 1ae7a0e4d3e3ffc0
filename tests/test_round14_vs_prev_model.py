"""Round-14 (VERDICT item 3): the two-component vs_prev machine
model.  The CPU-only canary over-corrected overhead-bound queries —
r13's record printed normalized 1.51 on a flat surface because the
host's CPU index swung 1.67x while the scheduler floor did not.  The
model now samples a second (1-task noop) canary and adjudicates each
query ratio within the [m_ovh, m_cpu] machine band: interval
attribution never invents a regression a machine-mix hypothesis can
explain, and never hides one it cannot.

Pure-function tests — no SparkSession."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import _machine_index, _overhead_index, compute_vs_prev

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rec(queries, cpu, ovh=None, samples=True):
    rec = {"value": sum(queries.values()), "queries": queries}
    if samples:
        rec["canary_samples"] = [
            {"at": "start", "sec": cpu * 2, "ovh_sec": (ovh or 0) * 2},
            {"at": "p0end", "sec": cpu, "ovh_sec": ovh},
            {"at": "p1end", "sec": cpu, "ovh_sec": ovh},
        ]
    return rec


def test_band_straddling_one_adjudicates_to_flat():
    """A uniform 1.3x slowdown on a host whose CPU canary also read
    1.3x slower and whose overhead read 1.0x: every per-query band
    [r*m_ovh, r*m_cpu] = [1.0, 1.3] straddles... the CPU edge
    explains it — adjudicated 1.0 for ALL queries."""
    prev = _rec({"a": 1.0, "b": 0.2, "c": 4.0}, cpu=0.10, ovh=0.20)
    now_q = {"a": 1.3, "b": 0.26, "c": 5.2}
    out = compute_vs_prev(prev, now_q, [], 0.13, 0.20)
    assert out["machine_band"] == [0.7692, 1.0]
    assert out["band_adjudicated_geomean_ratio"] == 1.0
    assert out["raw_geomean_ratio"] == pytest.approx(1.3, abs=1e-3)


def test_real_regression_survives_the_band():
    """A 3x slowdown on an UNCHANGED machine (both canaries flat)
    cannot be attributed: adjudicated stays 3x."""
    prev = _rec({"a": 1.0}, cpu=0.10, ovh=0.20)
    out = compute_vs_prev(prev, {"a": 3.0}, [], 0.10, 0.20)
    assert out["machine_band"] == [1.0, 1.0]
    assert out["band_adjudicated_geomean_ratio"] == pytest.approx(
        3.0, abs=1e-3
    )


def test_overhead_swing_does_not_fake_a_regression():
    """The r13 failure mode: CPU index 1.67x faster, overhead flat,
    overhead-bound queries flat raw.  The old model read r*m_cpu =
    1.67x 'regression'; the band model reads 1.0."""
    prev = _rec({"s1": 0.3, "s2": 0.4}, cpu=0.1675, ovh=0.20)
    out = compute_vs_prev(
        prev, {"s1": 0.3, "s2": 0.4}, [], 0.1005, 0.20
    )
    assert out["normalized_geomean_ratio"] == pytest.approx(
        1.6667, abs=1e-3
    )  # the legacy read (kept for series continuity)
    assert out["band_adjudicated_geomean_ratio"] == 1.0


def test_legacy_record_gets_proxy_overhead_index():
    """Records from before the ovh canary: p10 of sub-0.5 s walls."""
    q = {f"q{i}": 0.1 + 0.01 * i for i in range(30)}
    rec = {"queries": q, "canary_end_sec": 0.1}
    idx = _overhead_index(rec)
    assert idx is not None and 0.1 <= idx <= 0.2
    # and explicit samples win over the proxy
    rec2 = _rec(q, cpu=0.1, ovh=0.33)
    assert _overhead_index(rec2) == 0.33
    assert _machine_index(rec2) == 0.1


def test_mixed_unit_ovh_pair_uses_proxy_on_both_sides():
    """r14 measurement-bug fix: a legacy prev record (no explicit ovh
    canary; proxy = p10 of sub-0.5 s QUERY walls, ~0.2 s) compared
    against a new record whose explicit 1-task canary reads ~0.02 s
    must NOT divide the two — that fabricated an ~11x machine
    multiplier whose band adjudicated every query flat.  The pair must
    be computed with the same estimator on both sides (proxy here),
    and the record must say which."""
    prev_q = {f"q{i}": 0.1 + 0.01 * i for i in range(30)}
    prev_q["big"] = 4.0
    prev = {"queries": prev_q, "canary_samples": [
        {"at": "start", "sec": 0.2},
        {"at": "p0end", "sec": 0.1},
        {"at": "p1end", "sec": 0.1},
    ]}  # legacy shape: no ovh_sec anywhere
    # identical walls now; explicit ovh canary 10x smaller than the
    # proxy's query-wall units
    out = compute_vs_prev(prev, dict(prev_q), [], 0.1, 0.02)
    assert out["ovh_index_kind"] == "proxy"
    # same walls + same estimator both sides -> ovh multiplier 1.0,
    # band [1, 1], adjudicated flat — and a REAL 3x mover would no
    # longer hide inside a fabricated band
    assert out["machine_band"] == [1.0, 1.0]
    assert out["band_adjudicated_geomean_ratio"] == 1.0
    now3 = dict(prev_q)
    now3["big"] = 12.0  # a real 3x regression on one >=0.3 s query
    out3 = compute_vs_prev(prev, now3, [], 0.1, 0.02)
    assert out3["top_movers_adjudicated"]["big"] == pytest.approx(
        3.0, abs=1e-3
    )


def test_replay_r12_r13_reads_flat():
    """The item-3 'done' bar: replaying the committed r12 record vs
    the r13 record through the new model yields a band-adjudicated
    ratio consistent with the machine-matched r10 comparison (~1.0),
    where the old model read 1.51."""
    r13 = json.load(open(os.path.join(REPO, "BENCH_BASELINE.json")))
    out = subprocess.run(
        [
            "git", "show", "2c97e9d^:BENCH_BASELINE.json",
        ],
        cwd=REPO, capture_output=True, text=True,
    )
    if out.returncode != 0:
        pytest.skip("r12 record not reachable in git history")
    r12 = json.loads(out.stdout)
    res = compute_vs_prev(
        r12, r13["queries"], [], _machine_index(r13),
        _overhead_index(r13),
    )
    assert res["normalized_geomean_ratio"] == pytest.approx(
        1.5124, abs=1e-3
    )  # the old model's phantom regression, reproduced
    assert 0.9 <= res["band_adjudicated_geomean_ratio"] <= 1.1


def test_symmetric_guard_canary_prev_vs_legacy_now():
    """r15 (ADVICE): the mixed-unit guard must be SYMMETRIC.  A
    canary-bearing PREV replayed against a legacy-shaped NOW (whose
    overhead index is the query-wall proxy) must fall back to
    proxy-on-both-sides — dividing the prev's ~0.02 s canary by the
    now's ~0.2 s proxy would fabricate the inverse multiplier while
    still labeling it 'canary'."""
    q = {f"q{i}": 0.1 + 0.01 * i for i in range(30)}
    prev = _rec(dict(q), cpu=0.1, ovh=0.02)  # explicit ovh canary
    now_proxy_idx = _overhead_index({"queries": q})  # legacy shape
    out = compute_vs_prev(
        prev, dict(q), [], 0.1, now_proxy_idx, now_has_ovh=False
    )
    assert out["ovh_index_kind"] == "proxy"
    assert out["machine_band"] == [1.0, 1.0]
    assert out["band_adjudicated_geomean_ratio"] == 1.0


def test_print_priority_covers_committed_printed_sets():
    """r15 (VERDICT item 2): the printed bench line must never again
    silently evict queries the driver's series already tracks.  The
    HEADLINE + PRINT_PRIORITY keep-list must cover every query name
    the committed r13 and r14 records printed."""
    from bench import HEADLINE, PRINT_PRIORITY

    keep = set(HEADLINE) | set(PRINT_PRIORITY)
    for rec_name in ("BENCH_r13.json", "BENCH_r14.json"):
        rec = json.load(open(os.path.join(REPO, rec_name)))
        printed = set((rec.get("parsed") or {}).get("queries") or {})
        assert printed <= keep, (rec_name, sorted(printed - keep))
