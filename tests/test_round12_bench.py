"""Round-12: the bench record's self-adjudication surface — the
headline subset is pinned to real registry specs, and the canary
normalization math is deterministic."""

import bench
from lofar_bf_pulsar_scripts_spark.registry import HEADLINE_QUERIES, specs


def test_headline_queries_exist_and_are_distinct():
    names = {s.name for s in specs()}
    missing = [n for n in HEADLINE_QUERIES if n not in names]
    assert not missing, missing
    assert len(HEADLINE_QUERIES) == len(set(HEADLINE_QUERIES))
    # "~50 structurally distinct plans" (r11 VERDICT item 8)
    assert 45 <= len(HEADLINE_QUERIES) <= 70


def test_machine_index_prefers_mature_samples():
    rec = {
        "canary_samples": [
            {"at": "start", "sec": 0.40},  # JVM-maturation-inflated
            {"at": "p0q39", "sec": 0.14},
            {"at": "p0end", "sec": 0.12},
            {"at": "p1q39", "sec": 0.16},
        ],
        "canary_end_sec": 0.12,
    }
    assert bench._machine_index(rec) == 0.14  # median of mature three


def test_machine_index_legacy_fallback():
    # pre-r12 records carry only start/end: use the mature end sample
    assert bench._machine_index(
        {"canary_start_sec": 0.212, "canary_end_sec": 0.135}
    ) == 0.135
    assert bench._machine_index({}) is None


def test_geomean():
    assert abs(bench._geomean([2.0, 0.5]) - 1.0) < 1e-12
    assert abs(bench._geomean([4.0]) - 4.0) < 1e-12
