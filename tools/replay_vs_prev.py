"""Replay two committed bench records through the CURRENT vs_prev
model (bench.compute_vs_prev) — the audit path for the round-14
two-component machine model (r13 VERDICT item 3: the CPU-only canary
printed 1.51 on a flat surface when the host's CPU index swung
1.67x; the machine-matched read was ~1.0).

Usage:
  python tools/replay_vs_prev.py PREV.json NOW.json

PREV/NOW are bench records (BENCH_QUERIES.json-shaped: full
per-query dict + canary samples; the compact BENCH_r{N}.json tail
also works if its 'parsed' payload carries queries).  Legacy records
without overhead canary samples get the documented proxy overhead
index (p10 of sub-0.5 s query walls).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    _has_ovh_samples,
    _machine_index,
    _overhead_index,
    compute_vs_prev,
)


def _load(path: str) -> dict:
    rec = json.load(open(path))
    if "queries" not in rec and isinstance(rec.get("parsed"), dict):
        rec = rec["parsed"]
    if "queries" not in rec:
        raise SystemExit(f"{path}: no per-query dict in record")
    return rec


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    prev, now = _load(sys.argv[1]), _load(sys.argv[2])
    out = compute_vs_prev(
        prev,
        now["queries"],
        [],  # headline split not reconstructable from every record
        _machine_index(now),
        _overhead_index(now),
        # symmetric mixed-unit guard (ADVICE r14): a legacy-shaped NOW
        # record yields a proxy index — tell compute_vs_prev so it
        # falls back to proxy-on-both-sides instead of dividing the
        # prev's canary by the now's proxy
        now_has_ovh=_has_ovh_samples(now),
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
