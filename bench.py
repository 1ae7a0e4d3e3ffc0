"""Benchmark harness: runs the registry queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed through the same registry the correctness gate
uses; timing includes plan + execution, excluding session startup and
first-touch JVM warmup (one warmup query runs first).

Execution action (round 5 change): ``df.write.format("noop")`` — NOT
``count()``. Catalyst prunes unused columns through a final count, so
count() on an Aggregate drops the aggregate expressions themselves
(and column-prunes the scan down to the group keys): rounds 1-4
timed partial plans for every aggregate-shaped query
(minhash_signatures measured 0.4s flat at every SF; its full
projection is ~1.7s at sf0.1). The noop sink executes the complete
projection — what a downstream consumer pays. The JSON carries
``"action": "noop_write"`` so cross-round comparisons know r5+
numbers are NOT comparable to the r1-r4 count()-based series
(measured conversion on the r4 set: see SCALE.md round 5).

Self-adjudication (round 12): the committed bench series drifted up
to 1.21x geomean between rounds on IDENTICAL code from host
conditions alone (r11 VERDICT; the builder's four same-code runs
measured a 0.93-1.34x band with the same uniform-shift signature).
The adjudication now lives INSIDE the record instead of in an
after-the-fact drift study:
  - a fixed-cost, data-independent canary is sampled at FIVE fixed
    positions through every pass (start, 25/50/75%, pass end), so
    mid-run contention is visible, not inferred;
  - ``canary_machine_index`` = median of the mature (non-start)
    samples; ``queries_normalized`` rescales every per-query time to
    the reference machine speed (CANARY_REF);
  - ``vs_prev`` compares this run against the committed
    BENCH_BASELINE.json (the previous round's canonical record):
    raw and canary-normalized geomean ratios over common queries plus
    the top normalized movers — a judge can attribute a shift to the
    machine or to the code from the record alone.
Totals are reported twice: ``value`` (full registry — the continuous
series) and ``headline_value`` (registry.HEADLINE_QUERIES, ~58
structurally distinct plans), because ~40 sub-second micro-gates in
the full set carry ±1.3x position/JIT classification noise that
drowns round-over-round reads (r11 VERDICT item 8).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lofar_bf_pulsar_scripts_spark.session import get_spark
from lofar_bf_pulsar_scripts_spark.registry import HEADLINE_QUERIES
from __spark_entry__ import queries

# Print-priority set (kept from r1): one per operator family; the
# truncated stdout line keeps these entries first.
HEADLINE = [
    "fold_profile",
    "fold_subints",
    "pricing_summary",
    "catalog_union",
    "sigma_clip_events",
    "user_sessions",
    "nearest_supplier",
    "asof_latest_event",
    "trimmed_stats",
    "boxcar_best_hourly",
]

# Mature-JVM idle canary on the reference build host (r11 record's
# canary_end 0.135 s; r8 calibration band 0.1-0.25 s). Normalized
# times are "seconds on the reference host"; the vs_prev RATIO is
# ref-independent (it cancels), so this constant only anchors the
# queries_normalized column's units.
CANARY_REF = 0.14


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _geomean(ratios: list[float]) -> float:
    return math.exp(sum(math.log(r) for r in ratios) / len(ratios))


def _machine_index(record: dict) -> float | None:
    """Mature-JVM machine-speed index of a bench record: median of
    its non-start canary samples.  Records from before the
    interleaved-canary change fall back to canary_end_sec (the one
    mature sample they carry — canary_start is JVM-maturation-
    inflated ~1.5-2x even idle, r8 calibration)."""
    samples = record.get("canary_samples")
    if samples:
        mature = [s["sec"] for s in samples if s.get("at") != "start"]
        if mature:
            return _median(mature)
    end = record.get("canary_end_sec")
    return float(end) if end else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    qs = queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]
    action = os.environ.get("SPARK_GRAFT_BENCH_ACTION", "noop_write")

    def execute(df) -> None:
        if action == "count":  # legacy r1-r4 series, for comparison only
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()

    def canary(runs: int = 3) -> float:
        # Fixed-cost, data-independent probe of the machine: 400M-row
        # range sum through the same noop sink, min over ``runs``
        # (a single sub-second sample is GC/scheduler-noise-dominated;
        # r8 measured 1.8x drift from one-shot sampling alone).
        # Calibration (r8, idle machine): the pre-run sample reads
        # ~1.5-2x the mature ones because the JVM matures over the run
        # (C2/GC state), NOT contention — machine-speed comparisons
        # must use the mature samples (see _machine_index).
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            spark.range(0, 400_000_000, 1, 32).selectExpr(
                # double product: long sum-of-squares overflows int64
                "sum(CAST(id AS DOUBLE) * id) AS s"
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # One-time at-rest store builds happen BEFORE the canary and are
    # reported as their own field: on a cold container the first query
    # of each store family otherwise pays (and is charged for) the
    # build — r7's recorded ivf/lsh "regressions" were partly this.
    from lofar_bf_pulsar_scripts_spark.registry import prebuild_stores

    store_build = prebuild_stores(spark, sf_dir)

    # JVM/codegen warmup on the smallest query
    execute(qs[names[0]](spark, sf_dir))
    canary_samples: list[dict] = [{"at": "start", "sec": canary(3)}]
    # Per-query MIN over `passes` full fixed-order passes (round-10
    # methodology fix): a single-sample pass carries ~9% total
    # variance from position-dependent GC/cache state (two committed
    # same-code r9 runs read 143.8 vs 162.5 s), which round-over-round
    # comparisons then misread as code deltas. The min over two
    # deterministic-order passes discards each query's worse
    # GC-position draw; measured same-code agreement of two min-of-2
    # records is ~2-3%. Set SPARK_GRAFT_BENCH_PASSES=1 to reproduce
    # the pre-r10 single-pass series.
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    n = len(names)
    # canary checkpoints: after the 25/50/75% query and at pass end
    marks = sorted({max(1, n // 4), max(1, n // 2), max(1, 3 * n // 4)})
    timings: dict[str, float] = {}
    for p in range(passes):
        for i, name in enumerate(names):
            t0 = time.time()
            execute(qs[name](spark, sf_dir))
            dt = round(time.time() - t0, 3)
            if p == 0 or dt < timings[name]:
                timings[name] = dt
            if (i + 1) in marks:
                canary_samples.append(
                    {"at": f"p{p}q{i + 1}", "sec": canary(2)}
                )
        canary_samples.append({"at": f"p{p}end", "sec": canary(3)})
    total = round(sum(timings.values()), 3)
    headline_ts = {n_: timings[n_] for n_ in HEADLINE_QUERIES if n_ in timings}
    machine_index = _machine_index(
        {"canary_samples": canary_samples}
    )
    norm = (
        {
            n_: round(t * CANARY_REF / machine_index, 3)
            for n_, t in timings.items()
        }
        if machine_index
        else {}
    )
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "action": action,
        "passes": passes,
        "headline_value": round(sum(headline_ts.values()), 3),
        "headline_count": len(headline_ts),
        "canary_start_sec": canary_samples[0]["sec"],
        "canary_end_sec": canary_samples[-1]["sec"],
        "canary_machine_index": machine_index,
        "canary_ref_sec": CANARY_REF,
        "store_build_sec": store_build,
        "cpus": os.cpu_count(),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # --- self-adjudication vs the committed previous-round record ---
    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
    )
    vs_prev = None
    if os.path.exists(base_path):
        try:
            prev = json.load(open(base_path))
        except Exception:
            prev = None
        # same-SF only: a dev run at sf0.01 against the sf0.1 baseline
        # would print confidently meaningless ratios
        if prev is not None and prev.get("sf") != payload["sf"]:
            prev = None
        prev_q = (prev or {}).get("queries") or {}
        prev_m = _machine_index(prev or {})
        common = [
            k for k in timings
            if k in prev_q and timings[k] > 0 and prev_q[k] > 0
        ]
        if prev is not None and common:
            raw = [timings[k] / prev_q[k] for k in common]
            vs_prev = {
                "baseline_value": prev.get("value"),
                "common_queries": len(common),
                "raw_geomean_ratio": round(_geomean(raw), 4),
            }
            if prev_m and machine_index:
                # per-query machine-normalized ratio: a uniform host
                # shift divides out; residuals are code-attributable
                factor = prev_m / machine_index
                normed = {
                    k: round(timings[k] / prev_q[k] * factor, 4)
                    for k in common
                }
                vs_prev["machine_index_prev"] = prev_m
                vs_prev["machine_index_now"] = machine_index
                vs_prev["normalized_geomean_ratio"] = round(
                    _geomean(list(normed.values())), 4
                )
                hl_common = [k for k in common if k in headline_ts]
                if hl_common:
                    vs_prev["headline_normalized_geomean_ratio"] = round(
                        _geomean([normed[k] for k in hl_common]), 4
                    )
                # top movers by |log ratio| on a >=0.3s base (below
                # that the r11 drift study measured ±1.3x pure noise)
                movers = sorted(
                    (k for k in common if prev_q[k] >= 0.3),
                    key=lambda k: abs(math.log(normed[k])),
                    reverse=True,
                )[:8]
                vs_prev["top_movers_normalized"] = {
                    k: normed[k] for k in movers
                }
    full_payload = dict(payload)
    full_payload["queries_normalized"] = norm
    full_payload["canary_samples"] = canary_samples
    if vs_prev is not None:
        full_payload["vs_prev"] = vs_prev
        payload["vs_prev"] = {
            k: vs_prev[k]
            for k in (
                "raw_geomean_ratio",
                "normalized_geomean_ratio",
                "headline_normalized_geomean_ratio",
                "common_queries",
            )
            if k in vs_prev
        }
    # The driver records only the LAST 2000 chars of stdout and
    # json-parses that tail: with ~156 per-query entries the full line
    # is ~2.5 KB and the recorded BENCH_r{N}.json ends up with
    # parsed=null (observed in r4/r5). Keep the full per-query dict on
    # disk for the judge, and print a line guaranteed to fit: if the
    # full line is too long, the printed "queries" keeps the headline
    # set plus the slowest remaining entries and points at the file
    # for the rest.
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json"
        ),
        "w",
    ) as fh:
        json.dump(full_payload, fh, indent=1)
        fh.write("\n")
    full = json.dumps(payload, separators=(",", ":"))
    budget = 1900
    if len(full) > budget:
        keep = dict.fromkeys(n_ for n_ in HEADLINE if n_ in timings)
        for n_, _ in sorted(timings.items(), key=lambda kv: -kv[1]):
            keep.setdefault(n_)
        payload["queries"] = {}
        payload["queries_omitted"] = 0
        payload["full_queries_file"] = "BENCH_QUERIES.json"
        base = len(json.dumps(payload, separators=(",", ":"))) + 8
        shown: dict[str, float] = {}
        for n_ in keep:
            entry = len(json.dumps({n_: timings[n_]}, separators=(",", ":")))
            if base + entry > budget:
                break
            shown[n_] = timings[n_]
            base += entry
        payload["queries"] = shown
        payload["queries_omitted"] = len(timings) - len(shown)
        full = json.dumps(payload, separators=(",", ":"))
    print(full)


if __name__ == "__main__":
    main()
