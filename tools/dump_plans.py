"""Dump ``explain('formatted')`` for registry queries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> [query ...]

Writes ``<outdir>/<query>_<suffix>.txt`` for each named query (all
registry queries when none are named). The optimization-round judge
reads these against OPTIMIZATION_r{N}.md's plan claims; the round
convention is ``plans/r14/<query>_before.txt`` / ``..._after.txt``.

Builds each DataFrame at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and captures the formatted explain; the
committed file is the static shape (AQE prints ``isFinalPlan=false``)
— Exchange count, join strategy, PushedFilters, codegen spans —
which is what the claims cite.

NOT strictly plan-only (r14 ADVICE): CONSTRUCTING a gate's DataFrame
runs whatever its builder runs — store-mutating gates
(forget_documents_stores, trained_ivf_pq_upsert) execute their
deletes/writes, and eager-materialization plans (localCheckpoint /
persist+count proxies) run real jobs.  The all-queries mode therefore
SKIPS the store-mutating gates unless they are named explicitly or
``--include-mutating`` is passed; name them directly when you need
their dumps (their stores are per-run/ephemeral or rebuilt by the
next prebuild, but a "plan dump" should not silently mutate state).
"""

from __future__ import annotations

import io
import os
import sys
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lofar_bf_pulsar_scripts_spark.session import get_spark
from __spark_entry__ import queries


# gates whose DataFrame CONSTRUCTION mutates an at-rest store
MUTATING = {"forget_documents_stores", "trained_ivf_pq_upsert"}


def main() -> None:
    args = sys.argv[1:]
    include_mutating = "--include-mutating" in args
    args = [a for a in args if a != "--include-mutating"]
    outdir = args[0]
    suffix = args[1]
    names = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    qs = queries()
    if not names:
        names = sorted(qs)
        if not include_mutating:
            for m in sorted(MUTATING & set(names)):
                print(f"SKIP store-mutating query in all-queries mode: {m} "
                      "(name it explicitly or pass --include-mutating)")
            names = [n for n in names if n not in MUTATING]
    from lofar_bf_pulsar_scripts_spark.registry import prebuild_stores

    prebuild_stores(spark, sf_dir)
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query: {name}")
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"OK   {path}")
        except Exception:
            with open(path, "w") as fh:
                fh.write("EXPLAIN FAILED\n" + traceback.format_exc())
            print(f"FAIL {name}")


if __name__ == "__main__":
    main()
