"""Local replica of the driver's t2 correctness gate.

Runs every registry query on Spark at the given SF dir AND its DuckDB
oracle over the same parquet files, then compares row count, column
names, and an order-insensitive value comparison. Exit code 0 iff all
queries match.

Usage: python tools/check_oracle.py [sf_dir] [query ...]

Set ``SPARK_GRAFT_VANILLA=1`` to run the Spark side on
``SparkSession.builder.master('local[32]').getOrCreate()`` with no
repo configs — driver-shaped, so config-dependent divergence (session
timezone, AQE, Arrow, shuffle partitions) shows up here before it
shows up in CORRECTNESS_r{N}.json. Note getOrCreate() reuses any
pre-existing session in the process: vanilla mode is only truly
driver-shaped when this is the first session created (which holds for
the normal `python tools/check_oracle.py` CLI entry).
"""

from __future__ import annotations

import math
import os
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

from lofar_bf_pulsar_scripts_spark.session import get_spark
from lofar_bf_pulsar_scripts_spark.tables import TABLE_NAMES
from __spark_entry__ import oracle_sql, queries


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, then rows.

    Each cell carries a type-class tag so typed divergence the driver's
    Arrow-level hash sees (e.g. DuckDB HUGEINT -> Decimal('3') vs Spark
    int64 3, which ``str()`` collapses) fails here too.  bool is checked
    before int (bool is an int subclass).
    """
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "\0null"
        if isinstance(v, bool):
            return f"b:{v}"
        if isinstance(v, int):
            return f"i:{v}"
        if isinstance(v, float):
            if math.isnan(v):
                return "f:nan"
            return f"f:{v!r}"  # full precision — strictest possible compare
        if isinstance(v, Decimal):
            return f"dec:{v}"
        return f"{type(v).__name__}:{v}"

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        from pyspark.sql import SparkSession

        print("[vanilla session: driver-shaped, no repo configs]")
        spark = SparkSession.builder.master("local[32]").getOrCreate()
    else:
        spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
        except Exception as exc:  # keep scanning; report the crash
            print(f"  {name:28s} FAIL Spark raised: {str(exc).splitlines()[0][:160]}")
            failures.append(name)
            continue
        scols = sdf.columns
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(srows):6d}  (no oracle, rows-only) {t_spark:.1f}s")
            continue
        t0 = time.time()
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"  {name:28s} FAIL DuckDB raised: {str(exc).splitlines()[0][:160]}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"SCHEMA spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            status.append(f"ROWS spark={len(srows)} duck={len(drows)}")
        if not status:
            cs, cd = canon(srows, scols), canon(drows, dcols)
            if cs != cd:
                diff = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b][:3]
                ex = [(cs[i], cd[i]) for i in diff]
                status.append(f"VALUES {len([1 for a,b in zip(cs,cd) if a!=b])} differ, e.g. {ex}")
        tag = "OK " if not status else "FAIL"
        print(f"  {name:28s} {tag} rows={len(srows):6d} spark={t_spark:.1f}s duck={t_duck:.2f}s {' | '.join(status)}")
        if status:
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
