"""Local replica of the driver's t2 correctness gate — Arrow layer.

Runs every registry query on Spark at the given SF dir AND its DuckDB
oracle over the same parquet files, then compares row count, column
names, **Arrow type classes**, and an order-insensitive value
comparison. Exit code 0 iff all queries match.

Both sides are fetched at the Arrow layer (``DataFrame.toArrow()`` /
``duckdb.fetch_arrow_table()``) because that is where the driver's
value hash lives: ``fetchall()``/``collect()`` coerce DuckDB HUGEINT
(Arrow decimal128(38,0)) and Spark int64 to the same Python ``int``,
hiding exactly the divergence that turned the r7
``single_pulse_cands`` gate red (VERDICT r7 items 1-2). A window
``sum()`` or struct-extracted aggregate left uncast in an oracle now
fails HERE first, as a ``TYPE`` line.

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

import datetime as _dt
import math
import os
import sys
import time
from decimal import Decimal

import duckdb
import pyarrow as pa

sys.path.insert(0, ".")

from lofar_bf_pulsar_scripts_spark.session import get_spark
from lofar_bf_pulsar_scripts_spark.tables import TABLE_NAMES
from __spark_entry__ import oracle_sql, queries


def type_class(t: pa.DataType) -> str:
    """Collapse an Arrow type to the class the driver's hash treats as
    distinct. int64 vs int32 both hash as ints after to_pylist, but
    decimal128 surfaces as Decimal — so decimal is its own class."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal<{t}>"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return f"list<{type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{type_class(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return "map"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def cell(v):
    """Type-class-tagged canonical cell. Decimal stays distinct from
    int/float so HUGEINT leakage fails the value compare too (not just
    the TYPE line)."""
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
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return f"ts:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"date:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "d:{" + ",".join(f"{k}={cell(v[k])}" for k in sorted(v)) + "}"
    return f"{type(v).__name__}:{v}"


def canon(tbl: pa.Table):
    """Order-insensitive canonical form from an Arrow table: sort
    columns by name, then rows."""
    cols = sorted(tbl.column_names)
    pylists = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    return sorted(
        tuple(cell(pylists[c][i]) for c in cols) for i in range(n)
    )


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
            stbl = sdf.toArrow()
        except Exception as exc:  # keep scanning; report the crash
            print(f"  {name:28s} FAIL Spark raised: {str(exc).splitlines()[0][:160]}")
            failures.append(name)
            continue
        scols = list(stbl.column_names)
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={stbl.num_rows:6d}  (no oracle, rows-only) {t_spark:.1f}s")
            continue
        t0 = time.time()
        try:
            res = con.execute(oracles[name])
            dtbl = res.fetch_arrow_table()
        except Exception as exc:
            print(f"  {name:28s} FAIL DuckDB raised: {str(exc).splitlines()[0][:160]}")
            failures.append(name)
            continue
        dcols = list(dtbl.column_names)
        t_duck = time.time() - t0
        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"SCHEMA spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            stypes = {c: type_class(stbl.schema.field(c).type) for c in scols}
            dtypes = {c: type_class(dtbl.schema.field(c).type) for c in dcols}
            bad = {
                c: (stypes[c], dtypes[c])
                for c in stypes
                if stypes[c] != dtypes[c]
            }
            if bad:
                status.append(f"TYPE {bad}")
        if stbl.num_rows != dtbl.num_rows:
            status.append(f"ROWS spark={stbl.num_rows} duck={dtbl.num_rows}")
        if not status:
            cs, cd = canon(stbl), canon(dtbl)
            if cs != cd:
                diff = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b][:3]
                ex = [(cs[i], cd[i]) for i in diff]
                status.append(f"VALUES {len([1 for a,b in zip(cs,cd) if a!=b])} differ, e.g. {ex}")
        tag = "OK " if not status else "FAIL"
        print(f"  {name:28s} {tag} rows={stbl.num_rows:6d} spark={t_spark:.1f}s duck={t_duck:.2f}s {' | '.join(status)}", flush=True)
        if status:
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
