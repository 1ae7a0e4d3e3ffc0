"""Canonical loaders for the driver-generated parquet test tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings. Read-only parquet, one file per
table, under ``/root/testdata/sf{0.001,0.01,0.1}``.

At 100 TB these would be partitioned lakehouse tables; the loader keeps
the access path behind one function so the layout can change without
touching operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as int64
# nanoseconds (legacy.parquet.nanosAsLong); DuckDB reads the same files
# as microsecond TIMESTAMP (nanos truncated). ``ts_seconds`` therefore
# truncates ns -> µs before dividing, making Spark's epoch-seconds
# double bit-identical to DuckDB's epoch().
TS_NS_COLS = {
    "events": ("ts",),
    # orders.o_orderdate / lineitem.l_shipdate are TIMESTAMP(MICROS)
    # -> read natively as TIMESTAMP_NTZ; compare with timestamp_ntz
    # literals (session TZ pinned UTC).
}


def ts_seconds(col_name: str):
    """Epoch seconds (double) from an int64-nanosecond column, matching
    DuckDB's epoch() on the same parquet exactly: integer-truncate
    ns -> µs (`div`, not lossy double division), then one double
    division by 1e6."""
    from pyspark.sql import functions as F

    return F.expr(f"CAST(({col_name} div 1000) AS DOUBLE) / 1000000.0")


def ns_literal(iso_utc: str) -> int:
    """int64 ns epoch for an ISO 'YYYY-MM-DD HH:MM:SS' UTC instant."""
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(iso_utc).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every test table as a temp view for spark.sql pipelines."""
    for name in TABLE_NAMES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
