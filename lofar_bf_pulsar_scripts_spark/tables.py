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

# Columns the driver has generated as parquet TIMESTAMP(NANOS) in some
# rounds (round 1) and TIMESTAMP(MICROS) in others (round 2).
# ``load_table`` normalizes them to int64 epoch-nanoseconds whatever
# the on-disk type, so every consumer sees one contract:
#   * TIMESTAMP(MICROS): Spark reads TIMESTAMP_NTZ; wall-clock micros
#     since epoch via timestampdiff against an NTZ literal — pure field
#     arithmetic, independent of session/JVM timezone (the driver runs
#     a vanilla session whose TZ we don't control) — then * 1000.
#   * TIMESTAMP(NANOS): Spark reads them as int64
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


def _to_epoch_ns(df: DataFrame, col: str) -> DataFrame:
    """Normalize a timestamp-ish column to int64 epoch-nanoseconds.

    Handles every representation the driver's generator has produced:
    LongType (already ns via nanosAsLong), TIMESTAMP_NTZ (µs parquet,
    wall clock treated as UTC — timestampdiff on NTZ operands is
    timezone-independent), and TIMESTAMP_LTZ (instant semantics,
    unix_micros is timezone-independent by definition).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df
    if isinstance(dt, T.TimestampNTZType):
        expr = (
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', {col}) * 1000"
        )
    else:  # TimestampType (LTZ)
        expr = f"unix_micros({col}) * 1000"
    return df.withColumn(col, F.expr(expr))


def stream_events(spark: SparkSession, directory: str) -> DataFrame:
    """Structured-Streaming file source over a directory of events
    parquet, with ``ts`` normalized to a TIMESTAMP instant (UTC wall
    clock) whatever the on-disk representation — the streaming dual of
    ``load_table``'s ns normalization. The batch footer is peeked once
    to pick the matching explicit stream schema (readStream requires
    one)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        dt = spark.read.parquet(directory).schema["ts"].dataType
    except Exception as exc:  # empty dir / no parquet footers yet
        raise ValueError(
            f"stream_events needs at least one parquet file in "
            f"{directory!r} to infer the on-disk ts representation "
            f"(got: {exc})"
        ) from exc
    base = (
        "event_id long, ts {}, user_id long, event_type string, "
        "value double, props string"
    )
    if isinstance(dt, T.LongType):  # TIMESTAMP(NANOS) via nanosAsLong
        schema, conv = base.format("long"), "timestamp_micros(ts div 1000)"
    elif isinstance(dt, T.TimestampNTZType):  # TIMESTAMP(MICROS)
        schema = base.format("timestamp_ntz")
        conv = (
            "timestamp_micros(timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"
        )
    else:
        schema, conv = base.format("timestamp"), "ts"
    return (
        spark.readStream.schema(schema)
        .parquet(directory)
        .withColumn("ts", F.expr(conv))
    )


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in TS_NS_COLS.get(name, ()):
        df = _to_epoch_ns(df, c)
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every test table as a temp view for spark.sql pipelines."""
    for name in TABLE_NAMES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
