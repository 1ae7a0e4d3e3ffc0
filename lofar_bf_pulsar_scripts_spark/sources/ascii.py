"""ASCII readers (SURVEY §2.1 S7/S10/S12 + K5-adjacent formats).

* S7 event/table scans: whitespace-separated columns with '#'
  comments, fixed column positions (np.loadtxt-with-usecols semantics:
  /root/reference/pulsestack.py:376-378; sp2tim.py:122-125;
  LTA/lta-retrieve.py:377-404).
* S10 hardware-state log: 'LOFAR.PIC...|value|timestamp' lines into
  (station, band, element, ts, state)
  (/root/reference/tiles/lofar_antenna_state/getState.py:78-91).
* S12 pipeline-log regex extraction: file=/obs=/S/N= fields
  (/root/reference/lofar_status_map.py:124-139).

All are spark.read.text + column expressions — the usecols projection
IS Catalyst column pruning; no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_whitespace_table(
    spark: SparkSession,
    path: str,
    columns: list[tuple[str, str]],
    usecols: list[int] | None = None,
    comment: str = "#",
) -> DataFrame:
    """S7: whitespace-delimited table with comment lines.

    ``columns``: (name, spark-type) for the SELECTED columns, in the
    order given by ``usecols`` (defaults to 0..len-1)."""
    usecols = usecols if usecols is not None else list(range(len(columns)))
    lines = spark.read.text(path)
    body = lines.filter(
        (F.length(F.trim(F.col("value"))) > 0)
        & ~F.trim(F.col("value")).startswith(comment)
    )
    fields = F.split(F.trim(F.col("value")), r"\s+")
    return body.select(
        *[
            F.element_at(fields, idx + 1).cast(typ).alias(name)
            for (name, typ), idx in zip(columns, usecols)
        ]
    )


def read_events_ascii(spark: SparkSession, path: str) -> DataFrame:
    """D4 event list: times (s) + optional energy
    (pulsestack.py:376-378)."""
    return read_whitespace_table(
        spark, path, [("t", "double"), ("energy", "double")]
    )


def read_singlepulse(spark: SparkSession, path: str) -> DataFrame:
    """PRESTO .singlepulse rows (DM, sigma, time_s, offset, downfact)
    (sp2tim.py:122-125)."""
    return read_whitespace_table(
        spark,
        path,
        [
            ("dm", "double"),
            ("sigma", "double"),
            ("t", "double"),
            ("offset", "bigint"),
            ("downfact", "int"),
        ],
    )


def read_hw_state_log(spark: SparkSession, path: str) -> DataFrame:
    """S10: '|'-separated state log -> D6 rows. Key path grammar:
    LOFAR.PIC.<region>.<station>.<band>.<element>...|state|epoch."""
    lines = spark.read.text(path).filter(F.col("value").contains("|"))
    parts = F.split(F.col("value"), r"\|")
    key = F.split(F.element_at(parts, 1), r"\.")
    return lines.select(
        F.element_at(key, 4).alias("station"),
        F.element_at(key, 5).alias("band"),
        F.element_at(key, 6).alias("element"),
        F.element_at(parts, 2).cast("int").alias("state"),
        F.to_timestamp(F.from_unixtime(F.element_at(parts, 3).cast("double"))).alias("ts"),
    )


def read_pipeline_log(spark: SparkSession, path: str) -> DataFrame:
    """S12: regex field extraction from chi-squared.txt-style logs
    (lofar_status_map.py:124-139)."""
    lines = spark.read.text(path)
    return lines.select(
        F.regexp_extract("value", r"file=(\S+)", 1).alias("file"),
        F.regexp_extract("value", r"obs=(\S+)", 1).alias("obs"),
        F.regexp_extract("value", r"S/N=([0-9.]+)", 1)
        .cast("double")
        .alias("snr"),
    ).filter(F.col("file") != "")
