"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``lofar_bf_pulsar_scripts_spark`` (operators
cited to SURVEY.md §2); this module is the thin driver-facing facade.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lofar_bf_pulsar_scripts_spark import registry
from lofar_bf_pulsar_scripts_spark.operators.fold import fold
from lofar_bf_pulsar_scripts_spark.operators.profile import profile_stats


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: fold the event stream
    into a phase profile (A4, pulsestack.py:505-650) and attach the
    profile-statistics suite (A7, snr.py:305-314) — the minimum
    end-to-end slice of SURVEY.md §7.1."""
    sf_dir = "/root/testdata/sf0.001"
    from lofar_bf_pulsar_scripts_spark.tables import load_table, ts_seconds

    ev = load_table(spark, "events", sf_dir).withColumn("t", ts_seconds("ts"))
    prof = fold(ev, period=registry.FOLD_PERIOD, nbins=registry.FOLD_NBINS)
    stats = profile_stats(prof, value_col="profile").select(
        F.col("peak").alias("prof_peak"),
        F.col("mean").alias("prof_mean"),
        F.col("weq").alias("prof_weq"),
        F.col("chi2").alias("prof_chi2"),
    )
    return prof.crossJoin(F.broadcast(stats)).orderBy("bin")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
