"""AQE skew-join: the session enables
spark.sql.adaptive.skewJoin.enabled, and SCALING-RULES leans on AQE
as the runtime answer to residual skew (salting is the manual form,
`salted_event_type_volume` its oracle).  Nothing pinned that the
optimizer actually FIRES — this does, with thresholds lowered to
test scale, by reading the final adaptive plan."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # keep the join sort-merge: broadcast would bypass skew handling
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # one hot key holding ~all left rows; right side big enough that
    # Spark won't broadcast (also pinned off via the confs above)
    left = spark.range(200_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("v"),
        F.concat(F.lit("pad_"), F.col("id")).alias("pad"),
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    # keep pad/v alive through the aggregate: with only the (highly
    # compressible) repeated key surviving column pruning, the hot
    # partition compressed below the skew threshold and AQE coalesced
    # instead of splitting
    joined = left.join(right, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.length("pad")).alias("sp"),
        F.sum("v").alias("sv"),
    )
    row = joined.collect()[0]
    # every left key is < 1000, so each left row matches exactly one
    # right row
    assert row.n == 200_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
