"""Round-11: latest-wins compaction (plans.lake.compact_keep_latest)
— the merge step an append-mode parquet store lacks."""

from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.plans.lake import (
    compact_keep_latest,
    locate_shards_bloom,
    write_shard_bloom_index,
)


def _store(spark, tmp_path, extra_rows=()):
    rows = [
        # (doc_id, version, payload, shard)
        (1, 1, "v1-old", 0),
        (1, 3, "v1-new", 0),      # same-partition duplicate
        (2, 1, "v2-only", 0),
        (3, 1, "v3-old", 1),
        (3, 2, "v3-new", 2),      # CROSS-partition duplicate
        (None, 1, "null-a", 1),
        (None, 1, "null-b", 1),   # NULL ids must BOTH survive
        (4, 1, "v4-only", 3),
    ] + list(extra_rows)
    df = spark.createDataFrame(
        rows, "doc_id bigint, version int, payload string, shard int"
    )
    path = str(tmp_path / "store")
    df.write.partitionBy("shard").parquet(path)
    return path


def test_compact_keeps_latest_and_preserves_nulls(spark, tmp_path):
    path = _store(spark, tmp_path)
    out = compact_keep_latest(
        spark, path, id_col="doc_id", order_col="version"
    )
    # shards 0 (dup id 1), 1 and 2 (cross-partition dup id 3) touched;
    # shard 3 untouched
    assert set(out["partitions_rewritten"]) == {0, 1, 2}
    assert out["rows_removed"] == 2
    left = {
        (r.doc_id, r.version, r.payload)
        for r in spark.read.parquet(path).collect()
    }
    assert (1, 3, "v1-new") in left and (1, 1, "v1-old") not in left
    assert (3, 2, "v3-new") in left and (3, 1, "v3-old") not in left
    assert (2, 1, "v2-only") in left and (4, 1, "v4-only") in left
    assert (None, 1, "null-a") in left and (None, 1, "null-b") in left
    # idempotent: a second run finds nothing
    again = compact_keep_latest(
        spark, path, id_col="doc_id", order_col="version"
    )
    assert again == {"rows_removed": 0, "partitions_rewritten": []}


def test_compact_empties_partition_and_refreshes_sidecar(spark, tmp_path):
    # shard 4 holds ONLY a stale copy of id 3 -> compaction empties it
    path = _store(spark, tmp_path, extra_rows=[(3, 0, "v3-oldest", 4)])
    write_shard_bloom_index(spark, path)
    out = compact_keep_latest(
        spark, path, id_col="doc_id", order_col="version"
    )
    assert 4 in out["partitions_rewritten"]
    shards_left = {
        r.shard for r in spark.read.parquet(path).select("shard").collect()
    }
    assert 4 not in shards_left
    # sidecar refreshed through the rewrite: locate stays pruned and
    # still finds every surviving id
    for probe in (1, 2, 3, 4):
        cand = locate_shards_bloom(spark, path, [probe])
        assert cand is not None, probe
        exact = {
            r.shard
            for r in spark.read.parquet(path)
            .filter(F.col("doc_id") == probe)
            .select("shard")
            .distinct()
            .collect()
        }
        assert exact <= set(cand), (probe, exact, cand)


def test_compact_tie_breaks_deterministically(spark, tmp_path):
    rows = [(7, 1, "b-pay", 0), (7, 1, "a-pay", 0)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, version int, payload string, shard int"
    )
    path = str(tmp_path / "ties")
    df.write.partitionBy("shard").parquet(path)
    compact_keep_latest(spark, path, id_col="doc_id", order_col="version")
    left = [
        (r.doc_id, r.version, r.payload)
        for r in spark.read.parquet(path).collect()
    ]
    # greatest full-row struct wins: "b-pay" > "a-pay"
    assert left == [(7, 1, "b-pay")]
