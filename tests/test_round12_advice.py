"""Round-12: pins for the four round-11 ADVICE fixes —
compact_keep_latest's NULL-partition guard, the Bloom sidecar's
id-column stamp, and merge_components_incremental's batch-bounded
new-node derivation."""

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
    connected_components,
    merge_components_incremental,
)
from lofar_bf_pulsar_scripts_spark.plans.lake import (
    _sidecar_m_bits_if_fresh,
    compact_keep_latest,
    locate_shards_bloom,
    upsert_embeddings_by_centroid,
    write_shard_bloom_index,
)


def test_compact_refuses_null_partition_duplicate(spark, tmp_path):
    """A duplicated id with a copy in a NULL-partition row must raise
    BEFORE any rewrite: isin(touched) would silently exclude the NULL
    row, leaving a stale duplicate the report claims was compacted."""
    df = spark.createDataFrame(
        [(1, 1, "old", 0), (1, 2, "new", None), (2, 1, "only", 0)],
        "doc_id bigint, version int, payload string, shard int",
    )
    path = str(tmp_path / "store")
    df.write.partitionBy("shard").parquet(path)
    before = sorted(
        (r.doc_id, r.version)
        for r in spark.read.parquet(path).select("doc_id", "version").collect()
    )
    with pytest.raises(ValueError, match="NULL-partition"):
        compact_keep_latest(
            spark, path, id_col="doc_id", order_col="version"
        )
    # nothing was rewritten — the guard fired before the overwrite
    after = sorted(
        (r.doc_id, r.version)
        for r in spark.read.parquet(path).select("doc_id", "version").collect()
    )
    assert after == before


def test_compact_ignores_null_partition_without_duplicates(spark, tmp_path):
    """NULL-partition rows that hold NO duplicated id are harmless —
    the guard must not block compaction of healthy duplicates
    elsewhere."""
    df = spark.createDataFrame(
        [(1, 1, "old", 0), (1, 2, "new", 0), (9, 1, "nullrow", None)],
        "doc_id bigint, version int, payload string, shard int",
    )
    path = str(tmp_path / "store")
    df.write.partitionBy("shard").parquet(path)
    out = compact_keep_latest(
        spark, path, id_col="doc_id", order_col="version"
    )
    assert out["rows_removed"] == 1
    assert out["partitions_rewritten"] == [0]


def test_sidecar_stamps_id_col_and_rejects_mismatch(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"alt{i}", i % 3) for i in range(30)],
        "doc_id bigint, alt_id string, shard int",
    )
    path = str(tmp_path / "store")
    df.write.partitionBy("shard").parquet(path)
    idx_path = write_shard_bloom_index(spark, path, id_col="doc_id")
    assert "id_col" in spark.read.parquet(idx_path).columns
    # matching column: fresh
    assert _sidecar_m_bits_if_fresh(spark, path, id_col="doc_id") is not None
    assert locate_shards_bloom(spark, path, [5], id_col="doc_id") is not None
    # MISMATCHED column: reads stale (fall back to exact scan), never
    # a confidently-wrong candidate set
    assert _sidecar_m_bits_if_fresh(spark, path, id_col="alt_id") is None
    assert locate_shards_bloom(spark, path, ["alt5"], id_col="alt_id") is None


def test_upsert_skips_merge_on_id_col_mismatch(spark, tmp_path):
    """An upsert hashing a different id column than the sidecar's
    build must NOT OR-merge + restamp (that launders the mismatch into
    false negatives); the sidecar goes honestly stale instead."""
    vecs = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(12)],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [10.0, 0.0])], "cid int, embedding array<double>"
    )
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        write_embeddings_by_centroid,
    )
    from lofar_bf_pulsar_scripts_spark.operators.similarity import ivf_assign

    path = str(tmp_path / "vecs")
    write_embeddings_by_centroid(
        ivf_assign(vecs, cents, id_col="vec_id", vec_col="embedding",
                   centroid_id_col="cid"),
        path,
    )
    # build the sidecar over a DIFFERENT column name than the upsert's
    write_shard_bloom_index(
        spark, path, id_col="cid", partition_col="cid"
    )
    batch = spark.createDataFrame(
        [(100, [9.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    upsert_embeddings_by_centroid(batch, path, cents)
    # the sidecar was NOT restamped fresh: its fingerprint predates
    # the append, so every consumer sees it stale
    assert _sidecar_m_bits_if_fresh(spark, path, id_col="cid") is None
    assert _sidecar_m_bits_if_fresh(spark, path, id_col="vec_id") is None


def test_merge_components_new_nodes_without_store_anti_join(spark):
    """Merge with brand-new nodes (no stored label) must still append
    them labeled — and agree with a full recompute."""
    stored = connected_components(
        spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long"),
        src_col="id_a", dst_col="id_b",
    )
    batch = spark.createDataFrame(
        # bridges two stored comps, brings new nodes 10,11 (chained)
        # and an all-new isolated pair (20, 21)
        [(2, 3), (4, 10), (10, 11), (20, 21)],
        "id_a long, id_b long",
    )
    merged = merge_components_incremental(stored, batch)
    full = connected_components(
        spark.createDataFrame(
            [(1, 2), (3, 4), (2, 3), (4, 10), (10, 11), (20, 21)],
            "id_a long, id_b long",
        ),
        src_col="id_a", dst_col="id_b",
    )
    got = sorted((r.node, r.component) for r in merged.collect())
    want = sorted((r.node, r.component) for r in full.collect())
    assert got == want
    # and the merged plan never anti-joins against the stored node
    # column (the round-11 corpus-scale shuffle): no LeftAnti in it
    plan = merged._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" not in plan, plan[:1200]
