"""Round-11: the Bloom sidecar + targeted deletion generalized to any
partition column — right-to-be-forgotten on the cid-partitioned
VECTOR store (forgetting a document is incomplete while its embedding
still answers ANN probes), and upsert-side sidecar maintenance (an
append through upsert_embeddings_by_centroid keeps the pruned locate
path instead of silently invalidating it)."""

from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.similarity import ivf_assign
from lofar_bf_pulsar_scripts_spark.plans.lake import (
    delete_from_shards,
    locate_shards_bloom,
    upsert_embeddings_by_centroid,
    write_embeddings_by_centroid,
    write_shard_bloom_index,
)


def _vecs(spark, ids):
    # deterministic unit-ish vectors; cid structure comes from dim 0/1
    rows = [
        (int(i), [float((i % 4 == c) * 1.0 + 0.01 * c) for c in range(4)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _centroids(spark):
    rows = [(c, [float(c == d) for d in range(4)]) for c in range(4)]
    return spark.createDataFrame(rows, "cid int, embedding array<float>")


def _store(spark, tmp_path):
    path = str(tmp_path / "vecstore")
    cent = _centroids(spark)
    assigned = ivf_assign(_vecs(spark, range(40)), cent)
    write_embeddings_by_centroid(assigned, path)
    write_shard_bloom_index(
        spark, path, id_col="vec_id", partition_col="cid"
    )
    return path, cent


def test_cid_store_locate_and_delete(spark, tmp_path):
    path, _ = _store(spark, tmp_path)
    store = spark.read.parquet(path)
    exact = {
        r.cid
        for r in store.filter(F.col("vec_id").isin([5, 17]))
        .select("cid")
        .distinct()
        .collect()
    }
    cand = locate_shards_bloom(spark, path, [5, 17], id_col="vec_id")
    assert cand is not None and exact <= set(cand)
    out = delete_from_shards(
        spark, path, [5, 17], id_col="vec_id", partition_col="cid"
    )
    assert out["deleted"] == 2 and set(out["shards_rewritten"]) == exact
    after = spark.read.parquet(path)
    assert after.filter(F.col("vec_id").isin([5, 17])).count() == 0
    assert after.count() == 38
    # delete→delete keeps the pruned path on the cid store too
    cand2 = locate_shards_bloom(spark, path, [6], id_col="vec_id")
    assert cand2 is not None


def test_upsert_maintains_sidecar(spark, tmp_path):
    path, cent = _store(spark, tmp_path)
    upsert_embeddings_by_centroid(
        _vecs(spark, range(100, 110)), path, cent
    )
    # the sidecar stayed fresh through the append: locate is pruned
    # (not None) and finds BOTH an old id and a new id — merged bits
    # can never produce a false negative
    store = spark.read.parquet(path)
    assert store.count() == 50
    for probe in (3, 105):
        exact = {
            r.cid
            for r in store.filter(F.col("vec_id") == probe)
            .select("cid")
            .distinct()
            .collect()
        }
        cand = locate_shards_bloom(spark, path, [probe], id_col="vec_id")
        assert cand is not None and exact <= set(cand), (probe, cand)
    # and a vector delete still works end-to-end after the upsert
    out = delete_from_shards(
        spark, path, [105], id_col="vec_id", partition_col="cid"
    )
    assert out["deleted"] == 1


def test_upsert_leaves_stale_sidecar_stale(spark, tmp_path):
    """Merging onto a stale sidecar then stamping the new fingerprint
    would LAUNDER staleness into false negatives — the upsert must
    leave it stale instead."""
    path, cent = _store(spark, tmp_path)
    # out-of-band append makes the sidecar stale
    ivf_assign(_vecs(spark, [900]), cent).write.mode("append").partitionBy(
        "cid"
    ).parquet(path)
    assert locate_shards_bloom(spark, path, [900], id_col="vec_id") is None
    upsert_embeddings_by_centroid(_vecs(spark, [901]), path, cent)
    # still stale: 900 was never merged, so a fresh stamp would lie
    assert locate_shards_bloom(spark, path, [900], id_col="vec_id") is None
