"""Round-11: right-to-be-forgotten with near-duplicate closure
(plans.lake.delete_with_closure / expand_ids_with_duplicates — the
expansion half is oracle-gated as delete_closure_ids; these pin the
side-effecting shard rewrite and the API contracts)."""

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.plans.lake import (
    delete_with_closure,
    expand_ids_with_duplicates,
    write_training_shards,
)


def _edges(spark):
    # two clusters {1,2,3} (chain) and {10,11}; 99 is isolated
    return spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )


def test_expand_ids_with_duplicates(spark):
    got = {
        r.doc_id
        for r in expand_ids_with_duplicates(
            _edges(spark), [1, 99]
        ).collect()
    }
    # 1 expands to its whole component, 99 has no edges but stays
    assert got == {1, 2, 3, 99}


def test_expand_rejects_null_seed(spark):
    with pytest.raises(ValueError, match="NULL"):
        expand_ids_with_duplicates(_edges(spark), [1, None])


def _doc_store(spark, tmp_path):
    # near-identical texts for {1,2,3}: the ad-hoc (edges=None) path
    # must find them via verified n-gram Jaccard
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " today"),
        (3, base),
        (10, "completely different content about spark shuffles"),
        (11, "unrelated text concerning parquet row group geometry"),
        (20, "another standalone document with its own words entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, docs_per_shard=2)
    return path


def test_delete_with_closure_precomputed_edges(spark, tmp_path):
    path = _doc_store(spark, tmp_path)
    report = delete_with_closure(
        spark, path, [1], edges=_edges(spark)
    )
    assert report["requested"] == 1
    assert report["closure"] == 3
    assert report["deleted"] == 3
    left = {r.doc_id for r in spark.read.parquet(path).collect()}
    assert left == {10, 11, 20}


def test_delete_with_closure_ad_hoc_edges(spark, tmp_path):
    """edges=None computes verified near-dup edges from the store's
    own text: deleting doc 1 must also remove its near-copies 2,3."""
    path = _doc_store(spark, tmp_path)
    report = delete_with_closure(
        spark, path, [1], shingle_k=3, tau_num=5, tau_den=10
    )
    assert report["requested"] == 1
    assert report["closure"] >= 2  # 1 plus at least one verified copy
    left = {r.doc_id for r in spark.read.parquet(path).collect()}
    assert 1 not in left and 3 not in left
    assert {10, 11, 20} <= left


def test_delete_with_closure_contracts(spark, tmp_path):
    path = _doc_store(spark, tmp_path)
    assert delete_with_closure(spark, path, [], edges=_edges(spark)) == {
        "deleted": 0,
        "shards_rewritten": [],
        "requested": 0,
        "closure": 0,
    }
    with pytest.raises(ValueError, match="NULL"):
        delete_with_closure(spark, path, [1, None], edges=_edges(spark))
    with pytest.raises(TypeError, match="only apply when edges=None"):
        delete_with_closure(
            spark, path, [1], edges=_edges(spark), shingle_k=3
        )


def test_forget_documents_both_stores(spark, tmp_path):
    """The complete right-to-be-forgotten plan: one closure expansion,
    both stores rewritten — no text copy survives under another id,
    and no embedding of a forgotten doc keeps answering ANN probes."""
    from lofar_bf_pulsar_scripts_spark.operators.similarity import (
        ivf_assign,
    )
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        forget_documents,
        write_embeddings_by_centroid,
    )

    doc_path = _doc_store(spark, tmp_path)
    # vector store sharing the id space (vec_id == doc_id)
    ids = [1, 2, 3, 10, 11, 20]
    vecs = spark.createDataFrame(
        [
            (i, [float((i % 3) == d) + 0.01 * d for d in range(4)])
            for i in ids
        ],
        "vec_id bigint, embedding array<float>",
    )
    cent = spark.createDataFrame(
        [(c, [float(c == d) for d in range(4)]) for c in range(3)],
        "cid int, embedding array<float>",
    )
    vec_path = str(tmp_path / "vecs")
    write_embeddings_by_centroid(ivf_assign(vecs, cent), vec_path)

    report = forget_documents(
        spark, doc_path, [1], vec_store=vec_path, edges=_edges(spark)
    )
    assert report["requested"] == 1 and report["closure"] == 3
    assert report["docs"]["deleted"] == 3
    assert report["vectors"]["deleted"] == 3
    left_docs = {r.doc_id for r in spark.read.parquet(doc_path).collect()}
    left_vecs = {r.vec_id for r in spark.read.parquet(vec_path).collect()}
    assert left_docs == {10, 11, 20}
    assert left_vecs == {10, 11, 20}
