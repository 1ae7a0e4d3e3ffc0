"""Round-11: hybrid RRF dense side through the stored sign-LSH ANN
path (round-10 VERDICT item 5) — the per-query brute-force corpus scan
is gone; pin the fusion contract and the measured recall envelope."""

from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.similarity import (
    ann_recall,
    brute_force_topk,
    lsh_ann_topk,
)
from lofar_bf_pulsar_scripts_spark.registry import queries
from lofar_bf_pulsar_scripts_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_hybrid_gate_shape_and_no_corpus_scan(spark):
    out = queries()["hybrid_rrf_search"](spark, SF)
    rows = out.collect()
    assert len(rows) == 10
    assert {c for c in out.columns} == {"doc_id", "rrf_x1e6", "n_lists"}
    # fused scores are descending and every doc appears once
    scores = [r.rrf_x1e6 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert len({r.doc_id for r in rows}) == 10


def test_dense_recall_envelope(spark):
    """Measured recall@20 of the sign-LSH dense ranker vs the exact
    cosine top-20.  The synthetic corpus is ISOTROPIC (random
    embeddings — no neighborhood structure for any ANN to exploit),
    so the envelope is honest-but-low: mean ~0.10 at sf0.001, ~0.21
    at sf0.01 (recorded in SCALE.md).  The floor pinned here is the
    never-zero contract: the candidate generator must always surface
    SOME true neighbors for every query, else fusion silently
    degrades to lexical-only."""
    e = load_table(spark, "embeddings", SF)
    qv = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    approx = lsh_ann_topk(e, qv, k=20, n_tables=4, n_bits=6, dims=64)
    exact = brute_force_topk(e, qv, k=20)
    rec = {r.qid: r.recall for r in ann_recall(approx, exact, k=20).collect()}
    assert len(rec) == 5
    assert all(v >= 0.05 for v in rec.values()), rec


def test_multiprobe_recall_improves_and_parity(spark, tmp_path):
    """Multi-probe recall@20 strictly improves on exact-bucket probing
    (measured 0.21 -> 0.63 mean at sf0.01), the stored path returns
    identical rows at the same h (parity), and h out of range raises."""
    import pytest as _pytest

    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        ensure_lsh_signatures,
        lsh_ann_topk_stored,
    )

    e = load_table(spark, "embeddings", SF)
    qv = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = brute_force_topk(e, qv, k=20)

    def mean_recall(h):
        approx = lsh_ann_topk(
            e, qv, k=20, n_tables=4, n_bits=6, dims=64, hamming_probes=h
        )
        rec = ann_recall(approx, exact, k=20).collect()
        return sum(r.recall for r in rec) / len(rec)

    r0, r6 = mean_recall(0), mean_recall(6)
    assert r6 > r0, (r0, r6)

    store = str(tmp_path / "lsh_store")
    ensure_lsh_signatures(e, store, n_tables=4, n_bits=6, dims=64)
    a = {
        (r.qid, r.vec_id)
        for r in lsh_ann_topk(
            e, qv, k=5, n_tables=4, n_bits=6, dims=64, hamming_probes=6
        ).collect()
    }
    b = {
        (r.qid, r.vec_id)
        for r in lsh_ann_topk_stored(
            e, qv, store, k=5, n_tables=4, n_bits=6, dims=64,
            hamming_probes=6,
        ).collect()
    }
    assert a == b

    with _pytest.raises(ValueError, match="out of range"):
        lsh_ann_topk(e, qv, k=5, hamming_probes=7)
