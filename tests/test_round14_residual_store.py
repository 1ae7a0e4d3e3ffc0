"""Round-14: residual=True coverage for the trained IVF-PQ store
(r13 ADVICE low finding): the residual branch of
build_trained_ivf_pq_store and the matching per-cell query-LUT path
in trained_ivf_pq_rerank_topk had no test — a regression in the
residual geometry (the most error-prone part of the staged probe)
would have shipped silently.

The fixture is deliberately UN-normalized: clusters at different
distances from the origin with different radii — the regime residual
coding is for (the per-cell offset carries most of the energy, so
the codebook's cells go to the small residual).  On unit-normalized
corpora residual coding measurably LOSES (SCALE.md wave 17) and is
off by default; this test covers the geometry, not the default."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.similarity import (
    ann_recall,
    brute_force_topk,
)
from lofar_bf_pulsar_scripts_spark.plans.lake import (
    build_trained_ivf_pq_store,
    read_trained_ivf_pq_model,
    trained_ivf_pq_rerank_topk,
)

N, DIMS, K_CLUSTERS, K = 1500, 32, 8, 10


@pytest.fixture(scope="module")
def residual_store(spark, tmp_path_factory):
    # un-normalized planted mixture: cluster centers at radii 2..16
    # with per-cluster sigma proportional to the radius — residual
    # coding's home turf (global energy in the offset, detail in the
    # residual)
    rng = np.random.default_rng(77)
    centers = rng.standard_normal((K_CLUSTERS, DIMS))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    radii = np.linspace(2.0, 16.0, K_CLUSTERS)[:, None]
    centers *= radii
    g = np.arange(N) % K_CLUSTERS
    x = centers[g] + 0.15 * radii[g] * rng.standard_normal((N, DIMS))
    e = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(N)],
        "vec_id bigint, embedding array<float>",
    ).cache()
    e.count()
    path = str(tmp_path_factory.mktemp("tivfres") / "trained_ivf_pq_res")
    build_trained_ivf_pq_store(
        e, path, dims=DIMS, n_centroids=K_CLUSTERS, m_sub=8,
        k_codes=16, max_iter=3, kmeans_iter=3, train_stride=2,
        residual=True,
    )
    q = e.filter(F.pmod(F.col("vec_id"), F.lit(N // 12)) == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    ).cache()
    exact = brute_force_topk(e, q, k=K).cache()
    exact.count()
    yield e, q, exact, path
    e.unpersist()


def test_residual_flag_persisted(spark, residual_store):
    """The store's model must carry residual=True — the probe reads
    the flag from the model, and a store that lost it would ADC-score
    residual codes with a raw-vector LUT (the wrong-geometry failure
    the flag exists to prevent)."""
    _, _, _, path = residual_store
    _, _, _, residual = read_trained_ivf_pq_model(spark, path)
    assert residual is True


def test_residual_exhaustive_probe_equals_brute_force(
    spark, residual_store
):
    """Same pin the raw path has: with every cell probed and an
    uncapped shortlist, the staged residual probe degenerates to
    exact search — the per-cell LUT over rotate(q - centroid[cell])
    only decides the shortlist, and a shortlist of everything makes
    the exact cosine rerank (same tie order as brute_force_topk) the
    whole answer.  Equality pins the residual plumbing end-to-end:
    per-cell query LUTs, residual encode at build, prune, rerank."""
    _, q, exact, path = residual_store
    got = {
        (r["qid"], r["vec_id"], round(r["cos"], 9))
        for r in trained_ivf_pq_rerank_topk(
            spark, path, q, topk=K, nprobe=K_CLUSTERS, shortlist=N
        ).collect()
    }
    want = {
        (r["qid"], r["vec_id"], round(r["cos"], 9))
        for r in exact.collect()
    }
    assert got == want


def test_residual_narrow_probe_recall(spark, residual_store):
    """A pruned residual probe on well-separated un-normalized
    clusters must still find most true neighbors: with radii-separated
    planted clusters the home cell holds nearly all of each query's
    top-k, so nprobe=2 with a modest shortlist should clear a high
    floor — this is the path a residual production store would
    actually serve."""
    _, q, exact, path = residual_store
    approx = trained_ivf_pq_rerank_topk(
        spark, path, q, topk=K, nprobe=2, shortlist=200
    ).select("qid", "vec_id")
    rows = ann_recall(approx, exact, k=K).collect()
    mean_recall = sum(r["recall"] for r in rows) / len(rows)
    assert mean_recall >= 0.8, mean_recall
