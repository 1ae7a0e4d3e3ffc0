"""Round-12: ANN recall floors that MEAN something (r11 VERDICT item
4) — measured on a planted-Gaussian-mixture corpus with real
neighborhood structure, where recall separates good probes from bad
ones.  On the driver's isotropic corpus every pairwise cosine is ~0
and 'top-k' is near-arbitrary, so the old floors measured noise; the
probe-scale numbers live in SCALE.md's sixteenth wave (n=20k: lsh_h6
0.654, ivf_kmeans64_np8 0.528, trained-PQ m8+rerank 0.420)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.similarity import (
    ann_recall,
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    kmeans_assign,
    kmeans_fit,
    lsh_ann_topk,
)

N, DIMS, K_CLUSTERS, SIGMA, K = 4000, 64, 20, 0.25, 10


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(1234)
    centers = rng.standard_normal((K_CLUSTERS, DIMS))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    g = np.arange(N) % K_CLUSTERS
    x = centers[g] + SIGMA * rng.standard_normal((N, DIMS))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    e = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(N)],
        "vec_id bigint, embedding array<float>",
    ).cache()
    e.count()
    q = e.filter(F.pmod(F.col("vec_id"), F.lit(N // 20)) == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    ).cache()
    exact = brute_force_topk(e, q, k=K).cache()
    exact.count()
    yield e, q, exact
    e.unpersist()


def _mean_recall(approx, exact):
    rows = ann_recall(approx, exact, k=K).collect()
    return sum(r["recall"] for r in rows) / len(rows)


def test_multiprobe_dial_monotone_and_floored(spark, clustered):
    e, q, exact = clustered
    r = {
        h: _mean_recall(
            lsh_ann_topk(e, q, k=K, dims=DIMS, hamming_probes=h), exact
        )
        for h in (0, 2, 6)
    }
    # the dial must actually dial on data with neighborhood structure
    assert r[0] < r[2] < r[6], r
    # probe-scale measurement was 0.26 / 0.48 / 0.65 at n=20k
    assert r[6] > 0.45, r


def test_trained_centroids_beat_stride_centroids(spark, clustered):
    e, q, exact = clustered
    cent_s = e.filter(F.pmod(F.col("vec_id"), F.lit(64)) == 0).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    r_stride = _mean_recall(
        ivf_topk(ivf_assign(e, cent_s), q, cent_s, k=K, nprobe=4), exact
    )
    train = e.filter(F.pmod(F.col("vec_id"), F.lit(4)) == 0)
    cent_t, _, _ = kmeans_fit(train, 20, max_iter=4)
    r_trained = _mean_recall(
        ivf_topk(kmeans_assign(e, cent_t), q, cent_t, k=K, nprobe=4), exact
    )
    # trained centroids recover the planted structure; stride ones
    # are arbitrary corpus points (probe-scale: 0.372 vs 0.200)
    assert r_trained > r_stride, (r_trained, r_stride)
    assert r_trained > 0.3, r_trained
