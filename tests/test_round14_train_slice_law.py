"""Round-14 (VERDICT item 1): the trained IVF-PQ coarse fit is
TRAINING-DATA-bound at scale — wave 17's closing check measured
recall@20 0.196 at 200k/nlist=447 off an 18-rows/cell training slice.
train_stride="auto" now follows a rows-per-cell law (Lloyd slice
>= 192 rows/cell), with k-means|| seeding capped to a ~16-rows/cell
SUB-slice (seeding is the one super-linear training term; Lloyd owns
refinement).  This file pins the law arithmetic and the one
correctness property seeding can never change: exhaustive-probe
equality with brute force on a store whose build actually exercised
the seed sub-slice path (seed_mult > 1)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.similarity import (
    brute_force_topk,
    seed_slice_mult,
)
from lofar_bf_pulsar_scripts_spark.plans.lake import (
    auto_train_stride,
    build_trained_ivf_pq_store,
    trained_ivf_pq_rerank_topk,
)


def test_auto_train_stride_law():
    # the wave-17 failure case: 200k rows, sqrt-regime nlist=447 —
    # the old fixed-4000-row law gave stride 50 (18 rows/cell); the
    # rows-per-cell law gives stride 2 (~223 rows/cell)
    assert auto_train_stride(200_000, 447) == 2
    # mid-scale: 200k at the capped nlist=100 -> 20k-row slice
    assert auto_train_stride(200_000, 100) == 10
    # small-nlist regime (192*nc < 4000): reduces EXACTLY to the old
    # n//4000 law — the registry's nc=16 stores stay bit-identical
    assert auto_train_stride(20_000, 16) == 20_000 // 4000
    assert auto_train_stride(4_000, 20) == 1
    # never zero
    assert auto_train_stride(10, 447) == 1


def test_seed_slice_mult_law():
    # 100k-row Lloyd slice at nlist=447: seed from every 13th train
    # row (~7.7k rows, ~17/cell — spread, not refinement)
    assert seed_slice_mult(100_000, 447) == 13
    # fixture/registry scale: mult 1 -> seeding sees the whole slice,
    # existing stores bit-identical
    assert seed_slice_mult(4_000, 20) == 1
    assert seed_slice_mult(4_000, 16) == 1
    # the 4000-row floor dominates small nlist
    assert seed_slice_mult(8_000, 16) == 2


N, DIMS, K_CLUSTERS, NC, K = 9_000, 32, 18, 42, 10


def test_seed_subslice_store_exhaustive_equality(
    spark, tmp_path_factory
):
    """Build a store sized so the seed sub-slice path actually runs
    (n_train=9000, nc=42 -> seed_mult 2) and pin the property seeding
    can never break: with every cell probed and an uncapped shortlist
    the staged probe equals brute force bit-for-bit.  Seeding (and
    the training slice generally) decides partition QUALITY — recall
    at a given nprobe — never correctness of the served answer."""
    assert seed_slice_mult(N, NC) == 2  # the path under test
    rng = np.random.default_rng(4242)
    centers = rng.standard_normal((K_CLUSTERS, DIMS))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    g = np.arange(N) % K_CLUSTERS
    x = centers[g] + 0.25 * rng.standard_normal((N, DIMS))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    e = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(N)],
        "vec_id bigint, embedding array<float>",
    ).cache()
    e.count()
    path = str(tmp_path_factory.mktemp("tivfseed") / "tivf_seed")
    build_trained_ivf_pq_store(
        e, path, dims=DIMS, n_centroids=NC, m_sub=8, k_codes=16,
        max_iter=2, kmeans_iter=2, train_stride="auto",
    )
    q = e.filter(F.pmod(F.col("vec_id"), F.lit(N // 8)) == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    ).localCheckpoint()
    got = {
        (r["qid"], r["vec_id"], round(r["cos"], 9))
        for r in trained_ivf_pq_rerank_topk(
            spark, path, q, topk=K, nprobe=NC, shortlist=N
        ).collect()
    }
    want = {
        (r["qid"], r["vec_id"], round(r["cos"], 9))
        for r in brute_force_topk(e, q, k=K).collect()
    }
    e.unpersist()
    assert got == want
