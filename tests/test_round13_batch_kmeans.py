"""Round-13: Arrow-batched numpy scoring for k-means|| seeding and
Lloyd assignment — the cost that capped the coarse-quantizer size
(SCALE.md waves 16/17).  The batch path must be BIT-IDENTICAL to the
interpreted-HOF form: _np_quantized_scores replicates dot_quantized's
per-dim floor((x*y)*scale + 0.5) in the same float64 op order with
int64 sums, and argmax ties break to the smaller cid exactly like
the struct-max."""

import numpy as np
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.similarity import (
    kmeans_assign,
    kmeans_fit,
    kmeans_parallel_seeds,
)

DIMS = 16


def _corpus(spark, n=600, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, DIMS))
    return spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )


def test_seed_parity(spark):
    e = _corpus(spark).cache()
    e.count()
    s_hof, r_hof = kmeans_parallel_seeds(e, 12, batch_score=False)
    s_np, r_np = kmeans_parallel_seeds(e, 12, batch_score=True)
    assert r_hof == r_np
    assert s_hof == s_np  # byte-identical seed vectors, same order
    e.unpersist()


def test_assign_parity_including_ties(spark):
    e = _corpus(spark, n=200)
    # duplicate centroids force exact score ties: both paths must
    # break to the smaller cid
    cent_rows = [(0, [0.5] * DIMS), (1, [0.5] * DIMS), (2, [-0.5] * DIMS)]
    cent = spark.createDataFrame(
        cent_rows, "cid int, embedding array<double>"
    )
    a_hof = {
        int(r["vec_id"]): int(r["cid"])
        for r in kmeans_assign(e, cent, batch_score=False).collect()
    }
    a_np = {
        int(r["vec_id"]): int(r["cid"])
        for r in kmeans_assign(e, cent, batch_score=True).collect()
    }
    assert a_hof == a_np
    assert 1 not in set(a_np.values())  # ties went to cid 0, never 1


def test_fit_parity(spark):
    e = _corpus(spark, n=400, seed=9).cache()
    e.count()
    c_hof, _, it_hof = kmeans_fit(e, 6, max_iter=3, batch_score=False)
    c_np, _, it_np = kmeans_fit(e, 6, max_iter=3, batch_score=True)
    assert it_hof == it_np
    rows_hof = sorted(
        (int(r["cid"]), tuple(r["embedding"])) for r in c_hof.collect()
    )
    rows_np = sorted(
        (int(r["cid"]), tuple(r["embedding"])) for r in c_np.collect()
    )
    assert rows_hof == rows_np
    e.unpersist()


def test_batch_assign_carries_all_columns_without_shuffle(spark):
    e = _corpus(spark, n=100).withColumn("extra", F.col("vec_id") * 2)
    cent = spark.createDataFrame(
        [(0, [0.5] * DIMS), (1, [-0.5] * DIMS)],
        "cid int, embedding array<double>",
    )
    out = kmeans_assign(e, cent, batch_score=True)
    assert set(out.columns) == {"vec_id", "embedding", "extra", "cid"}
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    assert "Exchange" not in buf.getvalue()
