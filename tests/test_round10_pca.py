"""PCA/OPQ pre-rotation: exact-integer Gram (oracle-gated as
pca_gram_matrix), driver-side eigendecomposition, map-side projection
— the numpy-parity and plan-shape halves the DuckDB oracle can't
check."""

import numpy as np
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.similarity import (
    gram_matrix,
    pca_project,
    pca_rotation,
)
from lofar_bf_pulsar_scripts_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, "embeddings", SF).select("vec_id", "embedding")


def _collect_matrix(df):
    rows = sorted(
        ((r.vec_id, np.asarray(r.embedding, dtype=np.float64)) for r in df.collect())
    )
    return np.stack([v for _, v in rows]), [i for i, _ in rows]


def test_pca_end_to_end_matches_numpy(spark):
    e = _emb(spark)
    g = gram_matrix(e, dims=64, quant_scale=1e3).collect()
    w = pca_rotation(g, dims=64, out_dims=8, quant_scale=1e3)

    x, ids = _collect_matrix(e)
    xq = np.floor(x * 1e3 + 0.5)
    gq = (xq.T @ xq) / 1e6
    vals, vecs = np.linalg.eigh(gq)
    order = np.argsort(vals)[::-1][:8]
    ref = vecs[:, order]
    for c in range(8):
        p = np.argmax(np.abs(ref[:, c]))
        if ref[p, c] < 0:
            ref[:, c] = -ref[:, c]
    assert np.allclose(np.array(w).T, ref, atol=1e-9)

    proj = pca_project(e, w)
    got = {
        r.vec_id: np.asarray(r.pca, dtype=np.float64)
        for r in proj.select("vec_id", "pca").collect()
    }
    expect = x @ ref
    for k, i in enumerate(ids):
        assert np.allclose(got[i], expect[k], atol=1e-9), i


def test_pca_rotation_orthonormal_and_energy_ordered(spark):
    e = _emb(spark)
    g = gram_matrix(e, dims=64, quant_scale=1e3).collect()
    w = np.array(pca_rotation(g, dims=64, out_dims=16, quant_scale=1e3))
    assert np.allclose(w @ w.T, np.eye(16), atol=1e-9)
    x, _ = _collect_matrix(e)
    proj = x @ w.T
    energy = (proj**2).sum(axis=0)
    assert all(
        energy[c] >= energy[c + 1] - 1e-9 for c in range(len(energy) - 1)
    )
    # whitening equalizes second moments of the kept components
    ww = np.array(
        pca_rotation(g, dims=64, out_dims=16, quant_scale=1e3, whiten=True)
    )
    white = x @ ww.T
    m2 = (white**2).sum(axis=0)
    assert np.allclose(m2, m2[0], rtol=0.05)


def test_pca_project_is_map_side(spark):
    e = _emb(spark)
    g = gram_matrix(e, dims=64, quant_scale=1e3).collect()
    w = pca_rotation(g, dims=64, out_dims=4, quant_scale=1e3)
    plan = (
        pca_project(e, w)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan[:800]


def test_gram_matrix_skips_null_vectors(spark):
    e = _emb(spark)
    withnull = e.unionByName(
        spark.createDataFrame(
            [(999_999, None)], "vec_id bigint, embedding array<float>"
        )
    )
    a = {(r.i, r.j): str(r.s) for r in gram_matrix(e, dims=64).collect()}
    b = {
        (r.i, r.j): str(r.s)
        for r in gram_matrix(withnull, dims=64).collect()
    }
    assert a == b


def test_gram_matrix_overflow_refuses(spark):
    """The per-partition int64 partial must refuse, not wrap: at
    quant_scale=1e9 a handful of unit-norm rows already exceed the
    int64 cell bound."""
    import pytest as _pytest

    e = _emb(spark).coalesce(1)
    with _pytest.raises(Exception, match="overflow|OverflowError"):
        gram_matrix(e, dims=64, quant_scale=1e9).collect()


def test_gate_emits_canonical_string(spark):
    """The pca_gram_matrix GATE (not the operator) emits s as a plain
    decimal-digit string: decimal128/HUGEINT is the one type class
    whose driver-side Arrow hash diverged across rounds even when
    collected values agreed (r7 single_pulse_cands, r10 this gate),
    so the gate canonicalizes on both sides.  Pin the format: no
    exponent, no decimal point, optional leading '-'."""
    import re

    from lofar_bf_pulsar_scripts_spark.registry import queries

    out = queries()["pca_gram_matrix"](spark, SF)
    assert dict(out.dtypes)["s"] == "string"
    vals = [r.s for r in out.limit(50).collect()]
    assert vals, "gate returned no rows"
    assert all(re.fullmatch(r"-?\d+", v) for v in vals), vals[:5]
