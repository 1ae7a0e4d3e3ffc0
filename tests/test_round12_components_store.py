"""Round-12: the at-rest components store (plans.lake
write/ensure/read/merge_components_store) — the persisted half of
incremental connected components (r11 VERDICT item 2)."""

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
    connected_components,
)
from lofar_bf_pulsar_scripts_spark.plans.lake import (
    delete_from_shards,
    ensure_components_store,
    merge_components_store,
    read_components_store,
    write_components_store,
)


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "id_a long, id_b long")


def _cc(spark, pairs):
    return connected_components(
        _edges(spark, pairs), src_col="id_a", dst_col="id_b"
    )


def _labels(df):
    return sorted((r.node, r.component) for r in df.collect())


BASE = [(1, 2), (3, 4), (5, 6), (7, 8)]


def test_merge_equals_recompute_and_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "comp")
    write_components_store(_cc(spark, BASE), path, n_buckets=8)
    batch = [(2, 3), (6, 10), (10, 11), (20, 21)]
    rep = merge_components_store(spark, path, _edges(spark, batch))
    assert rep["new_nodes"] == 4  # 10, 11, 20, 21
    # only label 3 changes (merged into 1); 5 keeps its min-id label
    # when the larger-id new nodes 10/11 join it
    assert rep["relabeled_components"] == 1
    got = _labels(read_components_store(spark, path))
    want = _labels(_cc(spark, BASE + batch))
    assert got == want
    # merge -> merge keeps labels: the same batch is a no-op
    rep2 = merge_components_store(spark, path, _edges(spark, batch))
    assert rep2 == {
        "relabeled_components": 0, "new_nodes": 0, "buckets_rewritten": [],
    }
    assert _labels(read_components_store(spark, path)) == want


def test_sequential_merges_equal_one_recompute(spark, tmp_path):
    path = str(tmp_path / "comp")
    write_components_store(_cc(spark, BASE), path, n_buckets=8)
    b1 = [(2, 3), (100, 101)]
    b2 = [(4, 5), (101, 7)]  # chains through b1's new node
    merge_components_store(spark, path, _edges(spark, b1))
    merge_components_store(spark, path, _edges(spark, b2))
    got = _labels(read_components_store(spark, path))
    want = _labels(_cc(spark, BASE + b1 + b2))
    assert got == want


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "comp")
    # many buckets so untouched ones demonstrably keep their files
    write_components_store(_cc(spark, BASE), path, n_buckets=64)
    import glob
    import os

    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                           recursive=True)
    }
    rep = merge_components_store(spark, path, _edges(spark, [(2, 3)]))
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                           recursive=True)
    }
    touched_dirs = {f"cbucket={b}" for b in rep["buckets_rewritten"]}
    untouched = [
        f for f in before
        if not any(t in f for t in touched_dirs)
    ]
    assert untouched, "expected some untouched buckets at n_buckets=64"
    for f in untouched:
        assert f in after and after[f] == before[f], f


def test_ensure_builds_once_and_thunk_is_lazy(spark, tmp_path):
    path = str(tmp_path / "comp")
    calls = []

    def build():
        calls.append(1)
        return _cc(spark, BASE)

    ensure_components_store(build, path, n_buckets=8)
    ensure_components_store(build, path, n_buckets=8)
    assert calls == [1]  # second ensure never invoked the thunk
    assert _labels(read_components_store(spark, path)) == _labels(
        _cc(spark, BASE)
    )


def test_delete_interop_with_forget_path(spark, tmp_path):
    """A forgotten doc's row leaves the components store through the
    SAME delete path the doc/vector stores use (delete_from_shards
    with the store's partition column)."""
    path = str(tmp_path / "comp")
    write_components_store(_cc(spark, BASE), path, n_buckets=8)
    rep = delete_from_shards(
        spark, path, [1, 2], id_col="node", partition_col="cbucket"
    )
    assert rep["deleted"] == 2
    left = _labels(read_components_store(spark, path))
    assert left == _labels(_cc(spark, [(3, 4), (5, 6), (7, 8)]))


def test_merge_empty_store_raises(spark, tmp_path):
    path = str(tmp_path / "empty")
    spark.createDataFrame(
        [], "node long, component long, cbucket int, n_buckets int"
    ).write.parquet(path)
    with pytest.raises(ValueError, match="empty store"):
        merge_components_store(spark, path, _edges(spark, [(1, 2)]))
