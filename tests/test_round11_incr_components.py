"""Round-11: incremental connected components
(pipeline.merge_components_incremental — oracle-gated as
incremental_components, which asserts equality with the full-graph
transitive closure cross-engine; these pin the merge mechanics)."""

from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
    connected_components,
    merge_components_incremental,
)


def _cc_dict(df):
    return {r.node: r.component for r in df.collect()}


def test_merge_joins_two_old_clusters_and_appends_new(spark):
    old_edges = spark.createDataFrame(
        # old clusters {1,2} and {5,6}; {8,9} stays untouched
        [(1, 2), (5, 6), (8, 9)], "id_a bigint, id_b bigint"
    )
    stored = connected_components(old_edges, src_col="id_a", dst_col="id_b")
    assert _cc_dict(stored) == {1: 1, 2: 1, 5: 5, 6: 5, 8: 8, 9: 8}
    batch = spark.createDataFrame(
        # 100 bridges the two old clusters; 200-201 is a brand-new pair
        [(2, 100), (100, 6), (200, 201)], "id_a bigint, id_b bigint"
    )
    merged = merge_components_incremental(stored, batch)
    got = _cc_dict(merged)
    # equality with a full recompute, label for label
    full = _cc_dict(
        connected_components(
            old_edges.unionByName(batch), src_col="id_a", dst_col="id_b"
        )
    )
    assert got == full
    # the merged cluster takes the global min id; untouched cluster
    # keeps its rows verbatim; new pair appended
    assert got[1] == got[2] == got[5] == got[6] == got[100] == 1
    assert got[8] == got[9] == 8
    assert got[200] == got[201] == 200


def test_merge_with_empty_batch_is_identity(spark):
    old_edges = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    stored = connected_components(old_edges, src_col="id_a", dst_col="id_b")
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert _cc_dict(merge_components_incremental(stored, empty)) == _cc_dict(
        stored
    )


def test_merge_batch_edge_inside_one_old_cluster(spark):
    """A batch edge between two members of the SAME old component
    contracts to a self-loop — labels must not change."""
    old_edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a bigint, id_b bigint"
    )
    stored = connected_components(old_edges, src_col="id_a", dst_col="id_b")
    batch = spark.createDataFrame([(1, 3)], "id_a bigint, id_b bigint")
    assert _cc_dict(merge_components_incremental(stored, batch)) == _cc_dict(
        stored
    )


def test_merge_new_node_lowers_no_label(spark):
    """A new node with a HIGHER id joining a cluster must not move the
    label; a new node with a LOWER id becomes the new label (min-id
    semantics, matching the full recompute)."""
    old_edges = spark.createDataFrame([(5, 6)], "id_a bigint, id_b bigint")
    stored = connected_components(old_edges, src_col="id_a", dst_col="id_b")
    got = _cc_dict(
        merge_components_incremental(
            stored,
            spark.createDataFrame([(6, 3)], "id_a bigint, id_b bigint"),
        )
    )
    assert got == {5: 3, 6: 3, 3: 3}
