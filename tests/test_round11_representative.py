"""Round-11: quality-based dup-cluster representative selection
(dedup.representative_map / dedup_keep_best — oracle-gated as
quality_dedup_keep; these pin the keep-filter form and edge cases)."""

from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.dedup import (
    dedup_keep_best,
    representative_map,
)


def _fixture(spark):
    comp = spark.createDataFrame(
        # cluster 1 = {1,2,3}; cluster 10 = {10,11}
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "node bigint, component bigint",
    )
    docs = spark.createDataFrame(
        [
            (1, 5, "short"),
            (2, 9, "best-of-cluster-1"),
            (3, 9, "tied-score-higher-id"),
            (10, 2, "best-of-cluster-10"),
            (11, 1, "worse"),
            (99, 7, "unclustered"),
        ],
        "doc_id bigint, score int, text string",
    )
    return comp, docs


def test_representative_map_argmax_and_ties(spark):
    comp, docs = _fixture(spark)
    m = {
        r.doc_id: r.kept_id
        for r in representative_map(
            comp, docs.select("doc_id", "score")
        ).collect()
    }
    # cluster 1: 2 and 3 tie on score 9 -> smallest id (2) wins
    assert m == {1: 2, 2: 2, 3: 2, 10: 10, 11: 10}


def test_dedup_keep_best(spark):
    comp, docs = _fixture(spark)
    kept = {
        r.doc_id for r in dedup_keep_best(docs, comp).collect()
    }
    # best of each cluster survives; unclustered passes through
    assert kept == {2, 10, 99}
