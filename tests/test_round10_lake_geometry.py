"""Writer-side row-group geometry contract (SCALING-RULES rule 2):
write_scan_parallel must emit files whose row-group count — the
task-count ceiling of every zero-shuffle consumer — tracks the
requested group size, and rowgroup_report must read the truth back
from footers only."""

from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.plans.lake import (
    rowgroup_report,
    write_scan_parallel,
)

def _events(spark):
    # sf0.001 events is ~1000 rows (11 KB compressed) — below a single
    # 64 KB group, so geometry assertions need a bigger table: 100k
    # synthetic rows ~ several MB of row data
    return spark.range(100_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 997).alias("user_id"),
        F.concat(F.lit("type_"), (F.col("id") % 7)).alias("event_type"),
        (F.col("id") * 0.123456789).alias("value"),
    )


def test_small_rowgroups_give_many_splits(spark, tmp_path):
    path = str(tmp_path / "small_groups")
    # one output file so the group count is attributable to
    # parquet.block.size, not to file count
    write_scan_parallel(
        _events(spark).coalesce(1), path, rowgroup_bytes=64 * 1024
    )
    rep = rowgroup_report(spark, path).collect()
    assert len(rep) == 1
    row = rep[0]
    # sf0.001 events ~ a few hundred KB of row data: a 64 KB group
    # target must yield several groups (the exact count depends on
    # encoder state; >= 3 is far from the 1-group failure mode)
    assert row.n_rowgroups >= 3, rep
    assert row.n_rows == _events(spark).count()


def test_huge_rowgroups_collapse_to_one(spark, tmp_path):
    path = str(tmp_path / "one_group")
    write_scan_parallel(
        _events(spark).coalesce(1), path, rowgroup_bytes=512 * 1024 * 1024
    )
    rep = rowgroup_report(spark, path).collect()
    assert len(rep) == 1
    assert rep[0].n_rowgroups == 1, rep


def test_report_totals_match_data(spark, tmp_path):
    path = str(tmp_path / "multi_file")
    write_scan_parallel(
        _events(spark).repartition(4), path, rowgroup_bytes=64 * 1024
    )
    rep = rowgroup_report(spark, path)
    agg = rep.agg(
        F.sum("n_rows").alias("rows"), F.count(F.lit(1)).alias("files")
    ).first()
    assert agg.rows == _events(spark).count()
    assert agg.files == 4
    # every file obeys the intra-file contract independently
    assert rep.filter(F.col("n_rowgroups") < 1).count() == 0


def test_scan_splits_follow_rowgroups(spark, tmp_path):
    """The contract's point: Spark's scan of the small-group file
    plans more input splits than the one-group file (splits
    materialize only at row-group starts)."""
    many = str(tmp_path / "many")
    one = str(tmp_path / "one")
    ev = _events(spark).coalesce(1)
    write_scan_parallel(ev, many, rowgroup_bytes=64 * 1024)
    write_scan_parallel(ev, one, rowgroup_bytes=512 * 1024 * 1024)

    def n_useful_splits(p):
        # byte-range split COUNT is size-based either way; what row
        # groups gate is which splits produce rows (a slice with no
        # group START in it reads nothing) — so useful parallelism =
        # the number of NON-EMPTY partitions under tiny split targets
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        old_cost = spark.conf.get("spark.sql.files.openCostInBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        try:
            return (
                spark.read.parquet(p)
                .select(F.spark_partition_id().alias("pid"))
                .distinct()
                .count()
            )
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
            spark.conf.set("spark.sql.files.openCostInBytes", old_cost)

    assert n_useful_splits(one) == 1
    assert n_useful_splits(many) >= 3


def test_upsert_embeddings_by_centroid(spark, tmp_path):
    """Incremental vector ingest: the batch lands in the right cid
    directories, the union reads back exactly, untouched partitions
    gain no files, and the batch plan never scans the at-rest store."""
    from lofar_bf_pulsar_scripts_spark.operators.similarity import (
        ivf_assign,
    )
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        ensure_embeddings_by_centroid,
        upsert_embeddings_by_centroid,
    )
    from lofar_bf_pulsar_scripts_spark.tables import load_table

    e = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    cent = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    base = e.filter(F.col("vec_id") < 40)
    batch = e.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 60))
    store = str(tmp_path / "cid_store")
    ensure_embeddings_by_centroid(ivf_assign(base, cent), store)

    import glob
    import os

    before = {
        d: len(glob.glob(os.path.join(store, d, "*.parquet")))
        for d in os.listdir(store)
        if d.startswith("cid=")
    }
    upsert_embeddings_by_centroid(batch, store, cent)

    got = spark.read.parquet(store)
    expect = ivf_assign(base.unionByName(batch), cent)
    g = sorted((r.vec_id, r.cid) for r in got.select("vec_id", "cid").collect())
    x = sorted(
        (r.vec_id, r.cid) for r in expect.select("vec_id", "cid").collect()
    )
    assert g == x

    touched = {r.cid for r in ivf_assign(batch, cent).select("cid").distinct().collect()}
    after = {
        d: len(glob.glob(os.path.join(store, d, "*.parquet")))
        for d in os.listdir(store)
        if d.startswith("cid=")
    }
    for d, n in before.items():
        cid = int(d.split("=", 1)[1])
        if cid not in touched:
            assert after[d] == n, f"untouched partition {d} gained files"


def test_delete_from_shards(spark, tmp_path):
    """Right-to-be-forgotten over the shard store: the named ids
    disappear, ONLY the shards containing them are rewritten
    (untouched shard files stay byte-identical), everything else
    survives."""
    import glob
    import os

    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        delete_from_shards,
        write_training_shards,
    )

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, docs_per_shard=25)

    def snapshot():
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(path, "shard=*", "*.parquet"))
        }

    before = snapshot()
    victims = [7, 8, 113]
    placed = {
        r.doc_id: r.shard
        for r in spark.read.parquet(path)
        .filter(F.col("doc_id").isin(victims))
        .select("doc_id", "shard")
        .collect()
    }
    out = delete_from_shards(spark, path, victims)
    assert out["deleted"] == 3
    assert sorted(out["shards_rewritten"]) == sorted(set(placed.values()))

    after_df = spark.read.parquet(path)
    assert after_df.count() == 197
    assert after_df.filter(F.col("doc_id").isin(victims)).count() == 0

    touched = set(out["shards_rewritten"])
    after = snapshot()
    for f, m in before.items():
        shard = int(f.split("shard=")[1].split(os.sep)[0])
        if shard not in touched:
            assert f in after and after[f] == m, f"untouched {f} changed"

    # no-op delete: nothing rewritten
    out2 = delete_from_shards(spark, path, [999_999])
    assert out2 == {"deleted": 0, "shards_rewritten": []}


def test_shard_bloom_index_locate_and_staleness(spark, tmp_path):
    """The Bloom sidecar never misses a shard that holds an id (no
    false negatives), delete results are identical with and without
    it, a delete→delete sequence KEEPS the pruned locate path (the
    delete incrementally refreshes the sidecar — round-11 lifecycle
    fix), and an append the sidecar didn't see makes the locate
    report stale (None) instead of risking a false negative."""
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        delete_from_shards,
        locate_shards_bloom,
        write_shard_bloom_index,
        write_training_shards,
    )

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, docs_per_shard=30)
    write_shard_bloom_index(spark, path)

    victims = [5, 144, 299]
    exact = {
        r.shard
        for r in spark.read.parquet(path)
        .filter(F.col("doc_id").isin(victims))
        .select("shard")
        .distinct()
        .collect()
    }
    cand = locate_shards_bloom(spark, path, victims)
    assert cand is not None and exact <= set(cand)

    out = delete_from_shards(spark, path, victims)
    assert out["deleted"] == 3 and set(out["shards_rewritten"]) == exact
    assert (
        spark.read.parquet(path)
        .filter(F.col("doc_id").isin(victims))
        .count()
        == 0
    )

    # the delete refreshed the sidecar in place: a second locate stays
    # on the pruned path (not None) and never misses
    exact2 = {
        r.shard
        for r in spark.read.parquet(path)
        .filter(F.col("doc_id").isin([10, 250]))
        .select("shard")
        .distinct()
        .collect()
    }
    cand2 = locate_shards_bloom(spark, path, [10, 250])
    assert cand2 is not None and exact2 <= set(cand2)
    # a deleted id no longer blooms in its (recomputed) old shard row:
    # the refreshed row was rebuilt from the post-delete store
    idx = spark.read.parquet(path + ".bloom_index")
    assert idx.filter(F.col("shard").isin(sorted(exact))).count() > 0
    # delete→delete keeps working and keeps the sidecar fresh
    out2 = delete_from_shards(spark, path, [10])
    assert out2["deleted"] == 1
    exact3 = {
        r.shard
        for r in spark.read.parquet(path)
        .filter(F.col("doc_id") == 250)
        .select("shard")
        .distinct()
        .collect()
    }
    cand3 = locate_shards_bloom(spark, path, [250])
    assert cand3 is not None and exact3 <= set(cand3)

    # an append the sidecar did NOT see must read stale (None): an
    # unseen id would otherwise be a bloom false negative — the one
    # failure a locate must never have
    spark.range(300, 310).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        F.lit(0).alias("shard"),
    ).write.mode("append").partitionBy("shard").parquet(path)
    assert locate_shards_bloom(spark, path, [305]) is None
    # and a delete still works through the fallback path
    out3 = delete_from_shards(spark, path, [305])
    assert out3["deleted"] == 1


def test_delete_fully_emptied_shard_and_null_ids(spark, tmp_path):
    """Round-10 second-review fixes, pinned: (a) a shard whose EVERY
    row is deleted must vanish from the store (dynamic partition
    overwrite writes nothing for it, so its old files needed explicit
    removal — a silent compliance failure reported as success); (b)
    NULL-id rows in a touched shard must SURVIVE (the old ~isin()
    filter dropped them under three-valued logic)."""
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        delete_from_shards,
    )

    # a direct shard-partitioned write: write_training_shards' rank
    # key requires non-NULL unique ids by contract, but a store CAN
    # acquire NULL ids downstream (joins, schema evolution) and the
    # delete path must not destroy them
    docs = spark.range(100).select(
        F.when(F.col("id") == 55, F.lit(None))
        .otherwise(F.col("id"))
        .alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        (F.col("id") / 10).cast("bigint").alias("shard"),
    )
    path = str(tmp_path / "shards")
    docs.repartition(F.col("shard")).write.partitionBy("shard").parquet(
        path
    )

    store = spark.read.parquet(path)
    # pick one whole shard's ids to delete (plus the NULL row's shard
    # gets a partial delete to exercise NULL survival)
    shard0_ids = [
        r.doc_id
        for r in store.filter(
            (F.col("shard") == 0) & F.col("doc_id").isNotNull()
        ).collect()
    ]
    null_shard = store.filter(F.col("doc_id").isNull()).first().shard
    neighbor = [
        r.doc_id
        for r in store.filter(
            (F.col("shard") == null_shard) & F.col("doc_id").isNotNull()
        )
        .limit(2)
        .collect()
    ]
    out = delete_from_shards(spark, path, shard0_ids + neighbor)
    assert out["deleted"] == len(shard0_ids) + len(neighbor)

    after = spark.read.parquet(path)
    # (a) the emptied shard is GONE — not silently retained
    assert after.filter(F.col("shard") == 0).count() == 0
    import os

    assert not os.path.isdir(os.path.join(path, "shard=0"))
    # (b) the NULL-id row survived its shard's rewrite
    assert after.filter(F.col("doc_id").isNull()).count() == 1
    assert after.count() == 100 - len(shard0_ids) - len(neighbor)


def test_delete_id_type_coercion_and_null_shard_refusal(spark, tmp_path):
    """Third-review fixes, pinned: (a) int ids against a string id
    column keep working (the isin() coercion the anti-join replaced);
    (b) a NULL-shard row holding a requested id makes the delete
    REFUSE instead of silently skipping the row."""
    import pytest as _pytest

    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        delete_from_shards,
    )

    docs = spark.range(40).select(
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") / 10).cast("bigint").alias("shard"),
    )
    path = str(tmp_path / "s1")
    docs.repartition(F.col("shard")).write.partitionBy("shard").parquet(
        path
    )
    out = delete_from_shards(spark, path, [7, 23])  # ints vs string col
    assert out["deleted"] == 2
    assert (
        spark.read.parquet(path)
        .filter(F.col("doc_id").isin("7", "23"))
        .count()
        == 0
    )

    nulls = spark.createDataFrame(
        [("99", None), ("98", 1)], "doc_id string, shard bigint"
    )
    path2 = str(tmp_path / "s2")
    nulls.write.partitionBy("shard").parquet(path2)
    with _pytest.raises(ValueError, match="NULL.shard"):
        delete_from_shards(spark, path2, ["99"])

    # fourth-review guards: NULL ids and uncastable ids refuse loudly
    with _pytest.raises(ValueError, match="NULL in the deletion"):
        delete_from_shards(spark, path, [None])
    intstore = str(tmp_path / "s3")
    spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("shard")
    ).write.partitionBy("shard").parquet(intstore)
    with _pytest.raises(ValueError, match="not castable"):
        delete_from_shards(spark, intstore, ["12x"])


def test_bloom_locate_normalizes_id_spelling(spark, tmp_path):
    """Fourth-review fix: the bloom probe must hash ids through the
    same type round-trip the index hashed (cast to the store id type
    and back to string), so '007' against a bigint column still finds
    bigint 7's shard — a spelling mismatch would be a bloom false
    negative, reported as a successful no-op delete."""
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        delete_from_shards,
        locate_shards_bloom,
        write_shard_bloom_index,
        write_training_shards,
    )

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, docs_per_shard=10)
    write_shard_bloom_index(spark, path)

    true_shard = (
        spark.read.parquet(path).filter(F.col("doc_id") == 7).first().shard
    )
    cand = locate_shards_bloom(spark, path, ["007"])
    assert cand is not None and true_shard in cand

    out = delete_from_shards(spark, path, ["007"])
    assert out["deleted"] == 1
    assert (
        spark.read.parquet(path).filter(F.col("doc_id") == 7).count() == 0
    )
