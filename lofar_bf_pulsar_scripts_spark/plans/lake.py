"""Lakehouse layout utilities (SURVEY §4 partition-pruning analog,
SCALE.md "Data layout").

The reference prunes work with filename-grammar filters BEFORE
downloading (/root/reference/LTA/lta-retrieve.py:444-455) and
processes one subband file at a time (/root/reference/subdyn.py:
410-471). The lakehouse equivalents:

* write_observation_partitioned — Hive-style obs_id/sap/tab/part
  directories so P5/P6 filters become partition pruning (zero data
  touched for excluded partitions — verified via the plan's
  PartitionFilters in tests).
* write_cube_bucketed — the D3 archive cube bucketed by (subint,
  chan): every scrunch/Q-Q/sigma-clip groupBy on those keys is then
  shuffle-free (bucketed scan reports the output partitioning to
  Catalyst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_observation_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("obs_id", "sap", "tab", "part"),
) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_observation(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_cube_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int = 32,
    bucket_cols: tuple[str, ...] = ("subint", "chan"),
) -> None:
    """Bucketed managed table (bucketBy requires saveAsTable)."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


def explain_string(df: DataFrame) -> str:
    """Formatted physical plan as a string (for pruning assertions)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def write_embeddings_by_centroid(
    assigned: DataFrame,
    path: str,
    centroid_col: str = "cid",
) -> None:
    """IVF-ready on-disk layout: embeddings Hive-partitioned by their
    assigned centroid, so an nprobe-pruned query touches only the
    probed centroids' directories (PartitionFilters, zero IO for the
    rest) — the disk half of similarity.ivf_topk's scale story."""
    assigned.write.mode("overwrite").partitionBy(centroid_col).parquet(path)


def read_probed_centroids(
    spark: SparkSession,
    path: str,
    cids: list[int],
    centroid_col: str = "cid",
) -> DataFrame:
    """Partition-pruned scan of the probed centroid buckets."""
    df = spark.read.parquet(path)
    return df.filter(df[centroid_col].isin([int(c) for c in cids]))


def write_lsh_signatures(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    n_bits: int = 6,
    dims: int = 64,
) -> None:
    """At-rest LSH signature store: (id, tbl, bkt) rows built with the
    codegen'd ``hyperplane_buckets_long`` path, Hive-partitioned by
    (tbl, bkt) — a probe of one (table, bucket) pair is a
    partition-pruned scan (PartitionFilters, zero IO elsewhere), the
    sign-LSH mirror of the IVF layout above."""
    from ..operators.similarity import hyperplane_buckets_long

    sig = hyperplane_buckets_long(
        df, id_col=id_col, vec_col=vec_col,
        n_tables=n_tables, n_bits=n_bits, dims=dims,
    ).select(id_col, F.col("__tbl").alias("tbl"), F.col("__bkt").alias("bkt"))
    sig.write.mode("overwrite").partitionBy("tbl", "bkt").parquet(path)


def read_lsh_bucket(
    spark: SparkSession,
    path: str,
    tbl: int,
    bkt: int,
) -> DataFrame:
    """Partition-pruned scan of one LSH (table, bucket) directory."""
    df = spark.read.parquet(path)
    return df.filter((df["tbl"] == int(tbl)) & (df["bkt"] == int(bkt)))


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction — the standing operational task of any
    100 TB lake (streaming sinks and fine-grained partitioning leave
    thousands of KB-sized files; every one costs a task + a footer
    read per query). Sizes the output by the INPUT'S actual bytes:
    binaryFile listing with only the ``length`` column selected (the
    source is columnar about it — content is never read), then one
    repartition to ceil(total/target) files. Returns the file count
    written.

    Note: the output is UNPARTITIONED — Hive partition columns of a
    partitioned source are read back as ordinary data columns and the
    directory layout is flattened. Compact partitioned sources one
    partition directory at a time to keep the layout."""
    sizes = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(src)
        .select(F.sum("length").alias("b"))
        .first()
    )
    total = int(sizes["b"] or 0)
    if total == 0:
        raise ValueError(
            f"compact_parquet_dir: no *.parquet files found under {src!r}"
        )
    n_files = max(1, -(-total // int(target_file_bytes)))
    df = spark.read.parquet(src)
    df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files
