"""Distributed LTA retrieval executor (SURVEY §2.9 / D5).

Re-expresses the reference's download orchestration
(/root/reference/LTA/lta-retrieve.py):

* mirror-specific download URL construction (:47-49, :210-218) —
  srmlink -> the per-host SRMFifoGet HTTP gateway;
* per-file obsid target-directory rule (:190-196);
* the retrieve() loop (:181-260) as a **partition-parallel executor**:
  the manifest is repartitioned by download host so each partition is
  one sequential per-host queue (the reference downloads serially per
  process; here politeness is per-host, parallelism across hosts and
  partitions), and every row passes through an injectable ``fetch``
  callable inside ``mapInPandas`` — results come back as a DataFrame
  ledger instead of print statements;
* failures feed ``streaming.retry_ledger`` (:416-420 retryfile), whose
  dead-letter rows are exactly the reference's .retry file.

The network itself is injectable because this engine never assumes an
environment: any ``fetch(url, dest) -> (ok, bytes, error)`` works —
wget subprocess, HTTP library, or a test fake.
"""
from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame, functions as F, types as T

# lta-retrieve.py:47-49
SARA_PREFIX = "https://lofar-download.grid.surfsara.nl/lofigrid/SRMFifoGet.py?surl="
JUELICH_PREFIX = (
    "https://lofar-download.fz-juelich.de/webserver-lofar/SRMFifoGet.py?surl="
)
POZNAN_PREFIX = "https://lta-download.lofar.psnc.pl/lofigrid/SRMFifoGet.py?surl="

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("obsid_dir", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("nbytes", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("elapsed_s", T.DoubleType(), True),
    ]
)


def download_url(srmlink: Column) -> Column:
    """Mirror gateway URL for an srm:// link (lta-retrieve.py:210-218:
    juelich.de / psnc.pl hosts get their own prefixes, everything else
    goes through SARA)."""
    return (
        F.when(
            srmlink.contains("juelich.de"), F.concat(F.lit(JUELICH_PREFIX), srmlink)
        )
        .when(srmlink.contains("psnc.pl"), F.concat(F.lit(POZNAN_PREFIX), srmlink))
        .otherwise(F.concat(F.lit(SARA_PREFIX), srmlink))
    )


def obsid_dir(filename: Column) -> Column:
    """Per-file target directory (lta-retrieve.py:190-193): the obsid
    after '_locus' when present, else the leading token."""
    return F.when(
        filename.contains("_locus"),
        F.element_at(
            F.split(F.element_at(F.split(filename, "_locus"), -1), "_"), 2
        ),
    ).otherwise(F.element_at(F.split(filename, "_"), 1))


def retrieval_plan(manifest: DataFrame, uri_col: str = "uri") -> DataFrame:
    """Manifest -> executable download plan: gateway URL, obsid target
    dir, and the download host (partitioning key)."""
    url = download_url(F.col(uri_col))
    return manifest.withColumn("url", url).withColumn(
        "obsid_dir", obsid_dir(F.col("filename"))
    ).withColumn(
        "download_host", F.regexp_extract(F.col("url"), r"https://([^/]+)/", 1)
    )


def retrieve_manifest(
    manifest: DataFrame,
    fetch: Callable[[str, str], tuple[bool, int, str | None]],
    host_parallelism: int = 4,
    uri_col: str = "uri",
) -> DataFrame:
    """The reference's retrieve() loop (lta-retrieve.py:181-260) as a
    distributed executor: one sequential download queue per host
    partition, each file fetched into its obsid dir via the injected
    ``fetch(url, dest_dir)``, one result row per attempt.

    ``repartition(host_parallelism, download_host)`` keeps all files of
    one mirror in the same partition — downloads against a mirror stay
    serial (the reference's politeness), while distinct mirrors run
    concurrently on different executors. At 100 TB the fetch workers
    scale with partitions and no driver-side loop ever sees the file
    list."""
    plan = retrieval_plan(manifest, uri_col)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                # per-file wall-clock, the reference's retrieve timers
                # (lta-retrieve.py:184-288 prints retrieve/extract
                # times per file) — telemetry rides the ledger row
                t0 = time.time()
                try:
                    ok, nbytes, err = fetch(r["url"], r["obsid_dir"])
                except Exception as exc:  # fetcher bug == failed file
                    ok, nbytes, err = False, 0, repr(exc)
                rows.append(
                    {
                        "filename": r["filename"],
                        "obsid_dir": r["obsid_dir"],
                        "url": r["url"],
                        "ok": bool(ok),
                        "nbytes": int(nbytes),
                        "error": err,
                        "elapsed_s": time.time() - t0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESULT_SCHEMA.fields])

    return (
        plan.repartition(host_parallelism, "download_host")
        .select("filename", "obsid_dir", "url")
        .mapInPandas(run, schema=RESULT_SCHEMA)
    )


def staged_retrieval_stream(
    staged_events: DataFrame,
    manifest: DataFrame,
    fetch: Callable[[str, str], tuple[bool, int, str | None]],
    sink_path: str,
    checkpoint_path: str,
    host_parallelism: int = 4,
    key_col: str = "filename",
    ts_col: str = "ts",
):
    """The reference's staging/download overlap loop
    (lta-retrieve.py:482-568) as Structured Streaming: the xmlrpc
    polling becomes a staged-URL event stream; ``ready - downloaded``
    set subtraction becomes the watermarked first-seen dedup
    (streaming.fold_stream.streaming_dedup_new_urls); each micro-batch
    of newly staged files semi-joins the manifest and runs the
    host-partitioned retrieve executor, appending the per-attempt
    ledger to ``sink_path``. Downloads start while staging is still in
    progress — the overlap the reference's loop exists for.

    Returns the started StreamingQuery (caller stops it)."""
    from ..streaming.fold_stream import streaming_dedup_new_urls

    deduped = streaming_dedup_new_urls(
        staged_events, key_col=key_col, ts_col=ts_col
    )

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        new_files = batch_df.select(F.col(key_col).alias("filename")).distinct()
        todo = manifest.join(F.broadcast(new_files), "filename", "left_semi")
        if todo.isEmpty():
            return
        res = retrieve_manifest(todo, fetch, host_parallelism)
        res.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink_path)

    return (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(run_batch)
        .start()
    )


def retry_manifest(results: DataFrame, manifest: DataFrame) -> DataFrame:
    """Failed rows joined back to the manifest — the reference's
    .retry file (lta-retrieve.py:416-420,550-555) as a DataFrame that
    seeds the next retrieve_manifest() run."""
    failed = results.filter(~F.col("ok")).select("filename").distinct()
    return manifest.join(F.broadcast(failed), "filename", "left_semi")


def transfer_waves(
    plan: DataFrame,
    mode: str = "all",
    max_in_flight: int = -1,
    file_col: str = "filename",
    node_col: str = "obsid_dir",
) -> DataFrame:
    """The reference's three inter-cluster copy concurrency schemes
    (cluster-copy.py:166-171,377-490) as a deterministic wave
    assignment: every file gets a ``wave`` number; wave k starts when
    wave k-1 drains (the Popen waiting_list barrier).

    * ``all`` — everything at once: wave 0 (cluster-copy.py:386-401).
    * ``max_n`` — at most ``max_in_flight`` concurrent transfers:
      wave = rank/N over a deterministic file order
      (cluster-copy.py:402-430's bounded popen pool, batch form).
    * ``per_node`` — one file per destination node at a time:
      wave = rank within the node's queue
      (--one-file-per-dragnet-node-at-once, cluster-copy.py:432-490).

    Window partitioned by nothing ('all', 'max_n' — the file list is a
    manifest, dimension-sized) or by node ('per_node'); execution then
    groups by wave and feeds each wave to retrieve_manifest."""
    from pyspark.sql import Window

    if mode == "all":
        return plan.withColumn("wave", F.lit(0))
    if mode == "max_n":
        if max_in_flight <= 0:
            return plan.withColumn("wave", F.lit(0))
        rank = F.row_number().over(Window.orderBy(file_col)) - 1
        return plan.withColumn(
            "wave", (rank / F.lit(int(max_in_flight))).cast("int")
        )
    if mode == "per_node":
        rank = F.row_number().over(
            Window.partitionBy(node_col).orderBy(file_col)
        ) - 1
        return plan.withColumn("wave", rank.cast("int"))
    raise ValueError(f"unknown transfer mode {mode!r}")
