"""100x scale probe for plans.lake.compact_keep_latest: latest-wins
compaction of an append-mode shard store.  Geometry mirrors the
delete/closure probes (base = sf0.001 docs in a 20-shard store,
scaled = the realistic-mode 100x replica corpus in 2,000 shards,
25 docs/shard), with 5 duplicated ids appended (version 2) before
timing.  Expected shape: the dup-id scan is the corpus-scan term
(the documented price of not keeping an id index — same family as
the delete locate), the rewrite is bounded by the partitions holding
duplicates.

Usage: python tools/probe_compaction.py   (after the scale_probe
build documented in tools/probe_delete_closure.py)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DUP_IDS = [3, 8, 267, 400, 499]


def main() -> None:
    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        compact_keep_latest,
        write_training_shards,
    )
    from lofar_bf_pulsar_scripts_spark.session import get_spark

    spark = get_spark(app_name="probe_compaction")
    out = {}
    for tag, docs_path in (
        ("base", "/root/testdata/sf0.001/documents.parquet"),
        ("x100", "/tmp/scale100x_real/documents.parquet"),
    ):
        work = f"/tmp/compact_probe_{tag}"
        reps = []
        for _ in range(2):
            shutil.rmtree(work, ignore_errors=True)
            docs = (
                spark.read.parquet(docs_path)
                .select("doc_id", "text")
                .withColumn("version", F.lit(1))
            )
            store = os.path.join(work, "shards")
            write_training_shards(docs, store, docs_per_shard=25)
            dups = (
                spark.read.parquet(store)
                .filter(F.col("doc_id").isin(DUP_IDS))
                .withColumn("version", F.lit(2))
                .withColumn("text", F.concat(F.col("text"), F.lit(" v2")))
            )
            dups.write.mode("append").partitionBy("shard").parquet(store)
            t = time.time()
            rep = compact_keep_latest(
                spark, store, id_col="doc_id", order_col="version"
            )
            rep["sec"] = round(time.time() - t, 3)
            reps.append(rep)
        best = min(reps, key=lambda r: r["sec"])
        best["n_partitions_rewritten"] = len(
            best.pop("partitions_rewritten")
        )
        out[tag] = best
        print(tag, json.dumps(best), flush=True)
    ratio = out["x100"]["sec"] / out["base"]["sec"]
    print(
        json.dumps(
            {
                "ratio": round(ratio, 2),
                "exponent": round(math.log(ratio) / math.log(100), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
