"""100x scale probe for plans.lake.delete_with_closure (round-10
VERDICT item 3): right-to-be-forgotten deletion with near-dup closure.

Geometry mirrors the round-10 delete_from_shards probe: base =
sf0.001 documents in a 20-shard store, scaled = the REALISTIC-mode
100x replica corpus (/tmp/scale100x_real, word-rename bijection ->
constant duplicate density) in a 2,000-shard store, 25 docs/shard
both, Bloom sidecar built.  Edges are PRECOMPUTED and parquet-
materialized before timing (the 100 TB path: candidates come from
the at-rest MinHash band store, not a per-delete corpus scan), so
the timed region is what a production delete pays: connected
components over the edge list + two broadcast semi-joins (expansion)
+ the Bloom-pruned locate + touched-shard rewrite + sidecar refresh.

Usage:
    python tools/scale_probe.py build --src /root/testdata/sf0.001 \
        --dst /tmp/scale100x_real --factor 100 --docs-mode realistic
    python tools/probe_delete_closure.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = [3, 8, 267]


def _prep(spark, docs_path: str, work: str):
    """Shard store + bloom sidecar + materialized candidate edges."""
    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.operators.dedup import (
        candidate_pairs,
        lsh_buckets,
        minhash_signature,
    )
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        write_shard_bloom_index,
        write_training_shards,
    )

    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    store = os.path.join(work, "shards")
    write_training_shards(docs, store, docs_per_shard=25)
    write_shard_bloom_index(spark, store)
    sigs = minhash_signature(docs, num_hashes=8)
    pairs = candidate_pairs(
        lsh_buckets(sigs, id_col="doc_id", bands=4, rows_per_band=2),
        "doc_id",
    )
    edges = os.path.join(work, "edges")
    pairs.write.mode("overwrite").parquet(edges)
    n_shards = (
        spark.read.parquet(store).select("shard").distinct().count()
    )
    n_edges = spark.read.parquet(edges).count()
    return store, edges, n_shards, n_edges


def _timed_delete(spark, store: str, edges_path: str) -> dict:
    from lofar_bf_pulsar_scripts_spark.plans.lake import delete_with_closure

    edges = spark.read.parquet(edges_path)
    t = time.time()
    rep = delete_with_closure(spark, store, SEEDS, edges=edges)
    rep["sec"] = round(time.time() - t, 3)
    return rep


def main() -> None:
    import math

    from lofar_bf_pulsar_scripts_spark.session import get_spark

    spark = get_spark(app_name="probe_delete_closure")
    out = {}
    for tag, docs in (
        ("base", "/root/testdata/sf0.001/documents.parquet"),
        ("x100", "/tmp/scale100x_real/documents.parquet"),
    ):
        work = f"/tmp/closure_probe_{tag}"
        shutil.rmtree(work, ignore_errors=True)
        store, edges, n_shards, n_edges = _prep(spark, docs, work)
        # warmup on a copy-free dry run is impossible (delete mutates);
        # instead rebuild the store between repeats and keep the min
        reps = []
        for _ in range(2):
            shutil.rmtree(work, ignore_errors=True)
            store, edges, n_shards, n_edges = _prep(spark, docs, work)
            reps.append(_timed_delete(spark, store, edges))
        best = min(reps, key=lambda r: r["sec"])
        best.update(shards=n_shards, edges=n_edges)
        out[tag] = best
        print(tag, json.dumps(best, default=str))
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
