"""100x scale probe for plans.lake.merge_components_store: fold a
batch of new edges into the PERSISTED (node, component) label store,
rewriting only the touched cbucket partitions.

Geometry mirrors the delete/compaction probes: base = the sf0.001
corpus's LSH candidate graph, scaled = the realistic-mode 100x
replica corpus's (tools/probe_delete_closure.py documents the build).
The store holds the old-80% id space's components; the timed merge
folds in the remaining edges (every pair touching a new-20% id).
Expected shape: ONE corpus-scale contraction probe (the equi-join
against the label store — the honest floor), a batch-sized CC, and a
touched-bucket-bounded rewrite; the exponent should sit well below
the delete path's corpus-scan term because the store is bucket-
pruned on write.

Usage: python tools/probe_components_merge.py          # dense (r12)
       python tools/probe_components_merge.py --sparse # nightly-shaped

The dense mode's batch touches ~every component (replica density), so
its measured exponent (0.40 at r12) is the full-rewrite worst case —
every bucket holds a touched component.  --sparse probes the
PRODUCTION-shaped batch (r12 VERDICT item 2): ~0.5% of nodes seed the
batch — one appended new node per seed plus a handful of true
cross-component merges — so buckets_rewritten is bounded by the
touched components' bucket set, not n_buckets, and the timed cost is
the store SCAN term (the contraction prune's honest floor) plus a
touched-bucket-bounded rewrite."""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main_sparse() -> None:
    """Nightly-shaped merge probe: the store holds the FULL corpus's
    components; the batch seeds ~0.5% of nodes (pmod 200) — one new
    node appended per seed, plus consecutive-seed merges for ~1/8 of
    them (true cross-component relabels).  Asserts buckets_rewritten
    == the xxhash-bucket set of the touched labels (the proportional-
    IO law the pinned test in tests/test_round13_sparse_merge.py
    holds at fixture scale) and times base / x10 / x100."""
    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.operators.dedup import (
        candidate_pairs,
        lsh_buckets,
        minhash_signature,
    )
    from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
        connected_components,
    )
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        merge_components_store,
        write_components_store,
    )
    from lofar_bf_pulsar_scripts_spark.session import get_spark

    spark = get_spark(app_name="probe_components_merge_sparse")
    NEW = 10**12
    out = {}
    for tag, docs_path in (
        ("base", "/root/testdata/sf0.001/documents.parquet"),
        ("x10", "/tmp/scale10x_real/documents.parquet"),
        ("x100", "/tmp/scale100x_real/documents.parquet"),
    ):
        docs = spark.read.parquet(docs_path).select("doc_id", "text")
        sigs = minhash_signature(docs, num_hashes=8)
        pairs = candidate_pairs(
            lsh_buckets(sigs, id_col="doc_id", bands=4, rows_per_band=2),
            "doc_id",
        ).localCheckpoint()
        comp = connected_components(pairs, src_col="id_a", dst_col="id_b")
        # seeds: every doc with a component label and doc_id % 200 == 0
        seeds = sorted(
            r["node"]
            for r in comp.filter(
                F.pmod(F.col("node"), F.lit(200)) == 0
            ).select("node").collect()
        )
        batch_rows = [(s + NEW, s) for s in seeds]  # appends
        batch_rows += [  # 1/8 of seeds pairwise-merged (relabels)
            (seeds[2 * i], seeds[2 * i + 1])
            for i in range(len(seeds) // 16)
        ]
        batch = spark.createDataFrame(batch_rows, "id_a long, id_b long")
        n_store = comp.count()
        reps, rep = [], None
        work = f"/tmp/comp_merge_sparse_{tag}"
        for _ in range(2):
            shutil.rmtree(work, ignore_errors=True)
            write_components_store(comp, work, n_buckets=64)
            t0 = time.time()
            rep = merge_components_store(spark, work, batch)
            reps.append(time.time() - t0)
        out[tag] = {
            "merge_s": round(min(reps), 3),
            "store_rows": n_store,
            "batch_edges": len(batch_rows),
            "seeds": len(seeds),
            "buckets_rewritten": len(rep["buckets_rewritten"]),
            "relabeled": rep["relabeled_components"],
            "new_nodes": rep["new_nodes"],
        }
        print(json.dumps({tag: out[tag]}), flush=True)
    for a, b, decades in (("base", "x10", 1), ("base", "x100", 2)):
        ratio = out[b]["merge_s"] / out[a]["merge_s"]
        print(
            json.dumps(
                {
                    "summary": True,
                    "query": f"merge_components_store_sparse_{b}",
                    "ratio": round(ratio, 2),
                    "exponent": round(
                        math.log(max(ratio, 1e-9)) / math.log(10 ** decades), 2
                    ),
                }
            )
        )


def main() -> None:
    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.operators.dedup import (
        candidate_pairs,
        lsh_buckets,
        minhash_signature,
    )
    from lofar_bf_pulsar_scripts_spark.operators.pipeline import (
        connected_components,
    )
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        merge_components_store,
        read_components_store,
        write_components_store,
    )
    from lofar_bf_pulsar_scripts_spark.session import get_spark

    spark = get_spark(app_name="probe_components_merge")
    out = {}
    for tag, docs_path in (
        ("base", "/root/testdata/sf0.001/documents.parquet"),
        ("x100", "/tmp/scale100x_real/documents.parquet"),
    ):
        docs = spark.read.parquet(docs_path).select("doc_id", "text")
        sigs = minhash_signature(docs, num_hashes=8)
        pairs = candidate_pairs(
            lsh_buckets(sigs, id_col="doc_id", bands=4, rows_per_band=2),
            "doc_id",
        ).localCheckpoint()
        is_old = lambda c: F.pmod(c, F.lit(10)) < 8  # noqa: E731
        old = pairs.filter(is_old(F.col("id_a")) & is_old(F.col("id_b")))
        batch = pairs.filter(
            ~(is_old(F.col("id_a")) & is_old(F.col("id_b")))
        ).localCheckpoint()
        n_batch = batch.count()
        comp = connected_components(old, src_col="id_a", dst_col="id_b")
        reps = []
        work = f"/tmp/comp_merge_probe_{tag}"
        for _ in range(2):
            shutil.rmtree(work, ignore_errors=True)
            write_components_store(comp, work, n_buckets=64)
            t0 = time.time()
            rep = merge_components_store(spark, work, batch)
            reps.append(time.time() - t0)
        # post-merge content == full recompute (the correctness half)
        got = sorted(
            (r.node, r.component)
            for r in read_components_store(spark, work).collect()
        )
        want = sorted(
            (r.node, r.component)
            for r in connected_components(
                pairs, src_col="id_a", dst_col="id_b"
            ).collect()
        )
        assert got == want, f"{tag}: merged store != full recompute"
        out[tag] = {
            "merge_s": round(min(reps), 3),
            "batch_edges": n_batch,
            "buckets_rewritten": len(rep["buckets_rewritten"]),
            "new_nodes": rep["new_nodes"],
        }
        print(json.dumps({tag: out[tag]}), flush=True)
    ratio = out["x100"]["merge_s"] / out["base"]["merge_s"]
    print(
        json.dumps(
            {
                "summary": True,
                "query": "merge_components_store",
                "ratio_100x": round(ratio, 2),
                "exponent": round(math.log(max(ratio, 1e-9)) / math.log(100), 2),
            }
        )
    )


if __name__ == "__main__":
    if "--sparse" in sys.argv:
        main_sparse()
    else:
        main()
