"""Round-14 (VERDICT item 1): the 200k recall curve under the
rows-per-cell training law.  Wave 17's closing check measured
recall@20 = 0.196 at 200k/nlist=447 with an 18-rows/cell training
slice — training-data-bound, not cost-bound.  The auto law now sizes
the Lloyd slice to >=192 rows/cell (stride 2 -> ~100k rows here) with
k-means|| seeding on a ~16-rows/cell sub-slice.

This probe builds the 447-cell store under the new law on the
persistent 200k clustered corpus (/tmp/clustered_tivf_200k — 1000
planted clusters, dims 64) and measures:
  - recall@20 vs exact brute force at nprobe 8/16/32/44 (44 = ~10%
    of cells, the judge's scan budget),
  - the store's own FLAT CEILING: exhaustive probe (nprobe=447) at
    the same shortlist — what the PQ+rerank tier can ever deliver,
  - probe wall-clock (warm, min of 3) at the production nprobe.

Target (r13 VERDICT item 1 'done' bar): recall@20 at <=10% scan
within ~90% of the flat ceiling.

Usage: python tools/probe_tivf_recall_200k.py [--nlist 447]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DST, N, DIMS, K, SHORTLIST, N_QUERIES = (
    "/tmp/clustered_tivf_200k", 200_000, 64, 20, 200, 24
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlist", type=int, default=447)
    ap.add_argument("--kmeans-iter", type=int, default=4)
    ap.add_argument("--max-iter", type=int, default=4)
    ap.add_argument("--rpc", type=int, default=192)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
    )
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        auto_train_stride,
        ensure_trained_ivf_pq_store,
        trained_ivf_pq_rerank_topk,
    )
    from lofar_bf_pulsar_scripts_spark.session import get_spark
    from tools.scale_probe import build_clustered_embeddings

    spark = get_spark(app_name="probe_tivf_recall_200k")
    src = os.path.join(DST, "embeddings.parquet")
    if not os.path.exists(src):
        build_clustered_embeddings(DST, N, dims=DIMS)
    e = spark.read.parquet(src).select("vec_id", "embedding")
    n = e.count()
    assert n == N, (n, N)
    # EVERY training parameter in the store key (the /tmp-store
    # discipline): an unkeyed param silently reuses a store fitted
    # under old values
    store = (
        f"{DST}/tivf_store_{args.nlist}"
        f"_mi{args.max_iter}_ki{args.kmeans_iter}_rpc{args.rpc}_seedcap"
    )
    t0 = time.time()
    ensure_trained_ivf_pq_store(
        e, store, dims=DIMS, n_centroids=args.nlist, m_sub=8,
        max_iter=args.max_iter, kmeans_iter=args.kmeans_iter,
        train_stride="auto", train_rows_per_cell=args.rpc,
    )
    build_s = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "ensure_s": build_s,
                "nlist": args.nlist,
                "auto_stride": auto_train_stride(
                    N, args.nlist, args.rpc
                ),
            }
        ),
        flush=True,
    )
    stride = max(1, N // N_QUERIES)
    q = e.filter(F.pmod(F.col("vec_id"), F.lit(stride)) == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    ).localCheckpoint()
    exact = brute_force_topk(e, q, k=K).localCheckpoint()

    def recall_at(nprobe: int) -> float:
        res = trained_ivf_pq_rerank_topk(
            spark, store, q, topk=K, nprobe=nprobe,
            shortlist=SHORTLIST,
        ).select("qid", "vec_id")
        rows = ann_recall(res, exact, k=K).collect()
        return round(sum(r["recall"] for r in rows) / len(rows), 3)

    out = {}
    for nprobe in (8, 16, 32, 44):
        out[f"np{nprobe}"] = recall_at(nprobe)
        print(json.dumps({f"recall@20 np{nprobe}": out[f"np{nprobe}"]}),
              flush=True)
    out["ceiling"] = recall_at(args.nlist)
    print(json.dumps({"flat_ceiling": out["ceiling"]}), flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        trained_ivf_pq_rerank_topk(
            spark, store, q, topk=K, nprobe=8, shortlist=SHORTLIST
        ).count()
        times.append(time.time() - t0)
    out["probe_s_np8"] = round(min(times), 3)
    out["ensure_s"] = build_s
    for np_ in (8, 16, 32, 44):
        out[f"frac_of_ceiling_np{np_}"] = round(
            out[f"np{np_}"] / max(out["ceiling"], 1e-9), 3
        )
    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
