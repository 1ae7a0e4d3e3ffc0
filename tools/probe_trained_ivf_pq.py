"""Scale probe for the round-13 IVF-pruned trained-PQ store: WARM
probe wall-clock at 1x / 10x / 100x clustered corpora (2k / 20k /
200k vectors), n_centroids growing with the corpus (capped 64, the
broadcastable-codebook regime) and nprobe fixed at 8 — the production
dial.  The store build is paid once per corpus and reported
separately (ingest, not probe).  Expected: the probe exponent sits in
the partition-pruned class (lsh_ann_topk_stored ~0.1), NOT the
corpus-linear class the flat trained-PQ ADC scan lives in — that scan
was the one remaining unpruned ANN tier this store closes (r12
VERDICT item 1).

Usage: python tools/probe_trained_ivf_pq.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPORA = (
    ("base", "/tmp/clustered_tivf_2k", 2_000),
    ("x10", "/tmp/clustered_tivf_20k", 20_000),
    ("x100", "/tmp/clustered_tivf_200k", 200_000),
)
DIMS, K, NPROBE, SHORTLIST, N_QUERIES = 64, 20, 8, 200, 24


def main() -> None:
    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        ensure_trained_ivf_pq_store,
        trained_ivf_pq_rerank_topk,
    )
    from lofar_bf_pulsar_scripts_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
    )
    from lofar_bf_pulsar_scripts_spark.session import get_spark
    from tools.scale_probe import build_clustered_embeddings

    spark = get_spark(app_name="probe_trained_ivf_pq")
    out = {}
    for tag, dst, n in CORPORA:
        src = os.path.join(dst, "embeddings.parquet")
        if not os.path.exists(src):
            build_clustered_embeddings(dst, n, dims=DIMS)
        e = spark.read.parquet(src).select("vec_id", "embedding")
        # nlist in the sqrt(n) regime (see scale_probe.recall_probe's
        # tivfpq note), capped where kmeans_fit's k-means|| seeding
        # cost turns the probe into a training benchmark
        kc = max(16, min(100, int(n ** 0.5)))
        store = f"{dst}/tivf_store_{kc}"
        t0 = time.time()
        ensure_trained_ivf_pq_store(
            e, store, dims=DIMS, n_centroids=kc, m_sub=8,
            max_iter=4, kmeans_iter=4, train_stride=max(1, n // 4000),
        )
        build_s = round(time.time() - t0, 2)
        stride = max(1, n // N_QUERIES)
        q = e.filter(F.pmod(F.col("vec_id"), F.lit(stride)) == 0).select(
            F.col("vec_id").alias("qid"), "embedding"
        ).localCheckpoint()
        times = []
        for _ in range(3):
            t0 = time.time()
            res = trained_ivf_pq_rerank_topk(
                spark, store, q, topk=K, nprobe=NPROBE,
                shortlist=SHORTLIST,
            )
            res.count()
            times.append(time.time() - t0)
        exact = brute_force_topk(e, q, k=K)
        rows = ann_recall(
            res.select("qid", "vec_id"), exact, k=K
        ).collect()
        rec = round(sum(r["recall"] for r in rows) / len(rows), 3)
        out[tag] = {
            "n": n, "n_centroids": kc, "probe_s": round(min(times), 3),
            "ensure_s": build_s, "recall_at_20": rec,
        }
        print(json.dumps({tag: out[tag]}), flush=True)
    for a, b, decades in (("base", "x10", 1), ("base", "x100", 2)):
        ratio = out[b]["probe_s"] / out[a]["probe_s"]
        print(
            json.dumps(
                {
                    "summary": True,
                    "query": f"trained_ivf_pq_rerank_{b}",
                    "ratio": round(ratio, 2),
                    "exponent": round(
                        math.log(max(ratio, 1e-9))
                        / math.log(10 ** decades), 2,
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
