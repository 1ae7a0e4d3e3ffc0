"""Scale probe: measure wall-clock growth of the most expensive
registry queries under a 10x (sf0.1 -> sf1-equivalent) data scale-up.

VERDICT r4 task 1: the 100 TB story rested on plan shapes plus a
single ad-hoc 10x probe; this tool makes the measurement reproducible
and records per-query scaling exponents for SCALE.md.

Dataset construction (``build``): each fact/dim table at the source SF
is replicated ``factor`` times with per-replica key shifts chosen so
ALL foreign keys stay consistent (orders<->lineitem<->customer/part/
supplier join exactly as in TPC-H scaling; region/nation stay fixed,
as dbgen does). To avoid the degenerate corpus of the round-4 ad-hoc
probe (10 exact copies of every doc => candidate pairs grow as
replicas^2 inside every LSH bucket, which measures the synthetic
duplication, not the operator), replica r>0 gets:

* documents.text suffixed with a per-replica token (docs distinct
  across replicas; WITHIN-replica duplicates are preserved, so dedup
  still has real work at every scale);
* embeddings.embedding[0] nudged by r * 1e-3 (vectors distinct, near
  the originals — realistic near-dup structure).

events.user_id is shifted per replica: 10x data = 10x users with the
same per-user session structure, which is how a real corpus grows.

Usage:
    python tools/scale_probe.py build  [--src /root/testdata/sf0.1] \
        [--dst /tmp/scale_sf1] [--factor 10] [--docs-mode distinct|realistic]
    python tools/scale_probe.py run    [--base /root/testdata/sf0.1] \
        [--scaled /tmp/scale_sf1] [--factor 10] [--repeats 2] [--queries a,b]

At factor 100 set SPARK_GRAFT_DRIVER_MEM=48g (session.py default is
8g; the single local JVM is both driver and all executors, and the
100x corpus GC-thrashes an 8g heap).

``--docs-mode`` picks the documents replica mutation:

* ``distinct`` (default, the historical mode): replica token at both
  ends of the text. Replica copies of a doc still share ~95% of
  their word shingles, so at 100x every doc has 99 GENUINE
  above-threshold near-duplicates and dedup-family probes measure
  clone density, not operator shape (SCALE.md tenth wave, second
  decade). Fine for every non-dedup query.
* ``realistic`` (VERDICT r8 item 1): replica r>0 renames EVERY word
  injectively (word -> word_q{r}q). A bijection on the token
  alphabet preserves within-replica Jaccard EXACTLY (exact dups stay
  exact, organic near-dups keep their similarity) while cross-replica
  Jaccard drops to 0 — far below any dedup threshold. Duplicate
  density per doc is therefore CONSTANT as the corpus grows, which is
  how a real 100 TB corpus scales, and the dedup-family 100x probe
  measures the operator. Exact-substring spans likewise never match
  across replicas, so span_dedup has constant per-doc work too.

``run`` prints one JSON object per query with base/scaled wall times
(min over repeats after a warmup), the ratio, and the scaling exponent
log(t_scaled/t_base)/log(factor); plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The 8 most expensive registry queries per BENCH_r04 — the set VERDICT
# r4 names for the measurement.
DEFAULT_QUERIES = [
    "dup_clusters",
    "sequence_packing",
    "streaming_dedup_exact",
    "acf2d_user_day",
    "lsh_ann_topk",
    "chunk_dedup_stats",
    "lta_superquery_manifest",
    "catalog_union",
]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Tables replicated with key shifts; region/nation are fixed dims.
FIXED = {"region", "nation"}


def _strides(con, src: str) -> dict[str, int]:
    """Key-shift stride per key family = max(key)+1 at the source SF.
    Lazy per source file: a --tables subset build (e.g. events-only
    for the value-cardinality probe) may start from a partial source
    directory, so only the families whose files exist are computed —
    a replica SQL referencing a missing family still fails, loudly,
    at .format time."""
    q = lambda sql: con.execute(sql).fetchone()[0]  # noqa: E731
    spec = {
        "cust": ("customer", "max(c_custkey)+1"),
        "supp": ("supplier", "max(s_suppkey)+1"),
        "part": ("part", "max(p_partkey)+1"),
        "order": ("orders", "max(o_orderkey)+1"),
        "event": ("events", "max(event_id)+1"),
        "user": ("events", "max(user_id)+1"),
        "doc": ("documents", "max(doc_id)+1"),
        "vec": ("embeddings", "max(vec_id)+1"),
        "dims": ("embeddings", "len(embedding)"),
    }
    out = {}
    for key, (table, expr) in spec.items():
        path = f"{src}/{table}.parquet"
        if os.path.exists(path):
            limit = " limit 1" if key == "dims" else ""
            out[key] = q(f"select {expr} from '{path}'{limit}")
    return out


def build(
    src: str,
    dst: str,
    factor: int,
    docs_mode: str = "distinct",
    events_mode: str = "base",
    tables: list[str] | None = None,
) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # a factor-F build is an F-branch UNION ALL; DuckDB's default
    # expression-depth cap trips past ~1000 branches
    con.execute(f"SET max_expression_depth TO {max(1000, 4 * factor)}")
    s = _strides(con, src)
    # The rotation+sign replica scheme decorrelates only up to
    # 2*dims replicas: r and r+2*dims share both shift and sign, so
    # a larger factor silently reintroduces the degenerate
    # near-duplicate embedding corpus this scheme was built to fix
    # (round-10 ADVICE).  Fail loudly instead.
    if "dims" in s and "embeddings" in (tables or TABLES):
        # guard only applies when embeddings replicas are being built
        assert factor <= 2 * s["dims"], (
            f"factor {factor} > 2*dims ({2 * s['dims']}): replica r "
            f"and r+{2 * s['dims']} would be identical up to key "
            "shift — extend the decorrelation scheme before probing "
            "this large"
        )
    # Per-table SELECT for replica r (r is substituted as a literal).
    replica_sql = {
        "customer": (
            "select c_custkey + {r}*{cust} as c_custkey, c_name, "
            "c_nationkey, c_acctbal, c_mktsegment from src"
        ),
        "supplier": (
            "select s_suppkey + {r}*{supp} as s_suppkey, s_name, "
            "s_nationkey, s_acctbal from src"
        ),
        "part": (
            "select p_partkey + {r}*{part} as p_partkey, p_name, p_brand, "
            "p_type, p_size, p_retailprice from src"
        ),
        "orders": (
            "select o_orderkey + {r}*{order} as o_orderkey, "
            "o_custkey + {r}*{cust} as o_custkey, o_orderstatus, "
            "o_totalprice, o_orderdate, o_orderpriority from src"
        ),
        "lineitem": (
            "select l_orderkey + {r}*{order} as l_orderkey, "
            "l_partkey + {r}*{part} as l_partkey, "
            "l_suppkey + {r}*{supp} as l_suppkey, l_linenumber, "
            "l_quantity, l_extendedprice, l_discount, l_tax, "
            "l_returnflag, l_linestatus, l_shipdate from src"
        ),
        "events": (
            # {vjit} is '' (historical builds: value copied verbatim,
            # so distinct (event_type, value) stays base-sized) or a
            # per-replica jitter term ' + {r}*1e-9' (--events-mode
            # jitter, VERDICT r10 item 8): value-cardinality then
            # grows with N while per-group distributions move by at
            # most factor*1e-9 — double spacing at |value|~1e2 is
            # ~1.4e-14, so every replica's copy is a DISTINCT double.
            "select event_id + {r}*{event} as event_id, ts, "
            "user_id + {r}*{user} as user_id, event_type, "
            "value{vjit} as value, props "
            "from src"
        ),
        "documents": (
            # replica token at BOTH ends: the suffix varies the
            # shingle set (dedup keeps real work); the PREFIX shifts
            # the head bytes so raster/perceptual hashes differ across
            # replicas too — with suffix only, image_phash_pairs'
            # 16x16 raster (first 256 chars) was byte-identical in
            # every replica and the 10x probe measured the planted
            # exact-clone pair blow-up (249x output rows), not the
            # operator (round-8 finding; ninth-wave lesson 3 class)
            "select doc_id + {r}*{doc} as doc_id, "
            "case when {r} = 0 then text "
            "else 'z{r} ' || text || ' zrep{r}' end as text, "
            "lang, source, n_chars from src"
        )
        if docs_mode == "distinct"
        else (
            # realistic mode: injective per-replica word renaming —
            # the tokenizer splits on \s+ and lowercases, so suffixing
            # every non-space run with the lowercase tag '_q{r}q' is a
            # bijection on the token alphabet: within-replica shingle
            # Jaccard is IDENTICAL to the source corpus, cross-replica
            # Jaccard is 0. n_chars is kept from the source row on
            # purpose (token COUNT is unchanged and no gated query
            # derives n_chars from text).
            "select doc_id + {r}*{doc} as doc_id, "
            "case when {r} = 0 then text "
            "else regexp_replace(text, '(\\S+)', '\\1_q{r}q', 'g') "
            "end as text, "
            "lang, source, n_chars from src"
        ),
        "embeddings": (
            # Per-replica dimension ROTATION + sign flip past d
            # replicas (r9; replaces the old +r*0.001 dim-1 nudge).
            # The nudge left every replica of a vector nearly
            # identical in embedding space, so occupancy-sensitive
            # operators saw a degenerate corpus: all ~factor copies
            # of a vector argmax into the SAME cluster and SemDeDup's
            # within-cell pair-compare went quadratic (measured exp
            # 1.15 at 100x — the corpus, not the operator). A cyclic
            # shift by r mod d preserves norms and every WITHIN-
            # replica dot exactly (duplicate/cluster structure per
            # replica == the source corpus, the realistic-docs-mode
            # philosophy), while cross-replica dots are decorrelated;
            # the global sign flip for r >= d keeps within-replica
            # dots unchanged (dot(-a,-b)=dot(a,b)) and decorrelates
            # the r vs r+d pairs that share a shift.
            "select vec_id + {r}*{vec} as vec_id, "
            "case when {r} = 0 then embedding else "
            "cast(list_transform(list_concat("
            "embedding[({r} % {dims}) + 1:], "
            "embedding[1:({r} % {dims})]), "
            "x -> (case when {r} < {dims} then 1.0 else -1.0 end) * x) "
            "as FLOAT[]) end as embedding, label from src"
        ),
    }
    for t in (tables or TABLES):
        src_path = f"{src}/{t}.parquet"
        out = f"{dst}/{t}.parquet"
        con.execute(f"create or replace view src as select * from '{src_path}'")
        if t in FIXED:
            sql = "select * from src"
        else:
            vjit = " + {r}*0.000000001" if events_mode == "jitter" else ""
            parts = [
                replica_sql[t].format(
                    r=r, vjit=vjit.format(r=r), **s
                )
                for r in range(factor)
            ]
            sql = " union all ".join(f"({p})" for p in parts)
        # Row-group sizing (r9): DuckDB's default ~122k-row groups
        # gave the 100x embeddings file TWO row groups, capping Spark
        # scan parallelism at 2 tasks (splits only materialize where a
        # row group starts) — a map-side zero-shuffle operator then
        # measured 3.4x slower at 100x purely from the harness's file
        # layout, while a real 100 TB corpus has thousands of groups.
        # Target ~64 groups per replica table so scan stages see
        # cluster-like split counts (group size still >=4096 rows so
        # scans stay efficient).
        n_src = con.execute("select count(*) from src").fetchone()[0]
        n_total = n_src if t in FIXED else n_src * factor
        rg = min(122_880, max(4096, n_total // 64))
        con.execute(
            f"copy ({sql}) to '{out}' (format parquet, row_group_size {rg})"
        )
        n = con.execute(f"select count(*) from '{out}'").fetchone()[0]
        print(f"built {t}: {n} rows (row_group_size {rg})", file=sys.stderr)


def build_clustered_embeddings(
    dst: str,
    n: int,
    dims: int = 64,
    n_clusters: int | None = None,
    sigma: float = 0.25,
    seed: int = 1234,
) -> None:
    """Planted-Gaussian-mixture embeddings table (round-11 VERDICT
    item 4): every ANN recall number so far was measured on the
    driver's ISOTROPIC synthetic corpus, whose pairwise cosines are
    all ~0 — 'top-k' there is near-arbitrary, so recall cannot
    distinguish a good probe from a bad one (the same corpus property
    that hid the OPQ win until r11 built an anisotropic fixture).

    Here vector i = normalize(center[g] + sigma * noise) with
    n_clusters unit centers, g = i mod n_clusters, and the planted
    cluster id persisted as ``label`` — a corpus with REAL
    neighborhood structure (within-cluster cosine ~1/(1+sigma^2),
    cross-cluster ~0) and analytically known neighbor sets.  Written
    as dst/embeddings.parquet with the same (vec_id, embedding,
    label) schema as the driver tables and ~64 row groups (rule 2).
    Deterministic by seed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    k = int(n_clusters or max(32, n // 200))
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dims))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    g = np.arange(n) % k
    x = centers[g] + sigma * rng.standard_normal((n, dims))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    os.makedirs(dst, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                list(x.astype(np.float32)), pa.list_(pa.float32())
            ),
            "label": pa.array((g % 5).astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(
        tbl, os.path.join(dst, "embeddings.parquet"),
        row_group_size=max(4096, n // 64),
    )
    print(
        f"built clustered embeddings: {n} rows, {k} planted clusters, "
        f"sigma {sigma}", file=sys.stderr,
    )


def recall_probe(
    sf_dir: str,
    k: int = 20,
    n_queries: int = 24,
    dims: int = 64,
    methods: str = "lsh,ivf,pq",
    max_iter: int = 4,
) -> None:
    """Recall@k of every ANN family vs the exact cosine top-k on the
    embeddings table at ``sf_dir`` — run it against a CLUSTERED build
    (build-clustered) for numbers that mean something, or against the
    driver's isotropic table to see the difference.  One JSON line
    per method + a summary; methods mirror the registry gates'
    parameters (LSH 4x6-bit tables with the multiprobe dial, IVF with
    stride-64 and with TRAINED k-means centroids at nprobe 4/8,
    IVF-PQ rerank, trained-OPQ PQ store)."""
    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.session import get_spark
    from lofar_bf_pulsar_scripts_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        ivf_assign,
        ivf_pq_rerank_topk,
        ivf_topk,
        kmeans_fit,
        lsh_ann_topk,
    )
    from lofar_bf_pulsar_scripts_spark.plans.lake import (
        ensure_trained_pq_store,
        trained_pq_topk,
    )

    spark = get_spark(app_name="recall_probe")
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    e = e.select("vec_id", "embedding").cache()
    n = e.count()
    stride = max(1, n // n_queries)
    queries = e.filter(F.pmod(F.col("vec_id"), F.lit(stride)) == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    ).cache()
    exact = brute_force_topk(e, queries, k=k).cache()
    exact.count()

    def mean_recall(approx) -> float:
        rows = ann_recall(approx, exact, k=k).collect()
        return round(sum(r["recall"] for r in rows) / len(rows), 3)

    want = {m.strip() for m in methods.split(",") if m.strip()}
    results = {}
    if "lsh" in want:
        for h in (0, 2, 6):
            results[f"lsh_h{h}"] = mean_recall(
                lsh_ann_topk(e, queries, k=k, dims=dims, hamming_probes=h)
            )
            print(json.dumps({"method": f"lsh_h{h}",
                              "mean_recall_at_k": results[f"lsh_h{h}"],
                              "k": k}), flush=True)
    if want & {"ivf", "pq", "ivfpq"}:
        # stride centroids (the hash-gated gates' deterministic
        # codebook) vs trained centroids (kmeans_fit — the recall path)
        cent_stride = e.filter(
            F.pmod(F.col("vec_id"), F.lit(64)) == 0
        ).select(F.col("vec_id").alias("cid"), "embedding")
        assigned_s = ivf_assign(e, cent_stride).cache()
        kk = max(16, min(64, n // 256))
        # train the codebook on a deterministic ~4k-row sample (the
        # standard PQ/IVF practice — the codebook is a model, not a
        # sketch): k-means|| seeding cross-joins the corpus against
        # ~10k candidate seeds, which at full-corpus k=64 is the
        # probe's wall-clock, not its information
        from lofar_bf_pulsar_scripts_spark.operators.similarity import (
            kmeans_assign,
        )

        train = e.filter(
            F.pmod(F.col("vec_id"), F.lit(max(1, n // 4000))) == 0
        )
        cent_t, _, _ = kmeans_fit(train, kk, max_iter=max_iter)
        assigned_t = kmeans_assign(e, cent_t).cache()
    if "ivf" in want:
        for nprobe in (4, 8):
            results[f"ivf_stride64_np{nprobe}"] = mean_recall(
                ivf_topk(assigned_s, queries, cent_stride, k=k, nprobe=nprobe)
            )
            results[f"ivf_kmeans{kk}_np{nprobe}"] = mean_recall(
                ivf_topk(assigned_t, queries, cent_t, k=k, nprobe=nprobe)
            )
            for m in (f"ivf_stride64_np{nprobe}", f"ivf_kmeans{kk}_np{nprobe}"):
                print(json.dumps({"method": m, "mean_recall_at_k":
                                  results[m], "k": k}), flush=True)
    if want & {"pq", "ivfpq"}:
        results["ivf_pq_rerank_np8"] = mean_recall(
            ivf_pq_rerank_topk(
                assigned_t, queries, cent_t, dims=dims, k=k, nprobe=8,
                shortlist=4 * k,
            )
        )
        print(json.dumps({"method": "ivf_pq_rerank_np8",
                          "mean_recall_at_k": results["ivf_pq_rerank_np8"],
                          "k": k}), flush=True)
    if want & {"pq", "tpq"}:
        path = os.path.join(
            "/tmp", f"recall_probe_pq_{os.path.basename(sf_dir.rstrip('/'))}"
        )
        ensure_trained_pq_store(
            e, path, dims=dims, max_iter=max_iter,
            train_stride=max(1, n // 4000),
        )
        results["trained_opq_pq"] = mean_recall(
            trained_pq_topk(spark, path, queries, topk=k)
        )
        print(json.dumps({"method": "trained_opq_pq",
                          "mean_recall_at_k": results["trained_opq_pq"],
                          "k": k}), flush=True)
        # production shape: PQ is the SHORTLIST tier; only the
        # shortlist pays exact cosine (retrieve-then-rerank)
        from pyspark.sql import Window
        from lofar_bf_pulsar_scripts_spark.operators.similarity import (
            cosine,
        )

        short = trained_pq_topk(
            spark, path, queries, topk=10 * k
        ).select("qid", "vec_id")
        cand = short.join(e, "vec_id").join(
            F.broadcast(
                queries.select("qid", F.col("embedding").alias("__qv"))
            ),
            "qid",
        )
        scored = cand.select(
            "qid", "vec_id",
            cosine(F.col("__qv"), F.col("embedding")).alias("cos"),
        )
        wnd = Window.partitionBy("qid").orderBy(
            F.desc("cos"), F.col("vec_id")
        )
        rr = (
            scored.withColumn("__rk", F.row_number().over(wnd))
            .filter(F.col("__rk") <= k)
        )
        results["trained_opq_pq_rerank10k"] = mean_recall(rr)
        print(json.dumps({"method": "trained_opq_pq_rerank10k",
                          "mean_recall_at_k":
                          results["trained_opq_pq_rerank10k"],
                          "k": k}), flush=True)
    if want & {"pq", "tivfpq"}:
        # round-13: the STORED composition — IVF partition pruning +
        # trained-PQ ADC shortlist + exact rerank, all from one store
        from lofar_bf_pulsar_scripts_spark.plans.lake import (
            ensure_trained_ivf_pq_store,
            trained_ivf_pq_rerank_topk,
        )

        # nlist in the sqrt(n) regime (FAISS practice): at fixed
        # nprobe the probed fraction then SHRINKS as the corpus
        # grows, which is the whole point of the coarse quantizer —
        # an undersized nlist (n//500 was first tried: 40 cells over
        # 100 planted clusters) blends clusters per cell and measured
        # 0.378 where sqrt-sized cells clear the 0.42 floor
        kc = max(16, min(100, int(n ** 0.5)))
        ts = max(1, n // 4000)
        # EVERY training parameter is in the store key (the registry
        # discipline): ensure_* is first-build-wins, so a key that
        # omits kmeans_iter/train_stride silently probes a store
        # fitted under the OLD values (bit us in this very probe)
        path = os.path.join(
            "/tmp",
            f"recall_probe_tivf_{os.path.basename(sf_dir.rstrip('/'))}"
            f"_{kc}_mi{max_iter}_ki{2 * max_iter}_ts{ts}_res0",
        )
        # the composed recall is ~(coverage x shortlist quality):
        # an under-fitted coarse quantizer caps coverage and no
        # shortlist can recover it (kc=100 at 2k train rows / 4
        # Lloyd iters measured 0.326 @ np8 where the same kc
        # well-fitted clears the flat-scan 0.42) — so the coarse fit
        # gets 4k training rows and 2x the Lloyd iterations; the
        # k-means|| seeding cost this buys is the probe's wall-clock,
        # not its information (SCALE.md wave 16 pitfall)
        ensure_trained_ivf_pq_store(
            e, path, dims=dims, n_centroids=kc, m_sub=8,
            max_iter=max_iter, kmeans_iter=2 * max_iter,
            train_stride=ts,
        )
        for nprobe in (4, 8):
            m = f"trained_ivf_pq_rerank_np{nprobe}"
            results[m] = mean_recall(
                trained_ivf_pq_rerank_topk(
                    spark, path, queries, topk=k, nprobe=nprobe,
                    shortlist=10 * k,
                ).select("qid", "vec_id")
            )
            print(json.dumps({"method": m, "mean_recall_at_k":
                              results[m], "k": k, "n_centroids": kc}),
                  flush=True)
    print(json.dumps({"summary": True, "n": n, "k": k, **results}))


def run(base: str, scaled: str, factor: int, repeats: int, names: list[str]) -> None:
    from lofar_bf_pulsar_scripts_spark.session import get_spark
    from __spark_entry__ import queries

    spark = get_spark(app_name="scale_probe")
    qs = queries()
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # Harness lie #3 guard: the declared --factor MUST match the
    # actual volume ratio of the two directories. A probe once ran
    # base=<10x dir> scaled=<100x dir> with --factor 100 — an actual
    # factor of 10 whose exponents came out HALVED and read as
    # wins. The replica dir NAMES are probe units, not factors:
    # verify against the data, never the label.
    import duckdb

    n_base = duckdb.sql(
        f"select count(*) from '{base}/events.parquet'"
    ).fetchone()[0]
    n_scaled = duckdb.sql(
        f"select count(*) from '{scaled}/events.parquet'"
    ).fetchone()[0]
    measured = n_scaled / max(n_base, 1)
    if not (factor / 1.2 <= measured <= factor * 1.2):
        raise SystemExit(
            f"declared --factor {factor} but events rows say "
            f"{n_scaled}/{n_base} = {measured:.1f}x — exponents would "
            f"be computed against the wrong log base; fix the dirs or "
            f"the factor"
        )

    def execute(df):
        # NOT .count(): Catalyst prunes unused columns through a final
        # count, so count() on an Aggregate drops the aggregate
        # expressions themselves (minhash_signatures collapsed to a
        # distinct-doc count — measured 0.4s flat at every SF). The
        # noop sink executes the COMPLETE projection, which is what a
        # downstream consumer pays.
        df.write.format("noop").mode("overwrite").save()

    def timed(name: str, sf_dir: str) -> float:
        # warmup run (JVM/codegen + any at-rest store build), then
        # min over `repeats` timed runs = steady-state cost.
        execute(qs[name](spark, sf_dir))
        best = math.inf
        for _ in range(repeats):
            t0 = time.time()
            execute(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        return best

    rows = []
    for name in names:
        tb = timed(name, base)
        ts_ = timed(name, scaled)
        ratio = ts_ / tb
        exponent = math.log(max(ratio, 1e-9)) / math.log(factor)
        row = {
            "query": name,
            "base_s": round(tb, 3),
            "scaled_s": round(ts_, 3),
            "ratio": round(ratio, 2),
            "exponent": round(exponent, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    worst = max(rows, key=lambda r: r["ratio"])
    print(
        json.dumps(
            {
                "summary": True,
                "factor": factor,
                "max_ratio": worst["ratio"],
                "max_ratio_query": worst["query"],
                "all_within_linear_x1.2": all(
                    r["ratio"] <= 1.2 * factor for r in rows
                ),
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--src", default="/root/testdata/sf0.1")
    b.add_argument("--dst", default="/tmp/scale_sf1")
    b.add_argument("--factor", type=int, default=10)
    b.add_argument(
        "--docs-mode", choices=["distinct", "realistic"], default="distinct"
    )
    b.add_argument(
        "--events-mode", choices=["base", "jitter"], default="base"
    )
    b.add_argument(
        "--tables", default="",
        help="comma-separated subset of tables to build (default: all)",
    )
    r = sub.add_parser("run")
    r.add_argument("--base", default="/root/testdata/sf0.1")
    r.add_argument("--scaled", default="/tmp/scale_sf1")
    r.add_argument("--factor", type=int, default=10)
    r.add_argument("--repeats", type=int, default=2)
    r.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    c = sub.add_parser("build-clustered")
    c.add_argument("--dst", default="/tmp/clustered_embed")
    c.add_argument("--n", type=int, default=60_000)
    c.add_argument("--dims", type=int, default=64)
    c.add_argument("--clusters", type=int, default=0)
    c.add_argument("--sigma", type=float, default=0.25)
    c.add_argument("--seed", type=int, default=1234)
    rc = sub.add_parser("recall")
    rc.add_argument("--sf-dir", default="/tmp/clustered_embed")
    rc.add_argument("--k", type=int, default=20)
    rc.add_argument("--queries", type=int, default=24)
    rc.add_argument("--dims", type=int, default=64)
    rc.add_argument(
        "--methods", default="lsh,ivf,pq",
        help="comma set of lsh, ivf, ivfpq, tpq, tivfpq "
        "(pq = ivfpq+tpq+tivfpq) — stage long runs",
    )
    rc.add_argument("--max-iter", type=int, default=4)
    a = ap.parse_args()
    if a.cmd == "build":
        build(
            a.src, a.dst, a.factor, a.docs_mode, a.events_mode,
            [t for t in a.tables.split(",") if t] or None,
        )
    elif a.cmd == "build-clustered":
        build_clustered_embeddings(
            a.dst, a.n, a.dims, a.clusters or None, a.sigma, a.seed
        )
    elif a.cmd == "recall":
        recall_probe(a.sf_dir, a.k, a.queries, a.dims, a.methods, a.max_iter)
    else:
        run(a.base, a.scaled, a.factor, a.repeats, a.queries.split(","))


if __name__ == "__main__":
    main()
