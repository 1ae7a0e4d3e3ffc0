"""Full-text retrieval scoring over the documents table — the search
side of a training-data platform (find contaminated/near-benchmark
docs, audit what a filter kept, build eval sets).

``bm25_topk`` is a BM25-shaped ranker made ENGINE-EXACT the same way
the rest of this repo's compared aggregates are: every rational in
the classical formula is cross-multiplied into integers and the one
non-rational piece — the idf log — is replaced by its exact rational
argument (a monotone-equivalent surrogate per term):

    idf_x1e6(t)  = (1e6 * (2N - 2 df + 1)) DIV (2 df + 1)
    tf_ppm(t, d) = (1e6 * 22 T tf) DIV (10 T tf + 3 T + 9 dl N)

with k1 = 6/5 and b = 3/4 folded into the integer constants
(multiply numerator and denominator of the classical
tf (k1+1) / (tf + k1 (1 - b + b dl/avgdl)) through by 10 T, where
T = total corpus tokens and avgdl = T/N). The per-(query-term, doc)
score is (idf_x1e6 * tf_ppm) DIV 1e6 — the product is widened to
DECIMAL(38,0) first (the int64-overflow lesson of SCALE.md
pitfall 9) — and a document's score is the integer sum over query
terms. Deterministic ties break to the smaller doc id.

Scale shape: the posting scan filters the exploded tokens to the
query terms BEFORE any shuffle (predicate on a generated column —
only matching tokens survive the map side), document lengths are one
cheap projection, and the corpus-level (N, T, df) statistics are
broadcast scalars. Top-k uses the same two-stage reducer as the ANN
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under the exact-
    integer BM25 surrogate. Returns (doc_id, n_hit_terms, score)
    ordered by score desc, id asc."""
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = sorted({t.lower() for t in terms})
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "tok"
        ),
    )
    dl = df.select(
        F.col(id_col),
        F.size(tokens(F.coalesce(F.col(text_col), F.lit("")))).cast(
            "long"
        ).alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("t_tokens")
    )
    postings = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df_t")
    )
    scored = (
        postings.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.expr(
                "CAST((1000000 * (2 * n_docs - 2 * df_t + 1)) "
                "DIV (2 * df_t + 1) AS BIGINT)"
            ).alias("idf_x1e6"),
            # widened to DECIMAL(38,0): 1e6 * 22 * T * tf passes
            # int64 around T ~ 4e11 corpus tokens (pitfall 9)
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * 22 * t_tokens "
                "* tf) DIV (CAST(10 AS DECIMAL(38,0)) * t_tokens * tf "
                "+ 3 * t_tokens + 9 * dl * n_docs) AS BIGINT)"
            ).alias("tf_ppm"),
        )
        .select(
            id_col,
            F.expr(
                "CAST((CAST(idf_x1e6 AS DECIMAL(38,0)) * tf_ppm) "
                "DIV 1000000 AS BIGINT)"
            ).alias("term_score"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        F.sum("term_score").alias("score"),
    )
    return agg.orderBy(
        F.desc("score"), F.asc(id_col)
    ).limit(k)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    scale: int = 1_000_000,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009) — the
    standard hybrid-retrieval combiner for a lexical (BM25) and a
    dense (embedding-cosine) ranker: fused score = sum over rankers
    of 1/(k + rank), here as the exact integer ``scale DIV
    (k_rrf + rank)`` so the fusion hash-gates cross-engine (the
    floor preserves RRF's ordering semantics whenever score gaps
    exceed 1/scale — with scale 1e6 and k 60 adjacent-rank
    contributions differ by >= ~260 ppm, far above the floor's
    1-ppm quantization).

    Each input frame contributes (id, rank) with rank 1-based;
    ranker list sizes are the caller's top-k cutoffs (constant), so
    the union and the fused aggregation touch only |rankers| x k
    rows — the corpus-scale work lives in the rankers themselves.
    Ties: fused score desc, more lists hit, then smaller id."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    contrib = F.expr(
        f"CAST({int(scale)} DIV ({int(k_rrf)} + {rank_col}) AS BIGINT)"
    )
    parts = [
        r.select(F.col(id_col), contrib.alias("__c")) for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.sum("__c").alias("rrf_x1e6"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("rrf_x1e6"), F.desc("n_lists"), F.asc(id_col))
        .limit(int(top_k))
    )
