"""End-to-end training-data preparation pipeline: the composition a
100 TB corpus actually runs before a token ever reaches a trainer.

    quality filter (Gopher battery)
      -> near-dup removal (MinHash/LSH candidates, exact-Jaccard
         verify, connected components, min-id representative kept)
        -> benchmark-contamination screen (k-gram overlap vs the
           held-out eval set)
          -> tokenize (committed BPE merge table)
            -> per-source FFD context-window packing

Every stage reuses the oracle-gated operator it names (gopher_rules,
near_dedup_pipeline, contamination_screen, bpe_apply_counts,
sequence_packing); this plan is the one-DataFrame composition, the
LLM-data dual of ``plans/search.blind_search_summary`` (which chains
the pulsar side the same way — reference analog: the end-to-end
script pipelines SURVEY §7 catalogs).

Scale shape: quality is a pure scan; dedup work is candidate-bounded
(never N^2); the contamination benchmark is broadcast; BPE pays the
vocabulary, documents pay one multiplicity join; packing shuffles
once on the pack group key.  No stage collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def training_data_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    bench_mod: int = 97,
    tau_num: int = 5,
    tau_den: int = 10,
    max_tokens: int = 1024,
    pack_bound: int = 300,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    quality_rules: tuple[str, ...] = (
        "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_alpha_words", "r_stopwords", "r_bullet_lines",
        "r_ellipsis_lines",
    ),
) -> DataFrame:
    """Per-source funnel of the whole pipeline: one row per source
    with (n_input, n_fail_quality, n_dup_dropped, n_contaminated,
    n_kept, bpe_tokens, packed_docs, packed_tokens, n_packs).

    Docs with ``id % bench_mod == 0`` are the held-out benchmark set
    (the contamination_screen convention) and never enter the corpus.
    Packing covers kept docs under ``pack_bound`` — the same
    FFD-recursion bound the sequence_packing oracle documents — and
    packs PER SOURCE (a context window never mixes provenances).

    ``quality_rules`` selects which Gopher flags gate a doc (a real
    pipeline tunes the battery to its corpus; e.g. the stopword rule
    assumes English prose and rejects 100% of a non-prose corpus, so
    callers screening code or tables drop it).
    """
    from ..operators.bpe import apply_bpe_merges
    from ..operators.dedup import (
        contamination_counts,
        verified_near_dup_edges,
    )
    from ..operators.pipeline import connected_components, pack_sequences
    from ..operators.text import gopher_quality_flags

    did = F.col(id_col)
    corpus = docs.filter(F.pmod(did, F.lit(bench_mod)) != 0).select(
        id_col, group_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
    bench = docs.filter(F.pmod(did, F.lit(bench_mod)) == 0).select(
        id_col, text_col
    )

    # The quality stage is a pure per-row projection, so the corpus
    # filters on it INLINE (keep_text=True) — the old form semi-joined
    # corpus back to a pass_ids projection on id, which paid one extra
    # gopher regex scan plus a join in EVERY consumer of `passing`
    # (edge chain, contamination chain, BPE chain) and again in the
    # flagged funnel join (r14 optimization; measured same-session A/B
    # at sf0.1: 14.6 -> 8.9 s min-of-5 on a noisy host — ratio 0.61)
    flags = gopher_quality_flags(
        corpus, id_col=id_col, text_col=text_col, keep_text=True
    )
    passes = None
    for r in quality_rules:
        passes = F.col(r) if passes is None else (passes & F.col(r))
    passing = flags.filter(passes).select(id_col, group_col, text_col)

    edges = verified_near_dup_edges(
        passing, id_col=id_col, text_col=text_col,
        tau_num=tau_num, tau_den=tau_den,
    )
    comps = connected_components(edges, src_col="id_a", dst_col="id_b")
    # the drop/flag sets are tiny (ids only, bounded by dup + contam
    # density) but their lineage is the LSH-verify / shingle-join
    # chain; SIX downstream aggregates consume them, so materialize
    # once — at 100 TB these stay driver-safe while the corpus-sized
    # frames (passing, kept) are recomputed as pure scans
    dup_dropped = (
        comps.filter(F.col("component") < F.col("node"))
        .select(F.col("node").alias(id_col))
        .localCheckpoint(eager=True)
    )
    survivors = passing.join(dup_dropped, id_col, "left_anti")

    cont = contamination_counts(survivors, bench, id_col=id_col,
                                text_col=text_col)
    contaminated = (
        cont.filter(F.lit(2) * F.col("n_hit") > F.col("n_shingles"))
        .select(id_col)
        .localCheckpoint(eager=True)
    )
    kept = survivors.join(contaminated, id_col, "left_anti")

    bpe = apply_bpe_merges(kept, merges, id_col=id_col,
                           text_col=text_col).select(
        id_col, F.col("n_bpe_tokens").alias("__bpe")
    )
    kept_bpe = kept.select(id_col, group_col).join(bpe, id_col)

    packs = pack_sequences(
        kept_bpe.filter(did < pack_bound).select(
            id_col, group_col, F.col("__bpe").alias("n_tokens")
        ),
        max_tokens=max_tokens,
        bucket_col=group_col,
    )

    # One flagged pass over the corpus instead of one aggregate per
    # stage (which re-ran the gopher scan and the anti-join chains
    # once per count — measured ~8 s at sf0.1, ~5 s of it repeats):
    # every stage outcome becomes a flag column on the corpus row,
    # then a single groupBy folds the whole funnel.  dup_dropped /
    # contaminated are the checkpointed tiny sets; the flag
    # conjunctions reproduce the stage nesting (dup only counts among
    # quality-passers, contamination only among dedup survivors).
    flagged = (
        flags.select(id_col, group_col, passes.alias("__q"))
        .join(dup_dropped.withColumn("__d", F.lit(1)), id_col, "left")
        .join(contaminated.withColumn("__c", F.lit(1)), id_col, "left")
        .join(bpe, id_col, "left")
    )
    is_kept = (
        F.col("__q")
        & F.col("__d").isNull()
        & F.col("__c").isNull()
    )
    one = F.lit(1)
    stats = flagged.groupBy(group_col).agg(
        F.count(one).cast("long").alias("n_input"),
        F.sum(F.when(~F.col("__q"), one).otherwise(0))
        .cast("long").alias("n_fail_quality"),
        F.sum(F.when(F.col("__d").isNotNull(), one).otherwise(0))
        .cast("long").alias("n_dup_dropped"),
        F.sum(F.when(F.col("__c").isNotNull(), one).otherwise(0))
        .cast("long").alias("n_contaminated"),
        F.sum(is_kept.cast("long")).cast("long").alias("n_kept"),
        F.sum(F.when(is_kept, F.col("__bpe")).otherwise(0))
        .cast("long").alias("bpe_tokens"),
    )
    pack_stats = packs.groupBy(group_col).agg(
        F.count(one).alias("packed_docs"),
        F.sum("n_tokens").cast("long").alias("packed_tokens"),
        F.count_distinct("pack_id").alias("n_packs"),
    )
    out = stats.join(pack_stats, group_col, "left")
    return out.select(
        group_col,
        "n_input", "n_fail_quality", "n_dup_dropped", "n_contaminated",
        "n_kept", "bpe_tokens",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("packed_docs", "packed_tokens", "n_packs")
        ],
    )
