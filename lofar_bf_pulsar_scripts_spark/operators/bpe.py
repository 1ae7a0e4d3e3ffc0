"""Distributed byte-pair-encoding merge training (Sennrich et al.
2016, the tokenizer-training core of every LLM data pipeline).

Classic BPE trains on the WORD-TYPE table, not the corpus: one
corpus-wide aggregation collapses 100 TB of text to its vocabulary of
distinct words with frequencies (Zipf-bounded, map-side combined),
and every subsequent merge iteration touches only that table. Each
iteration is:

  1. adjacent-symbol pair counts, frequency-weighted   (one shuffle
     over pair keys — the table is word types, not documents)
  2. argmax pair with a deterministic tie-break (count desc, pair
     asc) — a 1-row collect
  3. greedy left-to-right merge of that pair in every word's symbol
     array — a pure projection (``F.aggregate`` fold, no UDF)

The driver loop is inherent to BPE (merge i+1's counts depend on
merge i having been applied — the same sequential-by-nature shape as
the reference's W10 scheduler); everything inside an iteration is
distributed. Lineage is truncated with ``localCheckpoint`` every few
iterations so n_merges doesn't stack n plans.

``learn_bpe_merges_local`` is the pure-Python reference
implementation the Spark path is parity-tested against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens

_CHECKPOINT_EVERY = 4


def word_types(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) vocabulary of the corpus — the BPE training set.
    One explode + one hash agg; at 100 TB the output is bounded by
    the language's vocabulary, not the corpus."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars(word: Column) -> Column:
    """Split a word into single-character symbols."""
    return F.filter(F.split(word, ""), lambda s: s != "")


def pair_counts(syms_df: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over (syms, freq) rows.
    Pairs are (left, right) symbol structs; one shuffle with map-side
    combine."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("a"),
                F.element_at(F.col("syms"), i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        syms_df.select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p")
        .agg(F.sum("freq").alias("cnt"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
    )


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b — the
    standard BPE application order ('aaa' with pair (a,a) becomes
    ['aa','a']). An ``F.aggregate`` fold: merged symbols become the
    accumulator's tail, so an element just consumed cannot be reused
    as the left side of another merge."""
    merged = a + b

    def step(acc: Column, x: Column) -> Column:
        can = (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b)
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    driver_vocab_limit: int = 1_000_000,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list and the final (word, freq, syms) segmentation
    table. Ties break deterministically (count desc, then (a, b)
    lexicographic) so the result is partition-invariant.

    DISPATCH (round-12 VERDICT item 5): the corpus-scale work of BPE
    is the ONE word_types aggregation — the training table it yields
    is vocabulary-sized (Zipf-bounded, a few MB for natural
    language), so the standard route trains the merge loop ON THE
    DRIVER over the collected (word, freq) table: a 32k-merge vocab
    is 32k dict passes, not 32k Spark jobs.  The distributed
    per-merge loop (one pair-count shuffle + a 1-row collect per
    iteration) remains the fallback for the pathological case of a
    word-type table past ``driver_vocab_limit`` rows (byte-garbage
    corpora, no whitespace segmentation); both paths share the same
    tokenization (the table is computed by Spark either way) and the
    same tie-break, so they produce identical merges — parity is
    test-pinned (merges AND final segmentations).  Pass
    ``driver_vocab_limit=0`` to force the distributed loop.  Measured
    at the sf0.01 documents table, 24 merges, local[8]: 6.1 s
    dispatched vs 13.2 s distributed — ~0.29 s/merge of pure job
    overhead, which at a real 32k-merge vocab is ~2.6 HOURS of
    scheduling against seconds of driver dict work (SCALE.md wave
    17)."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    wt = word_types(df, text_col).localCheckpoint()
    if driver_vocab_limit:
        head = wt.take(driver_vocab_limit + 1)
        if len(head) <= driver_vocab_limit:
            freqs = {r["word"]: int(r["freq"]) for r in head}
            merges, segs = _local_merges_from_freqs(freqs, n_merges)
            syms_df = df.sparkSession.createDataFrame(
                [(w, freqs[w], segs[w]) for w in sorted(freqs)],
                "word string, freq long, syms array<string>",
            )
            return merges, syms_df
    syms_df = wt.select(
        "word", "freq", _chars(F.col("word")).alias("syms")
    )
    syms_df = syms_df.localCheckpoint()
    merges = []
    for it in range(n_merges):
        top = (
            pair_counts(syms_df)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        syms_df = syms_df.select(
            "word", "freq", _merge_pair(F.col("syms"), a, b).alias("syms")
        )
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            syms_df = syms_df.localCheckpoint()
    return merges, syms_df


def _local_merges_from_freqs(
    freqs: dict, n_merges: int
) -> tuple[list[tuple[str, str]], dict]:
    """Driver-side BPE merge loop over a (word -> freq) table —
    shared by learn_bpe_merges' dispatch path and the list-of-texts
    reference trainer.  Same tie-break as the distributed loop
    (count desc, (a, b) lexicographic).  Returns (merges, segs)."""
    segs = {w: list(w) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in segs.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            segs[w] = out
    return merges, segs


def learn_bpe_merges_local(
    corpus: list[str], n_merges: int
) -> list[tuple[str, str]]:
    """Pure-Python reference BPE trainer (same tokenization, same
    tie-break) for parity tests."""
    freqs: dict[str, int] = {}
    for text in corpus:
        for w in (text or "").strip().lower().split():
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    merges, _ = _local_merges_from_freqs(freqs, n_merges)
    return merges


def apply_bpe_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment a corpus with a learned merge list: per document,
    (doc_id, n_words, n_bpe_tokens) — the token-budget counter under
    the trained tokenizer.

    Scale shape: the merge application runs over the DISTINCT word
    table (vocabulary-bounded — the same collapse that makes training
    tractable), as one Arrow-batched mapInPandas whose inner loop is
    the reference apply; the corpus itself only pays a broadcast-ish
    join of its (doc, word) multiplicities against that segmented
    vocabulary. 100 TB of text never runs Python row-by-row — the
    vocabulary does."""
    import pandas as pd

    doc_words = (
        df.select(
            F.col(id_col),
            F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias(
                "word"
            ),
        )
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("mult"))
    )
    vocab = doc_words.select("word").distinct()

    def seg_len(batches):
        for pdf in batches:
            counts = []
            for w in pdf["word"]:
                syms = list(w)
                for a, b in merges:
                    out: list[str] = []
                    for x in syms:
                        if out and out[-1] == a and x == b:
                            out[-1] = a + b
                        else:
                            out.append(x)
                    syms = out
                counts.append(len(syms))
            yield pd.DataFrame({"word": pdf["word"], "n_sym": counts})

    segmented = vocab.mapInPandas(seg_len, "word string, n_sym int")
    counted = (
        doc_words.join(segmented, "word")
        .groupBy(id_col)
        .agg(
            F.sum("mult").alias("n_words"),
            F.sum(F.col("mult") * F.col("n_sym")).alias("n_bpe_tokens"),
        )
    )
    # empty/whitespace-only docs have no words and would vanish from
    # the inner pipeline — restore them as (id, 0, 0) so the token
    # budget covers the whole corpus (same id-universe left join as
    # remove_shared_chunks)
    ids = df.select(id_col).distinct()
    return ids.join(counted, on=id_col, how="left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens"),
    )
