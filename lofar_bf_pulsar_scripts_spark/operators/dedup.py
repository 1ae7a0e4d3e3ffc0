"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard (BASELINE.json north star — training-data pipeline dedup at
100 TB).

Scale design:
* Signatures are computed with ARRAY expressions (transform/array_min)
  — per-row, JVM-side, no explode, no shuffle. A 100 TB corpus streams
  through as a scan+project.
* LSH banding turns near-dup search into an equi-join on
  (band, bucket): shuffle keys are bucket hashes, so skew only occurs
  for genuinely hot buckets (handled by AQE skew-join).
* Candidate verification (true Jaccard) touches only the candidate
  pairs, never the full cross product.

The min-over-md5-hex trick: md5 hex strings compare lexicographically
uniformly, so ``min(md5(seed || shingle))`` is a valid minwise hash
family member per seed — and is bit-identical across engines (used by
the DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import tokens, word_shingles


def shingle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(id, shingle) rows: explode of the bound-lambda shingle array.

    History (r14 optimization): this was a posexplode + lead-window
    form, justified by the OLD word_shingles re-running the tokenizer
    regex inside every lambda element — but word_shingles has since
    bound the token array once via the nested-lambda trick (its
    docstring / SCALE.md pitfall 1), so that justification was stale.
    The window form shuffled the ENTIRE token stream (partitionBy id +
    sort, no map-side combine possible) before any downstream
    aggregation; the array form is a pure scan+explode — zero
    shuffle — so e.g. minhash_signature's groupBy(id) now map-side-
    combines token rows down to one partial row per doc per task
    before its only exchange (guide §2.3 "aggregate before you
    shuffle").  Same (id, shingle) multiset: identical tokenizer,
    positions 1..n-k+1 in document order, duplicates preserved
    (consumers are min-aggregates / distinct / count_distinct, but
    the multiset contract is kept anyway).  Measured sf0.1 A/B
    (min-of-6 / min-of-4 per query, same session methodology):
    dup_clusters 2.26 -> 1.52 s, near_dedup_pipeline 3.16 -> 2.03 s,
    training_data_pipeline 9.93 -> 8.69 s, quality_dedup_keep
    2.81 -> 2.26 s, delete_closure_ids 3.07 -> 2.80 s."""
    # NOTE (r15): a spread_small_scan of the text projection here was
    # A/B-measured and REJECTED — consumers scan shingles several
    # times per pipeline and each scan then pays the round-robin
    # exchange, which costs more than the parallelism buys at this
    # tokenization weight (near_dedup_pipeline 2.54 -> 2.84 s,
    # contamination_screen 1.30 -> 1.46 s; only the single-scan
    # lsh_bucket_sizes won).  The pure scan+explode stays.
    return df.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, k)).alias("shingle"),
    )


def exact_duplicate_groups(
    df: DataFrame, cols: list[str], id_col: str
) -> DataFrame:
    """Exact dedup (A10 analog at corpus scale): hash-groupBy on the
    content columns; returns one row per duplicate group with count
    and the minimum id (the canonical survivor).

    NULLs are encoded with an explicit marker before concatenation —
    concat_ws silently skips NULLs, which would make (x, NULL) and
    (NULL, x) collide."""
    key = F.md5(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>")) for c in cols],
        ).cast("binary")
    )
    return (
        df.groupBy(key.alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(F.col(id_col)).alias("keep_id"),
        )
    )


# Universal-hash MinHash family: h_i(x) = (A[i]*x + B[i]) mod P over a
# 28-bit base hash x decoded from the shingle's md5. P = 2^31 - 1
# (Mersenne prime); A[i] < 2^31 and x < 2^28 keep A*x within int64.
# Constants are arbitrary fixed odd values (deterministic across
# engines — the DuckDB oracle reuses them via these lists).
MINHASH_P = 2_147_483_647
MINHASH_A = [
    1_322_178_731, 961_748_941, 787_222_311, 1_529_686_693,
    649_702_411, 1_073_807_359, 297_779_861, 1_928_455_033,
    413_158_511, 1_695_978_839, 533_000_401, 1_190_494_759,
    877_905_481, 1_462_654_261, 722_398_111, 2_009_742_139,
]
MINHASH_B = [
    908_319_117, 1_335_793_261, 551_654_431, 199_021_387,
    1_827_719_183, 1_003_026_329, 1_716_132_797, 404_536_039,
    622_960_259, 133_292_221, 1_916_186_239, 759_155_483,
    1_482_404_453, 318_034_883, 1_118_923_471, 2_085_853_741,
]
_HEXMAP = "0123456789abcdef"


def _md5_int28(col: Column) -> Column:
    """28-bit integer hash: first 7 hex nibbles of md5, decoded with
    strpos (portable to DuckDB — no conv() there)."""
    h = F.md5(col.cast("binary"))
    out = F.lit(0).cast("bigint")
    for p in range(1, 8):
        nib = F.instr(F.lit(_HEXMAP), F.substring(h, p, 1)) - 1
        out = out * 16 + nib
    return out


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
    sig_col: str = "minhash",
) -> DataFrame:
    """Append an ARRAY<BIGINT> MinHash signature. NULL entries when
    the doc has < shingle_k tokens.

    Implementation notes (measured, see git history):
    * explode + min-aggregate, NOT per-row array expressions —
      Catalyst inlines deterministic projections into every consumer
      (CollapseProject), so an array-expression signature gets
      recomputed once per downstream reference (50x slowdown).
    * ONE md5 per shingle + integer universal hashing per seed — an
      md5-per-seed variant forces string min aggregates (interpreted
      SortAggregate); integer mins stay in codegen'd HashAggregate
      (~10x faster) and map-side combine to num_hashes values per doc.
    """
    if num_hashes > len(MINHASH_A):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the {len(MINHASH_A)} fixed "
            "universal-hash parameter pairs (extend MINHASH_A/MINHASH_B "
            "with odd constants < MINHASH_P to go wider)"
        )
    exploded = shingle_rows(df, id_col, text_col, shingle_k).withColumn(
        "__x", _md5_int28(F.col("shingle"))
    )
    aggs = [
        F.min(
            (F.lit(MINHASH_A[i]) * F.col("__x") + F.lit(MINHASH_B[i]))
            % F.lit(MINHASH_P)
        ).alias(f"__sig_{i}")
        for i in range(num_hashes)
    ]
    sigs = (
        exploded.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"__sig_{i}") for i in range(num_hashes)]).alias(sig_col),
        )
    )
    return df.join(sigs, on=id_col, how="left")


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Explode a signature into (id, band, bucket) rows; bucket =
    the band's signature slice. Join-ready for candidate generation.

    Docs with NULL signatures (fewer than shingle_k tokens) are
    excluded — otherwise they would all share one empty bucket and
    produce O(n^2) false candidate pairs."""
    df = df.filter(F.element_at(F.col(sig_col), 1).isNotNull())
    per_band = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|",
                *[
                    F.element_at(F.col(sig_col), b * rows_per_band + r + 1).cast(
                        "string"
                    )
                    for r in range(rows_per_band)
                ],
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return df.select(
        F.col(id_col), F.explode(F.array(*per_band)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def candidate_pairs(buckets: DataFrame, id_col: str) -> DataFrame:
    """Distinct id pairs sharing any (band, bucket). Equi-join on the
    bucket key — the only shuffle in the whole near-dup pipeline."""
    a = buckets.select(
        F.col(id_col).alias("id_a"), "band", "bucket"
    )
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def contamination_counts(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Benchmark-contamination screen: per corpus document, how many of
    its DISTINCT k-gram shingles also occur anywhere in ``benchmark``
    (the eval/held-out set a training corpus must not leak).

    Scale shape: the benchmark's distinct shingle set is broadcast
    (benchmarks are small by definition), so the corpus side is a
    map-side left join + one per-doc aggregation — the 100 TB corpus
    is shuffled only on ``id_col`` for the final count, and map-side
    combine collapses it first. Returns (id, n_shingles, n_hit), all
    exact integers.
    """
    corp = shingle_rows(corpus, id_col, text_col, k)
    bench = (
        shingle_rows(benchmark, id_col, text_col, k)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = corp.join(F.broadcast(bench), on="shingle", how="left")
    return joined.groupBy(id_col).agg(
        F.count_distinct("shingle").alias("n_shingles"),
        F.count_distinct(
            F.when(F.col("__hit") == 1, F.col("shingle"))
        ).alias("n_hit"),
    )


def ngram_jaccard(
    text_a: str = "text_a",
    text_b: str = "text_b",
    shingle_k: int = 3,
) -> Column:
    """Column expression: true n-gram Jaccard between two text columns
    of an already-joined pair frame (distinct shingle sets)."""
    sa = F.array_distinct(word_shingles(text_a, shingle_k))
    sb = F.array_distinct(word_shingles(text_b, shingle_k))
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(sa) + F.size(sb) - inter
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def simhash16_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "simhash",
) -> DataFrame:
    """Explode-based SimHash (scale path): one md5 per token, 16
    sign-vote aggregates per doc, map-side combinable. Prefer this
    over the ``simhash16`` column expression for pipelines — the
    column form's 16 aggregate() references each recompute the token
    hash array (CollapseProject inlining)."""
    toks = tokens(text_col)
    hexmap = "0123456789abcdef"
    h = F.md5(F.col("__tok").cast("binary"))
    nib = lambda p: F.instr(F.lit(hexmap), F.substring(h, p, 1)) - 1
    hv = nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
    exploded = df.select(F.col(id_col), F.explode(toks).alias("__tok")).withColumn(
        "__hv", hv
    )
    votes = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("__hv").bitwiseAND(F.lit(1 << i)) > 0, 1).otherwise(-1)
            ).alias(f"__v{i}")
            for i in range(16)
        ]
    )
    out = F.lit(0)
    for i in range(16):
        out = out + F.when(F.col(f"__v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return votes.select(F.col(id_col), out.cast("int").alias(out_col))


def simhash16(col: Column | str) -> Column:
    """16-bit SimHash over whitespace tokens.

    Per token, a 16-bit hash from the first 4 md5 hex nibbles (decoded
    via strpos — portable across engines); per bit, sign-vote summed
    over all tokens (+1/-1); bit set iff vote > 0. Pure array
    expressions — no explode, no shuffle.
    """
    toks = tokens(col)
    hexmap = "0123456789abcdef"

    def tok_hash(t: Column) -> Column:
        h = F.md5(t.cast("binary"))
        nib = lambda p: F.instr(F.lit(hexmap), F.substring(h, p, 1)) - 1
        return nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)

    hashes = F.transform(toks, tok_hash)

    # two-parameter merge lambda only — capture the bit mask by closure
    def vote_merge(mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) > 0, 1
        ).otherwise(-1)

    bits = []
    for i in range(16):
        vote = F.aggregate(hashes, F.lit(0), vote_merge(1 << i))
        bits.append(F.when(vote > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


# --- Bloom-filter pre-screen for incremental dedup --------------------
#
# Two-tier incremental dedup at corpus scale: joining every new batch
# against the FULL historical fingerprint store (incremental_dedup)
# shuffles |history| per batch; a Bloom pre-screen reduces that to the
# positives only (definite-new rows never touch the store). Spark's
# built-in BloomFilter (df.stat.bloomFilter / runtime might_contain)
# is a driver-side object the column API cannot probe without a Python
# UDF, so this is a COLUMN-ALGEBRA Bloom: the bitmap is built with one
# distinct + one bit_or aggregation, shipped as a single broadcast
# map<word, bits32> row, and probed with k element_at + bit tests in
# whole-stage codegen. Positions are md5-derived (engine-portable),
# so the filter — an approximate structure — is BIT-REPRODUCIBLE in
# any engine: DuckDB expresses the identical membership as a k-way
# position semi-join, which is what lets the driver hash-gate it.

BLOOM_SALTS = ("b0", "b1", "b2", "b3")

def _bit_masks() -> Column:
    """32-entry literal array of bit masks: shiftleft()'s bit count
    must be a Python int in the column API, so the per-position mask
    is an element_at lookup instead (built lazily — F.lit needs an
    active session)."""
    return F.array(*[F.lit(1 << i).cast("long") for i in range(32)])


def bloom_positions(fp: Column, m_bits: int) -> Column:
    """k deterministic bit positions for a fingerprint string —
    md5(fp || ':salt') mod m, identical in Spark and DuckDB.

    The position hash has 28 bits of entropy (_md5_int28), so m_bits
    above 2^28 would leave bits >= 2^28 permanently unset and the
    documented (1-e^{-kn/m})^k false-positive rate would silently
    degrade; sizing at ~10 bits/fingerprint that ceiling arrives near
    n = 2.7e7 history rows. Refuse rather than mislead — callers
    needing a bigger filter should shard history (one filter per
    fp-prefix shard keeps each m under the ceiling)."""
    if m_bits > (1 << 28):
        raise ValueError(
            f"m_bits={m_bits} exceeds the 2^28 position-hash range; "
            "shard the history (one Bloom per fp prefix) instead"
        )
    return F.array(
        *[
            F.pmod(
                _md5_int28(F.concat_ws(":", fp, F.lit(s))),
                F.lit(int(m_bits)),
            )
            for s in BLOOM_SALTS
        ]
    )


def bloom_build(
    history: DataFrame, fp_col: str = "fp", m_bits: int = 1 << 20
) -> DataFrame:
    """One-row DataFrame carrying the Bloom bitmap as map<word_idx,
    bits> of 32-bit words (32-bit so ``1 << (p % 32)`` stays positive
    int64 in every engine). Build cost: one explode (k rows per
    fingerprint), one distinct, one bit_or aggregation — never more
    than k·|history| rows in flight, output ≤ m/32 map entries
    (~128 KB at m = 2^20)."""
    pos = history.select(
        F.explode(bloom_positions(F.col(fp_col), m_bits)).alias("p")
    ).distinct()
    words = pos.groupBy(
        (F.col("p") / F.lit(32)).cast("long").alias("w")
    ).agg(
        F.bit_or(
            F.element_at(_bit_masks(), F.pmod(F.col("p"), F.lit(32)).cast("int") + 1)
        ).alias("bits")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias(
            "bloom"
        )
    )


def bloom_screen(
    new: DataFrame,
    bloom_row: DataFrame,
    fp_col: str = "fp",
    m_bits: int = 1 << 20,
    out_col: str = "bloom_positive",
) -> DataFrame:
    """Append ``bloom_positive``: True iff every one of the row's k
    positions is set in the broadcast bitmap. No false negatives (an
    exact duplicate is always positive); false-positive rate is the
    standard (1 - e^{-kn/m})^k — at k=4, n=10^6, m=2^20 about 0.24,
    so size m ~ 10 bits per historical fingerprint in production.
    The probe is a pure projection: the new batch is never shuffled,
    the bitmap row is broadcast once."""
    bloom = F.col("__bloom")
    probe = F.forall(
        bloom_positions(F.col(fp_col), m_bits),
        lambda p: (
            F.coalesce(
                F.element_at(bloom, (p / F.lit(32)).cast("long")),
                F.lit(0).cast("long"),
            ).bitwiseAND(
                F.element_at(_bit_masks(), F.pmod(p, F.lit(32)).cast("int") + 1)
            )
            != 0
        ),
    )
    return (
        new.crossJoin(
            F.broadcast(bloom_row.select(F.col("bloom").alias("__bloom")))
        )
        .withColumn(out_col, probe)
        .drop("__bloom")
    )


# --- end-to-end near-dup removal pipeline -----------------------------

def verified_near_dup_edges(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    tau_num: int = 7,
    tau_den: int = 10,
) -> DataFrame:
    """LSH candidate pairs VERIFIED by exact n-gram Jaccard — the
    false-positive filter a production dedup runs between candidate
    generation and clustering (a banded pair can share one lucky
    bucket at Jaccard far below threshold).  Keeps (id_a, id_b) iff
    the true shingle-set Jaccard >= tau_num/tau_den, decided by the
    exact integer cross-multiplication tau_den * |inter| >=
    tau_num * |union| (no float threshold, engine-portable).  Pairs
    where either side has an empty shingle set never verify (union
    undefined; LSH already excludes NULL-signature docs).

    Scale shape: |pairs| is bucket-bounded (never n^2); the
    verification joins move each candidate pair's two shingle SETS —
    per-pair work proportional to document length, never corpus-
    crossing. One extra shuffle pair vs the unverified pipeline."""
    sigs = minhash_signature(
        docs, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, shingle_k=shingle_k,
    )
    pairs = candidate_pairs(
        lsh_buckets(sigs, id_col=id_col, bands=bands,
                    rows_per_band=rows_per_band),
        id_col,
    )
    shd = shingle_rows(docs, id_col, text_col, shingle_k).distinct()
    sizes = shd.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    inter = (
        pairs.join(
            shd.select(F.col(id_col).alias("id_a"), "shingle"), "id_a"
        )
        .join(
            shd.select(F.col(id_col).alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    union = F.col("__na") + F.col("__nb") - F.col("__i")
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("__i", F.coalesce("__i", F.lit(0)))
        .filter(
            (union > 0)
            & (F.lit(int(tau_den)) * F.col("__i") >= F.lit(int(tau_num)) * union)
        )
        .select("id_a", "id_b")
    )


def near_dedup_stats(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    **edge_kwargs,
) -> DataFrame:
    """The WHOLE near-dup removal pipeline as one plan (minhash ->
    LSH bands -> candidate pairs -> exact-Jaccard verify ->
    connected components -> keep the min-id representative of every
    cluster), reported per ``group_col``: (group, n_docs, n_dropped,
    n_kept, sum_dropped_ids).  sum_dropped_ids pins the dropped SET.

    The companion of the stage gates (minhash_signatures,
    lsh_bucket_sizes, dup_clusters): a user of the reference-style
    dedup runs this composition, not the stages."""
    from .pipeline import connected_components

    edges = verified_near_dup_edges(
        docs, id_col=id_col, text_col=text_col, **edge_kwargs
    )
    comps = connected_components(edges, src_col="id_a", dst_col="id_b")
    dropped = comps.filter(F.col("component") < F.col("node")).select(
        F.col("node").alias(id_col), F.lit(1).alias("__drop")
    )
    return (
        docs.select(group_col, id_col)
        .join(dropped, id_col, "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("__drop", F.lit(0)).cast("long")).alias(
                "n_dropped"
            ),
            (
                F.count(F.lit(1))
                - F.sum(F.coalesce("__drop", F.lit(0)).cast("long"))
            ).alias("n_kept"),
            F.sum(
                F.when(F.col("__drop") == 1, F.col(id_col)).otherwise(0)
            ).alias("sum_dropped_ids"),
        )
    )


def incremental_near_dup(
    batch: DataFrame,
    corpus: DataFrame,
    band_store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    tau_num: int = 5,
    tau_den: int = 10,
) -> DataFrame:
    """Near-dup screen of a NEW batch against an already-ingested
    corpus — the shape a 100 TB training-data lake actually runs
    daily: the corpus's MinHash band keys live in an at-rest store
    (``lake.write_minhash_bands``, built once at ingest), so a batch
    probe never re-shingles or shuffles the corpus.

    Plan shape: the batch's band keys (a few rows per batch doc) are
    BROADCAST against one linear scan of the band store — the corpus
    side of the candidate join has no Exchange (plan-asserted).  The
    exact-Jaccard verification then touches only candidate corpus
    docs: a broadcast left-semi prunes the corpus text scan before
    any shingling.  Work = O(|store| + |batch| + |candidates| ·
    doc_len); the corpus never pays a shuffle and its text is read
    only for docs that already share a bucket with the batch.

    Returns one row per batch doc: (new_id, n_dups = verified
    near-dup count in the corpus, min_dup_id = smallest verified
    corpus id, -1 when none — the doc is novel).  Batch docs that are
    themselves stored (re-crawls) are matched by id inequality.
    Threshold is the exact integer cross-multiplication
    tau_den·|inter| >= tau_num·|union| (engine-portable, same as
    ``verified_near_dup_edges``)."""
    bsig = minhash_signature(
        batch, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, shingle_k=shingle_k,
    )
    bb = lsh_buckets(
        bsig, id_col=id_col, bands=bands, rows_per_band=rows_per_band
    ).select(F.col(id_col).alias("new_id"), "band", "bucket")
    cands = (
        band_store.join(F.broadcast(bb), on=["band", "bucket"])
        .filter(F.col(id_col) != F.col("new_id"))
        .select("new_id", F.col(id_col).alias("dup_id"))
        .distinct()
    )
    cand_docs = corpus.join(
        F.broadcast(
            cands.select(F.col("dup_id").alias(id_col)).distinct()
        ),
        on=id_col,
        how="leftsemi",
    )
    shd_b = (
        shingle_rows(batch, id_col, text_col, shingle_k)
        .distinct()
        .select(F.col(id_col).alias("new_id"), "shingle")
    )
    shd_c = (
        shingle_rows(cand_docs, id_col, text_col, shingle_k)
        .distinct()
        .select(F.col(id_col).alias("dup_id"), "shingle")
    )
    nb = shd_b.groupBy("new_id").agg(F.count(F.lit(1)).alias("__nb"))
    nc = shd_c.groupBy("dup_id").agg(F.count(F.lit(1)).alias("__nc"))
    inter = (
        cands.join(shd_b, "new_id")
        .join(shd_c, ["dup_id", "shingle"])
        .groupBy("new_id", "dup_id")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    union = F.col("__nb") + F.col("__nc") - F.col("__i")
    verified = (
        cands.join(inter, ["new_id", "dup_id"], "left")
        .join(nb, "new_id")
        .join(nc, "dup_id")
        .withColumn("__i", F.coalesce("__i", F.lit(0)))
        .filter(
            (union > 0)
            & (F.lit(int(tau_den)) * F.col("__i")
               >= F.lit(int(tau_num)) * union)
        )
        .groupBy("new_id")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("dup_id").alias("min_dup_id"),
        )
    )
    return (
        batch.select(F.col(id_col).alias("new_id"))
        .join(verified, "new_id", "left")
        .select(
            "new_id",
            F.coalesce("n_dups", F.lit(0)).cast("long").alias("n_dups"),
            F.coalesce("min_dup_id", F.lit(-1)).cast("long").alias(
                "min_dup_id"
            ),
        )
    )


def span_dedup_stats(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring (positional span) dedup statistics — the
    suffix-array dedup of Lee et al., "Deduplicating Training Data
    Makes Language Models Better" (2022), re-expressed over word
    k-gram spans: a span is *duplicated* iff its exact token sequence
    occurs in at least one OTHER document, and a document's dup
    fraction is the share of its overlapping k-gram start positions
    that are duplicated.  (The chunk_dedup/boilerplate family dedups
    disjoint chunks and frequent lines; this is the positional
    overlapping-window variant that catches shared substrings at ANY
    alignment.)

    Shuffle story (VERDICT r8 item 4 — the r8 shape shuffled the span
    STRING twice and fanned the full positional frame back through a
    span-keyed join, measured exp 0.96 at 10x on the
    realistic-density corpus):

    1. spans are reduced to a 128-bit hash pair (two independent
       xxhash64 seeds) BEFORE any exchange — 16 bytes per key instead
       of a ~60-byte 8-word string (collision odds at 2^-128 are
       ~1e-23 for a 10^9-span corpus, far below the gate's noise
       floor);
    2. one exchange on (h1, h2, doc) with map-side combine collapses
       positional repeats to per-(doc, span) multiplicities ``m`` —
       the only corpus-sized shuffle, and it carries 3 longs + a
       count;
    3. cross-document frequency is a count window over that COLLAPSED
       frame (no second corpus-sized frame, no fan-back join of the
       positional explode);
    4. only spans with n_docs >= 2 — the genuinely duplicated ones —
       survive into the per-doc aggregation, so the last exchange is
       proportional to the duplicate mass, not the corpus (the
       "only plausibly-duplicated spans shuffle" stage).

    n_spans needs no explode at all: it is max(n_tokens - k + 1, 0)
    straight off the tokenizer, joined back on the doc id.

    Returns per document: (doc_id, n_spans, n_dup_spans,
    dup_fraction) with n_spans = max(n_tokens - k + 1, 0); documents
    shorter than k tokens report zeros.
    """
    from pyspark.sql import Window

    # per-doc span count without materializing shingles: matches
    # size(word_shingles) exactly (NULL text -> NULL/-1 size -> 0)
    n_tok = F.size(tokens(text_col))
    base = df.select(
        F.col(id_col),
        F.greatest(
            F.coalesce(n_tok, F.lit(0)) - F.lit(k - 1), F.lit(0)
        ).cast("long").alias("n_spans"),
    )
    spans = df.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, k=k)).alias("span"),
    ).select(
        id_col,
        F.xxhash64("span").alias("h1"),
        F.xxhash64(F.lit("span_dedup_2"), F.col("span")).alias("h2"),
    )
    per_doc_span = spans.groupBy("h1", "h2", id_col).agg(
        F.count(F.lit(1)).alias("m")
    )
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("h1", "h2"))
    dup = (
        per_doc_span.withColumn("n_docs", n_docs)
        .filter(F.col("n_docs") >= 2)
        .groupBy(id_col)
        .agg(F.sum("m").alias("n_dup_spans"))
    )
    return base.join(dup, id_col, "left").select(
        id_col,
        "n_spans",
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias(
            "n_dup_spans"
        ),
        F.when(
            F.col("n_spans") > 0,
            F.round(
                F.coalesce("n_dup_spans", F.lit(0)).cast("double")
                / F.col("n_spans"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("dup_fraction"),
    )


def representative_map(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-based representative selection for duplicate clusters:
    given (node, component) rows (pipeline.connected_components over
    near-dup edges) and a per-document score, return
    (doc_id, kept_id) for EVERY clustered doc — kept_id is its
    cluster's highest-score member, ties to the smallest id.  Losers
    are the rows with doc_id != kept_id; anti-join them to dedup
    (dedup_keep_best below).

    Production dedup keeps the BEST copy, not an arbitrary one: the
    min-id representative the transitive-closure label gives you is
    deterministic but quality-blind — with near (not exact)
    duplicates, the copies genuinely differ (one is truncated, one
    boilerplate-wrapped), and dropping the clean copy to keep the
    mangled one loses training signal.

    Scale shape: the window ranks within components —
    cluster-membership-sized input (≪ corpus; only clustered docs
    join in) on a HIGH-cardinality key, so the sort parallelism is
    the component count, not a task ceiling (no rule-13 violation);
    the score join is id-equi and the output is membership-sized."""
    m = components.join(
        scores.select(
            F.col(id_col).alias("node"), F.col(score_col).alias("__s")
        ),
        "node",
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("__s"), F.asc("node")
    )
    best = (
        m.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("component", F.col("node").alias("kept_id"))
    )
    return m.join(best, "component").select(
        F.col("node").alias(id_col), "kept_id"
    )


def dedup_keep_best(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Drop every dup-cluster member except its best-score
    representative (representative_map above); unclustered docs pass
    through untouched.  The anti-join ships the loser id set — dup
    losers only, membership-bounded."""
    losers = representative_map(
        components, docs.select(id_col, score_col),
        id_col=id_col, score_col=score_col,
    ).filter(F.col(id_col) != F.col("kept_id")).select(id_col)
    return docs.join(losers, id_col, "left_anti")
