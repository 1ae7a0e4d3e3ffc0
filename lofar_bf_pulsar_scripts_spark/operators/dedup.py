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

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens, word_shingles


def exact_duplicate_groups(
    df: DataFrame, cols: list[str], id_col: str
) -> DataFrame:
    """Exact dedup (A10 analog at corpus scale): hash-groupBy on the
    content columns; returns one row per duplicate group with count
    and the minimum id (the canonical survivor)."""
    key = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in cols]).cast("binary"))
    return (
        df.groupBy(key.alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(F.col(id_col)).alias("keep_id"),
        )
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 3,
    sig_col: str = "minhash",
) -> DataFrame:
    """Append an ARRAY<STRING> MinHash signature (md5-hex minima, one
    per seed). NULL entries when the doc has < shingle_k tokens."""
    sh = word_shingles(text_col, shingle_k)

    # NB: the lambda must take exactly ONE parameter — pyspark treats a
    # two-parameter lambda as (element, index).
    def seed_hash(i: int):
        prefix = f"{i}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s).cast("binary"))

    sigs = [F.array_min(F.transform(sh, seed_hash(i))) for i in range(num_hashes)]
    return df.withColumn(sig_col, F.array(*sigs))


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Explode a signature into (id, band, bucket) rows; bucket =
    md5 of the band's signature slice. Join-ready for candidate
    generation."""
    per_band = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(F.col(sig_col), b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                ).cast("binary")
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


def jaccard_pairs(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
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
