"""Text-analysis operators for large-scale training-data pipelines
(BASELINE.json north star: language-ID, quality scoring, token
counting, fingerprinting over the ``documents`` table).

Everything here is pure ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, no UDFs: at 100 TB these are scan+project
pipelines with zero shuffle (aggregations happen in the callers).

Tokenization rule (shared with the DuckDB oracles): lower, trim,
split on ``\\s+``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny marker-word inventories for the n-gram/stopword language
# heuristic; literal alternations keep Java-regex and RE2 semantics
# identical.
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|you|that)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein)\b",
    "es": r"\b(el|la|los|las|es|una|que)\b",
    "fr": r"\b(le|les|des|est|une|dans|que)\b",
    "zh": r"(的|是|了|在|我|不)",
}
_LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # deterministic tie-break

STOPWORD_RE = r"\b(the|a|an|and|or|of|to|in|is|it)\b"
PUNCT_CLASS = r"[.,;:!?]"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    training-data chunking primitive (context-window packing input).

    Chunk c starts at token ``c*stride`` (0-based) and spans
    ``min(chunk_tokens, n - start)`` tokens; with ``stride <
    chunk_tokens`` consecutive chunks overlap by ``chunk_tokens -
    stride`` tokens. Every document yields >= 1 chunk (an empty text
    is one empty chunk), and every token is covered.

    Returns (id, chunk_idx, chunk_start, chunk_len, chunk_md5,
    chunk_text). Scale shape: pure projection + generator explode
    (fan-out factor n/stride) — zero shuffle, whole-stage codegen;
    the md5 fingerprint feeds straight into the exact-dedup /
    contamination operators on chunk granularity.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        # the docstring's "every token is covered" guarantee would be
        # silently broken: tokens in (start+chunk_tokens, start+stride)
        # would belong to no chunk.
        raise ValueError(
            f"stride ({stride}) > chunk_tokens ({chunk_tokens}) leaves "
            "uncovered token gaps between chunks"
        )
    # NULL text behaves as empty text (one empty chunk): without the
    # coalesce, size(NULL)=-1 flows through greatest/least (which skip
    # NULLs) into an inconsistent (chunk_len=chunk_tokens, text='') row.
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    d = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(stride)
    )
    ch = d.select(
        id_col,
        "__toks",
        "__n",
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    chunk_len = F.least(F.lit(chunk_tokens), F.col("__n") - F.col("chunk_start"))
    chunk_text = F.concat_ws(
        " ", F.slice(F.col("__toks"), F.col("chunk_start") + 1, chunk_len)
    )
    return ch.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        chunk_len.alias("chunk_len"),
        F.md5(chunk_text).alias("chunk_md5"),
        chunk_text.alias("chunk_text"),
    )


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles; [] when the document has < k tokens.
    (Spark's sequence(1, n) is DESCENDING for n<1, hence the guard.)

    The token array is bound ONCE as a lambda variable: a captured
    outer expression inside a higher-order-function lambda is
    re-evaluated per element (SCALE.md pitfall 1 / the minhash
    measurement), so referencing ``tokens(col)`` directly from the
    per-shingle lambda re-ran the tokenizer regex k times per
    shingle — quadratic per document (measured: repetition_stats at
    17 s for sf0.1 under the noop executor; ~1.4 s with the bound
    form). ``transform(array(tokens), build)[0]`` is the same
    nested-lambda binding trick as hyperplane_buckets (pitfall 7)."""

    def build(w: Column) -> Column:
        n = F.size(w)

        def shingle(i: Column) -> Column:
            return F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(k)]
            )

        return F.when(
            n >= k, F.transform(F.sequence(F.lit(1), n - (k - 1)), shingle)
        ).otherwise(F.array().cast("array<string>"))

    return F.transform(F.array(tokens(col)), build)[0]


def corpus_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide unigram counts: (tok, cnt). One explode + one hash
    agg with map-side combine — the 'training' half of the
    vocabulary-coverage quality signal."""
    return (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_below: int = 5,
    common_at_least: int = 100,
) -> DataFrame:
    """Per-document vocabulary-coverage quality score: how much of a
    document is rare (corpus count < ``rare_below``) vs common
    (>= ``common_at_least``) tokens. An integer-exact stand-in for a
    unigram-LM log-prob filter (log/exp are not correctly-rounded and
    diverge across engines; counts never do): high rare-fraction ≈
    high perplexity ≈ gibberish/OCR noise, high common-fraction ≈
    boilerplate.

    Scale shape: per-(doc, tok) pre-aggregation shrinks the exploded
    fact BEFORE the vocab join (Zipf heads collapse map-side), then
    one shuffle join on tok (AQE skew-split handles 'the'), one final
    agg on doc.
    """
    v = vocab if vocab is not None else corpus_vocab(df, text_col)
    dt = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("__k"))
    )
    # LEFT join + corpus-count-0 for misses: with a user-supplied
    # vocab, out-of-vocabulary tokens must count as maximally rare —
    # an inner join would silently drop them (undercounting n_tokens
    # and losing fully-OOV docs, i.e. exactly the docs the filter
    # exists to catch). With the self-derived vocab every token
    # matches and the left join degenerates to the inner one.
    cnt = F.coalesce(F.col("cnt"), F.lit(0))
    return (
        dt.join(v, on="tok", how="left")
        .groupBy(id_col)
        .agg(
            F.sum("__k").alias("n_tokens"),
            F.sum(
                F.when(cnt < rare_below, F.col("__k")).otherwise(0)
            ).alias("n_rare"),
            F.sum(
                F.when(cnt >= common_at_least, F.col("__k")).otherwise(0)
            ).alias("n_common"),
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals
    (cheap heuristics standard in pretraining-data filtering)."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return (
        df.withColumn("n_chars_text", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_token_len",
            (F.length(F.regexp_replace(F.trim(t), r"\s+", "")) / n_tok),
        )
        .withColumn(
            "punct_count",
            F.length(t) - F.length(F.regexp_replace(t, PUNCT_CLASS, "")),
        )
        .withColumn("stopword_count", F.regexp_count(F.lower(t), F.lit(STOPWORD_RE)))
        .withColumn("stopword_ratio", F.col("stopword_count") / n_tok)
    )


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-hit counts per language + deterministic argmax
    prediction (ties resolve in _LANG_ORDER)."""
    low = F.lower(F.col(text_col))
    out = df
    for lang in _LANG_ORDER:
        out = out.withColumn(
            f"score_{lang}", F.regexp_count(low, F.lit(LANG_MARKERS[lang]))
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _LANG_ORDER])
    pred = F.lit(None).cast("string")
    # build CASE from last to first so earlier languages win ties
    for lang in reversed(_LANG_ORDER):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


# GPT2-style pretokenizer approximation: word pieces, numbers, and
# single punctuation marks each count as one token (the real BPE then
# merges/splits within these — this regex matches its pretokenization
# boundaries for ASCII text).
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish pretokenization regex — the
    cheap-but-honest token counter for pretraining-data budgeting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PRETOKEN_RE))


def fingerprint(col: Column | str) -> Column:
    """Whitespace-normalized md5 document fingerprint (near-exact
    dedup key; the rolling-hash analog of a content checksum)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.md5(norm.cast("binary"))


# --- PII redaction (north star: training-data scrubbing) -------------

_PII_PATTERNS: list[tuple[str, str]] = [
    # order matters: emails before bare domains, long digit runs last
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"(?<![\w.])\+?\d[\d\s().-]{7,}\d(?![\w.])", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Regex scrubbing of emails / IPv4 / phone-like digit runs — the
    standard pre-training redaction pass, entirely JVM-side
    (chained regexp_replace, no UDF). Patterns are deliberately
    conservative: recall over precision is the training-data trade."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, token in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(col: Column | str) -> Column:
    """Struct of per-category PII hit counts for corpus auditing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        *[
            F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(name)
            for (pat, token), name in zip(
                _PII_PATTERNS, ["emails", "ips", "phones"]
            )
        ]
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    score_scale: float = 1e6,
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF
    (score = tf * ln((N+1)/(df+1))), the classic corpus keyword /
    stopword screen.

    Scale shape: term-frequency and document-frequency are two hash
    aggregations (map-side partials); the tf<->df join shuffles on
    term (skewed head terms -> AQE skew-join); the per-doc top-k
    window partitions on doc_id with per-doc term cardinality, never
    corpus cardinality, and Spark plans the rank<=k filter as
    WindowGroupLimit. The score is quantized to integer micro-units
    AFTER the one fixed double expression, so ranking ties resolve
    identically on any engine (tie-break: term ascending).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    idf = F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_q",
            F.floor(
                F.col("tf").cast("double") * idf * F.lit(float(score_scale))
                + F.lit(0.5)
            ).cast("bigint"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_q"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(id_col, "term", "score_q", F.col("rk").cast("int").alias("rk"))
    )
