"""Tests for the LLM-data-pipeline operators: dedup (exact / minhash
LSH / simhash / jaccard), similarity search, text analysis, multimodal
plumbing."""

import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.dedup import (
    candidate_pairs,
    exact_duplicate_groups,
    lsh_buckets,
    minhash_signature,
    simhash16,
)
from lofar_bf_pulsar_scripts_spark.operators.multimodal import (
    decode_image_features,
    frame_sample,
    media_from_documents,
    payload_metadata,
)
from lofar_bf_pulsar_scripts_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    ivf_assign,
    ivf_topk,
)
from lofar_bf_pulsar_scripts_spark.operators.text import (
    language_scores,
    token_count,
    word_shingles,
)


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the afternoon sun light"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different content about spark query planning engines"),
        (4, "unrelated text mentioning pulsars dispersion measures and radio"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicate_groups(spark, docs):
    groups = exact_duplicate_groups(docs, ["text"], "doc_id").collect()
    dups = [g for g in groups if g["n_dups"] > 1]
    assert len(dups) == 1
    assert dups[0]["n_dups"] == 2 and dups[0]["keep_id"] == 0


def test_minhash_lsh_finds_near_dups(spark, docs):
    sigs = minhash_signature(docs, num_hashes=16)
    buckets = lsh_buckets(sigs, "doc_id", bands=8, rows_per_band=2)
    pairs = {(r["id_a"], r["id_b"]) for r in candidate_pairs(buckets, "doc_id").collect()}
    assert (0, 1) in pairs  # exact dup always collides
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup should band-collide
    assert (3, 4) not in pairs  # unrelated docs must not


def test_minhash_estimates_jaccard(spark, docs):
    # identical docs -> identical signatures
    sigs = {
        r["doc_id"]: r["minhash"]
        for r in minhash_signature(docs, num_hashes=16).collect()
    }
    assert sigs[0] == sigs[1]
    agree_near = sum(a == b for a, b in zip(sigs[0], sigs[2])) / 16
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[3])) / 16
    assert agree_near > agree_far


def test_simhash_distance(spark, docs):
    sh = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash16("text").alias("sh")).collect()}
    assert sh[0] == sh[1]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sh[0], sh[2]) < ham(sh[0], sh[3])


def test_shingles_and_tokens(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",)], "text string")
    rows = df.select(
        token_count("text").alias("n"), word_shingles("text", 3).alias("s")
    ).collect()
    assert rows[0]["n"] == 4 and rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["n"] == 2 and rows[1]["s"] == []  # < k tokens


def test_language_scores_picks_marked_language(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog is happy that you see"),
            (1, "der hund und die katze ist nicht ein problem"),
            (2, "el perro y la casa es una maravilla que ver"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in language_scores(df).collect()}
    assert got == {0: "en", 1: "de", 2: "es"}


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.normal(0, 1, (40, 16)).astype("float32")
    base[1] = base[0] + 0.01 * rng.normal(0, 1, 16).astype("float32")  # near 0
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(base)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    top = brute_force_topk(vectors, q, k=3).collect()
    assert len(top) == 3
    assert top[0]["vec_id"] == 1  # planted nearest neighbor
    cs = [r["cos"] for r in sorted(top, key=lambda r: -r["cos"])]
    assert cs == sorted(cs, reverse=True) and cs[0] > 0.99


def test_ivf_recall_of_planted_neighbor(spark, vectors):
    cents = vectors.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    assigned = ivf_assign(vectors, cents)
    q = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    top = ivf_topk(assigned, q, cents, k=3, nprobe=2).collect()
    assert top and top[0]["vec_id"] == 1


def test_multimodal_pipeline(spark, docs):
    media = media_from_documents(
        docs.withColumn("source", F.lit("s")).withColumn("lang", F.lit("en"))
    )
    meta = {r["media_id"]: r for r in payload_metadata(media).collect()}
    assert meta[0]["byte_len"] == len(BASE)
    assert meta[0]["content_md5"] == meta[1]["content_md5"]
    feats = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert feats[0]["width"] == feats[1]["width"]  # deterministic fake decode
    assert 64 <= feats[0]["width"] < 256 and feats[0]["byte_len"] == len(BASE)
    frames = frame_sample(media.filter(F.col("media_id") == 0), every_n_bytes=32).collect()
    assert len(frames) >= 2
    assert frames[0]["byte_offset"] == 0 and frames[1]["byte_offset"] == 32
    joined = b"".join(bytes(f["frame_bytes"]) for f in sorted(frames, key=lambda f: f["frame_idx"]))
    assert joined[: len(joined)] == BASE.encode()[: len(joined)]


def test_decode_unstubbed_decoder_raises(spark, docs):
    media = media_from_documents(
        docs.withColumn("source", F.lit("s"))
    )
    with pytest.raises(NotImplementedError):
        decode_image_features(media, decoder="pillow")


def test_cosine_expression_matches_numpy(spark, vectors):
    import numpy as np

    rows = vectors.filter(F.col("vec_id").isin(0, 1)).collect()
    a = np.array(rows[0]["embedding"], dtype="float64")
    b = np.array(rows[1]["embedding"], dtype="float64")
    expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    df = spark.createDataFrame(
        [(rows[0]["embedding"], rows[1]["embedding"])],
        "a array<float>, b array<float>",
    )
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
    assert got == pytest.approx(expected, rel=1e-12)
