"""Round-13: BPE learner dispatch (r12 VERDICT item 5) — the merge
loop trains on the DRIVER when the word-type table fits (the standard
route: the table is vocabulary-sized), with the one-job-per-merge
distributed loop as the documented pathological-vocab fallback.  The
two routes must agree merge-for-merge AND segmentation-for-
segmentation, since gate hashes depend on both."""

from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.operators.bpe import learn_bpe_merges

CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "the cat sat on the mat the cat",
] * 5


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_dispatch_parity_with_distributed_loop(spark):
    df = _df(spark)
    m_loc, s_loc = learn_bpe_merges(df, 12)  # dispatched (vocab fits)
    m_dist, s_dist = learn_bpe_merges(df, 12, driver_vocab_limit=0)
    assert m_loc == m_dist
    loc = sorted(
        (r["word"], r["freq"], tuple(r["syms"])) for r in s_loc.collect()
    )
    dst = sorted(
        (r["word"], r["freq"], tuple(r["syms"])) for r in s_dist.collect()
    )
    assert loc == dst


def test_dispatch_falls_back_past_the_limit(spark):
    """A limit smaller than the vocab forces the distributed loop —
    same answer, fallback exercised."""
    df = _df(spark)
    m_small, _ = learn_bpe_merges(df, 6, driver_vocab_limit=3)
    m_ref, _ = learn_bpe_merges(df, 6)
    assert m_small == m_ref


def test_dispatched_segs_consistent_with_merges(spark):
    """Every adjacent pair named by a merge is absent from the final
    segmentation exactly when the greedy application removed it —
    sanity on the returned table, not just the merge list."""
    df = _df(spark)
    merges, segs = learn_bpe_merges(df, 8)
    rows = segs.collect()
    assert rows and all(len(r["syms"]) >= 1 for r in rows)
    # reconstructing each word from its symbols is lossless
    assert all("".join(r["syms"]) == r["word"] for r in rows)
    # the first merge's pair no longer appears adjacent anywhere
    a, b = merges[0]
    for r in rows:
        s = r["syms"]
        assert not any(
            s[i] == a and s[i + 1] == b for i in range(len(s) - 1)
        ), (r["word"], s)
