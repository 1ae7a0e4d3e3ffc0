"""Round-6 operators: Gopher rule battery, bigram-LM quality,
Z-order layout, BPE merge training."""

import pytest
from pyspark.sql import Row, functions as F

from lofar_bf_pulsar_scripts_spark.operators.bpe import (
    learn_bpe_merges,
    learn_bpe_merges_local,
)
from lofar_bf_pulsar_scripts_spark.operators.text import (
    bigram_lm_scores,
    gopher_quality_flags,
)
from lofar_bf_pulsar_scripts_spark.operators.zorder import (
    write_zordered,
    zorder_key,
)


def _flags(spark, text):
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    return gopher_quality_flags(df).first()


def test_gopher_rules_spot_checks(spark):
    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with vigour"] * 6
    )
    r = _flags(spark, good)
    assert r["n_words"] == 66
    assert r["r_word_count"] and r["r_mean_word_len"] and r["r_alpha_words"]
    assert r["r_stopwords"]  # has 'the', 'that', 'with'
    assert r["pass_all"]

    # too short
    assert not _flags(spark, "only four tiny words")["r_word_count"]

    # mean word length out of [3, 10]: fifty 1-char words
    short = " ".join(["a"] * 50)
    r = _flags(spark, short)
    assert r["r_word_count"] and not r["r_mean_word_len"]

    # symbol-heavy: > 1 symbol per 10 words
    sym = " ".join(["word### more..."] * 30)
    r = _flags(spark, sym)
    assert r["n_symbols"] == 120 and not r["r_symbol_ratio"]

    # numeric words fail the alpha rule
    nums = " ".join(["1234 5678 999 word"] * 15)
    r = _flags(spark, nums)
    assert r["n_alpha_words"] == 15 and not r["r_alpha_words"]

    # no required stopwords
    r = _flags(spark, " ".join(["zip zap zoom"] * 20))
    assert r["n_stopwords"] == 0 and not r["r_stopwords"]

    # bullet lines: 10 lines, 9+ start with '-'
    bullets = "\n".join(["- item one here"] * 10)
    r = _flags(spark, bullets)
    assert r["n_lines"] == 10 and r["n_bullet_lines"] == 10
    assert not r["r_bullet_lines"]

    # ellipsis line endings: 10 lines, 4 end with '...'
    ell = "\n".join(["truncated line..."] * 4 + ["a normal line here"] * 6)
    r = _flags(spark, ell)
    assert r["n_ellipsis_lines"] == 4 and not r["r_ellipsis_lines"]

    # NULL text behaves as empty
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    r = gopher_quality_flags(df).first()
    assert r["n_words"] == 1 and not r["pass_all"]


def test_gopher_bullet_ellipsis_keep_at_exact_threshold(spark):
    # Gopher removes only documents strictly ABOVE the threshold:
    # exactly 90% bullet lines / exactly 30% ellipsis lines are KEPT.
    at_90 = "\n".join(["- item"] * 9 + ["plain line"])
    r = _flags(spark, at_90)
    assert r["n_lines"] == 10 and r["n_bullet_lines"] == 9
    assert r["r_bullet_lines"]

    above_90 = "\n".join(["- item"] * 10)
    assert not _flags(spark, above_90)["r_bullet_lines"]

    at_30 = "\n".join(["cut short..."] * 3 + ["plain line"] * 7)
    r = _flags(spark, at_30)
    assert r["n_ellipsis_lines"] == 3 and r["r_ellipsis_lines"]

    above_30 = "\n".join(["cut short..."] * 4 + ["plain line"] * 6)
    assert not _flags(spark, above_30)["r_ellipsis_lines"]


def test_bigram_lm_scores_hand_computed(spark):
    # corpus: "a b a b" and "a b c". unigrams: a:3 b:3 c:1 -> V=3
    # bigrams: (a b):3, (b a):1, (b c):1
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b a b"), Row(doc_id=1, text="a b c")]
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    # doc 0: bigrams a-b (x2), b-a (x1)
    #   ppm(a b) = 1e6 * (3+1) // (c(a)=3 + 3) = 666666
    #   ppm(b a) = 1e6 * (1+1) // (c(b)=3 + 3) = 333333
    assert out[0]["n_bigrams"] == 3
    assert out[0]["score_sum"] == 2 * 666666 + 333333
    assert out[0]["avg_ppm"] == (2 * 666666 + 333333) // 3
    # doc 1: a-b and b-c; ppm(b c) = 1e6*2 // 6 = 333333
    assert out[1]["n_bigrams"] == 2
    assert out[1]["score_sum"] == 666666 + 333333
    # single-token docs produce no row
    df2 = spark.createDataFrame([Row(doc_id=9, text="lonely")])
    assert bigram_lm_scores(df2).count() == 0


def test_zorder_key_matches_python_interleave(spark):
    def py_z(x, y, bits=10):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(3, 5), (0, 0), (1023, 1023), (17, 512), (700, 33)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=10).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == py_z(r["x"], r["y"]), (r["x"], r["y"])
    with pytest.raises(ValueError):
        zorder_key([F.col("x")])
    with pytest.raises(ValueError):
        zorder_key([F.col("x"), F.col("y")], bits=32)


def test_zorder_layout_shrinks_file_footprints(spark, tmp_path):
    """Data-skipping evidence: with a Z-ordered layout, each file's
    (x-range * y-range) footprint covers a small tile of the key
    space; an x-sorted layout leaves y unconstrained per file. A
    point/range predicate on y therefore skips most z-ordered files
    but NO x-sorted ones (footer min/max pruning)."""
    import pyarrow.parquet as pq

    n, side = 1 << 14, 1 << 7  # 128x128 grid, one row per cell
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )
    zpath, xpath = str(tmp_path / "zord"), str(tmp_path / "xsort")
    write_zordered(df, zpath, ["x", "y"], bits=7, num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(xpath)
    )

    def footprints(path):
        import glob

        out = []
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq.read_metadata(f)
            mins = {"x": None, "y": None}
            maxs = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in mins:
                        st = col.statistics
                        mins[name] = (
                            st.min
                            if mins[name] is None
                            else min(mins[name], st.min)
                        )
                        maxs[name] = (
                            st.max
                            if maxs[name] is None
                            else max(maxs[name], st.max)
                        )
            out.append(
                (mins["x"], maxs["x"], mins["y"], maxs["y"])
            )
        return out

    z_fp, x_fp = footprints(zpath), footprints(xpath)
    # the Z-order trade: the x-sorted layout skips perfectly on x and
    # NOT AT ALL on y (every file spans the full y range); the
    # Z-ordered layout skips well on BOTH dimensions. Quantified as
    # files touched by a point predicate on each dimension alone:
    y_probe, x_probe = 5, 5
    z_hit_y = sum(1 for _, _, y0, y1 in z_fp if y0 <= y_probe <= y1)
    x_hit_y = sum(1 for _, _, y0, y1 in x_fp if y0 <= y_probe <= y1)
    assert x_hit_y == len(x_fp)  # x-sort: zero y skipping
    assert z_hit_y <= len(z_fp) // 2  # z-order: y predicate skips >= half
    z_hit_x = sum(1 for x0, x1, _, _ in z_fp if x0 <= x_probe <= x1)
    assert z_hit_x <= len(z_fp) // 2  # ... and x predicate also skips
    # every z file's y-span is a bounded tile, not the full range
    assert max(y1 - y0 for _, _, y0, y1 in z_fp) <= 64
    # round-trip: clustering must not lose or duplicate rows
    assert spark.read.parquet(zpath).count() == n


def test_bpe_merges_match_pure_python(spark):
    corpus = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "the new low the new wide",
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(corpus)])
    merges, segs = learn_bpe_merges(df, n_merges=8)
    assert merges == learn_bpe_merges_local(corpus, 8)
    # the learned segmentation applies every merge greedily
    seg = {r["word"]: r["syms"] for r in segs.collect()}
    for w, syms in seg.items():
        assert "".join(syms) == w
    # determinism under different partitioning
    merges2, _ = learn_bpe_merges(df.repartition(7), n_merges=8)
    assert merges2 == merges


def test_bpe_merge_greedy_left_to_right(spark):
    # 'aaa' with top pair (a,a) must segment as ['aa','a'], not ['a','aa']
    df = spark.createDataFrame([Row(doc_id=0, text="aaa aaa")])
    merges, segs = learn_bpe_merges(df, n_merges=1)
    assert merges == [("a", "a")]
    seg = segs.filter(F.col("word") == "aaa").first()["syms"]
    assert seg == ["aa", "a"]
    with pytest.raises(ValueError):
        learn_bpe_merges(df, n_merges=-1)


def test_bpe_stops_when_no_pairs_left(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="ab ab")])
    merges, _ = learn_bpe_merges(df, n_merges=10)
    # after ('a','b') every word is one symbol; training stops early
    assert merges == [("a", "b")]


def test_dsir_importance_hand_computed(spark):
    from lofar_bf_pulsar_scripts_spark.operators.pipeline import dsir_importance

    # 1-bucket degenerate case: every token maps to bucket 0, so
    # ppm_t and ppm_s are fully determined by the token totals:
    # target (en) tokens Nt=2, source total Ns=4, B=1
    #   ppm_t = 1e6*(2+1)//(2+1) = 1_000_000
    #   ppm_s = 1e6*(4+1)//(4+1) = 1_000_000  -> every weight 0
    df = spark.createDataFrame(
        [(0, "a b", "en"), (1, "c d", "de")],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_importance(
            df, F.col("lang") == "en", n_buckets=1
        ).collect()
    }
    assert out[0]["n_tokens"] == 2 and out[0]["weight_ppm"] == 0
    assert out[1]["n_tokens"] == 2 and out[1]["weight_ppm"] == 0

    # target-heavy vs source-only tokens separate in sign with real
    # buckets: doc 0's tokens are ALL target tokens, doc 1's appear
    # only in the source half -> weight(doc0) > weight(doc1)
    df2 = spark.createDataFrame(
        [
            (0, "alpha beta alpha beta", "en"),
            (1, "gamma delta gamma delta", "de"),
            (2, "alpha beta", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    w = {
        r["doc_id"]: r["weight_ppm"]
        for r in dsir_importance(
            df2, F.col("lang") == "en", n_buckets=64
        ).collect()
    }
    assert w[0] > 0 > w[1]
    with pytest.raises(ValueError):
        dsir_importance(df2, F.col("lang") == "en", n_buckets=0)


def test_dsir_importance_partition_invariant(spark):
    from lofar_bf_pulsar_scripts_spark.operators.pipeline import dsir_importance

    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common word", "en" if i % 2 else "de")
         for i in range(40)],
        "doc_id long, text string, lang string",
    )
    a = sorted(map(tuple, dsir_importance(df, F.col("lang") == "en").collect()))
    b = sorted(
        map(
            tuple,
            dsir_importance(
                df.repartition(13), F.col("lang") == "en"
            ).collect(),
        )
    )
    assert a == b


def test_apply_bpe_merges_counts(spark):
    from lofar_bf_pulsar_scripts_spark.operators.bpe import (
        apply_bpe_merges,
        learn_bpe_merges,
        learn_bpe_merges_local,
    )

    corpus = ["low low lower", "newest newest new"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    merges, _ = learn_bpe_merges(df, n_merges=4)
    out = {r["doc_id"]: r for r in apply_bpe_merges(df, merges).collect()}

    # reference: segment each word locally with the same merges
    def seg(word):
        syms = list(word)
        for a, b in merges:
            acc = []
            for x in syms:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            syms = acc
        return syms

    for i, text in enumerate(corpus):
        words = text.split()
        assert out[i]["n_words"] == len(words)
        assert out[i]["n_bpe_tokens"] == sum(len(seg(w)) for w in words)
    # zero merges degenerates to character count
    out0 = {r["doc_id"]: r for r in apply_bpe_merges(df, []).collect()}
    assert out0[0]["n_bpe_tokens"] == sum(len(w) for w in corpus[0].split())


def test_remove_shared_chunks(spark):
    from lofar_bf_pulsar_scripts_spark.operators.text import (
        remove_shared_chunks,
    )

    boiler = " ".join(f"nav{i}" for i in range(16))  # one full chunk
    uniq0 = " ".join(f"alpha{i}" for i in range(16))
    uniq1 = " ".join(f"beta{i}" for i in range(16))
    df = spark.createDataFrame(
        [
            (0, boiler + " " + uniq0),
            (1, boiler + " " + uniq1),
            (2, boiler),  # all boilerplate -> survives empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_shared_chunks(df, 16).collect()}
    assert out[0]["n_kept_chunks"] == 1 and out[0]["cleaned_text"] == uniq0
    assert out[1]["n_kept_chunks"] == 1 and out[1]["cleaned_text"] == uniq1
    assert out[2]["n_kept_chunks"] == 0 and out[2]["cleaned_text"] == ""
    assert out[0]["n_tokens_kept"] == 16

    # multi-chunk docs reassemble in order regardless of partitioning
    long0 = " ".join(f"w{i}" for i in range(64))
    df2 = spark.createDataFrame(
        [(0, long0), (1, "something else entirely here")],
        "doc_id long, text string",
    ).repartition(5)
    r0 = remove_shared_chunks(df2, 16).filter(F.col("doc_id") == 0).first()
    assert r0["cleaned_text"] == long0
    assert r0["n_kept_chunks"] == 4 and r0["n_tokens_kept"] == 64


def test_funnel_strict_ordering(spark):
    from lofar_bf_pulsar_scripts_spark.operators.funnel import funnel_reach

    rows = [
        # user 0: full ordered funnel
        (0, "view", 1.0), (0, "click", 2.0), (0, "purchase", 3.0),
        # user 1: clicked BEFORE viewing -> stops at view
        (1, "click", 1.0), (1, "view", 2.0),
        # user 2: view+click, purchase before click -> stops at click
        (2, "view", 1.0), (2, "purchase", 1.5), (2, "click", 2.0),
        # user 3: never viewed
        (3, "purchase", 1.0),
        # user 4: simultaneous view/click (strict >) -> stops at view
        (4, "view", 5.0), (4, "click", 5.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, t double")
    out = {r["step"]: r for r in funnel_reach(ev, ["view", "click", "purchase"]).collect()}
    assert out["view"]["n_users"] == 4  # users 0,1,2,4
    assert out["view"]["sum_user_id"] == 0 + 1 + 2 + 4
    assert out["click"]["n_users"] == 2  # users 0,2
    assert out["click"]["sum_user_id"] == 2
    assert out["purchase"]["n_users"] == 1 and out["purchase"]["sum_user_id"] == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        funnel_reach(ev, [])


def test_cohort_retention_hand_case(spark):
    from lofar_bf_pulsar_scripts_spark.operators.funnel import cohort_retention

    day = 86400.0
    rows = [
        (0, 0.5 * day), (0, 1.2 * day), (0, 3.9 * day),
        (1, 1.1 * day), (1, 1.9 * day),  # two same-day events dedupe
        (2, 0.1 * day), (2, 1.5 * day),
    ]
    ev = spark.createDataFrame(rows, "user_id long, t double")
    got = {
        (r["cohort_day"], r["day_offset"]): (r["n_users"], r["sum_user_id"])
        for r in cohort_retention(ev).collect()
    }
    assert got[(0, 0)] == (2, 2)   # users 0 and 2 start day 0
    assert got[(0, 1)] == (2, 2)   # both active day 1
    assert got[(0, 3)] == (1, 0)   # only user 0 on day 3
    assert got[(1, 0)] == (1, 1)   # user 1's cohort is day 1
    assert (1, 1) not in got


def test_bm25_ranks_rare_term_docs_first(spark):
    from lofar_bf_pulsar_scripts_spark.operators.retrieval import bm25_topk

    filler = " ".join(["common word here"] * 10)
    df = spark.createDataFrame(
        [
            (0, "zebra " + filler),          # rare term once
            (1, "zebra zebra " + filler),    # rare term twice
            (2, filler),                      # no hit
            (3, "common " + filler),          # frequent term only
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(df, ["zebra", "common"], k=4).collect()
    ids = [r["doc_id"] for r in out]
    # doc 2 has no 'zebra' but has 'common' -> appears, ranked last of hits
    assert set(ids) == {0, 1, 2, 3}
    # doc 1 (rare term, higher tf) outranks doc 0, which outranks
    # common-only docs
    assert ids.index(1) < ids.index(0) < ids.index(2)
    r1 = next(r for r in out if r["doc_id"] == 1)
    assert r1["n_hit_terms"] == 2
    import pytest as _pt
    with _pt.raises(ValueError):
        bm25_topk(df, [], k=3)


def test_scd2_history_versions(spark):
    from lofar_bf_pulsar_scripts_spark.operators.history import scd2_history

    ev = spark.createDataFrame(
        [
            (0, 1.0, 10.0), (0, 3.0, 30.0), (0, 2.0, 20.0),
            (0, 3.0, 25.0),  # duplicate (key, t): max value kept
            (1, 5.0, 50.0),
        ],
        "user_id long, t double, value double",
    )
    rows = scd2_history(ev).orderBy("user_id", "valid_from").collect()
    u0 = [r for r in rows if r["user_id"] == 0]
    assert [(r["valid_from"], r["valid_to"], r["value"]) for r in u0] == [
        (1.0, 2.0, 10.0), (2.0, 3.0, 20.0), (3.0, None, 30.0)
    ]
    assert [r["is_current"] for r in u0] == [False, False, True]
    u1 = [r for r in rows if r["user_id"] == 1]
    assert len(u1) == 1 and u1[0]["is_current"]


def test_resample_ffill_grid(spark):
    from lofar_bf_pulsar_scripts_spark.operators.history import resample_ffill

    h = 3600.0
    ev = spark.createDataFrame(
        [
            (0, 0.5 * h, 1.0),   # slot 0
            (0, 0.9 * h, 2.0),   # slot 0, later -> wins
            (0, 3.5 * h, 9.0),   # slot 3; slots 1, 2 forward-fill 2.0
            (1, 10.2 * h, 7.0),  # single slot
        ],
        "user_id long, t double, value double",
    )
    got = {
        (r["user_id"], r["slot"]): r["value_ffill"]
        for r in resample_ffill(ev, step=3600).collect()
    }
    assert got[(0, 0)] == 2.0
    assert got[(0, 1)] == 2.0 and got[(0, 2)] == 2.0
    assert got[(0, 3)] == 9.0
    assert got[(1, 10)] == 7.0
    assert len(got) == 5  # no slots outside each user's span


def test_scd2_tuple_max_multi_value_columns(spark):
    from lofar_bf_pulsar_scripts_spark.operators.history import scd2_history

    # duplicate (key, t) with conflicting rows: the ROW-WISE tuple max
    # (a=2, b=0) must win — per-column maxes would fabricate (2, 9)
    ev = spark.createDataFrame(
        [(1, 5.0, 1.0, 9.0), (1, 5.0, 2.0, 0.0)],
        "user_id long, t double, a double, b double",
    )
    rows = scd2_history(ev, value_cols=["a", "b"]).collect()
    assert len(rows) == 1
    assert (rows[0]["a"], rows[0]["b"]) == (2.0, 0.0)


def test_apply_bpe_merges_keeps_empty_docs(spark):
    from lofar_bf_pulsar_scripts_spark.operators.bpe import apply_bpe_merges

    df = spark.createDataFrame(
        [(0, "some words"), (1, ""), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in apply_bpe_merges(df, []).collect()}
    assert set(out) == {0, 1, 2, 3}
    for i in (1, 2, 3):
        assert out[i]["n_words"] == 0 and out[i]["n_bpe_tokens"] == 0


def test_casa_comb_probe_rejects_cumulative_drift(spark):
    """Per-step deviations of delta/4 can accumulate into multi-slot
    positional drift; the probe must reject such a grid (routing to
    the exact fold) so the query at an exact grid point still gets
    its own row."""
    from pyspark.sql import Row

    from lofar_bf_pulsar_scripts_spark import caldata

    freqs = [i * 1.25 for i in range(9)] + [10.0 + 0.75 * i for i in range(1, 9)]
    bc = spark.createDataFrame(
        [Row(station="XX001", freq_mhz=f, factor=100.0 + i)
         for i, f in enumerate(freqs)]
    )
    df = spark.createDataFrame([Row(station="XX001", freq_mhz=10.0)])
    got = caldata.attach_casa_beamcorr(df, bc).first()
    # 10.0 is an exact grid point (index 8): its factor is 108
    assert got["casa_factor"] == 108.0


def test_resample_ffill_null_values_ignorenulls(spark):
    """A NULL-valued observation occupies a grid slot but never
    overwrites the carried value (window last-ignorenulls parity for
    the interval-explode form), and slots before the first non-null
    observation forward-fill NULL."""
    from lofar_bf_pulsar_scripts_spark.operators.history import resample_ffill

    h = 3600.0
    ev = spark.createDataFrame(
        [
            (0, 1.5 * h, 2.0),    # slot 1
            (0, 4.5 * h, None),   # slot 4: NULL obs -> carries 2.0
            (0, 6.5 * h, 9.0),    # slot 6
            (1, 2.5 * h, None),   # leading NULL obs
            (1, 5.5 * h, 3.0),    # first non-null at slot 5
        ],
        "user_id long, t double, value double",
    )
    got = {
        (r["user_id"], r["slot"]): r["value_ffill"]
        for r in resample_ffill(ev, step=3600).collect()
    }
    assert [got[(0, s)] for s in range(1, 7)] == [
        2.0, 2.0, 2.0, 2.0, 2.0, 9.0
    ]
    assert got[(1, 2)] is None and got[(1, 3)] is None
    assert got[(1, 4)] is None and got[(1, 5)] == 3.0
    assert len(got) == 10
