"""Bounded-memory sketches beyond Spark's built-ins.

``approx_sketches`` (registry) covers HLL distinct counts and KLL-ish
quantiles via Spark's own approx_count_distinct / percentile_approx;
this module adds the frequent-items member of the family.

misra_gries — single-pass heavy hitters with k counters:

* Guarantee 1 (no false negatives): every item with true frequency
  > n/k appears in the summary.
* Guarantee 2 (count error): each reported count lower-bounds the
  true count by at most n/k.

Distributed shape: one Arrow-batched pass builds per-batch summaries
(mapInPandas — bounded at k counters per batch regardless of input
size), then a single tiny reduce merges them (MG summaries merge by
counter addition + global decrement, preserving both guarantees with
error n/k_total). The corpus is never shuffled — only ≤ k rows per
input partition cross the wire.

The summary's COUNTS are processing-order dependent (any MG is), so
this is deliberately NOT an oracle-gated query: the deterministic
verification is the property test (guarantees above against exact
counts on Zipf-like data), the same treatment the HLL/GK estimates
get in test_sketch_estimates_within_published_bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _mg_reduce(counts: dict, k: int) -> dict:
    """Trim a counter dict to at most k-1 entries by the MG global
    decrement: subtract the (k'th largest) overflow from everyone and
    drop non-positives."""
    if len(counts) < k:
        return counts
    # decrement by the k-th LARGEST counter: entries strictly above it
    # number at most k-1, and the subtracted amount is bounded by n/k
    # (there are >= k counters each >= cut, and counter mass <= n) —
    # the classical mergeable-MG bound. Using the (k-1)-th largest
    # would free a slot more aggressively but lets the decrement reach
    # n/(k-1), breaking Guarantee 1 for items in (n/k, n/(k-1)].
    vals = sorted(counts.values())
    cut = vals[len(counts) - k]
    return {i: c - cut for i, c in counts.items() if c > cut}


def misra_gries(
    df: DataFrame, item_col: str, k: int = 64
) -> list[tuple[str, int]]:
    """Heavy-hitter summary of ``item_col`` with ≤ k-1 entries:
    returns [(item, lower_bound_count), ...] sorted by count desc then
    item. See the module docstring for the guarantees and why this is
    property-tested rather than oracle-gated."""
    import pandas as pd

    if k < 2:
        raise ValueError("k must be >= 2")

    def per_batch(batches):
        for pdf in batches:
            counts: dict = {}
            for it in pdf[item_col]:
                if it is None:
                    continue
                if it in counts:
                    counts[it] += 1
                elif len(counts) < k - 1:
                    counts[it] = 1
                else:
                    # decrement-all; drop zeros
                    dead = []
                    for key in counts:
                        counts[key] -= 1
                        if counts[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counts[key]
            if counts:
                yield pd.DataFrame(
                    {"item": list(counts), "cnt": list(counts.values())}
                )

    partials = df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        per_batch, "item string, cnt long"
    )
    # merge: counter addition, then one global trim back to k-1.
    # The partial table is <= k rows per Arrow batch — tiny — so the
    # merge collects it rather than shuffling the corpus.
    rows = (
        partials.groupBy("item").agg(F.sum("cnt").alias("cnt")).collect()
    )
    merged = _mg_reduce({r["item"]: r["cnt"] for r in rows}, k)
    return sorted(merged.items(), key=lambda t: (-t[1], t[0]))
