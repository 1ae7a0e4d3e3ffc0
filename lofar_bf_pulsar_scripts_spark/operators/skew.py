"""Skew-mitigation helpers: explicit key salting for equi-joins whose
key distribution is too skewed for AQE's runtime skew-split to fix
(AQE only splits oversized SHUFFLE partitions of sort-merge joins —
it cannot help a broadcast-impossible join against a replicable dim,
or a stateful/streaming join where AQE is disabled).

Semantics contract: ``salted_join`` returns exactly the rows of the
plain equi-join (property-tested); only the physical key distribution
changes. Salting is DETERMINISTIC (xxhash64 of the fact row's join
key + a stable discriminator column) so retried tasks and replayed
streams salt identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    salt_by: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: the fact side's hot keys are spread
    over ``n_salts`` sub-keys by a deterministic hash of ``salt_by``
    (any fact column with per-row variation, e.g. its primary key);
    the dim side is replicated ``n_salts``× via a tiny explode — dim
    rows are dimension-sized by assumption, so the replication is
    n_salts × |dim|, never fact-sized.

    Join keys become (key..., salt): a key with 10^9 fact rows now
    lands on n_salts reducers instead of one. Replication factor is
    explicit and bounded — unlike broadcast, this works when the dim
    is too big to broadcast but small enough to replicate modestly.
    ``how`` supports inner/left joins (dim-side semantics are
    preserved because every (key, salt) replica carries the full dim
    row)."""
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "semi", "left_semi", "leftsemi",
        "anti", "left_anti", "leftanti",
    }
    if how.lower() not in allowed:
        # right/full joins see each unmatched dim key n_salts times
        # (one per replica) — silently NOT equal to the plain join
        raise ValueError(
            f"salted_join supports fact-preserving joins {sorted(allowed)}; "
            f"how={how!r} would duplicate unmatched dim rows per salt"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in keys + [salt_by]]),
                  F.lit(n_salts)).alias("__salt")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    return f.join(d, on=keys + ["__salt"], how=how).drop("__salt")
