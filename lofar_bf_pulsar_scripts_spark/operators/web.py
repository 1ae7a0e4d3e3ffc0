"""URL / domain operators for a web-scale training-data pipeline
(north-star brief: corpus curation): domain extraction, blocklist
filtering, per-domain statistics.

Scale design: domain extraction is a JVM-side regexp projection (no
Python, no shuffle); the blocklist is broadcast (it is dimension-sized
by definition — a curated list, not a fact table); per-domain stats are
one hash aggregation with map-side combine. Nothing here touches a
Python UDF or a second fact-table pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# scheme://host[:port]/... -> host. Scheme matched case-insensitively
# (crawled URLs carry HTTPS:// etc.; a case-sensitive class would
# silently extract '' and bypass the blocklist). Mirrored verbatim in
# the DuckDB oracles (same RE2-compatible pattern class).
_DOMAIN_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def extract_domain(url_col) -> F.Column:
    """Registrable host part of a URL, lower-cased. Pure JVM regexp —
    stays inside whole-stage codegen."""
    return F.lower(F.regexp_extract(url_col, _DOMAIN_RE, 1))


def with_domain(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("domain", extract_domain(F.col(url_col)))


def blocklist_filter(
    df: DataFrame,
    blocked_domains: list[str],
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose domain is on the blocklist: broadcast left-anti
    join, so the corpus is filtered map-side with zero shuffles.
    An empty blocklist is the identity."""
    if not blocked_domains:
        return df
    bl = F.broadcast(
        df.sparkSession.createDataFrame(
            [(d.lower(),) for d in blocked_domains], f"{domain_col} string"
        )
    )
    return df.join(bl, on=domain_col, how="left_anti")


def domain_stats(
    df: DataFrame,
    domain_col: str = "domain",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-domain corpus inventory: document count and total chars.
    One hash aggregation (map-side partials) — the canonical first
    screen before per-domain quotas / rate caps."""
    return df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(chars_col)).cast("bigint").alias("total_chars"),
    )
