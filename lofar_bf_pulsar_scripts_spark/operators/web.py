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


# tracking query parameters dropped by canonicalize_url; anchored so
# regexp_replace/first-match semantics agree across engines.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="


def canonicalize_url(url) -> F.Column:
    """Canonical URL for crawl-level dedup — the normalization every
    web pipeline applies before URL-exact dedup:

    * scheme and host lower-cased (path/query case is significant and
      preserved);
    * ``www.`` prefix and scheme-default port (``:443``/``:80``)
      dropped;
    * fragment dropped;
    * tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``) removed, remaining params kept in original order;
    * trailing slashes trimmed from non-root paths; empty path
      becomes ``/``.

    Pure JVM expression chain (regexp + array filter) — codegen'd
    projection, no shuffle, no Python. Every regex is anchored, so
    Spark's replace-all and an oracle's replace-first agree by
    construction.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    # rest = path + query, fragment excluded by the [^#]* match
    rest = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .otherwise(host)
    )
    # trim trailing slashes FIRST, then map empty -> '/': the reverse
    # order sent an all-slash path ('//') to '' (non-idempotent, and a
    # different canonical form than '/')
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    qjoined = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qjoined == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), qjoined)
        ),
    )
