"""Per-group Q-Q normalization (SURVEY §2.5 W2) — the reference's most
duplicated routine (5 copies: /root/reference/dynsp.py:186-224,
spspectra.py:10-49, pulse_info.py:18-40, snr.py:56-67,
fluxcal/lofar_fluxcal.py:200-211).

Semantics: per group, order the values, pair them with normal
order-statistic medians (Filliben's estimate -> inverse normal CDF),
fit a line over the quantile range [osm_lo, osm_hi] (default -1..1);
slope = rms, intercept = mean; output (x - mean)/rms.

Spark design: grouped-map pandas UDF (Arrow-batched) — the sort is
per-group in memory, which is exactly the reference's working set
(one (subint, chan) profile ~1e3 bins). Shuffle is one exchange on the
group key; ingest-time partitioning by the same key makes it map-side
(SURVEY §4 "needs custom work" item 1). scipy is not available in the
container, so the inverse normal CDF is Acklam's rational
approximation (public-domain algorithm), |rel err| < 1.15e-9 — within
float32 parity of probplot.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def norm_ppf(p: np.ndarray) -> np.ndarray:
    """Acklam's inverse-normal-CDF rational approximation."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    p = np.asarray(p, dtype=np.float64)
    out = np.empty_like(p)
    plow, phigh = 0.02425, 1 - 0.02425

    lo = p < plow
    q = np.sqrt(-2 * np.log(p[lo]))
    out[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )

    mid = (p >= plow) & (p <= phigh)
    q = p[mid] - 0.5
    r = q * q
    out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )

    hi = p > phigh
    q = np.sqrt(-2 * np.log(1 - p[hi]))
    out[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    return out


def filliben_quantiles(n: int) -> np.ndarray:
    """Normal order-statistic medians (probplot's osm axis)."""
    m = np.empty(n, dtype=np.float64)
    if n == 0:
        return m
    m[-1] = 0.5 ** (1.0 / n)
    m[0] = 1.0 - m[-1]
    i = np.arange(2, n)
    m[1:-1] = (i - 0.3175) / (n + 0.365)
    return norm_ppf(m)


def qq_mean_rms(values: np.ndarray, osm_lo: float = -1.0, osm_hi: float = 1.0):
    """(mean, rms) from the Q-Q line fit over the central quantile
    range (dynsp.py:186-224 semantics)."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    osm = filliben_quantiles(v.size)
    sel = (osm >= osm_lo) & (osm <= osm_hi)
    if sel.sum() < 2:
        sel = np.ones_like(osm, dtype=bool)
    slope, intercept = np.polyfit(osm[sel], v[sel], 1)
    return intercept, slope  # mean, rms


def _horner_col(coeffs: list[float], x):
    from pyspark.sql import functions as F

    acc = F.lit(float(coeffs[0]))
    for c in coeffs[1:]:
        acc = acc * x + F.lit(float(c))
    return acc


_ACKLAM_A = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
             1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
_ACKLAM_B = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
             6.680131188771972e+01, -1.328068155288572e+01, 1.0]
_ACKLAM_C = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
             -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
_ACKLAM_D = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
             3.754408661907416e+00, 1.0]
_ACKLAM_PLOW = 0.02425


def norm_ppf_col(p):
    """Acklam's inverse normal CDF as a pure column expression —
    makes the Q-Q regression fully SQL-expressible (and therefore
    DuckDB-oracle-checkable); bit-compatible with the numpy
    ``norm_ppf`` above."""
    from pyspark.sql import functions as F

    q_low = F.sqrt(-2.0 * F.log(p))
    tail = lambda q: _horner_col(_ACKLAM_C, q) / _horner_col(_ACKLAM_D, q)
    qm = p - F.lit(0.5)
    r = qm * qm
    mid = _horner_col(_ACKLAM_A, r) * qm / _horner_col(_ACKLAM_B, r)
    q_hi = F.sqrt(-2.0 * F.log(F.lit(1.0) - p))
    return (
        F.when(p < F.lit(_ACKLAM_PLOW), tail(q_low))
        .when(p > F.lit(1.0 - _ACKLAM_PLOW), -tail(q_hi))
        .otherwise(mid)
    )


def _regr_exact(y, x, yscale: float, xscale: float):
    """(slope, intercept, n) of the least-squares line, computed from
    integer-quantized sums so the result is bit-deterministic across
    engines and aggregation orders (the oracle SQL mirrors these
    expressions verbatim). ``y``/``x`` must be NULL together (regr_*
    pair-skip semantics). The exact integer sums are converted to
    double once; every following op is a fixed expression."""
    from pyspark.sql import functions as F

    yq = F.floor(y * F.lit(float(yscale)) + F.lit(0.5))
    xq = F.floor(x * F.lit(float(xscale)) + F.lit(0.5))
    # DECIMAL(38,0) sums: DuckDB widens sum(BIGINT) to HUGEINT, so a
    # long sum here would wrap/throw first on large groups; decimal
    # gives int128-equivalent headroom and one correctly-rounded
    # double conversion at the end (see fits.fit_powerlaw).
    xd = xq.cast("decimal(19,0)")
    yd = yq.cast("decimal(19,0)")
    n = F.count(xq).cast("double")
    sx = F.sum(xd).cast("double")
    sy = F.sum(yd).cast("double")
    sxy = F.sum((xd * yd).cast("decimal(38,0)")).cast("double")
    sxx = F.sum((xd * xd).cast("decimal(38,0)")).cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx) * F.lit(
        float(xscale) / float(yscale)
    )
    mean_x = (sx / n) / F.lit(float(xscale))
    mean_y = (sy / n) / F.lit(float(yscale))
    intercept = mean_y - slope * mean_x
    return slope, intercept


def _grouped_rank_n(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_buckets: int,
) -> DataFrame:
    """Per-group 1-based rank and group size WITHOUT a per-group
    single-task sort — the pipeline.global_rank pattern applied inside
    groups.  A window ``partitionBy(group).orderBy(value)`` caps
    parallelism at the number of GROUPS; with a handful of groups
    (this operator's event_type case) the sort runs on that many
    tasks no matter how many executors exist.  Here each group's value
    domain is cut at approximate per-group quantile boundaries,
    collected ONCE and embedded as literals (so every later job agrees
    by construction — sampled range partitioning would not), rows get
    ranked within (group, bucket), and per-bucket offsets (a second
    driver-bounded collect: groups x buckets rows) lift local ranks to
    group ranks.  Ties stay inside one bucket (strict ``value >
    boundary``), NULL values sort first (bucket -1), matching the
    window form's NULLS FIRST order.  Driver state is bounded by
    groups x buckets — the same contract as global_rank's bucket
    count, NOT by data volume."""
    from pyspark.sql import Window, functions as F

    from .pipeline import group_value_buckets

    bucketed = group_value_buckets(df, group_cols, value_col, n_buckets)
    # offsets need only per-(group, bucket) COUNTS — a plain
    # aggregation, not the windowed sort (a first cut ranked here too
    # and paid the full shuffle+sort twice)
    counts = sorted(
        bucketed.groupBy("__k", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect(),
        key=lambda r: (r["__k"], r["__b"]),
    )
    local = bucketed.withColumn(
        "__lr",
        F.row_number().over(
            Window.partitionBy("__k", "__b").orderBy(value_col)
        ),
    )
    offsets: list[tuple[str, int, int]] = []
    totals: dict[str, int] = {}
    for r in counts:
        k = r["__k"]
        offsets.append((k, r["__b"], totals.get(k, 0)))
        totals[k] = totals.get(k, 0) + r["__c"]
    # The offsets ship as a BROADCAST-JOINED dimension, not as
    # create_map literals: a map-lookup __i gets re-inlined by
    # CollapseProject into every branch of downstream expression trees
    # (the Acklam ppf references its argument ~10 times; measured 66 s
    # vs 4.6 s for the rank itself at 20M rows), while join outputs
    # are plain attributes that are computed once.
    odf = local.sparkSession.createDataFrame(
        [(k, b, off, totals[k]) for k, b, off in offsets],
        "__k string, __b int, __off bigint, __n bigint",
    )
    return (
        local.join(F.broadcast(odf), ["__k", "__b"])
        .withColumn("__i", F.col("__lr") + F.col("__off"))
        .drop("__k", "__b", "__lr", "__off")
    )


def qq_stats_sql(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    osm_lo: float = -1.0,
    osm_hi: float = 1.0,
    exact_scales: tuple[float, float] | None = None,
    rank_buckets: int | None = None,
    bucket_min_rows: int = 2_000_000,
) -> DataFrame:
    """Pure-SQL Q-Q stats (no pandas UDF): rank -> Filliben quantile
    -> Acklam ppf -> line fit over the central osm range.
    One window pass + one aggregation; ties in the value ordering are
    harmless (equal values contribute identical regression terms
    whichever rank they take).

    ``exact_scales=(value_scale, osm_scale)`` switches the fit from
    engine-native regr_slope/regr_intercept (order-dependent double
    sums) to the deterministic integer-quantized form (_regr_exact).

    ``rank_buckets=B`` replaces the per-group window rank — whose
    parallelism is capped at the number of groups — with the bucketed
    rank (``_grouped_rank_n``): per-group quantile boundaries cut each
    group into ~B rankable slices, so a low-cardinality grouping (the
    event_type case) still spreads its sort over groups x B tasks.
    The result is bit-identical with ``exact_scales`` set: ranks move
    only within ties, tied values contribute identical integer
    regression terms, and the sums are exact.  Leave None for
    high-cardinality groupings where the window form is already
    parallel and pays no extra driver collects.

    ``bucket_min_rows`` makes the bucketed rank SIZE-ADAPTIVE (r14
    optimization): below that many input rows the single-task window
    sort is nowhere near the wall, while the bucketing machinery pays
    a fixed driver round-trip tax (two quantile/count collects + a
    broadcast-joined offset dimension — measured 2.6 s bucketed vs
    0.95 s window at sf0.1's 100 k rows; the bucketed form earned its
    keep at 20 M rows/group, 38->16 s, r10 item).  Since the switch is
    only provably bit-identical under ``exact_scales``, the probe (one
    count job — metadata-only on an unfiltered parquet scan, and a
    trivial fraction of the sort it is sizing otherwise) runs only
    when both ``rank_buckets`` and ``exact_scales`` are set.

    Caller-facing contract of the probe (r14 ADVICE, explicit): when
    it engages, (a) plan CONSTRUCTION runs an eager Spark count job —
    this function is not lazy in that configuration — and (b) an
    explicitly requested ``rank_buckets`` is OVERRIDDEN to the window
    form below ``bucket_min_rows`` input rows.  Pass
    ``bucket_min_rows=0`` to force the bucketed machinery regardless
    of size (the parity tests do exactly this to keep the bucketed
    path exercised end-to-end)."""
    from pyspark.sql import Window, functions as F

    if (
        rank_buckets is not None
        and exact_scales is not None
        and bucket_min_rows
        and df.count() < bucket_min_rows
    ):
        rank_buckets = None
    if rank_buckets is None:
        w = Window.partitionBy(*group_cols).orderBy(value_col)
        n = F.count(F.lit(1)).over(
            Window.partitionBy(*group_cols).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        i = F.row_number().over(w)
        base = df.select(
            *group_cols,
            F.col(value_col).alias("__v"),
            i.alias("__i"),
            n.alias("__n"),
        )
    else:
        base = _grouped_rank_n(
            df, group_cols, value_col, int(rank_buckets)
        ).select(
            *group_cols, F.col(value_col).alias("__v"), "__i", "__n"
        )
    i = F.col("__i")
    n = F.col("__n")
    m_last = F.pow(F.lit(0.5), F.lit(1.0) / n.cast("double"))
    m = (
        F.when(i == 1, F.lit(1.0) - m_last)
        .when(i == n, m_last)
        .otherwise((i.cast("double") - 0.3175) / (n.cast("double") + 0.365))
    )
    ranked = base.select(
        *group_cols,
        F.col("__v"),
        norm_ppf_col(m).alias("__osm"),
    ).withColumn(
        "__in",
        (F.col("__osm") >= F.lit(float(osm_lo)))
        & (F.col("__osm") <= F.lit(float(osm_hi))),
    )
    # qq_mean_rms falls back to fitting ALL points when fewer than 2
    # survive the [osm_lo, osm_hi] filter (tiny groups) — mirror it so
    # the SQL and pandas variants stay parity-testable. regr_* skip
    # rows where either argument is NULL, so the in-range regression
    # is a conditional projection, not a second scan.
    v_in = F.when(F.col("__in"), F.col("__v"))
    o_in = F.when(F.col("__in"), F.col("__osm"))
    if exact_scales is None:
        agg = ranked.groupBy(*group_cols).agg(
            F.regr_intercept(v_in, o_in).alias("__m_in"),
            F.regr_slope(v_in, o_in).alias("__s_in"),
            F.regr_intercept(F.col("__v"), F.col("__osm")).alias("__m_all"),
            F.regr_slope(F.col("__v"), F.col("__osm")).alias("__s_all"),
            F.sum(F.col("__in").cast("int")).alias("__n_in"),
        )
    else:
        vs, os_ = exact_scales
        s_in, m_in = _regr_exact(v_in, o_in, vs, os_)
        s_all, m_all = _regr_exact(F.col("__v"), F.col("__osm"), vs, os_)
        agg = ranked.groupBy(*group_cols).agg(
            m_in.alias("__m_in"),
            s_in.alias("__s_in"),
            m_all.alias("__m_all"),
            s_all.alias("__s_all"),
            F.sum(F.col("__in").cast("int")).alias("__n_in"),
        )
    use_in = F.col("__n_in") >= 2
    return agg.select(
        *group_cols,
        F.when(use_in, F.col("__m_in")).otherwise(F.col("__m_all")).alias("qq_mean"),
        F.when(use_in, F.col("__s_in")).otherwise(F.col("__s_all")).alias("qq_rms"),
    )


def qq_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    osm_lo: float = -1.0,
    osm_hi: float = 1.0,
) -> DataFrame:
    """Replace value with (value - qq_mean)/qq_rms per group; appends
    qq_mean / qq_rms columns."""
    schema_cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{schema_cols}, qq_mean double, qq_rms double"

    def norm_group(pdf):
        mean, rms = qq_mean_rms(pdf[value_col].to_numpy(), osm_lo, osm_hi)
        pdf = pdf.copy()
        pdf[value_col] = (pdf[value_col] - mean) / rms
        pdf["qq_mean"] = mean
        pdf["qq_rms"] = rms
        return pdf

    return df.groupBy(*group_cols).applyInPandas(norm_group, schema=out_schema)


def qq_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    osm_lo: float = -1.0,
    osm_hi: float = 1.0,
) -> DataFrame:
    """Per-group (qq_mean, qq_rms) only — the snr.py:56-67 usage."""
    def stats_group(pdf):
        import pandas as pd

        mean, rms = qq_mean_rms(pdf[value_col].to_numpy(), osm_lo, osm_hi)
        out = pdf.iloc[:1][group_cols].copy()
        out["qq_mean"] = mean
        out["qq_rms"] = rms
        return out

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in group_cols
    )
    return df.groupBy(*group_cols).applyInPandas(
        stats_group, schema=f"{key_schema}, qq_mean double, qq_rms double"
    )
