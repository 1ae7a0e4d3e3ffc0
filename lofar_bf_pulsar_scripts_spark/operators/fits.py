"""Fitting operators (SURVEY §2.8 interpolation/fit family).

* fit_powerlaw — log-log deg-1 fit via the built-in regression
  aggregates: spectral index (/root/reference/fluxcal/
  lofar_fluxcal.py:1040-1048) and the exponential scattering-tail fit
  (/root/reference/fluxcal/get_rough_tscat.py:80-93 fits a line in
  log space). JVM-side regr_slope/regr_intercept — one aggregation.
* fit_polynomial_baseline — deg-n polynomial baseline per group
  (/root/reference/snr.py:343-362) as a grouped pandas UDF
  (numpy.polyfit); returns the input with the baseline subtracted.
* fit_histogram_gaussian — Gaussian fit over a histogram
  (/root/reference/subdyn.py:306-324; snr.py:536-542's leastsq):
  method="fit" runs the reference's Gaussian+offset least-squares
  (numpy LM over the bins-row summary per group); method="moments" is
  the closed-form no-optimizer mode (equal on clean Gaussians, dragged
  by contaminated tails).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def fit_powerlaw(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    exact_scale: float | None = None,
) -> DataFrame:
    """Per group: y = amp * x^index fit in log-log space. Rows with
    non-positive x or y are excluded (log domain), matching the
    reference's masking of zapped channels.

    ``exact_scale`` quantizes (log10 x, log10 y) to integers before
    the regression sums, making slope/intercept/r2 bit-deterministic
    across engines and aggregation orders (the DuckDB oracle mirrors
    the derived expressions verbatim)."""
    sel = df.filter((F.col(x_col) > 0) & (F.col(y_col) > 0))
    lx, ly = F.log10(F.col(x_col)), F.log10(F.col(y_col))
    grouped = sel.groupBy(*group_cols) if group_cols else sel.groupBy()
    if exact_scale is None:
        return grouped.agg(
            F.regr_slope(ly, lx).alias("index"),
            F.regr_intercept(ly, lx).alias("log_amp"),
            F.regr_r2(ly, lx).alias("r2"),
            F.regr_count(ly, lx).alias("n_used"),
        )
    s = F.lit(float(exact_scale))
    xq = F.floor(lx * s + F.lit(0.5))
    yq = F.floor(ly * s + F.lit(0.5))
    # Sum in DECIMAL(38,0): DuckDB's sum(BIGINT) widens to HUGEINT
    # (int128) automatically, so a plain long sum on the Spark side
    # would wrap (or throw under ANSI) first — at ~1e12 rows/group the
    # squared-term sums exceed int64. decimal(38,0) gives equivalent
    # headroom; the one cast to double at the end is correctly rounded
    # on both engines. Products are widened BEFORE multiplying so the
    # per-row term can't wrap either (oracle mirrors via HUGEINT).
    xd = xq.cast("decimal(19,0)")
    yd = yq.cast("decimal(19,0)")
    n = F.count(xq).cast("double")
    sx = F.sum(xd).cast("double")
    sy = F.sum(yd).cast("double")
    sxy = F.sum((xd * yd).cast("decimal(38,0)")).cast("double")
    sxx = F.sum((xd * xd).cast("decimal(38,0)")).cast("double")
    syy = F.sum((yd * yd).cast("decimal(38,0)")).cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx  # x,y share the scale -> it cancels
    intercept = (sy / n) / s - slope * ((sx / n) / s)
    return grouped.agg(
        slope.alias("index"),
        intercept.alias("log_amp"),
        (cov * cov / (varx * vary)).alias("r2"),
        F.count(xq).alias("n_used"),
    )


def fit_polynomial_baseline(
    df: DataFrame,
    degree: int,
    x_col: str = "bin",
    y_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Subtract a per-group numpy.polyfit baseline of ``degree``
    (snr.py:343-362's Polynom method). Appends ``baseline``;
    ``y_col`` becomes the residual."""
    import numpy as np

    group_cols = group_cols or []
    schema_cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{schema_cols}, baseline double"

    def debase(pdf):
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        coeffs = np.polyfit(x, y, degree)
        base = np.polyval(coeffs, x)
        pdf = pdf.copy()
        pdf["baseline"] = base
        pdf[y_col] = y - base
        return pdf

    if group_cols:
        return df.groupBy(*group_cols).applyInPandas(debase, schema=out_schema)
    return df.withColumn("__g", F.lit(1)).groupBy("__g").applyInPandas(
        lambda pdf: debase(pdf.drop(columns="__g")), schema=out_schema
    )


def _lm_gauss_fit(x, n):
    """Deterministic Levenberg-Marquardt fit of
    A*exp(-0.5*((x-mu)/sigma)^2) + C to histogram counts — the
    reference's leastsq model (snr.py:536-542) with (mu, sigma) free.
    Pure numpy (scipy is optional in this environment); analytic
    Jacobian, multiplicative damping, ~O(bins) per iteration."""
    import numpy as np

    tot = float(n.sum())
    if tot <= 0 or len(x) < 5:
        return None
    mu = float(x[int(np.argmax(n))])  # peak-seeded: tails can't drag it
    var = float(((x - mu) ** 2 * n).sum() / tot)
    sig = float(np.sqrt(var)) or float(x.max() - x.min() or 1.0)
    c = float(n.min())
    a = float(n.max()) - c
    p = np.array([a if a > 0 else 1.0, mu, sig, c])

    def model(p):
        z = (x - p[1]) / p[2]
        e = np.exp(-0.5 * z * z)
        return p[0] * e + p[3], e, z

    f, e, z = model(p)
    r = n - f
    cost = float(r @ r)
    lam = 1e-3
    for _ in range(60):
        jac = np.column_stack(
            [e, p[0] * e * z / p[2], p[0] * e * z * z / p[2], np.ones_like(x)]
        )
        jtj = jac.T @ jac
        g = jac.T @ r
        try:
            dp = np.linalg.solve(jtj + lam * np.diag(np.diag(jtj)), g)
        except np.linalg.LinAlgError:
            lam *= 10.0
            if lam > 1e12:
                break
            continue
        p_new = p + dp
        if p_new[2] == 0.0:
            p_new[2] = p[2]
        f2, e2, z2 = model(p_new)
        r2 = n - f2
        c2 = float(r2 @ r2)
        if c2 <= cost:
            converged = float(np.abs(dp).max()) < 1e-12 * max(
                1.0, float(np.abs(p).max())
            )
            p, f, e, z, r, cost = p_new, f2, e2, z2, r2, c2
            lam = max(lam * 0.3, 1e-12)
            if converged:
                break
        else:
            lam *= 10.0
            if lam > 1e12:
                break
    return float(p[1]), abs(float(p[2])), float(p[0]), float(p[3])


def fit_histogram_gaussian(
    df: DataFrame,
    value_col: str = "value",
    bins: int = 50,
    group_cols: list[str] | None = None,
    method: str = "moments",
) -> DataFrame:
    """Histogram + Gaussian parameters per group, two modes.

    ``method="fit"`` — the reference's approach: leastsq a Gaussian
    (+ constant offset) to the binned counts (subdyn.py:306-324 plots
    it; snr.py:536-542 runs the leastsq). This is a PEAK fit: an RFI
    tail adds low-count bins far from the peak, which barely perturb
    it. Adds ``gauss_amp``/``gauss_offset`` columns. The optimizer
    (numpy LM, deterministic) runs per group over the ``bins``
    histogram rows via applyInPandas — the fact table itself never
    reaches Python, only its ``bins``-row summary does.

    ``method="moments"`` (default) — closed-form moment matching over
    the same binned counts: identical for clean Gaussian data, no
    optimizer, 100% JVM-side; but moments ARE dragged by contaminated
    tails (that is precisely why the reference fits — see the pytest
    contaminated-fixture case where the two disagree)."""
    if method not in ("moments", "fit"):
        raise ValueError(f"unknown method {method!r}")
    group_cols = group_cols or []
    bounds = df.groupBy(*group_cols).agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )
    joined = (
        df.join(F.broadcast(bounds), on=group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    b = F.least(
        F.floor((F.col(value_col) - F.col("__lo")) / width).cast("int"),
        F.lit(bins - 1),
    )
    hist = (
        joined.withColumn("__bin", b)
        .groupBy(*group_cols, "__bin", "__lo", "__hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "center",
            F.col("__lo")
            + (F.col("__bin") + 0.5) * (F.col("__hi") - F.col("__lo")) / bins,
        )
    )
    if method == "fit":
        import numpy as np

        key_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        schema_parts = [f"{c} {key_fields[c]}" for c in group_cols]
        schema_parts += [
            "n_total long",
            "gauss_mean double",
            "gauss_sigma double",
            "gauss_amp double",
            "gauss_offset double",
        ]
        out_schema = ", ".join(schema_parts)

        def fit_group(key, pdf):
            import pandas as pd

            x = pdf["center"].to_numpy(dtype="float64")
            n = pdf["n"].to_numpy(dtype="float64")
            order = np.argsort(x)  # group rows arrive in shuffle order
            x, n = x[order], n[order]
            res = _lm_gauss_fit(x, n)
            if res is None:
                mean = sig = amp = off = float("nan")
            else:
                mean, sig, amp, off = res
            row = dict(zip(group_cols, key))
            row.update(
                n_total=int(n.sum()), gauss_mean=mean, gauss_sigma=sig,
                gauss_amp=amp, gauss_offset=off,
            )
            return pd.DataFrame([row], columns=[p.split(" ")[0] for p in schema_parts])

        if group_cols:
            return hist.groupBy(*group_cols).applyInPandas(fit_group, out_schema)
        return (
            hist.withColumn("__g", F.lit(1))
            .groupBy("__g")
            .applyInPandas(
                lambda key, pdf: fit_group((), pdf.drop(columns="__g")),
                out_schema,
            )
        )

    out = hist.groupBy(*group_cols).agg(
        F.sum("n").alias("n_total"),
        (F.sum(F.col("center") * F.col("n")) / F.sum("n")).alias("gauss_mean"),
    )
    second = hist.join(out, on=group_cols) if group_cols else hist.crossJoin(out)
    return (
        second.groupBy(*group_cols, "n_total", "gauss_mean")
        .agg(
            F.sqrt(
                F.sum(
                    F.pow(F.col("center") - F.col("gauss_mean"), F.lit(2.0))
                    * F.col("n")
                )
                / F.sum("n")
            ).alias("gauss_sigma")
        )
    )
