"""Single-pulse -> TOA file formatting (SURVEY §2.1 K5; D4).

Re-expresses /root/reference/sp2tim.py: take PRESTO .singlepulse rows
(dm, sigma, t, offset, downfact) plus the .inf epoch, compute each
pulse's arrival MJD with the (int, frac) split preserved at full
precision (sp2tim.py:126-131 keeps MJD as strings to avoid double
rounding), and render Tempo/Tempo2-style TOA lines (sp2tim.py:133-187
has 8 variants; the two principal ones are implemented, the rest are
format-string changes).

High-precision rule: mjd = epoch_int + (epoch_frac + t/86400), with
carry into the int part when the frac crosses 1.0 — all in column
arithmetic; the fractional part is rendered at 13 digits via
format_string, so the double's full precision survives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SECONDS_PER_DAY = 86400.0


def arrival_mjd_cols(
    t: Column, epoch_int: Column, epoch_frac: Column, render_digits: int = 13
) -> tuple[Column, Column]:
    """(mjd_int, mjd_frac) of epoch + t seconds, frac carried.

    The frac is pre-rounded at the rendering precision and re-carried:
    otherwise a frac like 0.9999999999999995 formats as
    '1.0000000000000' and the printed TOA loses a full day."""
    frac = epoch_frac + t / F.lit(SECONDS_PER_DAY)
    carry = F.floor(frac).cast("bigint")
    frac = F.round(frac - carry, render_digits)
    carry2 = F.floor(frac).cast("bigint")
    return (
        (epoch_int + carry + carry2).alias("mjd_int"),
        (frac - carry2).alias("mjd_frac"),
    )


def toa_lines_tempo2(
    sp: DataFrame,
    epoch_int: Column,
    epoch_frac: Column,
    freq_mhz: float = 150.0,
    site: str = "b",
    name_col: str = "obs_id",
    err_us: float = 10.0,
) -> DataFrame:
    """Tempo2 .tim rows: 'name freq MJD err site' (sp2tim.py's tempo2
    branch). MJD rendered as int + 13-digit frac so the string
    concatenation never loses precision."""
    mjd_int, mjd_frac = arrival_mjd_cols(F.col("t"), epoch_int, epoch_frac)
    w = sp.withColumn("mjd_int", mjd_int).withColumn("mjd_frac", mjd_frac)
    line = F.format_string(
        "%s %.3f %d.%s %.2f %s",
        F.col(name_col),
        F.lit(float(freq_mhz)),
        F.col("mjd_int"),
        F.substring(F.format_string("%.13f", F.col("mjd_frac")), 3, 13),
        F.lit(float(err_us)),
        F.lit(site),
    )
    return w.withColumn("toa_line", line)


def toa_lines_presto(sp: DataFrame, epoch_int: Column, epoch_frac: Column) -> DataFrame:
    """PRESTO-style variant: '# DM sigma' trailer retained
    (sp2tim.py's default branch keeps dm/sigma per line)."""
    mjd_int, mjd_frac = arrival_mjd_cols(F.col("t"), epoch_int, epoch_frac)
    w = sp.withColumn("mjd_int", mjd_int).withColumn("mjd_frac", mjd_frac)
    line = F.format_string(
        "%d.%s %8.2f %6.2f",
        F.col("mjd_int"),
        F.substring(F.format_string("%.13f", F.col("mjd_frac")), 3, 13),
        F.col("dm"),
        F.col("sigma"),
    )
    return w.withColumn("toa_line", line)


def reference_toa_str(
    offset: Column, startmjd: float, tres_s: float
) -> Column:
    """The reference's TOA string: '%.13f' % (startmjd +
    offset*tres/86400) — plain double formatting (sp2tim.py:126),
    precision bounded by the double at ~1e-11 day. Use
    ``arrival_mjd_cols`` when full precision matters; this form exists
    for byte parity with the reference's .tim output.

    Java's %f pads the shortest double repr with zeros instead of
    expanding the exact binary value (CPython expands), so the 13
    fractional digits are rendered from round(frac*1e13) as an
    integer — identical to CPython's output except when the exact
    expansion sits within ~1e-4 of the final-digit rounding boundary
    (~1e-11 day, below the timing noise the reference accepts)."""
    mjd = F.lit(float(startmjd)) + offset.cast("double") * F.lit(
        float(tres_s)
    ) / F.lit(SECONDS_PER_DAY)
    mjd_int = F.floor(mjd).cast("bigint")
    frac13 = F.round((mjd - mjd_int) * F.lit(1.0e13)).cast("bigint")
    # a frac of .99999999999996+ rounds up to 1e13: carry into the day
    carry = (frac13 >= F.lit(10_000_000_000_000)).cast("bigint")
    frac13 = frac13 - carry * F.lit(10_000_000_000_000)
    return F.format_string("%d.%013d", mjd_int + carry, frac13)


def toa_lines_reference(
    sp: DataFrame,
    startmjd: float,
    tres_s: float,
    freq_mhz: float,
    source: str = "J0000+0000",
    obscode: str = "1",
    tempo2: bool = False,
    phase_col: str | None = None,
    col6_col: str | None = None,
    extra: str = "",
) -> DataFrame:
    """All 8 of the reference's .tim line variants (sp2tim.py:133-187):
    {Tempo2, Princeton} x {with/without polyco phase} x {optional
    .singlepulse col6 and/or --extra field}, byte-exact printf shapes.

    Expects columns (sigma double, downfact int, offset int). unc is
    '%9f' % (tres*1e6) (sp2tim.py:110); Tempo2's first field is the
    comma-joined sigma,downfact[,phase][,col6][,extra] blob, Princeton
    is the fixed-width Tempo1 layout with a literal '0.0' phase slot
    when no polyco is given. Pure column projection — formatting
    happens JVM-side, no UDF."""
    unc = "%9f" % (tres_s * 1_000_000.0)
    toa = reference_toa_str(F.col("offset"), startmjd, tres_s)
    sigma_s = F.col("sigma").cast("string")
    down_s = F.col("downfact").cast("string")
    phase = F.col(phase_col) if phase_col else None
    col6 = F.col(col6_col) if col6_col else None

    if tempo2:
        parts: list[Column] = [sigma_s, down_s]
        if phase is not None:
            parts.append(F.format_string("%f", phase))
        elif col6 is not None or extra:
            parts.append(F.lit(""))  # the ',,' empty phase slot
        if col6 is not None:
            parts.append(col6.cast("string"))
        if extra:
            parts.append(F.lit(extra))
        line = F.format_string(
            "%s   %8.3f   %s   %s   %s",
            F.concat_ws(",", *parts),
            F.lit(float(freq_mhz)),
            toa,
            F.lit(unc),
            F.lit(obscode),
        )
    else:
        head = F.format_string(
            "%1s %-12s %8.3f %-20s%9s%10s   %s   %s",
            F.lit(obscode),
            F.lit(source),
            F.lit(float(freq_mhz)),
            toa,
            F.lit(unc),
            F.lit("0"),
            sigma_s,
            down_s,
        )
        tail: list[Column] = []
        if phase is not None:
            tail.append(F.format_string("%f", phase))
        elif col6 is not None or extra:
            tail.append(F.lit("0.0"))
        if col6 is not None:
            tail.append(col6.cast("string"))
        if extra:
            tail.append(F.lit(extra))
        line = F.concat_ws("   ", head, *tail) if tail else head
    return sp.withColumn("toa_line", line)


def write_tim(df: DataFrame, path: str, header: str = "FORMAT 1") -> None:
    """K5 sink: single text file with a header line. coalesce(1) is
    deliberate — a .tim file is a small human-facing artifact, not a
    data table."""
    spark = df.sparkSession
    head = spark.createDataFrame([(header,)], "toa_line string")
    head.unionByName(df.select("toa_line")).coalesce(1).write.mode(
        "overwrite"
    ).text(path)
