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


def write_tim(df: DataFrame, path: str, header: str = "FORMAT 1") -> None:
    """K5 sink: single text file with a header line. coalesce(1) is
    deliberate — a .tim file is a small human-facing artifact, not a
    data table."""
    spark = df.sparkSession
    head = spark.createDataFrame([(header,)], "toa_line string")
    head.unionByName(df.select("toa_line")).coalesce(1).write.mode(
        "overwrite"
    ).text(path)
