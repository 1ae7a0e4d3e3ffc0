"""Report sinks & caching utilities (SURVEY §2.1 K2/K3/K5, §2.3 J7).

* rfirep_lines — the .rfirep bad-channel report
  (/root/reference/subdyn.py:605-611): one line per rejected subband
  with its clipped fraction.
* flux_ascii_lines — the per-(subint, chan) flux table rows
  (/root/reference/fluxcal/lofar_fluxcal.py:770-772 column layout).
* materialize — K3's pickle-cache pattern as a Parquet intermediate:
  write once, read back as a fresh scan (predicate pushdown applies to
  the cached copy, unlike .cache()).
* validated_station_join — J7 (/root/reference/fluxcal/
  get_flagged_tiles.py:79-105): join on (date, station-substring) and
  ERROR on 0 or >1 distinct matches, expressed as a count-validated
  join returning a match_status column instead of raising mid-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rfirep_lines(clip_fracs: DataFrame, rfilimit: float = 0.1) -> DataFrame:
    """(chan, clip_frac) -> rejected channels with report lines
    (subdyn.py:605-611 writes '# chan  fraction')."""
    bad = clip_fracs.filter(F.col("clip_frac") >= F.lit(float(rfilimit)))
    return bad.withColumn(
        "rfirep_line",
        F.format_string("%d\t%.4f", F.col("chan").cast("int"), F.col("clip_frac")),
    )


def flux_ascii_lines(calibrated: DataFrame) -> DataFrame:
    """Per-(subint, chan) flux rows in the reference's ascii layout:
    'subint chan freq flux_mJy err_mJy' (lofar_fluxcal.py:770-772)."""
    return calibrated.withColumn(
        "flux_line",
        F.format_string(
            "%4d %5d %10.4f %12.5f %12.5f",
            F.col("subint").cast("int"),
            F.col("chan").cast("int"),
            F.col("freq_mhz"),
            F.col("flux_mjy"),
            F.col("flux_err_mjy"),
        ),
    )


def write_report(lines: DataFrame, line_col: str, path: str, header: str | None = None) -> None:
    """K5 text sink (small human-facing artifact -> single file)."""
    spark = lines.sparkSession
    body = lines.select(F.col(line_col).alias("line"))
    if header is not None:
        body = spark.createDataFrame([(header,)], "line string").unionByName(body)
    body.coalesce(1).write.mode("overwrite").text(path)


def materialize(df: DataFrame, path: str) -> DataFrame:
    """K3 cache: persist an expensive intermediate as Parquet and
    return a scan of it (dynsp.py:137-148's pickle --load path)."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def validated_station_join(
    obs: DataFrame,
    flagged: DataFrame,
    obs_station_col: str = "station",
    flagged_station_col: str = "substation",
    on_date_cols: tuple[str, str] = ("date", "date"),
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """J7: per observation row, flagged-summary rows whose substation
    string contains the observation's station, same date; appends
    n_matches and match_status ('ok' | 'missing' | 'ambiguous') —
    get_flagged_tiles.py:79-105 raises on 0 or >1 distinct matches.

    ``payload_cols`` are carried from the (unique) match; default =
    every flagged column except the join keys."""
    if payload_cols is None:
        payload_cols = [
            c
            for c in flagged.columns
            if c not in (on_date_cols[1], flagged_station_col)
        ]
    fl = flagged.select(
        F.col(on_date_cols[1]).alias("__fdate"),
        F.col(flagged_station_col).alias("__fsub"),
        *payload_cols,
    )
    joined = obs.join(
        F.broadcast(fl),
        (F.col(on_date_cols[0]) == F.col("__fdate"))
        & F.col("__fsub").contains(F.col(obs_station_col)),
        "left",
    )
    counts = joined.groupBy(*obs.columns).agg(
        F.countDistinct("__fsub").alias("n_matches"),
        *[F.first(c, ignorenulls=True).alias(c) for c in payload_cols],
    )
    return counts.withColumn(
        "match_status",
        F.when(F.col("n_matches") == 1, "ok")
        .when(F.col("n_matches") == 0, "missing")
        .otherwise("ambiguous"),
    )


def flagged_tiles_summary(
    flagged: DataFrame,
    antenna: str = "HBA",
    station_col: str = "substation",
    ntiles_col: str = "ntiles",
) -> DataFrame:
    """The flagged-tiles observation summary
    (/root/reference/fluxcal/get_flagged_tiles.py:85-139): given the
    per-(sub)station flagged counts already scoped to one observation
    (date-filtered + station-list joined — compose with
    ``validated_station_join``), produce the reference's
    '%g %d %d' output triple plus the worst-station diagnostics:

    * total_tiles by station class — HBA: CS sub-stations carry 24
      tiles, RS 48, international 96; LBA: CS/RS 48, international 96
      (:114-125);
    * nflagged = sum of flagged counts, fraction = nflagged/total;
    * worst = max count, st_worst = ALL stations tied at the max
      (:89-105 appends ties), sorted for determinism;
    * worst_fraction uses the reference's class precedence: any CS in
      the tie -> CS denominator, else RS, else international
      (:117-131).

    One hash aggregation; the tie scan is an array expression over the
    collected (count, station) pairs — an observation has tens of
    stations, so the collected list is a scalar-sized working set."""
    cls = F.substring(F.col(station_col), 1, 2)
    if antenna == "HBA":
        den = (
            F.when(cls == "CS", F.lit(24.0))
            .when(cls == "RS", F.lit(48.0))
            .otherwise(F.lit(96.0))
        )
    else:
        den = F.when(
            (cls == "CS") | (cls == "RS"), F.lit(48.0)
        ).otherwise(F.lit(96.0))
    keyed = flagged.select(
        F.col(station_col).alias("__st"),
        F.col(ntiles_col).cast("int").alias("__n"),
        den.alias("__den"),
    )
    agg = keyed.agg(
        F.sum("__n").alias("nflagged"),
        F.sum("__den").alias("total_tiles"),
        F.collect_list(F.struct("__n", "__st", "__den")).alias("__items"),
    )
    worst = F.array_max(F.transform(F.col("__items"), lambda x: x["__n"]))
    ties = F.filter(F.col("__items"), lambda x: x["__n"] == worst)
    worst_stations = F.sort_array(
        F.transform(ties, lambda x: x["__st"])
    )
    # reference precedence: any CS among the worst -> /24 (HBA) else
    # RS -> /48 else /96 (get_flagged_tiles.py:117-131)
    worst_den = F.array_min(F.transform(ties, lambda x: x["__den"]))
    return agg.select(
        (F.col("nflagged") / F.col("total_tiles")).alias("fraction"),
        F.col("nflagged"),
        F.col("total_tiles").cast("long").alias("total_tiles"),
        worst.alias("worst_ntiles"),
        worst_stations.alias("worst_stations"),
        (worst / worst_den).alias("worst_fraction"),
        # Java %g keeps trailing zeros where C/CPython strips them —
        # normalize so the line is byte-identical to the reference's
        # print "%g %d %d" (get_flagged_tiles.py:139)
        F.concat_ws(
            " ",
            F.regexp_replace(
                F.format_string("%g", F.col("nflagged") / F.col("total_tiles")),
                r"\.?0+(e|$)",
                "$1",
            ),
            F.col("nflagged").cast("string"),
            F.col("total_tiles").cast("long").cast("string"),
        ).alias("summary_line"),
    )
