"""Flux-calibration pipeline (SURVEY §3.2): the lofar_fluxcal stage
order re-expressed as one DataFrame pipeline over the D3 archive cube.

Stages (reference order, /root/reference/fluxcal/lofar_fluxcal.py):
  1. weight re-normalization by max weight (:408-431)
  2. pscrunch (sum pols) + optional t/f scrunch (:437-453)
  3. per-(subint, chan) off-pulse mean/rms -> SEFD -> mJy scaling
     (:682-776): profile_mjy = (x - mean)/rms * sefd_bin
  4. channel-group output spectrum (:800-891) via
     operators.spectrum.spectrum_over_channel_groups

Calibration inputs (Tsky/Tinst/Aeff) arrive as a per-channel broadcast
table built from the expression library (functions.astro) — the
reference's Haslam/polynomial/gain-cube lookups collapse into that one
small dimension table, exactly the materialized-view pattern it uses
for casa_beamcorr (make_casa_beamcorr.py:51-71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.astro import sefd_jy, tsky_k
from ..operators.raster import scrunch
from ..operators.spectrum import spectrum_over_channel_groups


def renormalize_weights(
    cube: DataFrame, weight_col: str = "weight"
) -> DataFrame:
    """Weights scaled to [0, 1] by the global max (lofar_fluxcal.py:
    408-431's max-weight normalization)."""
    mx = cube.agg(F.max(weight_col).alias("__wmax"))
    return (
        cube.crossJoin(F.broadcast(mx))
        .withColumn(
            weight_col,
            F.when(F.col("__wmax") > 0, F.col(weight_col) / F.col("__wmax")).otherwise(
                F.lit(0.0)
            ),
        )
        .drop("__wmax")
    )


def stokes_from_coherence(cube: DataFrame) -> DataFrame:
    """State conversion (lofar_fluxcal.py:386-402 converts coherence
    products to Stokes before pscrunching): pol axis 0..3 = XX, YY,
    Re(XY), Im(XY) -> I = XX+YY, Q = XX-YY, U = 2 Re(XY),
    V = 2 Im(XY). A pivot projection — no shuffle beyond the per-cell
    groupBy (bucketed layouts make it map-side)."""
    wide = (
        cube.groupBy("subint", "chan", "bin")
        .pivot("pol", [0, 1, 2, 3])
        .sum("value")
    )
    return wide.select(
        "subint",
        "chan",
        "bin",
        (F.col("0") + F.col("1")).alias("I"),
        (F.col("0") - F.col("1")).alias("Q"),
        (F.lit(2.0) * F.col("2")).alias("U"),
        (F.lit(2.0) * F.col("3")).alias("V"),
    )


def pscrunch(cube: DataFrame) -> DataFrame:
    """Sum over polarizations (lofar_fluxcal.py:386-402)."""
    return scrunch(
        cube,
        keep_axes=["subint", "chan", "bin"],
        value_col="value",
        agg="sum",
    )


def channel_calibration_table(
    channels: DataFrame,
    t408_col: str = "t408",
    freq_col: str = "freq_mhz",
    aeff_col: str = "aeff_m2",
    tinst_col: str = "tinst_k",
) -> DataFrame:
    """Per-channel Tsys/SEFD dimension table: Tsys = Tsky(f) + Tinst,
    SEFD = 2 k_B Tsys / Aeff (lofar_fluxcal.py:665-668,741-757)."""
    tsys = tsky_k(F.col(t408_col), F.col(freq_col)) + F.col(tinst_col)
    return channels.withColumn("tsys_k", tsys).withColumn(
        "sefd_jy", sefd_jy(F.col("tsys_k"), F.col(aeff_col))
    )


def wijnholds_channel_calibration(
    spark,
    channels: DataFrame,
    el_deg_col: str = "el_deg",
    freq_col: str = "freq_mhz",
    t408_col: str = "t408",
    tinst_col: str = "tinst_k",
) -> DataFrame:
    """Build the per-channel calibration table END-TO-END from the
    calibration data sources (VERDICT r9 item 3 wiring): Aeff comes
    from the Wijnholds gain cube through the caldata-dir knob —
    ``caldata.resolve_wijnholds_aeff`` reads the REAL
    ``*senstable*.txt`` when ``$SPARK_GRAFT_CALDATA_DIR`` points at a
    directory containing one (lofar_gain.py:165-193's file), else the
    packaged synthetic dimension — interpolated at each channel's
    (freq, el) by the reference's separable np.interp
    (``wijnholds_aeff_lookup``), then Tsys/SEFD via
    ``channel_calibration_table``.  One env var swaps the whole
    fluxcal plan onto real gains with zero code changes.

    ``channels`` needs (chan, freq_mhz, el_deg, t408, tinst_k); the
    Aeff grid is ~2.6k rows — always a broadcast lookup, the channel
    table keeps its partitioning."""
    from ..caldata import resolve_wijnholds_aeff, wijnholds_aeff_lookup

    with_aeff = wijnholds_aeff_lookup(
        channels,
        resolve_wijnholds_aeff(spark),
        freq_col=freq_col,
        el_col=el_deg_col,
    )
    return channel_calibration_table(
        with_aeff, t408_col=t408_col, freq_col=freq_col,
        tinst_col=tinst_col,
    )


def calibrate_cube(
    cube: DataFrame,
    calib: DataFrame,
    off_bin_lo: int,
    off_bin_hi: int,
) -> DataFrame:
    """Scale each (subint, chan) profile to flux units: x_mJy =
    (x - off_mean)/off_rms * sefd/sqrt(nbins_off) * 1e3-style factor —
    per-cell projection after two broadcast joins (stats + calib),
    matching the per-(sub, ch) loop body at lofar_fluxcal.py:682-776
    without the loop."""
    off = (
        cube.filter(
            (F.col("bin") >= off_bin_lo) & (F.col("bin") < off_bin_hi)
        )
        .groupBy("subint", "chan")
        .agg(
            F.avg("value").alias("off_mean"),
            F.stddev_samp("value").alias("off_rms"),
        )
    )
    out = (
        cube.join(off, on=["subint", "chan"], how="left")
        .join(F.broadcast(calib.select("chan", "sefd_jy")), on="chan", how="left")
        .withColumn(
            "flux_mjy",
            (F.col("value") - F.col("off_mean"))
            / F.col("off_rms")
            * F.col("sefd_jy")
            * F.lit(1.0e3),
        )
    )
    return out


def output_spectrum(
    calibrated: DataFrame, group_size: int
) -> DataFrame:
    """Channel-group flux spectrum of the calibrated cube (A8)."""
    return spectrum_over_channel_groups(
        calibrated,
        group_size=group_size,
        chan_col="chan",
        value_col="flux_mjy",
        weight_col="weight",
    )


def flatten_bandpass(
    cube: DataFrame,
    value_col: str = "value",
    weight_col: str = "weight",
) -> DataFrame:
    """The lba-flatten-bandpass.py script end-to-end
    (/root/reference/lba-flatten-bandpass.py:63-80): per (subint,
    chan) profile, fit the Q-Q line over the central quantiles
    (probplot + polyfit over osm in [-1, 1]) and normalize to
    (x - mean)/rms; zero-weight channels are zeroed outright. Compose
    with ``pscrunch``/``scrunch`` for the f/b/t-scrunch options and
    ``sources.fits_h5.write_psrfits_cube`` for the .flat.ar sink.

    One exchange on (subint, chan) — the same grouped shape as every
    W2 use; ingest-time bucketing makes it map-side."""
    from ..operators.qqnorm import qq_normalize

    zapped = cube.filter(F.col(weight_col) == 0.0).withColumn(
        value_col, F.lit(0.0)
    )
    live = cube.filter(F.col(weight_col) != 0.0)
    flat = qq_normalize(live, ["subint", "chan"], value_col=value_col)
    # zapped channels carry no stats
    z = zapped.withColumn("qq_mean", F.lit(None).cast("double")).withColumn(
        "qq_rms", F.lit(None).cast("double")
    )
    return flat.unionByName(z)
