"""lofar_psrflux.py as a named pipeline plan (SURVEY §3.2): the
script's per-channel flux calibration + output-spectrum loop
re-expressed as three hash aggregations.

Reference stage order (/root/reference/fluxcal/lofar_psrflux.py):
  1. per-channel calibration table (:492-560): Tsys = Tsky + Tinst,
     per-bin 1-sigma sensitivity
       sefd_mjy = delta_s * Tsys / (Aeff * sqrt(good_fraction)),
       delta_s  = 1e3*1e23*2*beta*k_B /
                  ((1-badtiles) * 1e4 * nstations^cohfactor
                   * sqrt(npol * (tobs/nbins) * chan_bw_hz))
     and the radiometer-advantage-free true SEFD (Jy)
       true_sefd = 1e23*2*beta*k_B*Tsys /
                   ((1-badtiles) * 1e4 * ns^coh * Aeff)
  2. per-channel profile normalization (:566-571):
       prof = (x - off_mean)/off_rms * sefd_mjy,  prof_err = sefd^2
  3. channel-group spectrum (:594-648) and total band (:652-680):
     totprof = sum(prof)/n_good, then peak/mean flux, S/N, effective
     width Weq = sum/max, duty cycle, profile significance
     sum(snr)/sqrt(Weq), chi^2 = sum(snr^2)/(nbins-1), flux error
     sqrt(sum(prof_err))/n_good/sqrt(nbins), real SEFD
     sqrt(sum(true_sefd^2)/n_good).

The per-channel loop becomes a broadcast-joined projection; the
spectrum loop becomes a (out_chan, bin) partial aggregation followed
by an (out_chan) collapse — every shuffle key is bounded by the
channel/bin grid, never the sample count, so the plan's exchanges
carry ~nchan*nbins rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.astro import tsky_k

KB_ERG_K = 1.3806488e-16  # lofar_psrflux.py:492 (erg/K)


def psrflux_constants(
    *,
    nstations: float,
    cohfactor: float,
    badtiles: float,
    npol: int,
    tobs_s: float,
    nbins: int,
    chan_bw_mhz: float,
    beta: float = 1.0,
) -> tuple[float, float]:
    """(delta_s, true_delta_s) of lofar_psrflux.py:516-518 — exposed
    so the oracle gate can embed the bit-identical doubles the plan
    uses."""
    import math

    scale = (1.0 - badtiles) * 1.0e4 * nstations**cohfactor
    delta_s = (
        1.0e3 * 1.0e23 * 2.0 * beta * KB_ERG_K
        / (scale * math.sqrt(npol * (tobs_s / nbins) * chan_bw_mhz * 1.0e6))
    )
    true_delta_s = 1.0e23 * 2.0 * beta * KB_ERG_K / scale
    return delta_s, true_delta_s


def psrflux_channel_table(
    channels: DataFrame,
    *,
    nstations: float,
    cohfactor: float,
    badtiles: float,
    npol: int,
    tobs_s: float,
    nbins: int,
    chan_bw_mhz: float,
    beta: float = 1.0,
    t408_col: str = "t408",
    freq_col: str = "freq_mhz",
    aeff_col: str = "aeff_m2",
    tinst_col: str = "tinst_k",
    goodfrac_col: str = "good_fraction",
) -> DataFrame:
    """Stage 1: the per-channel quantities of lofar_psrflux.py:492-560.
    ``channels`` carries (chan, freq_mhz, t408, aeff_m2, tinst_k,
    good_fraction); Aeff here is the single-station model value — the
    station count / coherence scaling and tile flagging are applied by
    the delta_s constants exactly as the script does. Channels with
    good_fraction == 0 keep NULL sefd (zapped; :552-556)."""
    tsys = tsky_k(F.col(t408_col), F.col(freq_col)) + F.col(tinst_col)
    delta_s, true_delta_s = psrflux_constants(
        nstations=nstations, cohfactor=cohfactor, badtiles=badtiles,
        npol=npol, tobs_s=tobs_s, nbins=nbins, chan_bw_mhz=chan_bw_mhz,
        beta=beta,
    )
    good = F.col(goodfrac_col)
    return (
        channels.withColumn("tsys_k", tsys)
        .withColumn(
            "sefd_mjy",
            F.when(
                good > 0,
                F.lit(delta_s) * F.col("tsys_k")
                / (F.col(aeff_col) * F.sqrt(good)),
            ),
        )
        .withColumn(
            "true_sefd_jy",
            F.when(
                good > 0,
                F.lit(true_delta_s) * F.col("tsys_k") / F.col(aeff_col),
            ),
        )
    )


def psrflux_calibrate(
    profiles: DataFrame,
    chan_table: DataFrame,
    off_bin_lo: int,
    off_bin_hi: int,
    chan_col: str = "chan",
    bin_col: str = "bin",
    value_col: str = "value",
) -> DataFrame:
    """Stage 2: per-channel normalization to flux units
    (lofar_psrflux.py:566-571, 'Off' mean_rms method :513-519):
    prof_mjy = (x - off_mean)/off_rms * sefd_mjy over the off window
    [off_bin_lo, off_bin_hi); prof_err = sefd^2. Zapped channels
    (NULL sefd) yield NULL flux — downstream counts exclude them the
    way the script's nzapped bookkeeping does."""
    off = (
        profiles.filter(
            (F.col(bin_col) >= off_bin_lo) & (F.col(bin_col) < off_bin_hi)
        )
        .groupBy(chan_col)
        .agg(
            F.avg(value_col).alias("off_mean"),
            F.stddev_pop(value_col).alias("off_rms"),
        )
    )
    cal = F.broadcast(
        chan_table.select(chan_col, "sefd_mjy", "true_sefd_jy")
    )
    return (
        profiles.join(F.broadcast(off), on=chan_col, how="left")
        .join(cal, on=chan_col, how="left")
        .withColumn(
            "prof_mjy",
            (F.col(value_col) - F.col("off_mean"))
            / F.col("off_rms")
            * F.col("sefd_mjy"),
        )
        .withColumn("prof_err", F.col("sefd_mjy") * F.col("sefd_mjy"))
    )


def _band_metrics(
    grouped: DataFrame,
    nbins: int,
    off_bin_lo: int,
    off_bin_hi: int,
    group_col: str = "out_chan",
    bin_col: str = "bin",
) -> DataFrame:
    """Shared spectrum/total-band collapse (lofar_psrflux.py:594-648):
    ``grouped`` carries one row per (group, bin) with totprof (already
    normalized by n_good), plus per-group flux_err_sum,
    true_sefd_sq_sum, n_good constants."""
    g = F.col(group_col)
    off = F.col(bin_col).between(off_bin_lo, off_bin_hi - 1)
    agg = grouped.groupBy(group_col).agg(
        F.avg(F.when(off, F.col("totprof"))).alias("off_mean"),
        (
            F.sqrt(
                F.avg(F.when(off, F.col("totprof") * F.col("totprof")))
                - F.pow(F.avg(F.when(off, F.col("totprof"))), F.lit(2.0))
            )
        ).alias("off_rms"),
        F.max("totprof").alias("flux_peak"),
        F.avg("totprof").alias("flux_mean"),
        F.sum("totprof").alias("prof_sum"),
        F.sum(F.col("totprof") * F.col("totprof")).alias("prof_sq_sum"),
        F.first("flux_err_sum").alias("flux_err_sum"),
        F.first("true_sefd_sq_sum").alias("true_sefd_sq_sum"),
        F.first("n_good").alias("n_good"),
        F.min("freq_lo_mhz").alias("freq_lo_mhz"),
        F.max("freq_hi_mhz").alias("freq_hi_mhz"),
    )
    # snr sums expand algebraically: sum((x-m)/r) = (sum x - n m)/r,
    # sum(((x-m)/r)^2) = (sum x^2 - 2 m sum x + n m^2)/r^2 — so the
    # second pass over bins the script does is one more expression
    n = float(nbins)
    snr_sum = (F.col("prof_sum") - F.lit(n) * F.col("off_mean")) / F.col(
        "off_rms"
    )
    snr_sq_sum = (
        F.col("prof_sq_sum")
        - F.lit(2.0) * F.col("off_mean") * F.col("prof_sum")
        + F.lit(n) * F.col("off_mean") * F.col("off_mean")
    ) / (F.col("off_rms") * F.col("off_rms"))
    weq = F.col("prof_sum") / F.col("flux_peak")
    sens = F.sqrt(F.col("flux_err_sum")) / F.col("n_good")
    return agg.select(
        g,
        ((F.col("freq_lo_mhz") + F.col("freq_hi_mhz")) / 2.0).alias(
            "freq_mhz"
        ),
        F.sqrt(F.col("true_sefd_sq_sum") / F.col("n_good")).alias(
            "real_sefd_jy"
        ),
        (snr_sum / F.lit(n)).alias("snr_mean"),
        ((F.col("flux_peak") - F.col("off_mean")) / F.col("off_rms")).alias(
            "snr_peak"
        ),
        # Weq = sum(prof)/max(prof) <= 0 happens on pure-noise
        # profiles (no pulsed flux): the script's numpy sqrt would
        # emit NaN there; NULL is that semantics spelled so BOTH
        # engines agree (DuckDB sqrt(neg) ERRORS instead of NaN-ing —
        # surfaced by the r13 sf0.1 full-registry sweep, where one
        # synthetic band's profile sum goes negative)
        F.when(weq > 0, snr_sum / F.sqrt(weq)).alias(
            "prof_significance"
        ),
        (snr_sq_sum / F.lit(n - 1.0)).alias("chi2_dof"),
        weq.alias("weff_bins"),
        (F.lit(100.0) * weq / F.lit(n)).alias("duty_cycle_pct"),
        F.col("flux_peak").alias("flux_peak_mjy"),
        sens.alias("sensitivity_mjy"),
        F.col("flux_mean").alias("flux_mean_mjy"),
        (sens / F.lit(n**0.5)).alias("flux_mean_err_mjy"),
        F.col("n_good"),
    )


def psrflux_spectrum(
    calibrated: DataFrame,
    chan_table: DataFrame,
    *,
    nbins: int,
    group_size: int,
    chan_bw_mhz: float,
    off_bin_lo: int,
    off_bin_hi: int,
    chan_col: str = "chan",
    bin_col: str = "bin",
    freq_col: str = "freq_mhz",
) -> DataFrame:
    """Stage 3, spectrum flavor (lofar_psrflux.py:594-648): channels
    fold into out_chan blocks of ``group_size``; zapped channels are
    excluded from totprof and from the n_good normalizer. Pass
    ``group_size >= nchan`` for the total-band flavor (:652-680)."""
    out_chan = F.floor(F.col(chan_col) / F.lit(int(group_size))).cast(
        "int"
    )
    live = calibrated.filter(F.col("prof_mjy").isNotNull())
    per_bin = (
        live.withColumn("out_chan", out_chan)
        .groupBy("out_chan", bin_col)
        .agg(F.sum("prof_mjy").alias("prof_sum_raw"))
    )
    ct = chan_table.withColumn("out_chan", out_chan)
    per_group = (
        ct.groupBy("out_chan")
        .agg(
            F.sum((F.col("sefd_mjy").isNotNull()).cast("int")).alias(
                "n_good"
            ),
            F.sum(F.col("sefd_mjy") * F.col("sefd_mjy")).alias(
                "flux_err_sum"
            ),
            F.sum(F.col("true_sefd_jy") * F.col("true_sefd_jy")).alias(
                "true_sefd_sq_sum"
            ),
            F.min(freq_col).alias("freq_lo_mhz"),
            (F.max(freq_col) + F.lit(float(chan_bw_mhz))).alias(
                "freq_hi_mhz"
            ),
        )
        .filter(F.col("n_good") > 0)
    )
    grouped = per_bin.join(F.broadcast(per_group), on="out_chan").withColumn(
        "totprof", F.col("prof_sum_raw") / F.col("n_good")
    )
    return _band_metrics(
        grouped, nbins, off_bin_lo, off_bin_hi, bin_col=bin_col
    )
