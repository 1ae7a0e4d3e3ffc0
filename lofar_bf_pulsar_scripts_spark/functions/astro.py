"""Astro / physics column expressions (SURVEY §2.8).

Pure pyspark.sql.functions compositions — JVM-side, codegen-friendly,
no UDFs. Each function cites the reference lines whose formula it
re-expresses; formulas are standard pulsar-astronomy results (Lorimer
& Kramer 2004), independently re-derived here as column algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# dispersion constant in the reference's unit convention
# (/root/reference/simple-sh-scripts/dide:12-13: dt_ms = DM/2.41e-4 *
# (f1^-2 - f2^-2) with f in MHz)
_DISP_K = 2.41e-4

SECONDS_PER_DAY = 86400.0
MJD_UNIX_EPOCH = 40587  # MJD of 1970-01-01


def dispersion_delay_ms(dm: Column, f_lo_mhz: Column, f_hi_mhz: Column) -> Column:
    """Dispersive delay (ms) between two frequencies
    (dide:12-13): dt = DM/2.41e-4 * (f_lo^-2 - f_hi^-2)."""
    return (dm / F.lit(_DISP_K)) * (
        F.lit(1.0) / (f_lo_mhz * f_lo_mhz) - F.lit(1.0) / (f_hi_mhz * f_hi_mhz)
    )


def dm_from_delay_ms(dt_ms: Column, f_lo_mhz: Column, f_hi_mhz: Column) -> Column:
    """Inverse of dispersion_delay_ms (simple-sh-scripts/dm:12-13)."""
    return (
        dt_ms
        * F.lit(_DISP_K)
        / (F.lit(1.0) / (f_lo_mhz * f_lo_mhz) - F.lit(1.0) / (f_hi_mhz * f_hi_mhz))
    )


def channel_smearing_ms(dm: Column, f_mhz: Column, chan_bw_mhz: Column) -> Column:
    """Intra-channel dispersion smearing (dide variant: derivative of
    the delay over the channel width): 2 * K * DM * bw / f^3, K in the
    same convention."""
    return (
        F.lit(2.0) / F.lit(_DISP_K) * dm * chan_bw_mhz / (f_mhz * f_mhz * f_mhz)
    )


def scattering_time_ms(dm: Column, f_ghz: Column) -> Column:
    """Bhat et al. 2004 empirical scattering time
    (simple-sh-scripts/tscat:17-21): log10(tau_ms) =
    -6.46 + 0.154 log10(DM) + 1.07 (log10 DM)^2 - 3.86 log10(f_GHz)."""
    logdm = F.log10(dm)
    logtau = (
        F.lit(-6.46)
        + F.lit(0.154) * logdm
        + F.lit(1.07) * logdm * logdm
        - F.lit(3.86) * F.log10(f_ghz)
    )
    return F.pow(F.lit(10.0), logtau)


def mjd_from_unix_seconds(t: Column) -> Column:
    """MJD (double) from unix epoch seconds."""
    return t / F.lit(SECONDS_PER_DAY) + F.lit(float(MJD_UNIX_EPOCH))


def unix_seconds_from_mjd(mjd_int: Column, mjd_frac: Column) -> Column:
    """Unix seconds from the high-precision (int, frac) MJD pair
    (precision representation per pulsestack.py:44 / sp2tim.py:131 —
    the int part carries the days exactly, the frac carries sub-day)."""
    return (
        (mjd_int - F.lit(MJD_UNIX_EPOCH)).cast("double") * F.lit(SECONDS_PER_DAY)
        + mjd_frac * F.lit(SECONDS_PER_DAY)
    )


# --- pulsar derived quantities (simple-sh-scripts/ppdot:27-96) -------

def characteristic_age_yr(p: Column, pdot: Column) -> Column:
    """tau = P / (2 Pdot), in years (ppdot:27-96)."""
    return p / (F.lit(2.0) * pdot) / F.lit(86400.0 * 365.25)


def spindown_luminosity(p: Column, pdot: Column) -> Column:
    """Edot = 4 pi^2 I Pdot / P^3, I = 1e45 g cm^2 (ppdot)."""
    import math

    return F.lit(4.0 * math.pi**2 * 1e45) * pdot / F.pow(p, F.lit(3.0))


def surface_b_field_g(p: Column, pdot: Column) -> Column:
    """B_s = 3.2e19 sqrt(P Pdot) gauss (ppdot)."""
    return F.lit(3.2e19) * F.sqrt(p * pdot)


def lightcyl_b_field_g(p: Column, pdot: Column) -> Column:
    """B_lc = 2.94e8 Pdot^0.5 P^-5/2 gauss (ppdot)."""
    return F.lit(2.94e8) * F.sqrt(pdot) * F.pow(p, F.lit(-2.5))


# --- calibration math (fluxcal) --------------------------------------

def tsky_k(t408: Column, f_mhz: Column) -> Column:
    """Sky temperature scaled from the 408 MHz map
    (fluxcal/tsky.py:1059): T = 2.7 + T408 * (f/408)^-2.55."""
    return F.lit(2.7) + t408 * F.pow(f_mhz / F.lit(408.0), F.lit(-2.55))


def poly_eval(coeffs: list[float], x: Column) -> Column:
    """Horner evaluation of a polynomial with literal coefficients
    (highest degree first), as used for Tinst
    (fluxcal/lofar_tinst.py:45,60,79)."""
    acc: Column = F.lit(float(coeffs[0]))
    for c in coeffs[1:]:
        acc = acc * x + F.lit(float(c))
    return acc


def aeff_max_hba_m2(n_stations: Column, f_mhz: Column) -> Column:
    """HBA maximum effective area: N_tiles * 16 * min(lambda^2/3,
    1.5625) m^2 (fluxcal/lofar_gain_hamaker_carozzi.py:104-115)."""
    lam = F.lit(299.792458) / f_mhz  # c in m*MHz
    return n_stations * F.lit(16.0) * F.least(
        lam * lam / F.lit(3.0), F.lit(1.5625)
    )


def aeff_lba_m2(n_dipoles: Column, f_mhz: Column) -> Column:
    """LBA effective area: N * lambda^2 / 3
    (lofar_gain_hamaker_carozzi.py:104-115)."""
    lam = F.lit(299.792458) / f_mhz
    return n_dipoles * lam * lam / F.lit(3.0)


def band_average(f_lo_mhz: Column, f_hi_mhz: Column, fn, steps: int = 100) -> Column:
    """Band average of a spectral function by midpoint sampling over
    ``steps`` sub-intervals (the reference integrates Tsky/Tinst/Aeff
    over each channel this way: fluxcal/lofar_tinst.py:126-149,
    tsky.py:1096-1113, lofar_gain.py:423-445 — 101 midpoint samples).

    ``fn`` maps a frequency Column -> value Column. Implemented as a
    fold over sequence(0, steps-1) — pure column expression, no
    explode, no shuffle."""
    width = (f_hi_mhz - f_lo_mhz) / F.lit(float(steps))

    def step_val(acc: Column, i: Column) -> Column:
        f_mid = f_lo_mhz + (i.cast("double") + F.lit(0.5)) * width
        return acc + fn(f_mid)

    total = F.aggregate(
        F.sequence(F.lit(0), F.lit(steps - 1)), F.lit(0.0), step_val
    )
    return total / F.lit(float(steps))


def hour_angle_at_elevation(
    dec_deg: Column, lat_deg: Column, el_deg: Column
) -> Column:
    """Hour angle (hours) at which a source crosses elevation el:
    cos(HA) = (sin el - sin dec sin lat)/(cos dec cos lat)
    (scheduling/azlst.pl's rise/set geometry, ~245 LoC Perl).
    NULL-free: clamped to [0, 12] (never rises -> 0, circumpolar -> 12)."""
    import math

    d2r = math.pi / 180.0
    cos_ha = (
        F.sin(el_deg * F.lit(d2r))
        - F.sin(dec_deg * F.lit(d2r)) * F.sin(lat_deg * F.lit(d2r))
    ) / (F.cos(dec_deg * F.lit(d2r)) * F.cos(lat_deg * F.lit(d2r)))
    return F.acos(F.least(F.greatest(cos_ha, F.lit(-1.0)), F.lit(1.0))) / F.lit(
        d2r
    ) / F.lit(15.0)


def radiometer_noise_mjy(
    tsys_k: Column,
    aeff_m2: Column,
    tobs_s: Column,
    bw_hz: Column,
    npol: Column,
    beta: float = 1.0,
    bad_fraction: Column | None = None,
) -> Column:
    """Radiometer-equation flux noise in mJy
    (fluxcal/lofar_fluxcal.py:652-659): dS = 1e3 * 1e23 * 2 beta k_B
    Tsys / (Aeff_good * sqrt(npol * tobs * bw))."""
    k_b = 1.380649e-16  # erg/K
    good = F.lit(1.0) - (bad_fraction if bad_fraction is not None else F.lit(0.0))
    return (
        F.lit(1.0e3 * 1.0e23 * 2.0 * beta * k_b)
        * tsys_k
        / (good * aeff_m2 * F.lit(1.0e4) * F.sqrt(npol * tobs_s * bw_hz))
    )


def sefd_jy(tsys_k: Column, aeff_m2: Column) -> Column:
    """System equivalent flux density: 2 k_B Tsys / Aeff in Jy
    (fluxcal/lofar_fluxcal.py:741-757)."""
    k_b = 1.380649e-16
    return F.lit(2.0 * k_b * 1.0e23) * tsys_k / (aeff_m2 * F.lit(1.0e4))


def aeff_arisN_m2(
    n_elem: Column, f_mhz: Column, el_deg: Column
) -> Column:
    """'arisN' effective-area model: the analytic maximum scaled with
    elevation as sin(EL)^1.39, Noutsos et al. (2015)
    (fluxcal/lofar_gain.py:460-473; dispatched at
    lofar_psrflux.py:531,693). HBA (>=100 MHz): n*16*min(lambda^2/3,
    1.5625); LBA: n*lambda^2/3 — each scaled by the elevation term."""
    import math

    lam = F.lit(299.792458) / f_mhz
    base = F.when(
        f_mhz >= 100.0,
        n_elem * F.lit(16.0) * F.least(lam * lam / F.lit(3.0), F.lit(1.5625)),
    ).otherwise(n_elem * lam * lam / F.lit(3.0))
    el_scale = F.pow(F.sin(el_deg * F.lit(math.pi / 180.0)), F.lit(1.39))
    return base * el_scale


def station_nelem(station: Column) -> Column:
    """Element count by station class: CS/RS 48, international 96
    (lofar_gain.py:633-640)."""
    cls = F.substring(station, 1, 2)
    return F.when((cls == "CS") | (cls == "RS"), F.lit(48.0)).otherwise(
        F.lit(96.0)
    )
