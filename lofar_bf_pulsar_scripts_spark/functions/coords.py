"""Coordinate / time column expressions (SURVEY §2.8).

Re-expresses the reference's Perl/Python coordinate utilities as pure
column trig (all standard spherical-astronomy formulas, Meeus 1998):

* ra/dec sexagesimal parsing (bfscheduler.py:109-118,
  fluxcal/lofar_fluxcal.py:238-243)
* JD/MJD from calendar date (scheduling/jd.pl:19-60)
* GMST/LST from UTC (scheduling/sid.pl:40-57)
* az/el from (ra, dec, lst, lat) (scheduling/azza.pl)
* equatorial -> galactic (fluxcal/tsky.py:1116-1123 uses pyephem; the
  closed-form rotation to J2000 galactic pole is standard)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

D2R = math.pi / 180.0


def _split3(col: Column, sep: str = ":") -> tuple[Column, Column, Column]:
    parts = F.split(col, sep)
    get = lambda i: F.element_at(parts, i).cast("double")
    return get(1), get(2), F.coalesce(get(3), F.lit(0.0))


def ra_hms_to_deg(col: Column) -> Column:
    """'HH:MM:SS.S' -> degrees (bfscheduler.py:109-113)."""
    h, m, s = _split3(col)
    return (h + m / 60.0 + s / 3600.0) * F.lit(15.0)


def dec_dms_to_deg(col: Column) -> Column:
    """'[+-]DD:MM:SS.S' -> degrees, sign applied to all terms
    (bfscheduler.py:114-118; lofar_fluxcal.py:238-243)."""
    d, m, s = _split3(col)
    sign = F.when(F.trim(col).startswith("-"), -1.0).otherwise(1.0)
    return sign * (F.abs(d) + m / 60.0 + s / 3600.0)


def julian_day(year: Column, month: Column, day: Column) -> Column:
    """JD at 0h UT for a calendar date (jd.pl:19-60; standard
    Fliegel-Van Flandern integer algorithm)."""
    a = F.floor((F.lit(14) - month) / 12)
    y = year + F.lit(4800) - a
    m = month + F.lit(12) * a - F.lit(3)
    jdn = (
        day
        + F.floor((F.lit(153) * m + 2) / 5)
        + F.lit(365) * y
        + F.floor(y / 4)
        - F.floor(y / 100)
        + F.floor(y / 400)
        - F.lit(32045)
    )
    return jdn.cast("double") - F.lit(0.5)


def mjd_from_jd(jd: Column) -> Column:
    return jd - F.lit(2400000.5)


def gmst_hours(mjd: Column) -> Column:
    """Greenwich mean sidereal time in hours (sid.pl:40-57; IAU 1982
    polynomial, truncated to the terms the reference carries)."""
    d = mjd - F.lit(51544.5)
    t = d / F.lit(36525.0)
    gmst = (
        F.lit(18.697374558)
        + F.lit(24.06570982441908) * d
        + F.lit(0.000026) * t * t
    )
    return F.pmod(gmst, F.lit(24.0))


def lst_hours(mjd: Column, lon_deg: Column) -> Column:
    """Local sidereal time: GMST + east longitude (sid.pl)."""
    return F.pmod(gmst_hours(mjd) + lon_deg / F.lit(15.0), F.lit(24.0))


def altaz_from_equatorial(
    ra_deg: Column, dec_deg: Column, lst_h: Column, lat_deg: Column
) -> tuple[Column, Column]:
    """(alt_deg, az_deg) from hour angle geometry (azza.pl ~230 LoC of
    Perl trig -> 10 lines of column algebra)."""
    ha = (lst_h * F.lit(15.0) - ra_deg) * F.lit(D2R)
    dec = dec_deg * F.lit(D2R)
    lat = lat_deg * F.lit(D2R)
    sin_alt = F.sin(dec) * F.sin(lat) + F.cos(dec) * F.cos(lat) * F.cos(ha)
    alt = F.asin(F.least(F.greatest(sin_alt, F.lit(-1.0)), F.lit(1.0)))
    az = F.atan2(
        -F.cos(dec) * F.sin(ha),
        F.sin(dec) * F.cos(lat) - F.cos(dec) * F.sin(lat) * F.cos(ha),
    )
    return alt / F.lit(D2R), F.pmod(az / F.lit(D2R), F.lit(360.0))


LOFAR_LAT_DEG = 52.915111  # scheduling/azlst.pl:20 site default
LOFAR_LON_DEG = 6.869883   # scheduling/azlst.pl:24


def visibility_window(
    ra_deg: Column,
    dec_deg: Column,
    lat_deg: Column,
    el_min_deg: Column,
) -> Column:
    """Rise/set visibility window of a source at an elevation limit —
    the inverse of :func:`altaz_from_equatorial`
    (scheduling/azlst.pl, ~245 LoC Perl -> one struct of column
    algebra). Returns a struct:

    * ``el_transit_deg`` — elevation at transit (90 - |lat - dec|,
      computed via the HA=0 zenith-angle formula, azlst.pl get_ZA);
    * ``never_sets`` — circumpolar above ``el_min`` (azlst.pl's
      is_never_set test with its 0.001 deg tolerance);
    * ``never_above`` — transit never reaches ``el_min`` (folds the
      reference's is_never_rise / is_never_above pair, which differ
      only in message text and its 1-dp sprintf rounding — here the
      exact transit elevation is compared, same 0.001 tolerance);
    * ``ha_h`` — half-window hour angle in hours: the source is above
      ``el_min`` for LST in ra/15 +/- ha_h (12.0 when never_sets,
      0.0 when never_above);
    * ``lst_rise_h`` / ``lst_set_h`` — LST of rise/set in [0, 24)
      (azlst.pl sidmin/sidmax), NULL unless a genuine crossing;
    * ``az_rise_deg`` / ``az_set_deg`` — azimuth (deg, North
      clockwise) at the two crossings (azlst.pl get_AZ: atan2 form
      +180), NULL unless a genuine crossing.

    Pure trig, no shuffle; feeds the scheduler's ``transit_min``
    (plans/scheduler.py) via lst-of-transit = ra/15."""
    dec = dec_deg * F.lit(D2R)
    lat = lat_deg * F.lit(D2R)
    clamp = lambda c: F.least(F.greatest(c, F.lit(-1.0)), F.lit(1.0))
    # ZA at transit (HA=0): acos(sin d sin l + cos d cos l) = |lat-dec|
    el_transit = F.lit(90.0) - F.acos(
        clamp(F.sin(dec) * F.sin(lat) + F.cos(dec) * F.cos(lat))
    ) / F.lit(D2R)
    never_sets = F.when(
        lat_deg >= 0.0,
        dec_deg >= F.lit(90.0) - lat_deg + el_min_deg - F.lit(0.001),
    ).otherwise(
        dec_deg <= -(F.lit(90.0) + lat_deg + el_min_deg - F.lit(0.001))
    )
    never_above = el_min_deg >= el_transit - F.lit(0.001)
    za = (F.lit(90.0) - el_min_deg) * F.lit(D2R)
    cos_ha = (F.cos(za) - F.sin(dec) * F.sin(lat)) / (
        F.cos(dec) * F.cos(lat)
    )
    ha = F.acos(clamp(cos_ha))  # rad, azlst.pl get_HA
    ha_h = (
        F.when(never_sets, F.lit(12.0))
        .when(never_above, F.lit(0.0))
        .otherwise(ha / F.lit(D2R) / F.lit(15.0))
    )
    crossing = (~never_sets) & (~never_above)
    ra_h = ra_deg / F.lit(15.0)
    lst_rise = F.when(crossing, F.pmod(ra_h - ha_h, F.lit(24.0)))
    lst_set = F.when(crossing, F.pmod(ra_h + ha_h, F.lit(24.0)))

    def az_at(h: Column) -> Column:
        # azlst.pl get_AZ: atan2(cos d sin H, -sin d cos l
        #                        + cos d sin l cos H) + 180, mod 360
        return F.pmod(
            F.atan2(
                F.cos(dec) * F.sin(h),
                -F.sin(dec) * F.cos(lat)
                + F.cos(dec) * F.sin(lat) * F.cos(h),
            )
            / F.lit(D2R)
            + F.lit(180.0),
            F.lit(360.0),
        )

    az_rise = F.when(crossing, az_at(-ha))
    az_set = F.when(crossing, az_at(ha))
    return F.struct(
        el_transit.alias("el_transit_deg"),
        never_sets.alias("never_sets"),
        never_above.alias("never_above"),
        ha_h.alias("ha_h"),
        lst_rise.alias("lst_rise_h"),
        lst_set.alias("lst_set_h"),
        az_rise.alias("az_rise_deg"),
        az_set.alias("az_set_deg"),
    )


# J2000 galactic pole / center constants (IAU): standard rotation.
_POLE_RA = 192.85948 * D2R
_POLE_DEC = 27.12825 * D2R
_L_NCP = 122.93192


def galactic_from_equatorial(ra_deg: Column, dec_deg: Column) -> tuple[Column, Column]:
    """(l_deg, b_deg) via the J2000 rotation (tsky.py:1116-1123 uses
    pyephem for the same transform)."""
    ra = ra_deg * F.lit(D2R)
    dec = dec_deg * F.lit(D2R)
    sin_b = F.sin(dec) * F.lit(math.sin(_POLE_DEC)) + F.cos(dec) * F.lit(
        math.cos(_POLE_DEC)
    ) * F.cos(ra - F.lit(_POLE_RA))
    b = F.asin(F.least(F.greatest(sin_b, F.lit(-1.0)), F.lit(1.0)))
    l = F.lit(_L_NCP) - F.atan2(
        F.cos(dec) * F.sin(ra - F.lit(_POLE_RA)),
        F.sin(dec) * F.lit(math.cos(_POLE_DEC))
        - F.cos(dec) * F.lit(math.sin(_POLE_DEC)) * F.cos(ra - F.lit(_POLE_RA)),
    ) / F.lit(D2R)
    return F.pmod(l, F.lit(360.0)), b / F.lit(D2R)
