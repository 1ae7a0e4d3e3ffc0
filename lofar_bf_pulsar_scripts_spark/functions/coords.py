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
