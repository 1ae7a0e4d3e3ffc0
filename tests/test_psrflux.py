"""plans/psrflux.py vs a direct numpy replica of the
lofar_psrflux.py:492-680 loops on a synthetic tscrunched cube."""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lofar_bf_pulsar_scripts_spark.plans.psrflux import (
    KB_ERG_K,
    psrflux_calibrate,
    psrflux_channel_table,
    psrflux_spectrum,
)

NCHAN, NBINS = 8, 32
NSTATIONS, COH, BADTILES, NPOL = 24, 0.85, 0.05, 2
TOBS, CHAN_BW = 600.0, 0.195
OFF_LO, OFF_HI = 20, 32


def make_cube():
    rng = np.random.RandomState(7)
    data = 5.0 + rng.normal(0, 1, (NCHAN, NBINS))
    data[:, 4:8] += 40.0  # pulse
    goodfrac = np.array([1.0, 0.9, 0.0, 0.75, 1.0, 0.5, 1.0, 0.8])
    freqs = 120.0 + CHAN_BW * np.arange(NCHAN)  # channel low edges
    t408 = np.full(NCHAN, 25.0)
    tinst = np.full(NCHAN, 400.0)
    aeff = 600.0 - 5.0 * np.arange(NCHAN)
    return data, goodfrac, freqs, t408, tinst, aeff


def numpy_reference(data, goodfrac, freqs, t408, tinst, aeff, group):
    """Direct transliteration of the script's loops (same variable
    roles; python3 syntax)."""
    scale = (1.0 - BADTILES) * 1e4 * NSTATIONS**COH
    delta_s = (
        1e3 * 1e23 * 2 * KB_ERG_K
        / (scale * math.sqrt(NPOL * (TOBS / NBINS) * CHAN_BW * 1e6))
    )
    true_delta_s = 1e23 * 2 * KB_ERG_K / scale
    tsky = t408 * (freqs / 408.0) ** -2.55 + 2.7
    tsys = tsky + tinst
    prof = np.zeros((NCHAN, NBINS))
    prof_err = np.zeros(NCHAN)
    true_sefd = np.zeros(NCHAN)
    for ch in range(NCHAN):
        if goodfrac[ch] == 0:
            continue
        sefd = delta_s * tsys[ch] / (aeff[ch] * math.sqrt(goodfrac[ch]))
        true_sefd[ch] = true_delta_s * tsys[ch] / aeff[ch]
        mean = np.mean(data[ch, OFF_LO:OFF_HI])
        rms = np.std(data[ch, OFF_LO:OFF_HI])
        prof[ch] = (data[ch] - mean) / rms * sefd
        prof_err[ch] = sefd * sefd
    out = {}
    nspch = NCHAN // group
    for spch in range(nspch):
        lo, hi = spch * group, (spch + 1) * group
        live = [c for c in range(lo, hi) if goodfrac[c] > 0]
        if not live:
            continue
        ngood = len(live)
        totprof = prof[lo:hi].sum(axis=0) / ngood
        flux_err = prof_err[lo:hi].sum()
        sens = math.sqrt(flux_err) / ngood
        real_sefd = math.sqrt(
            sum(true_sefd[c] ** 2 for c in range(lo, hi)) / ngood
        )
        mean = np.mean(totprof[OFF_LO:OFF_HI])
        rms = np.std(totprof[OFF_LO:OFF_HI])
        snrs = (totprof - mean) / rms
        peak = totprof.max()
        weq = totprof.sum() / peak
        out[spch] = dict(
            freq=freqs[lo] + group * CHAN_BW / 2.0,
            real_sefd=real_sefd,
            snr_mean=snrs.mean(),
            snr_peak=(peak - mean) / rms,
            profsign=snrs.sum() / math.sqrt(weq),
            chi2=float((snrs**2).sum()) / (NBINS - 1),
            weq=weq,
            dc=100.0 * weq / NBINS,
            flux_peak=peak,
            sens=sens,
            flux_mean=totprof.mean(),
            flux_mean_err=sens / math.sqrt(NBINS),
            n_good=ngood,
        )
    return out


@pytest.mark.parametrize("group", [4, 8])
def test_psrflux_matches_numpy_replica(spark, group):
    data, goodfrac, freqs, t408, tinst, aeff = make_cube()
    want = numpy_reference(data, goodfrac, freqs, t408, tinst, aeff, group)

    chans = spark.createDataFrame(
        [
            (c, float(freqs[c]), float(t408[c]), float(tinst[c]),
             float(aeff[c]), float(goodfrac[c]))
            for c in range(NCHAN)
        ],
        "chan int, freq_mhz double, t408 double, tinst_k double,"
        " aeff_m2 double, good_fraction double",
    )
    ct = psrflux_channel_table(
        chans, nstations=NSTATIONS, cohfactor=COH, badtiles=BADTILES,
        npol=NPOL, tobs_s=TOBS, nbins=NBINS, chan_bw_mhz=CHAN_BW,
    )
    # zapped channel carries NULL sefd
    assert (
        ct.filter("chan = 2").first()["sefd_mjy"] is None
    )
    profs = spark.createDataFrame(
        [
            (c, b, float(data[c, b]))
            for c in range(NCHAN)
            for b in range(NBINS)
        ],
        "chan int, bin int, value double",
    )
    cal = psrflux_calibrate(profs, ct, OFF_LO, OFF_HI)
    spec = psrflux_spectrum(
        cal, ct, nbins=NBINS, group_size=group, chan_bw_mhz=CHAN_BW,
        off_bin_lo=OFF_LO, off_bin_hi=OFF_HI,
    ).collect()
    got = {r["out_chan"]: r for r in spec}
    assert set(got) == set(want)
    for k, w in want.items():
        r = got[k]
        ap = lambda x: pytest.approx(x, rel=1e-9, abs=1e-12)
        assert r["freq_mhz"] == ap(w["freq"])
        assert r["real_sefd_jy"] == ap(w["real_sefd"])
        assert r["snr_mean"] == ap(w["snr_mean"])
        assert r["snr_peak"] == ap(w["snr_peak"])
        assert r["prof_significance"] == ap(w["profsign"])
        assert r["chi2_dof"] == ap(w["chi2"])
        assert r["weff_bins"] == ap(w["weq"])
        assert r["duty_cycle_pct"] == ap(w["dc"])
        assert r["flux_peak_mjy"] == ap(w["flux_peak"])
        assert r["sensitivity_mjy"] == ap(w["sens"])
        assert r["flux_mean_mjy"] == ap(w["flux_mean"])
        assert r["flux_mean_err_mjy"] == ap(w["flux_mean_err"])
        assert r["n_good"] == w["n_good"]


def test_psrflux_all_zapped_group_dropped(spark):
    data, goodfrac, freqs, t408, tinst, aeff = make_cube()
    goodfrac = np.array([0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0])
    chans = spark.createDataFrame(
        [
            (c, float(freqs[c]), float(t408[c]), float(tinst[c]),
             float(aeff[c]), float(goodfrac[c]))
            for c in range(NCHAN)
        ],
        "chan int, freq_mhz double, t408 double, tinst_k double,"
        " aeff_m2 double, good_fraction double",
    )
    ct = psrflux_channel_table(
        chans, nstations=NSTATIONS, cohfactor=COH, badtiles=BADTILES,
        npol=NPOL, tobs_s=TOBS, nbins=NBINS, chan_bw_mhz=CHAN_BW,
    )
    profs = spark.createDataFrame(
        [
            (c, b, float(data[c, b]))
            for c in range(NCHAN)
            for b in range(NBINS)
        ],
        "chan int, bin int, value double",
    )
    cal = psrflux_calibrate(profs, ct, OFF_LO, OFF_HI)
    spec = psrflux_spectrum(
        cal, ct, nbins=NBINS, group_size=4, chan_bw_mhz=CHAN_BW,
        off_bin_lo=OFF_LO, off_bin_hi=OFF_HI,
    ).collect()
    # group 0 fully zapped -> no row (the script prints "zapped")
    assert {r["out_chan"] for r in spec} == {1}
