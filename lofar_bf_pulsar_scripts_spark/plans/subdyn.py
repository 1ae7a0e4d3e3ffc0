"""subdyn pipeline (SURVEY §2 S4 + A1 + W8 + K5): the dynamic-spectrum
RFI inspector (/root/reference/subdyn.py) as one composition:

  .sub int16 files -> per-channel time rebin (7630-sample default
  ~10 s bins, subdyn.py:23) -> sigma-clip per channel (6 sigma,
  subdyn.py:19) -> channel rejection at the 10% rfilimit
  (subdyn.py:20,464-467) -> .rfirep report rows (subdyn.py:605-611).

The reference processes one subband file at a time to bound memory
(subdyn.py:410-471); here each file is one partition of the binaryFile
scan and Spark pipelines the same per-file work in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.raster import rebin
from ..operators.robust import clipped_fraction, sigma_clip
from ..plans.reports import rfirep_lines
from ..sources.binary import read_sub_int16

DEFAULT_NBINS = 7630  # subdyn.py:23
DEFAULT_THRESHOLD = 6.0  # subdyn.py:19
DEFAULT_RFILIMIT = 0.1  # subdyn.py:20


def dynamic_spectrum(
    spark: SparkSession,
    path_glob: str,
    nbins: int = DEFAULT_NBINS,
) -> DataFrame:
    """(chan, block, value, npts): time-averaged dynamic spectrum."""
    raw = read_sub_int16(spark, path_glob)
    return rebin(raw, nbins, idx_col="sample_idx", value_col="value",
                 group_cols=["chan"]).withColumnRenamed("block", "time_bin")


def rfi_report(
    spectrum: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    rfilimit: float = DEFAULT_RFILIMIT,
) -> DataFrame:
    """Per-channel clipped fraction + .rfirep rows for channels over
    the limit."""
    fracs = clipped_fraction(
        spectrum, ["chan"], value_col="value", threshold=threshold
    )
    return rfirep_lines(fracs, rfilimit=rfilimit)


def cleaned_spectrum(
    spectrum: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    rfilimit: float = DEFAULT_RFILIMIT,
) -> DataFrame:
    """Sigma-clipped spectrum with bad channels dropped entirely
    (subdyn.py:464-467 + clipsubband zero-write at :208-249)."""
    return sigma_clip(
        spectrum,
        ["chan"],
        value_col="value",
        threshold=threshold,
        rfilimit=rfilimit,
    )
