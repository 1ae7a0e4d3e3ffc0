"""Binary readers (SURVEY §2.1 S1-S4): raw float32 time series,
sigproc .tim, .inf sidecars, .sub int16 subband files.

Format facts from the reference (semantics only, no code reuse):
* S1 raw payload: packed little-endian float32 samples after an
  optional header (/root/reference/pulsestack.py:446-454,553-565).
* S2 sigproc header: HEADER_START .. HEADER_END key-value block with
  <len><name> string framing; keys tstart/tsamp/source_name
  (pulsestack.py:293-298 reads them via the sigproc module).
* S3 .inf sidecar: "key = value" lines; epoch/tsamp/object keys
  (pulsestack.py:317-322; sp2tim.py:103-118).
* S4 .sub files: one int16-per-sample file per subband, channel id =
  position in the sorted file list (subdyn.py:345-416, samplesize=2
  at subdyn.py:25-27).

Spark design: ``spark.read.format("binaryFile")`` lists and streams
whole files; decoding is a mapInPandas over Arrow batches that
explodes each file into (chunk of) samples — one Python crossing per
file batch, numpy frombuffer vectorized decode, never per-sample
Python. At 100 TB the same reader runs per-file-partition; sample_idx
is derived from byte offsets so re-chunking never renumbers.
"""

from __future__ import annotations

import io
import re
import struct
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def read_raw_float32(
    spark: SparkSession,
    path_glob: str,
    header_bytes: int = 0,
    tsamp: float | None = None,
) -> DataFrame:
    """S1: (obs_file STRING, sample_idx BIGINT, value FLOAT[, t DOUBLE])
    from packed float32 files."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                payload = bytes(row["content"])[header_bytes:]
                vals = np.frombuffer(payload, dtype="<f4")
                out = pd.DataFrame(
                    {
                        "obs_file": row["path"],
                        "sample_idx": np.arange(vals.size, dtype="int64"),
                        "value": vals,
                    }
                )
                yield out

    df = (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(decode, schema="obs_file string, sample_idx long, value float")
    )
    if tsamp is not None:
        df = df.withColumn("t", F.col("sample_idx") * F.lit(float(tsamp)))
    return df


_SIGPROC_STR_KEYS = {"source_name", "rawdatafile"}
_SIGPROC_DBL_KEYS = {"tstart", "tsamp", "fch1", "foff", "refdm", "az_start"}
_SIGPROC_INT_KEYS = {"nchans", "nbits", "nifs", "machine_id", "telescope_id", "data_type"}


def parse_sigproc_header(data: bytes) -> tuple[dict, int]:
    """S2: parse a sigproc header (public format spec: length-prefixed
    keyword strings between HEADER_START and HEADER_END). Returns
    (header dict, payload offset)."""
    buf = io.BytesIO(data)

    def read_str() -> str:
        (n,) = struct.unpack("<i", buf.read(4))
        return buf.read(n).decode("ascii", errors="replace")

    first = read_str()
    if first != "HEADER_START":
        return {}, 0
    header: dict = {}
    while True:
        key = read_str()
        if key == "HEADER_END":
            break
        if key in _SIGPROC_STR_KEYS:
            header[key] = read_str()
        elif key in _SIGPROC_DBL_KEYS:
            (header[key],) = struct.unpack("<d", buf.read(8))
        elif key in _SIGPROC_INT_KEYS:
            (header[key],) = struct.unpack("<i", buf.read(4))
        else:  # unknown key: stop to avoid desync
            break
    return header, buf.tell()


def read_sigproc_tim(spark: SparkSession, path_glob: str) -> DataFrame:
    """S2: sigproc .tim scan — header keys as columns + S1 payload.
    Returns (obs_file, tstart_mjd, tsamp, source_name, sample_idx,
    value, t)."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                data = bytes(row["content"])
                header, off = parse_sigproc_header(data)
                nbits = header.get("nbits", 32)
                if nbits != 32:
                    raise ValueError(f"unsupported nbits={nbits} in {row['path']}")
                vals = np.frombuffer(data[off:], dtype="<f4")
                tsamp = float(header.get("tsamp", 0.0))
                yield pd.DataFrame(
                    {
                        "obs_file": row["path"],
                        "tstart_mjd": float(header.get("tstart", 0.0)),
                        "tsamp": tsamp,
                        "source_name": header.get("source_name", ""),
                        "sample_idx": np.arange(vals.size, dtype="int64"),
                        "value": vals,
                        "t": np.arange(vals.size, dtype="float64") * tsamp,
                    }
                )

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(
            decode,
            schema=(
                "obs_file string, tstart_mjd double, tsamp double, "
                "source_name string, sample_idx long, value float, t double"
            ),
        )
    )


_INF_KEYS = {
    "Data file name without suffix": ("datfile", str),
    "Epoch of observation (MJD)": ("epoch_mjd", float),
    "Width of each time series bin (sec)": ("tsamp", float),
    "Object being observed": ("source", str),
    "Number of bins in the time series": ("nsamples", int),
}


def read_inf_sidecar(spark: SparkSession, path_glob: str) -> DataFrame:
    """S3: PRESTO .inf metadata — one row per file with the keys the
    reference consumes (pulsestack.py:317-322; sp2tim.py:103-118)."""
    raw = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                meta = {"obs_file": row["path"], "datfile": None, "epoch_mjd": None,
                        "tsamp": None, "source": None, "nsamples": None}
                for line in bytes(row["content"]).decode("ascii", "replace").splitlines():
                    if "=" not in line:
                        continue
                    key, _, val = line.partition("=")
                    key = key.strip()
                    for prefix, (name, typ) in _INF_KEYS.items():
                        if key.startswith(prefix):
                            try:
                                meta[name] = typ(val.strip())
                            except ValueError:
                                pass
                rows.append(meta)
            yield pd.DataFrame(rows)

    return raw.mapInPandas(
        decode,
        schema=(
            "obs_file string, datfile string, epoch_mjd double, tsamp double, "
            "source string, nsamples bigint"
        ),
    )


def read_sub_int16(
    spark: SparkSession,
    path_glob: str,
    chan_from_name: str = r"\.sub(\d+)$",
) -> DataFrame:
    """S4: one int16 file per subband -> (chan, sample_idx, value).
    Channel id parsed from the filename (subdyn.py:377 uses sorted
    position; an explicit suffix is more robust under partition
    listing order)."""
    rx = re.compile(chan_from_name)

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                m = rx.search(row["path"])
                chan = int(m.group(1)) if m else -1
                vals = np.frombuffer(bytes(row["content"]), dtype="<i2")
                yield pd.DataFrame(
                    {
                        "chan": np.full(vals.size, chan, dtype="int32"),
                        "sample_idx": np.arange(vals.size, dtype="int64"),
                        "value": vals.astype("int16"),
                    }
                )

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(decode, schema="chan int, sample_idx long, value short")
    )


def scale_offset_decode(
    df: DataFrame,
    scales: DataFrame,
    on: list[str],
    value_col: str = "value",
) -> DataFrame:
    """S5's PSRFITS dat_scl/dat_offs decode as a projection
    (subdyn.py:542-556): value*scale + offset after a broadcast join
    of the per-row scale table."""
    joined = df.join(F.broadcast(scales), on=on, how="left")
    return joined.withColumn(
        value_col,
        F.col(value_col).cast("double") * F.coalesce(F.col("dat_scl"), F.lit(1.0))
        + F.coalesce(F.col("dat_offs"), F.lit(0.0)),
    )
