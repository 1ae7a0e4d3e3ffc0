"""PSRFITS / HDF5 metadata readers (SURVEY §2.1 S5/S9).

* S5 PSRFITS (/root/reference/subdyn.py:474-556): parsed with a
  dependency-free FITS reader below (FITS is 2880-byte blocks of
  80-char cards + big-endian data — no astropy needed): header scan,
  BINTABLE column extraction, and the SUBINT rows with per-row
  dat_scl/dat_offs; the calibrated decode IS
  `sources.binary.scale_offset_decode`, a pure projection.
* S9 HDF5 attrs (/root/reference/fluxcal/lofar_fluxcal.py:151-172;
  get_flagged_tiles.py:50-64): FILTER_SELECTION,
  OBSERVATION_STATIONS_LIST, OBSERVATION_START_UTC — one metadata row
  per .h5 file, parsed dependency-free by ``hdf5_lite`` (superblock
  v0/v1 + v1 object headers, the format old LOFAR DAL files carry);
  h5py is used as a fallback for newer container versions when it is
  installed.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

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


def _h5_attrs(buf: bytes) -> dict:
    """Root attrs via hdf5_lite; h5py fallback for newer containers."""
    from .hdf5_lite import parse_h5_root_attrs

    try:
        return parse_h5_root_attrs(buf)
    except ValueError:
        import io

        h5py = _require("h5py", "HDF5 metadata scan (newer container)")
        with h5py.File(io.BytesIO(buf), "r") as f:
            return dict(f.attrs)


def read_h5_metadata(spark: SparkSession, path_glob: str) -> DataFrame:
    """S9: one metadata row per .h5 file."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                attrs = _h5_attrs(bytes(row["content"]))
                stations = [
                    s.decode() if isinstance(s, bytes) else str(s)
                    for s in attrs.get("OBSERVATION_STATIONS_LIST", [])
                ]
                def _s(v):
                    if v is None:
                        return None
                    return v.decode() if isinstance(v, bytes) else str(v)

                rows.append(
                    {
                        "obs_file": row["path"],
                        "filter_selection": _s(attrs.get("FILTER_SELECTION")),
                        "stations": stations,
                        "start_utc": _s(attrs.get("OBSERVATION_START_UTC")),
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


# --- pure-Python FITS container parsing (no astropy needed) ----------
#
# FITS is 2880-byte blocks of 36 80-char ASCII cards followed by
# 2880-padded big-endian data (NASA FITS standard 4.0). That is simple
# enough to parse dependency-free, which un-gates the S5 PSRFITS scan:
# the reference reads hdu[0]/hdu[1] headers and the SUBINT bintable's
# dat_scl/dat_offs/data columns (subdyn.py:474-556).

_FITS_BLOCK = 2880

_TFORM_SIZES = {
    "L": 1, "X": 1, "B": 1, "I": 2, "J": 4, "K": 8,
    "A": 1, "E": 4, "D": 8, "C": 8, "M": 16,
}


def _parse_card_value(raw: str):
    """Value of one 'KEY = value / comment' card."""
    s = raw.strip()
    if s.startswith("'"):
        # string: up to the closing quote, '' escapes a quote
        out, i = [], 1
        while i < len(s):
            if s[i] == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                break
            out.append(s[i])
            i += 1
        return "".join(out).rstrip()
    s = s.split("/", 1)[0].strip()
    if s == "T":
        return True
    if s == "F":
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s.replace("D", "E").replace("d", "e"))
    except ValueError:
        return s


def parse_fits(buf: bytes) -> list[dict]:
    """Parse every HDU of an in-memory FITS file: returns dicts with
    lower-cased ``cards``, ``data_start``, ``data_bytes`` and
    ``hdu_name`` (PRIMARY / XTENSION value / EXTNAME if present)."""
    hdus: list[dict] = []
    pos = 0
    while pos + _FITS_BLOCK <= len(buf):
        cards: dict = {}
        end = False
        start = pos
        while not end and pos + _FITS_BLOCK <= len(buf):
            block = buf[pos : pos + _FITS_BLOCK]
            pos += _FITS_BLOCK
            for i in range(36):
                card = block[i * 80 : (i + 1) * 80].decode("ascii", "replace")
                key = card[:8].strip()
                if key == "END":
                    end = True
                    break
                if not key or key in ("COMMENT", "HISTORY", "CONTINUE"):
                    continue
                if card[8:10] != "= ":
                    continue
                cards[key.lower()] = _parse_card_value(card[10:])
        if not end:
            break  # truncated header -> stop
        if not hdus and not cards.get("simple", False) and "xtension" not in cards:
            raise ValueError("not a FITS file (no SIMPLE card)")
        bitpix = abs(int(cards.get("bitpix", 8)))
        naxis = int(cards.get("naxis", 0))
        shape = [int(cards.get(f"naxis{i}", 0)) for i in range(1, naxis + 1)]
        nelem = 1
        for s in shape:
            nelem *= s
        if naxis == 0:
            nelem = 0
        gcount = int(cards.get("gcount", 1))
        pcount = int(cards.get("pcount", 0))
        data_bytes = (bitpix // 8) * gcount * (pcount + nelem)
        hdus.append(
            {
                "hdu_name": (
                    cards.get("extname")
                    or cards.get("xtension")
                    or ("PRIMARY" if not hdus else f"HDU{len(hdus)}")
                ),
                "cards": cards,
                "shape": shape,
                "data_start": pos,
                "data_bytes": data_bytes,
            }
        )
        pos += -(-data_bytes // _FITS_BLOCK) * _FITS_BLOCK
    if not hdus:
        raise ValueError("not a FITS file (no parseable HDU)")
    return hdus


def bintable_layout(cards: dict) -> list[tuple[str, int, str, int]]:
    """(name, repeat, typecode, byte_offset) per TFORMn column of a
    BINTABLE HDU, validated against NAXIS1."""
    import re

    ncols = int(cards.get("tfields", 0))
    layout = []
    offset = 0
    for i in range(1, ncols + 1):
        tform = str(cards.get(f"tform{i}", "")).strip()
        m = re.match(r"^(\d*)([LXBIJKAEDCM])", tform)
        if not m:
            raise ValueError(f"unsupported TFORM{i}: {tform!r}")
        repeat = int(m.group(1) or 1)
        code = m.group(2)
        name = str(cards.get(f"ttype{i}", f"col{i}")).strip().lower()
        layout.append((name, repeat, code, offset))
        offset += repeat * _TFORM_SIZES[code]
    naxis1 = int(cards.get("naxis1", offset))
    if offset != naxis1:
        raise ValueError(f"TFORM widths sum to {offset}, NAXIS1 is {naxis1}")
    return layout


_NP_CODES = {"B": "u1", "I": ">i2", "J": ">i4", "K": ">i8", "E": ">f4",
             "D": ">f8", "L": "u1", "A": "S1", "X": "u1"}


def bintable_column(buf: bytes, hdu: dict, name: str):
    """One BINTABLE column as a (nrows, repeat) numpy array —
    big-endian per the FITS standard."""
    import numpy as np

    cards = hdu["cards"]
    layout = {n: (r, c, o) for n, r, c, o in bintable_layout(cards)}
    repeat, code, off = layout[name.lower()]
    naxis1 = int(cards["naxis1"])
    nrows = int(cards["naxis2"])
    raw = np.frombuffer(
        buf, dtype="u1", count=naxis1 * nrows, offset=hdu["data_start"]
    ).reshape(nrows, naxis1)
    width = repeat * _TFORM_SIZES[code]
    cells = raw[:, off : off + width].tobytes()
    return np.frombuffer(cells, dtype=_NP_CODES[code]).reshape(nrows, repeat)


def scan_fits_headers(spark: SparkSession, path_glob: str) -> DataFrame:
    """S5/S9 metadata scan: one row per (file, hdu, keyword) — the
    queryable long form of every header card, parsed dependency-free.
    Arrow-batched mapInPandas over binaryFile; the parse touches only
    header blocks."""
    schema = T.StructType(
        [
            T.StructField("obs_file", T.StringType(), False),
            T.StructField("hdu", T.IntegerType(), False),
            T.StructField("hdu_name", T.StringType(), False),
            T.StructField("keyword", T.StringType(), False),
            T.StructField("value", T.StringType(), True),
        ]
    )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                for i, hdu in enumerate(parse_fits(bytes(row["content"]))):
                    for k, v in hdu["cards"].items():
                        rows.append(
                            {
                                "obs_file": row["path"],
                                "hdu": i,
                                "hdu_name": str(hdu["hdu_name"]),
                                "keyword": k,
                                "value": None if v is None else str(v),
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(decode, schema=schema)
    )


def read_psrfits(spark: SparkSession, path_glob: str) -> DataFrame:
    """S5: PSRFITS SUBINT rows in PSRFITS_SUBINT_SCHEMA, parsed with
    the dependency-free FITS reader (container layout per
    subdyn.py:474-556: hdu[1] BINTABLE, per-row dat_scl/dat_offs of
    nchan floats, 'data' uint8 interleaved sample-major so channel ch
    occupies data[s*nchan + ch]).

    Values stay RAW uint8 here; compose with
    ``sources.binary.scale_offset_decode`` for calibrated floats — the
    decode is a column projection, exactly the reference's
    data*scl+offs (subdyn.py:555)."""

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                buf = bytes(row["content"])
                hdus = parse_fits(buf)
                sub = next(
                    (
                        h
                        for h in hdus[1:]
                        if str(h["hdu_name"]).upper().startswith(("SUBINT", "BINTABLE"))
                    ),
                    None,
                )
                if sub is None:
                    continue
                cards = sub["cards"]
                nchan = int(cards["nchan"])
                scl = bintable_column(buf, sub, "dat_scl").astype("f8")
                offs = bintable_column(buf, sub, "dat_offs").astype("f8")
                data = bintable_column(buf, sub, "data")
                nrows, rowlen = data.shape
                nsblk = rowlen // nchan
                for r in range(nrows):
                    samples = data[r].reshape(nsblk, nchan)
                    for ch in range(nchan):
                        out.append(
                            pd.DataFrame(
                                {
                                    "obs_file": row["path"],
                                    "subint": r,
                                    "chan": ch,
                                    "sample_idx": np.arange(nsblk, dtype="i8")
                                    + r * nsblk,
                                    "value": samples[:, ch].astype("i4"),
                                    "dat_scl": scl[r, ch],
                                    "dat_offs": offs[r, ch],
                                }
                            )
                        )
            yield (
                pd.concat(out, ignore_index=True)
                if out
                else pd.DataFrame(
                    {f.name: [] for f in PSRFITS_SUBINT_SCHEMA.fields}
                )
            )

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(decode, schema=PSRFITS_SUBINT_SCHEMA)
    )


PSRFITS_CUBE_SCHEMA = T.StructType(
    [
        T.StructField("obs_file", T.StringType(), False),
        T.StructField("subint", T.IntegerType(), False),
        T.StructField("pol", T.IntegerType(), False),
        T.StructField("chan", T.IntegerType(), False),
        T.StructField("bin", T.IntegerType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("weight", T.DoubleType(), True),
    ]
)


def read_psrfits_cube(spark: SparkSession, path_glob: str) -> DataFrame:
    """S6: a folded PSRCHIVE/PSRFITS archive as the D3 long cube
    (subint, pol, chan, bin, value, weight) — PSRCHIVE's .ar container
    IS PSRFITS, so the dependency-free parser covers it (the reference
    gets the same cube via the psrchive bindings,
    fluxcal/lofar_fluxcal.py:300-360).

    Folded-mode SUBINT layout (PSRFITS standard): DATA holds
    NPOL*NCHAN*NBIN values per row, bin fastest
    (idx = (p*nchan + c)*nbin + b); DAT_SCL/DAT_OFFS have one entry
    per (pol, chan); DAT_WTS one per chan. The decoded value is
    raw*scl+offs — emitted calibrated, with the channel weight riding
    along for P9 weight-zapping."""

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                buf = bytes(row["content"])
                hdus = parse_fits(buf)
                sub = next(
                    (
                        h
                        for h in hdus[1:]
                        if str(h["hdu_name"]).upper().startswith(("SUBINT", "BINTABLE"))
                    ),
                    None,
                )
                if sub is None:
                    continue
                cards = sub["cards"]
                npol = int(cards.get("npol", 1))
                nchan = int(cards["nchan"])
                nbin = int(cards.get("nbin", 1))
                scl = bintable_column(buf, sub, "dat_scl").astype("f8")
                offs = bintable_column(buf, sub, "dat_offs").astype("f8")
                data = bintable_column(buf, sub, "data").astype("f8")
                try:
                    wts = bintable_column(buf, sub, "dat_wts").astype("f8")
                except KeyError:
                    wts = np.ones((data.shape[0], nchan))
                nrows = data.shape[0]
                cube = data.reshape(nrows, npol, nchan, nbin)
                s = scl.reshape(nrows, npol, nchan, 1)
                o = offs.reshape(nrows, npol, nchan, 1)
                cal = cube * s + o
                r_idx, p_idx, c_idx, b_idx = np.indices(
                    (nrows, npol, nchan, nbin)
                )
                out.append(
                    pd.DataFrame(
                        {
                            "obs_file": row["path"],
                            "subint": r_idx.ravel().astype("i4"),
                            "pol": p_idx.ravel().astype("i4"),
                            "chan": c_idx.ravel().astype("i4"),
                            "bin": b_idx.ravel().astype("i4"),
                            "value": cal.ravel(),
                            "weight": wts[r_idx.ravel(), c_idx.ravel()],
                        }
                    )
                )
            yield (
                pd.concat(out, ignore_index=True)
                if out
                else pd.DataFrame({f.name: [] for f in PSRFITS_CUBE_SCHEMA.fields})
            )

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(decode, schema=PSRFITS_CUBE_SCHEMA)
    )


def _fits_card(key: str, value) -> bytes:
    if isinstance(value, bool):
        body = f"{key.upper():<8}= {'T' if value else 'F':>20}"
    elif isinstance(value, str):
        body = f"{key.upper():<8}= '{value:<8}'"
    elif isinstance(value, float):
        body = f"{key.upper():<8}= {value:>20.12G}"
    else:
        body = f"{key.upper():<8}= {value:>20d}"
    return body.ljust(80).encode("ascii")


def _fits_header(cards: list[bytes]) -> bytes:
    blob = b"".join(cards) + b"END".ljust(80)
    return blob + b" " * ((-len(blob)) % _FITS_BLOCK)


def write_psrfits_cube(
    cube: DataFrame,
    path: str,
    extra_primary_cards: dict | None = None,
) -> None:
    """K4 calibrated-archive sink: serialize a D3 long cube
    (subint, pol, chan, bin, value, weight) back into a folded-mode
    PSRFITS file — the reference persists its calibrated archives via
    psrchive's unload (``pam``/``lofar_fluxcal.py`` pipeline output);
    this writes the same SUBINT container dependency-free.

    16-bit quantization per (subint, pol, chan), the PSRFITS
    convention: offs = (max+min)/2, scl = (max-min)/65534 (1.0 when
    the profile is flat), raw = round((v-offs)/scl). One .ar file is
    one observation — a driver-side artifact like the reference's, so
    the cube is collected via Arrow (toPandas); partition-parallel
    writes would shard per observation at scale."""
    import numpy as np

    # size guard: one .ar is one observation; a cube that doesn't fit
    # the driver indicates a mis-scoped call (e.g. an unfiltered fact
    # table), not a bigger archive. 2^28 cells = 2 GiB of float64.
    # ONE upstream execution: collect through LIMIT guard+1 and length-
    # check the result — CollectLimit stops scanning once the limit is
    # hit, so a runaway input costs at most guard+1 rows of transfer
    # (the same bound a valid cube pays), and a valid cube (<= guard
    # rows) passes through the limit unchanged. The former separate
    # probe count() ran the whole upstream a second time.
    guard = 1 << 28
    pdf = cube.limit(guard + 1).toPandas()
    if len(pdf) > guard:
        raise ValueError(
            f"write_psrfits_cube collects the cube to the driver; "
            f"more than 2^28 cells exceeds the single-archive guard — "
            f"filter to one observation (or shard per obs) first"
        )
    pdf = pdf.sort_values(["subint", "pol", "chan", "bin"])
    nsub = int(pdf["subint"].max()) + 1
    npol = int(pdf["pol"].max()) + 1
    nchan = int(pdf["chan"].max()) + 1
    nbin = int(pdf["bin"].max()) + 1
    vals = pdf["value"].to_numpy().reshape(nsub, npol, nchan, nbin)
    if "weight" in pdf.columns:
        wts = (
            pdf[pdf["pol"].eq(0) & pdf["bin"].eq(0)]["weight"]
            .to_numpy()
            .reshape(nsub, nchan)
        )
    else:
        wts = np.ones((nsub, nchan))
    vmax = vals.max(axis=3)
    vmin = vals.min(axis=3)
    offs = (vmax + vmin) / 2.0
    scl = (vmax - vmin) / 65534.0
    scl[scl == 0.0] = 1.0
    raw = np.round(
        (vals - offs[..., None]) / scl[..., None]
    ).astype(">i2")

    primary_cards = [
        _fits_card("SIMPLE", True),
        _fits_card("BITPIX", 8),
        _fits_card("NAXIS", 0),
        _fits_card("EXTEND", True),
    ] + [_fits_card(k, v) for k, v in (extra_primary_cards or {}).items()]
    naxis1 = (npol * nchan) * 4 * 2 + nchan * 4 + npol * nchan * nbin * 2
    subint_cards = [
        _fits_card("XTENSION", "BINTABLE"),
        _fits_card("BITPIX", 8),
        _fits_card("NAXIS", 2),
        _fits_card("NAXIS1", naxis1),
        _fits_card("NAXIS2", nsub),
        _fits_card("PCOUNT", 0),
        _fits_card("GCOUNT", 1),
        _fits_card("TFIELDS", 4),
        _fits_card("EXTNAME", "SUBINT"),
        _fits_card("TTYPE1", "DAT_SCL"),
        _fits_card("TFORM1", f"{npol * nchan}E"),
        _fits_card("TTYPE2", "DAT_OFFS"),
        _fits_card("TFORM2", f"{npol * nchan}E"),
        _fits_card("TTYPE3", "DAT_WTS"),
        _fits_card("TFORM3", f"{nchan}E"),
        _fits_card("TTYPE4", "DATA"),
        _fits_card("TFORM4", f"{npol * nchan * nbin}I"),
        _fits_card("NPOL", npol),
        _fits_card("NCHAN", nchan),
        _fits_card("NBIN", nbin),
    ]
    rows = b"".join(
        scl[r].astype(">f4").tobytes()
        + offs[r].astype(">f4").tobytes()
        + wts[r].astype(">f4").tobytes()
        + raw[r].tobytes()
        for r in range(nsub)
    )
    data = rows + b"\x00" * ((-len(rows)) % _FITS_BLOCK)
    with open(path, "wb") as fh:
        fh.write(_fits_header(primary_cards) + _fits_header(subint_cards) + data)
