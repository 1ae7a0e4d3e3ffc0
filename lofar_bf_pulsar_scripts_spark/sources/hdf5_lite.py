"""Dependency-free HDF5 root-attribute reader (SURVEY §2.1 S9).

The reference's entire HDF5 surface is root-group attributes:
``FILTER_SELECTION``, ``OBSERVATION_STATIONS_LIST``,
``OBSERVATION_START_UTC`` and friends
(/root/reference/fluxcal/lofar_fluxcal.py:151-172,
get_flagged_tiles.py:50-64, lofar_psrflux.py:124-131,
tiles/lofar_antenna_state/getState.py:216-222). None of that needs
h5py: parsing the superblock, the root object header and its
attribute messages is enough — the same dependency-free approach that
un-gated the S5 PSRFITS scan (fits_h5.py).

Scope (per the public HDF5 File Format Specification III):
* superblock version 0/1 — what old LOFAR DAL / h5py
  ``libver='earliest'`` files carry;
* version-1 object headers with continuation blocks;
* version-1 attribute messages;
* datatypes: fixed-point, IEEE float, fixed-length strings, and
  variable-length strings (global-heap resolved), scalar or 1-D.
Anything newer (v2+ superblock, v2 "OHDR" headers, dense attribute
storage) raises a clear ValueError; ``fits_h5.read_h5_metadata``
falls back to h5py for those when it is installed.

The module also ships a minimal *writer* (`write_minimal_h5`) used to
build test fixtures, since neither h5py nor sample .h5 files exist in
this container. It emits spec-conformant v0 files: superblock, root
symbol-table message with an allocated (empty) local heap, compact
attribute messages, and a global heap for vlen strings.
"""

from __future__ import annotations

import struct

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"


class VlenStr(str):
    """Marker: write this attribute as a variable-length string."""


# ---------------------------------------------------------------- read


def _u(buf: bytes, off: int, n: int) -> int:
    return int.from_bytes(buf[off : off + n], "little")


def _parse_datatype(buf: bytes, off: int) -> dict:
    classver = buf[off]
    cls, ver = classver & 0xF, classver >> 4
    if ver not in (1, 2):
        raise ValueError(f"unsupported datatype version {ver}")
    bits = buf[off + 1 : off + 4]
    size = _u(buf, off + 4, 4)
    dt = {"class": cls, "size": size, "bits": bits, "off": off}
    if cls == 0:  # fixed-point
        dt["signed"] = bool(bits[0] & 0x08)
        dt["big_endian"] = bool(bits[0] & 0x01)
    elif cls == 9:  # variable-length
        dt["vlen_string"] = (bits[0] & 0x0F) == 1
    return dt


def _parse_dataspace(buf: bytes, off: int) -> list[int]:
    ver = buf[off]
    rank = buf[off + 1]
    if ver == 1:
        dims_off = off + 8
    elif ver == 2:
        dims_off = off + 4
    else:
        raise ValueError(f"unsupported dataspace version {ver}")
    if rank > 1:
        raise ValueError(f"attribute rank {rank} > 1 not supported")
    return [_u(buf, dims_off + 8 * i, 8) for i in range(rank)]


def _gheap_object(buf: bytes, addr: int, index: int) -> bytes:
    if buf[addr : addr + 4] != b"GCOL":
        raise ValueError("bad global heap signature")
    size = _u(buf, addr + 8, 8)
    pos, end = addr + 16, addr + size
    while pos + 16 <= end:
        idx = _u(buf, pos, 2)
        osize = _u(buf, pos + 8, 8)
        if idx == 0:  # free space — end of objects
            break
        if idx == index:
            return buf[pos + 16 : pos + 16 + osize]
        pos += 16 + osize + ((-osize) % 8)
    raise ValueError(f"global heap object {index} not found")


def _decode_element(buf: bytes, dt: dict, data: bytes):
    cls, size = dt["class"], dt["size"]
    if cls == 3:  # fixed string: null-terminated/padded
        return data[:size].split(b"\x00", 1)[0].decode("utf-8", "replace")
    if cls == 0:
        return int.from_bytes(
            data[:size],
            "big" if dt.get("big_endian") else "little",
            signed=dt.get("signed", True),
        )
    if cls == 1:
        fmt = {4: "<f", 8: "<d"}.get(size)
        if fmt is None:
            raise ValueError(f"unsupported float size {size}")
        return struct.unpack(fmt, data[:size])[0]
    if cls == 9 and dt.get("vlen_string"):
        length = _u(data, 0, 4)
        addr = _u(data, 4, 8)
        index = _u(data, 12, 4)
        return _gheap_object(buf, addr, index)[:length].decode(
            "utf-8", "replace"
        )
    raise ValueError(f"unsupported datatype class {cls}")


def _parse_attribute(buf: bytes, body: bytes):
    if body[0] != 1:
        raise ValueError(f"unsupported attribute message version {body[0]}")
    name_size = _u(body, 2, 2)
    dt_size = _u(body, 4, 2)
    ds_size = _u(body, 6, 2)
    pos = 8
    name = body[pos : pos + name_size].split(b"\x00", 1)[0].decode("utf-8")
    pos += name_size + ((-name_size) % 8)
    dt = _parse_datatype(body, pos)
    pos += dt_size + ((-dt_size) % 8)
    dims = _parse_dataspace(body, pos)
    pos += ds_size + ((-ds_size) % 8)
    data = body[pos:]
    # the file-level buffer is only needed to chase global-heap refs
    elem = dt["size"]
    if not dims:  # scalar
        return name, _decode_element(buf, dt, data[:elem])
    return name, [
        _decode_element(buf, dt, data[i * elem : (i + 1) * elem])
        for i in range(dims[0])
    ]


def _iter_v1_messages(buf: bytes, header_addr: int):
    if buf[header_addr] != 1:
        raise ValueError(
            f"unsupported object header version {buf[header_addr]} "
            "(only v1 headers are parsed; install h5py for newer files)"
        )
    nmsgs = _u(buf, header_addr + 2, 2)
    first_size = _u(buf, header_addr + 8, 4)
    blocks = [(header_addr + 16, first_size)]
    seen = 0
    while blocks and seen < nmsgs:
        pos, remaining = blocks.pop(0)
        end = pos + remaining
        while pos + 8 <= end and seen < nmsgs:
            mtype = _u(buf, pos, 2)
            msize = _u(buf, pos + 2, 2)
            body = buf[pos + 8 : pos + 8 + msize]
            seen += 1
            pos += 8 + msize
            if mtype == 0x0010:  # continuation
                blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
            else:
                yield mtype, body


def parse_h5_root_attrs(buf: bytes) -> dict:
    """Root-group attributes of an in-memory HDF5 file as a dict.
    Values: str, int, float, or list thereof."""
    if buf[:8] != _SIG:
        raise ValueError("not an HDF5 file (bad signature)")
    ver = buf[8]
    if ver not in (0, 1):
        raise ValueError(
            f"unsupported superblock version {ver} "
            "(v0/v1 only; install h5py for newer files)"
        )
    size_off = buf[13]
    if size_off != 8:
        raise ValueError(f"unsupported offset size {size_off}")
    # v1 inserts 'indexed storage internal node k' (2B) + reserved (2B)
    entry = 24 + (4 if ver == 1 else 0) + 32
    root_header = _u(buf, entry + 8, 8)
    attrs: dict = {}
    for mtype, body in _iter_v1_messages(buf, root_header):
        if mtype == 0x000C:
            name, value = _parse_attribute(buf, body)
            attrs[name] = value
    return attrs


def read_meta(buf: bytes) -> tuple[int, None, list[str]]:
    """Reference read_meta parity (lofar_fluxcal.py:151-172): number
    of coherently-added core stations, flagged fraction (None — the
    reference also returns None), station list. HBA counts are halved
    because the list carries ear sub-stations (CS001HBA0/CS001HBA1);
    zero core stations falls back to the full station count."""
    try:
        attrs = parse_h5_root_attrs(buf)
        band_filter = str(attrs.get("FILTER_SELECTION", ""))
        antenna = band_filter.split("_")[0]
        stations = [str(s) for s in attrs.get("OBSERVATION_STATIONS_LIST", [])]
        ncore = len([s for s in stations if s[:2] == "CS"])
        if antenna == "HBA":
            ncore //= 2
        if ncore == 0:
            ncore = len(stations)
    except (ValueError, IndexError):
        return 0, None, []
    return ncore, None, stations


# --------------------------------------------------------------- write


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((-len(b)) % 8)


def _dt_fixed_string(size: int) -> bytes:
    # class 3 v1, null-padded, ASCII
    return struct.pack("<B3BI", 0x13, 0, 0, 0, size)


def _dt_int64() -> bytes:
    # class 0 v1, little-endian signed, 64 bits
    return struct.pack("<B3BIHH", 0x10, 0x08, 0, 0, 8, 0, 64)


def _dt_float64() -> bytes:
    # class 1 v1, IEEE 754 LE double (the exact h5py property block)
    return struct.pack(
        "<B3BIHHBBBBI", 0x11, 0x20, 0x3F, 0, 8, 0, 64, 52, 11, 0, 52, 1023
    )


def _dt_vlen_string() -> bytes:
    # class 9 v1, vlen type=string; base type = 1-byte fixed string
    return struct.pack("<B3BI", 0x19, 0x01, 0, 0, 16) + _dt_fixed_string(1)


def _ds_scalar() -> bytes:
    return struct.pack("<BBB5x", 1, 0, 0)


def _ds_1d(n: int) -> bytes:
    return struct.pack("<BBB5xQ", 1, 1, 0, n)


def _attr_message(name: str, dt: bytes, ds: bytes, data: bytes) -> bytes:
    nameb = name.encode("ascii") + b"\x00"
    body = struct.pack("<BBHHH", 1, 0, len(nameb), len(dt), len(ds))
    body += _pad8(nameb) + _pad8(dt) + _pad8(ds) + data
    return _pad8(body)


def _v1_message(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def write_minimal_h5(path: str, attrs: dict) -> None:
    """Spec-conformant minimal HDF5 v0 file: one (root) group whose
    object header carries the given attributes compactly. Values may
    be str (fixed string), VlenStr (global-heap vlen string), int,
    float, or list[str]."""
    # global heap objects for vlen strings, assigned in encounter order
    gheap_payloads: list[bytes] = []
    attr_msgs_parts: list[tuple] = []  # deferred: need gheap address
    for name, value in attrs.items():
        if isinstance(value, VlenStr):
            payload = str(value).encode("utf-8")
            gheap_payloads.append(payload)
            attr_msgs_parts.append(
                ("vlen", name, len(payload), len(gheap_payloads))
            )
        elif isinstance(value, str):
            size = len(value.encode("utf-8")) + 1
            data = value.encode("utf-8") + b"\x00"
            attr_msgs_parts.append(
                ("plain", name, _dt_fixed_string(size), _ds_scalar(), data)
            )
        elif isinstance(value, bool):
            raise ValueError("bool attributes not supported")
        elif isinstance(value, int):
            attr_msgs_parts.append(
                (
                    "plain",
                    name,
                    _dt_int64(),
                    _ds_scalar(),
                    struct.pack("<q", value),
                )
            )
        elif isinstance(value, float):
            attr_msgs_parts.append(
                (
                    "plain",
                    name,
                    _dt_float64(),
                    _ds_scalar(),
                    struct.pack("<d", value),
                )
            )
        elif isinstance(value, (list, tuple)):
            enc = [str(v).encode("utf-8") for v in value]
            size = max((len(e) for e in enc), default=0) + 1
            data = b"".join(e.ljust(size, b"\x00") for e in enc)
            attr_msgs_parts.append(
                (
                    "plain",
                    name,
                    _dt_fixed_string(size),
                    _ds_1d(len(enc)),
                    data,
                )
            )
        else:
            raise ValueError(f"unsupported attribute type for {name!r}")

    # ---- layout: superblock | local heap hdr | heap data | objhdr | gheap
    sb_size = 96
    heap_hdr_addr = sb_size
    heap_data_addr = heap_hdr_addr + 32
    objhdr_addr = heap_data_addr + 32

    # object header needs the gheap address for vlen attrs; the gheap
    # address depends on the header size — resolve with a fixed-point
    # pass (sizes don't change between passes: only an address field).
    def build_messages(gheap_addr: int) -> bytes:
        msgs = [
            _v1_message(0x0011, struct.pack("<QQ", UNDEF, heap_hdr_addr))
        ]
        for part in attr_msgs_parts:
            if part[0] == "vlen":
                _, name, length, idx = part
                data = struct.pack("<IQI", length, gheap_addr, idx)
                msgs.append(
                    _v1_message(
                        0x000C,
                        _attr_message(
                            name, _dt_vlen_string(), _ds_scalar(), data
                        ),
                    )
                )
            else:
                _, name, dt, ds, data = part
                msgs.append(
                    _v1_message(0x000C, _attr_message(name, dt, ds, data))
                )
        return b"".join(msgs)

    probe = build_messages(0)
    gheap_addr = objhdr_addr + 16 + len(probe)
    gheap_addr += (-gheap_addr) % 8
    msg_blob = build_messages(gheap_addr)
    n_msgs = 1 + len(attr_msgs_parts)
    objhdr = (
        struct.pack("<BBHII4x", 1, 0, n_msgs, 1, len(msg_blob)) + msg_blob
    )

    gheap = b""
    if gheap_payloads:
        objs = b""
        for i, payload in enumerate(gheap_payloads, start=1):
            objs += (
                struct.pack("<HH4xQ", i, 1, len(payload)) + _pad8(payload)
            )
        # free-space pseudo-object (index 0) closes the collection;
        # its size includes its own 16-byte header per the spec
        free = struct.pack("<HH4xQ", 0, 0, 16)
        total = 16 + len(objs) + len(free)
        gheap = b"GCOL" + struct.pack("<B3xQ", 1, total) + objs + free

    eof = gheap_addr + len(gheap) if gheap else objhdr_addr + len(objhdr)

    sb = _SIG + struct.pack(
        "<BBBBBBBBHHI", 0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0
    )
    sb += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    # root symbol table entry: name offset 0, header addr, no cache
    sb += struct.pack("<QQII16x", 0, objhdr_addr, 0, 0)
    assert len(sb) == sb_size

    # local heap: 32-byte data segment; offset 0 = empty name slot,
    # free block at offset 8 (next=1 end marker, size=24)
    heap_hdr = b"HEAP" + struct.pack("<B3xQQQ", 0, 32, 8, heap_data_addr)
    heap_data = b"\x00" * 8 + struct.pack("<QQ", 1, 24) + b"\x00" * 8

    blob = sb + heap_hdr + heap_data + objhdr
    blob += b"\x00" * (gheap_addr - len(blob)) if gheap else b""
    blob += gheap
    with open(path, "wb") as fh:
        fh.write(blob)
