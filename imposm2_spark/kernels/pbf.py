"""Byte-level OSM PBF wire codec (S1 literal form).

Implements the public OSM PBF container + osmformat wire layout from the
published spec (wiki.openstreetmap.org/wiki/PBF_Format; fileformat.proto /
osmformat.proto) with NO protobuf library: hand-rolled wire decoding —
varints, zigzag, length-delimited fields, packed arrays — plus a writer
used to build golden fixtures (encode -> decode round-trips are the spec
test; SURVEY.md §2.1 S1).

Layout recap:
  file   := repeated [uint32 BE len][BlobHeader][Blob]
  BlobHeader := 1:type(str "OSMHeader"|"OSMData") 3:datasize(int32)
  Blob       := 1:raw(bytes) | 3:zlib_data(bytes) (+ 2:raw_size)
  PrimitiveBlock := 1:stringtable{1:bytes*} 2:PrimitiveGroup*
                    17:granularity(=100) 19:lat_offset 20:lon_offset
  PrimitiveGroup := 2:DenseNodes 3:Way* 4:Relation*
  DenseNodes := 1:id(packed sint64 Δ) 8:lat(packed sint64 Δ)
                9:lon(packed sint64 Δ) 10:keys_vals(packed int32,
                0-terminated kv runs per node)
  Way        := 1:id 2:keys(packed) 3:vals(packed) 8:refs(packed sint64 Δ)
  Relation   := 1:id 2:keys 3:vals 8:roles_sid(packed)
                9:memids(packed sint64 Δ) 10:types(packed 0/1/2)
  degrees = 1e-9 * (offset + granularity * raw)

Per-blob decode is bounded work (the spec caps blobs at 32 MB; extracts
use ~8k elements/block), so a Python-loop varint parser is acceptable
here; the *block* level is where the parallelism lives (sources/pbf.py
fans blobs out across the cluster — the same design as the reference's
process-per-block parser, SURVEY §2.1).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

__all__ = [
    "decode_blob",
    "decode_file",
    "encode_file",
    "scan_blob_ranges",
    "PbfNode",
    "PbfWay",
    "PbfRelation",
]

MEMBER_TYPES = ("node", "way", "relation")


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------

def _uvarint(buf: bytes, i: int) -> tuple[int, int]:
    r = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << shift
        if not b & 0x80:
            return r, i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long (corrupt PBF)")


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _w_uvarint(v: int) -> bytes:
    if v < 0:
        # Python's arithmetic right shift never reaches 0 for negatives, so
        # the loop below would hang silently (ADVICE r5). Negative ids are
        # legal int64 per the spec but must come through zigzag encoding;
        # raise instead of spinning.
        raise ValueError(f"_w_uvarint requires a non-negative value, got {v}")
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _w_tag(fieldno: int, wire: int) -> bytes:
    return _w_uvarint((fieldno << 3) | wire)


def _w_len(fieldno: int, payload: bytes) -> bytes:
    return _w_tag(fieldno, 2) + _w_uvarint(len(payload)) + payload


def _w_packed_uvarint(fieldno: int, vals) -> bytes:
    return _w_len(fieldno, b"".join(_w_uvarint(v) for v in vals))


def _w_packed_sint_delta(fieldno: int, vals) -> bytes:
    out = bytearray()
    prev = 0
    for v in vals:
        out += _w_uvarint(_zigzag_enc(v - prev))
        prev = v
    return _w_len(fieldno, bytes(out))


def _fields(buf: bytes):
    """Yield (field_no, wire_type, value) over one message.

    wire 0 -> int value; wire 2 -> bytes; wire 1/5 -> raw 8/4 bytes.
    Unknown fields are yielded too (callers skip what they don't know) —
    forward-compatible like real protobuf readers.
    """
    i, n = 0, len(buf)
    while i < n:
        tag, i = _uvarint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _uvarint(buf, i)
        elif wt == 2:
            ln, i = _uvarint(buf, i)
            v = buf[i : i + ln]
            if len(v) != ln:
                raise ValueError("truncated length-delimited field")
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _packed_uvarints(buf: bytes) -> list[int]:
    out = []
    i, n = 0, len(buf)
    while i < n:
        v, i = _uvarint(buf, i)
        out.append(v)
    return out


def _packed_sint_delta(buf: bytes) -> list[int]:
    out = []
    i, n = 0, len(buf)
    acc = 0
    while i < n:
        v, i = _uvarint(buf, i)
        acc += _zigzag_dec(v)
        out.append(acc)
    return out


# ---------------------------------------------------------------------------
# element records
# ---------------------------------------------------------------------------

@dataclass
class PbfNode:
    id: int
    lon: float
    lat: float
    tags: dict = field(default_factory=dict)


@dataclass
class PbfWay:
    id: int
    refs: list
    tags: dict = field(default_factory=dict)


@dataclass
class PbfRelation:
    id: int
    members: list  # (type str, ref int, role str)
    tags: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _blob_payload(blob: bytes) -> bytes:
    raw = zdata = None
    for fno, _wt, v in _fields(blob):
        if fno == 1:
            raw = v
        elif fno == 3:
            zdata = v
    if raw is not None:
        return raw
    if zdata is not None:
        return zlib.decompress(zdata)
    raise ValueError("Blob carries neither raw nor zlib_data (unsupported codec)")


def decode_blob(blob: bytes):
    """One OSMData blob -> (nodes, ways, relations) element lists."""
    block = _blob_payload(blob)
    strings: list[str] = []
    groups: list[bytes] = []
    gran, lat_off, lon_off = 100, 0, 0
    for fno, _wt, v in _fields(block):
        if fno == 1:
            strings = [
                sv.decode("utf-8")
                for sfno, _swt, sv in _fields(v)
                if sfno == 1
            ]
        elif fno == 2:
            groups.append(v)
        elif fno == 17:
            gran = v
        elif fno == 19:
            lat_off = v
        elif fno == 20:
            lon_off = v

    def deg(off, raw):
        # divide, don't multiply by 1e-9: division is correctly rounded in
        # one step, while 1e-9 is itself inexact and compounds a second
        # rounding (300000 * 1e-9 != 0.0003 but 300000 / 1e9 == 0.0003)
        return (off + gran * raw) / 1e9

    nodes, ways, rels = [], [], []
    for g in groups:
        for fno, _wt, v in _fields(g):
            if fno == 2:  # DenseNodes
                ids = lats = lons = None
                kvs: list[int] = []
                for dfno, _dwt, dv in _fields(v):
                    if dfno == 1:
                        ids = _packed_sint_delta(dv)
                    elif dfno == 8:
                        lats = _packed_sint_delta(dv)
                    elif dfno == 9:
                        lons = _packed_sint_delta(dv)
                    elif dfno == 10:
                        kvs = _packed_uvarints(dv)
                ki = 0
                for j, nid in enumerate(ids or []):
                    tags = {}
                    while ki < len(kvs) and kvs[ki] != 0:
                        tags[strings[kvs[ki]]] = strings[kvs[ki + 1]]
                        ki += 2
                    ki += 1  # the 0 terminator (absent entirely if no node has tags)
                    nodes.append(
                        PbfNode(nid, deg(lon_off, lons[j]), deg(lat_off, lats[j]), tags)
                    )
            elif fno == 3:  # Way
                wid, keys, vals, refs = 0, [], [], []
                for wfno, _wwt, wv in _fields(v):
                    if wfno == 1:
                        wid = wv
                    elif wfno == 2:
                        keys = _packed_uvarints(wv)
                    elif wfno == 3:
                        vals = _packed_uvarints(wv)
                    elif wfno == 8:
                        refs = _packed_sint_delta(wv)
                ways.append(
                    PbfWay(wid, refs, {strings[k]: strings[x] for k, x in zip(keys, vals)})
                )
            elif fno == 4:  # Relation
                rid, keys, vals, roles, mids, types = 0, [], [], [], [], []
                for rfno, _rwt, rv in _fields(v):
                    if rfno == 1:
                        rid = rv
                    elif rfno == 2:
                        keys = _packed_uvarints(rv)
                    elif rfno == 3:
                        vals = _packed_uvarints(rv)
                    elif rfno == 8:
                        roles = _packed_uvarints(rv)
                    elif rfno == 9:
                        mids = _packed_sint_delta(rv)
                    elif rfno == 10:
                        types = _packed_uvarints(rv)
                members = [
                    (MEMBER_TYPES[t], m, strings[r])
                    for t, m, r in zip(types, mids, roles)
                ]
                rels.append(
                    PbfRelation(rid, members, {strings[k]: strings[x] for k, x in zip(keys, vals)})
                )
    return nodes, ways, rels


def scan_blob_ranges(path: str):
    """Sequential header scan -> [(offset, length, type)] per blob.

    This is the DRIVER-side step of the parallel read (sources/pbf.py): it
    reads only the 4-byte length prefixes + BlobHeaders (a few hundred
    bytes per ~8k-element block), never blob payloads, so scanning a
    planet-scale file is IO-bound on ~0.01% of its bytes.
    """
    out = []
    with open(path, "rb") as f:
        while True:
            hdr_len_b = f.read(4)
            if not hdr_len_b:
                break
            (hdr_len,) = struct.unpack(">I", hdr_len_b)
            hdr = f.read(hdr_len)
            btype, datasize = "", 0
            for fno, _wt, v in _fields(hdr):
                if fno == 1:
                    btype = v.decode("utf-8")
                elif fno == 3:
                    datasize = v
            off = f.tell()
            out.append((off, datasize, btype))
            f.seek(off + datasize)
    return out


def decode_file(path: str):
    """Whole-file decode (tests / small extracts); returns merged lists."""
    nodes, ways, rels = [], [], []
    with open(path, "rb") as f:
        for off, ln, btype in scan_blob_ranges(path):
            if btype != "OSMData":
                continue
            f.seek(off)
            n, w, r = decode_blob(f.read(ln))
            nodes += n
            ways += w
            rels += r
    return nodes, ways, rels


# ---------------------------------------------------------------------------
# encode (fixture/golden writer — same wire layout, zlib blobs)
# ---------------------------------------------------------------------------

def _string_table(elements) -> tuple[list[str], dict]:
    strings = [""]  # index 0 is reserved (the DenseNodes kv terminator)
    index = {"": 0}

    def intern(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    for e in elements:
        for k, v in e.tags.items():
            intern(k)
            intern(v)
        if isinstance(e, PbfRelation):
            for _t, _m, role in e.members:
                intern(role)
    return strings, index


def _encode_block(nodes, ways, rels, granularity=100) -> bytes:
    strings, idx = _string_table([*nodes, *ways, *rels])
    st = b"".join(_w_len(1, s.encode("utf-8")) for s in strings)
    groups = []
    if nodes:
        kvs = []
        for nd in nodes:
            for k, v in nd.tags.items():
                kvs += [idx[k], idx[v]]
            kvs.append(0)
        dense = (
            _w_packed_sint_delta(1, [nd.id for nd in nodes])
            + _w_packed_sint_delta(8, [round(nd.lat * 1e9) // granularity for nd in nodes])
            + _w_packed_sint_delta(9, [round(nd.lon * 1e9) // granularity for nd in nodes])
            + _w_packed_uvarint(10, kvs)
        )
        groups.append(_w_len(2, dense))
    for w in ways:
        body = (
            _w_tag(1, 0) + _w_uvarint(w.id)
            + _w_packed_uvarint(2, [idx[k] for k in w.tags])
            + _w_packed_uvarint(3, [idx[v] for v in w.tags.values()])
            + _w_packed_sint_delta(8, list(w.refs))
        )
        groups.append(_w_len(3, body))
    for r in rels:
        body = (
            _w_tag(1, 0) + _w_uvarint(r.id)
            + _w_packed_uvarint(2, [idx[k] for k in r.tags])
            + _w_packed_uvarint(3, [idx[v] for v in r.tags.values()])
            + _w_packed_uvarint(8, [idx[role] for _t, _m, role in r.members])
            + _w_packed_sint_delta(9, [m for _t, m, _r in r.members])
            + _w_packed_uvarint(10, [MEMBER_TYPES.index(t) for t, _m, _r in r.members])
        )
        groups.append(_w_len(4, body))
    block = _w_len(1, st)
    for g in groups:
        block += _w_len(2, g)
    block += _w_tag(17, 0) + _w_uvarint(granularity)
    return block


def _frame(btype: str, payload: bytes) -> bytes:
    raw_size = len(payload)
    z = zlib.compress(payload)
    blob = _w_tag(2, 0) + _w_uvarint(raw_size) + _w_len(3, z)
    hdr = _w_len(1, btype.encode("utf-8")) + _w_tag(3, 0) + _w_uvarint(len(blob))
    return struct.pack(">I", len(hdr)) + hdr + blob


def encode_file(path: str, nodes, ways, rels, block_elements: int = 8000) -> int:
    """Write a spec-layout .osm.pbf: OSMHeader + one OSMData blob per
    `block_elements` chunk (nodes, then ways, then relations — the
    conventional ordering). Returns the blob count."""
    header = _w_len(4, b"DenseNodes")  # required_features
    n_blobs = 1
    with open(path, "wb") as f:
        f.write(_frame("OSMHeader", header))

        def chunks(seq):
            for i in range(0, len(seq), block_elements):
                yield seq[i : i + block_elements]

        for ch in chunks(nodes):
            f.write(_frame("OSMData", _encode_block(ch, [], [])))
            n_blobs += 1
        for ch in chunks(ways):
            f.write(_frame("OSMData", _encode_block([], ch, [])))
            n_blobs += 1
        for ch in chunks(rels):
            f.write(_frame("OSMData", _encode_block([], [], ch)))
            n_blobs += 1
    return n_blobs
