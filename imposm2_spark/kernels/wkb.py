"""Minimal WKB encode/decode (little-endian) — SURVEY.md G7.

Reference analog: imposm2 shipped geometries to PostGIS as WKB via Shapely/GEOS
(imposm/geom.py + psycopg2 adapters). This is a from-scratch NumPy writer/reader
for the OGC well-known-binary spec (public standard), covering exactly the types
the engine materializes: Point(1), LineString(2), Polygon(3), MultiPolygon(6).

Used only at materialization boundaries; kernels operate on nested float64 arrays.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6

_LE = b"\x01"


def point_wkb(x: float, y: float) -> bytes:
    return _LE + struct.pack("<Idd", WKB_POINT, x, y)


def linestring_wkb(coords: np.ndarray) -> bytes:
    c = np.ascontiguousarray(np.asarray(coords, dtype="<f8"))
    return _LE + struct.pack("<II", WKB_LINESTRING, len(c)) + c.tobytes()


def _polygon_body(rings: list[np.ndarray]) -> bytes:
    parts = [struct.pack("<I", len(rings))]
    for r in rings:
        c = np.ascontiguousarray(np.asarray(r, dtype="<f8"))
        parts.append(struct.pack("<I", len(c)))
        parts.append(c.tobytes())
    return b"".join(parts)


def polygon_wkb(rings: list[np.ndarray]) -> bytes:
    """rings = [shell, hole, ...], each (N,2) closed."""
    return _LE + struct.pack("<I", WKB_POLYGON) + _polygon_body(rings)


def multipolygon_wkb(polygons: list[list[np.ndarray]]) -> bytes:
    parts = [_LE, struct.pack("<II", WKB_MULTIPOLYGON, len(polygons))]
    for rings in polygons:
        parts.append(_LE + struct.pack("<I", WKB_POLYGON) + _polygon_body(rings))
    return b"".join(parts)


def parse_wkb(buf: bytes) -> tuple[int, object]:
    """-> (geom_type, payload). Point -> (x, y); LineString -> (N,2) array;
    Polygon -> [rings]; MultiPolygon -> [[rings], ...]."""
    geom_type, payload, off = _parse_one(buf, 0)
    if off != len(buf):
        raise ValueError(f"trailing {len(buf) - off} bytes after WKB geometry")
    return geom_type, payload


def _parse_one(buf: bytes, off: int) -> tuple[int, object, int]:
    if buf[off : off + 1] != _LE:
        raise ValueError("only little-endian WKB supported")
    (geom_type,) = struct.unpack_from("<I", buf, off + 1)
    off += 5
    if geom_type == WKB_POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return geom_type, (x, y), off + 16
    if geom_type == WKB_LINESTRING:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
        return geom_type, arr.copy(), off + 16 * n
    if geom_type == WKB_POLYGON:
        rings, off = _parse_rings(buf, off)
        return geom_type, rings, off
    if geom_type == WKB_MULTIPOLYGON:
        (np_,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys = []
        for _ in range(np_):
            t, rings, off = _parse_one(buf, off)
            if t != WKB_POLYGON:
                raise ValueError("MultiPolygon member is not a Polygon")
            polys.append(rings)
        return geom_type, polys, off
    raise ValueError(f"unsupported WKB geometry type {geom_type}")


def _parse_rings(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    (nr,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings = []
    for _ in range(nr):
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
        rings.append(arr.copy())
        off += 16 * n
    return rings, off


def rings_to_nested(rings: list[np.ndarray]) -> list[list[list[float]]]:
    """Kernel rings -> the engine's ARRAY<ARRAY<ARRAY<DOUBLE>>> column shape."""
    return [np.asarray(r, dtype=np.float64).tolist() for r in rings]


def nested_to_rings(nested) -> list[np.ndarray]:
    """Robust to Arrow's object-dtype nested arrays (ndarray-of-ndarray)."""
    out = []
    for r in nested:
        arr = np.asarray(r)
        if arr.dtype == object:
            arr = np.vstack([np.asarray(p, dtype=np.float64) for p in r])
        out.append(np.asarray(arr, dtype=np.float64).reshape(-1, 2))
    return out
