"""F-GEO: deterministic per-document geotag (FIXTURES.md §1 rule, frozen).

Rule: if the html carries a `<meta name="geo.position" content="{lat};{lon}">`
tag, use it; otherwise derive a deterministic fallback from the url:
    lon = (blake2b(url, digest_size=8, salt=b'lon') % 3_600_000) / 10_000 - 180
    lat mapped into [-85.05, 85.05] with salt b'lat' (web-mercator clamp).

Reference analog: imposm2's node (lon, lat) is intrinsic to the input; the
graft derives it, after which documents play the node-stream role (SURVEY §1.3).

Runs as one Arrow-batched pandas UDF returning a struct; blake2b per row is a
cheap C call at batch granularity (not a Spark per-row Python UDF).
"""

from __future__ import annotations

import re
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# lat;lon with optional whitespace — the geo.position microformat
_GEO_META_RE = re.compile(
    rb'<meta\s+name="geo\.position"\s+content="\s*(-?\d+(?:\.\d+)?)\s*;'
    rb'\s*(-?\d+(?:\.\d+)?)\s*"',
    re.IGNORECASE,
)

LAT_CLAMP = 85.05


def fallback_lon(url: str) -> float:
    h = int.from_bytes(blake2b(url.encode("utf-8"), digest_size=8, salt=b"lon").digest(), "big")
    return (h % 3_600_000) / 10_000.0 - 180.0


def fallback_lat(url: str) -> float:
    h = int.from_bytes(blake2b(url.encode("utf-8"), digest_size=8, salt=b"lat").digest(), "big")
    span = int(2 * LAT_CLAMP * 10_000)  # 0.0001-degree grid over the clamp range
    return (h % span) / 10_000.0 - LAT_CLAMP


def geotag_pair(url: str | None, html: bytes | None) -> tuple[float, float]:
    """(lon, lat) for one document — geo meta wins, else url-hash fallback.

    A NULL url hashes as the empty string (review r5: url.encode() on None
    raised AttributeError and killed the whole Arrow batch; one dirty row
    must not fail the spine stage). Deterministic: every null-url document
    lands on the same fallback point."""
    if isinstance(html, (bytes, bytearray)):
        m = _GEO_META_RE.search(html)
        if m:
            lat = float(m.group(1))
            lon = float(m.group(2))
            return lon, lat
    # isinstance, not `is not None`: pandas may surface a missing string as
    # NaN rather than None depending on the Arrow conversion path
    u = url if isinstance(url, str) else ""
    return fallback_lon(u), fallback_lat(u)


_GEO_SCHEMA = T.StructType(
    [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
)


@F.pandas_udf(_GEO_SCHEMA)
def geotag_udf(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    n = len(url)
    lon = np.empty(n, dtype=np.float64)
    lat = np.empty(n, dtype=np.float64)
    for i, (u, h) in enumerate(zip(url, html)):
        lon[i], lat[i] = geotag_pair(u, h)
    return pd.DataFrame({"lon": lon, "lat": lat})


def geotag(url_col: Column | str, html_col: Column | str) -> Column:
    """df.withColumn('geo', geotag('url', 'html')) -> struct<lon double, lat double>."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    h = F.col(html_col) if isinstance(html_col, str) else html_col
    return geotag_udf(u, h)
