"""F-HTML: deterministic HTML -> text extraction (frozen spec v1).

North-rule invariant (BASELINE.json input_hint): byte-identical extracted text
per url. Reference analog: imposm2's parse stage (imposm.parser XML/PBF decode)
— here the "parse" is HTML to text, executed as an Arrow-batched pandas UDF.

FROZEN SPEC v1 — do not change without regolding tests/test_textx.py:
  1. Decode input bytes as UTF-8 (errors='replace').
  2. Walk the HTML with html.parser (stdlib, convert_charrefs=True so entities
     and character references decode to text).
  3. Collect all text nodes EXCEPT inside <script> and <style> elements.
     Note html.parser treats script/style as raw-text (CDATA) elements: their
     content ends at the FIRST matching close tag (HTML5 behavior), so a
     literal "<script>" inside script text does not nest.
  4. Join collected chunks with a single ASCII space, then canonicalize
     whitespace: split on any Unicode whitespace run, join with a single
     ASCII space, strip ends.

Properties (tested): deterministic, independent of Arrow batch size and row
order, stable under re-extraction of its own output wrapped in <p>.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPEC_VERSION = 1

_SKIP_ELEMENTS = frozenset({"script", "style"})


class _TextCollector(HTMLParser):
    __slots__ = ("_chunks", "_skip_depth")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_ELEMENTS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_ELEMENTS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._chunks.append(data)

    def text(self) -> str:
        return " ".join(" ".join(self._chunks).split())


def extract_text_bytes(html: bytes | None) -> str | None:
    """Frozen extractor v1 for one document. None stays None."""
    if html is None:
        return None
    p = _TextCollector()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    return p.text()


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized batch loop over one Arrow batch (pandas Series of bytes)."""
    return html.map(extract_text_bytes)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_series(html)


def extract_text(html_col: Column | str) -> Column:
    """DataFrame-facing entry: df.withColumn('text', extract_text(F.col('html')))."""
    return extract_text_udf(F.col(html_col) if isinstance(html_col, str) else html_col)
