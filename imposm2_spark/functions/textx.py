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

import re
from html import unescape
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


# ---------------------------------------------------------------------------
# Fast path: a regex tokenizer for the common well-formed-page shape, gated so
# anything html.parser treats non-trivially (comments, doctype, processing
# instructions, bare '<', malformed tags) falls back to the reference
# implementation above. Output is byte-identical to the html.parser path on
# every input the gate admits (differential-tested in tests/test_textx_geotag
# against adversarial + randomized documents). html.parser runs ~20k docs/s
# per core — the spine's hottest stage — while this path tokenizes with three
# compiled regexes.
# ---------------------------------------------------------------------------
_RISKY = re.compile(r"<(?![a-zA-Z]|/[a-zA-Z])")  # <!, <?, <3, </>, <<, bare <
# STRICT start-tag grammar: well-formed name + `name[=value]` attributes with
# properly quoted or bare values, optional XHTML self-close. This is a strict
# SUBSET of html.parser's tolerant grammar — on any tag both accept, the
# tolerant machinery finds the same extent, the same tag name, and ends with
# the same '>' / '/>' classification (bare values eat a trailing '/', exactly
# like attrfind_tolerant's `(?!['"])[^>\s]*`). Tags only the tolerant grammar
# accepts (junk attrs, '==', '>' in unquoted values, ...) fail this regex and
# send the whole document to the reference parser.
_TAG_STRICT = re.compile(
    r"""<([a-zA-Z][^\t\n\r\f />\x00]*)"""
    r"""((?:\s+[^\s/>=]+(?:\s*=\s*(?:"[^"]*"|'[^']*'|[^\s>"'`]+))?)*)\s*(/?)>"""
)
# html.parser's own end-tag pattern (anything else -> tolerant path -> fallback)
_ENDTAGFIND = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
# html.parser raw-text close: set_cdata_mode scans for the FULL close tag
# (r'</\s*script\s*>'), so `</script x>` or `</scriptx>` never end raw text —
# they stay (discarded) data and scanning continues.
_CDATA_CLOSE = {
    e: re.compile(r"</\s*%s\s*>" % e, re.IGNORECASE) for e in _SKIP_ELEMENTS
}


def _find_cdata_close(s: str, pos: int, elem: str) -> int | None:
    """Position just past the raw-text close tag (None: unclosed to EOF —
    the rest of the document is raw data, discarded like html.parser does)."""
    m = _CDATA_CLOSE[elem].search(s, pos)
    return m.end() if m else None


def _fast_extract(s: str) -> str | None:
    """Frozen-spec extraction for gate-admitted documents; None = fall back."""
    if _RISKY.search(s):
        return None
    chunks: list[str] = []
    pos = 0
    while True:
        lt = s.find("<", pos)
        if lt == -1:
            chunks.append(s[pos:])
            break
        if lt > pos:
            chunks.append(s[pos:lt])
        if s.startswith("</", lt):
            em = _ENDTAGFIND.match(s, lt)
            if not em:
                return None  # tolerant bogus-end-tag handling: full parser
            pos = em.end()
            continue
        m = _TAG_STRICT.match(s, lt)
        if not m:
            return None  # tolerant-only / malformed tag: full parser
        pos = m.end()
        if m.group(3):  # XHTML self-close: handle_startendtag, no cdata mode
            continue
        name = m.group(1).lower()
        if name in _SKIP_ELEMENTS:
            end = _find_cdata_close(s, pos, name)
            if end is None:
                break  # unclosed raw text: rest of document discarded
            pos = end
    text = " ".join(unescape(c) if "&" in c else c for c in chunks)
    return " ".join(text.split())


def extract_text_bytes(html: bytes | None) -> str | None:
    """Frozen extractor v1 for one document. None stays None."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    fast = _fast_extract(s)
    if fast is not None:
        return fast
    p = _TextCollector()
    p.feed(s)
    p.close()
    return p.text()


def extract_text_bytes_reference(html: bytes | None) -> str | None:
    """The html.parser reference path, unconditionally (differential tests)."""
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
