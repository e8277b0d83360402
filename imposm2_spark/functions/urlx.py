"""T26: URL canonicalization + host extraction for crawl curation.

Graft addition (SURVEY.md §2 training-data ops) — no reference analog;
imposm2 keys features on OSM element ids, not URLs. Web-crawl curation
(CCNet / RefinedWeb style) needs URL-level identity BEFORE text-level
dedup: the same page is recrawled under tracking-parameter, case, port,
fragment, and www-prefix variants, and per-host aggregates (doc counts,
URL-duplication rate) drive host-level block rules.

Canonical form (engine-defined, frozen — the DuckDB oracle in
plans/registry.py mirrors it expression-for-expression):
  1. fragment stripped (everything from the first ``#``)
  2. scheme lowercased
  3. authority lowercased; default port stripped (``:443`` for https,
     ``:80`` for http); leading ``www.`` prefixes stripped (ALL of them —
     one-pass stripping breaks idempotence on www.www.* hosts)
  4. path preserved case-sensitively; empty path becomes ``/``
  5. query params: tracking params dropped (``utm_*``, ``fbclid``,
     ``gclid``, ``msclkid``, ``ref`` — names matched lowercase, as the
     trackers emit them), the rest sorted lexicographically
     as full ``k=v`` strings and re-joined with ``&``; an emptied query
     loses its ``?``

Scale shape: every function here is a pure codegen/regex Column expression
— a single projection over the scan, zero shuffles, no Python boundary
(§2.10). Host aggregation on top is one map-side-combined hash-agg keyed
by host — linear at 10^12 URLs. All regexes are RE2-safe (no lookaround /
backreferences), so they run identically under Spark (Java regex), DuckDB
(RE2), and photon-style engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# tracking-parameter names dropped during canonicalization; matched against
# the full "k=v" token, anchored, value unconstrained. Kept as ONE frozen
# alternation so the Spark rlike and the DuckDB regexp_matches stay textually
# identical (see registry.URL_TRACKING_RE usage).
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_scheme(url: F.Column) -> F.Column:
    """Lowercased scheme, '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def _host_from_auth(scheme: F.Column, raw_auth: F.Column) -> F.Column:
    """Canonical host from a pre-extracted raw authority: lowercase, strip
    the scheme's default port and leading www. (shared by url_host and
    canonicalize_url so the hot canonicalization path runs the
    fragment/scheme/authority regexes ONCE — review r5)."""
    auth = F.lower(raw_auth)
    auth = F.when(scheme == "https", F.regexp_replace(auth, r":443$", "")).otherwise(
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")).otherwise(auth)
    )
    return F.regexp_replace(auth, r"^(www\.)+", "")


def url_host(url: F.Column) -> F.Column:
    """Canonical host: lowercased authority with default port and leading
    www. stripped. '' for scheme-less input."""
    base = F.regexp_replace(url, r"#.*", "")
    scheme = url_scheme(base)
    rest = F.regexp_replace(base, _SCHEME_RE, "")
    raw_auth = F.regexp_extract(rest, r"^([^/?]*)", 1)
    return F.when(scheme == "", F.lit("")).otherwise(
        _host_from_auth(scheme, raw_auth)
    )


def canonicalize_url(url: F.Column) -> F.Column:
    """Canonical URL string per the module contract; idempotent
    (canonicalize(canonicalize(u)) == canonicalize(u), property-tested).
    Non-absolute input (no scheme) is returned fragment-stripped only."""
    base = F.regexp_replace(url, r"#.*", "")
    scheme = url_scheme(base)
    rest = F.regexp_replace(base, _SCHEME_RE, "")
    raw_auth = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # host derived from the raw_auth already in hand — calling url_host(base)
    # here would re-run the fragment/scheme/authority regexes per row in the
    # module's hottest projection (review r5); the scheme=='' case never
    # consumes `host` (the outer when returns `base`)
    host = _host_from_auth(scheme, raw_auth)
    pathq = rest.substr(F.length(raw_auth) + 1, F.lit(1 << 30))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q2 = F.concat_ws("&", kept)
    return F.when(scheme == "", base).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
        )
    )
