"""T26 URL canonicalization: frozen-contract examples, a pure-Python
differential reference over the synthesized corpus, idempotence, and the
host-rollup query's keep-rule discrimination."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from imposm2_spark.functions import urlx


def _py_canon(u: str) -> str:
    """Independent pure-Python implementation of the module contract."""
    base = re.sub(r"#.*", "", u)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", base)
    if not m:
        return base
    scheme = m.group(1).lower()
    rest = base[m.end():]
    raw_auth = re.match(r"^([^/?]*)", rest).group(1)
    auth = raw_auth.lower()
    if scheme == "https":
        auth = re.sub(r":443$", "", auth)
    elif scheme == "http":
        auth = re.sub(r":80$", "", auth)
    host = re.sub(r"^(www\.)+", "", auth)
    pathq = rest[len(raw_auth):]
    path = re.match(r"^([^?]*)", pathq).group(1) or "/"
    qm = re.search(r"\?(.*)$", pathq)
    qs = qm.group(1) if qm else ""
    kept = sorted(
        p
        for p in qs.split("&")
        if p and not re.match(r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)=", p)
    )
    return f"{scheme}://{host}{path}" + (f"?{'&'.join(kept)}" if kept else "")


CASES = [
    (
        "HTTPS://WWW.Example.COM:443/Path/To?b=2&utm_source=x&a=1#frag",
        "https://example.com/Path/To?a=1&b=2",
    ),
    ("http://Example.org:80", "http://example.org/"),
    ("https://example.org/?utm_campaign=z&fbclid=abc", "https://example.org/"),
    ("https://example.org:8443/x", "https://example.org:8443/x"),  # non-default port kept
    ("https://sub.www.example.org/a", "https://sub.www.example.org/a"),  # inner www kept
    ("https://example.org/A/B?ref=tw&Z=1&z=1", "https://example.org/A/B?Z=1&z=1"),
    ("relative/path#frag", "relative/path"),  # scheme-less: fragment strip only
]


def _canon_many(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r["c"]
        for r in df.select(urlx.canonicalize_url(F.col("url")).alias("c")).collect()
    ]


def test_canonicalize_frozen_examples(spark):
    got = _canon_many(spark, [u for u, _ in CASES])
    for (u, want), g in zip(CASES, got):
        assert g == want, (u, g, want)
        assert _py_canon(u) == want, (u, _py_canon(u), want)


def test_canonicalize_differential_and_idempotent(spark):
    """Spark == pure-Python reference on the registry's synthesized corpus,
    and canonicalize(canonicalize(u)) == canonicalize(u)."""
    from imposm2_spark.plans import registry

    base = registry.load(spark, "/root/testdata/sf0.001", "documents")
    # the SAME synthesis the oracle query runs — not a copy that could drift
    url = registry.url_synth_col()
    rows = (
        base.select(url.alias("url"))
        .select(
            "url",
            urlx.canonicalize_url(F.col("url")).alias("c1"),
            urlx.canonicalize_url(urlx.canonicalize_url(F.col("url"))).alias("c2"),
            urlx.url_host(F.col("url")).alias("host"),
        )
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r["c1"] == _py_canon(r["url"]), (r["url"], r["c1"])
        assert r["c2"] == r["c1"], ("not idempotent", r["url"], r["c1"], r["c2"])
        assert r["host"].startswith("h") and r["host"].endswith(".example.org")


def test_url_host_curation_blocks_dense_hosts(spark):
    """Even-numbered hosts (path modulus 3) collapse to few canonical URLs
    and must be blocked at sf0.01; odd hosts stay nearly unique and pass."""
    from imposm2_spark.plans import registry

    out = registry.queries()["url_host_curation"](spark, "/root/testdata/sf0.01")
    rows = {r["host"]: r for r in out.collect()}
    assert set(rows) == {f"h{i}.example.org" for i in range(5)}
    for host, r in rows.items():
        n = int(host[1])
        assert r["n_docs"] > 0 and 0 <= r["dup_url_frac"] <= 1
        assert r["keep"] is not None
        if n % 2 == 0:
            assert not r["keep"], (host, r)
        else:
            assert r["keep"], (host, r)


def test_canonicalize_fuzz_differential(spark):
    """Seeded fuzz: URLs assembled from adversarial fragments (repeated ?,
    #, &, empty params, mixed-case schemes/hosts, ports, userinfo) must
    canonicalize identically in Spark and the pure-Python reference, and
    stay idempotent."""
    import random

    rng = random.Random(20260817)
    schemes = ["https", "HTTPS", "http", "hTTp", "ftp", ""]
    hosts = ["WWW.Ex.COM", "ex.com", "www.ex.com:443", "EX.com:80", "ex.com:8080",
             "user@Ex.Com", "www.w.ww", "WWW.www.Ex.com", ""]
    paths = ["", "/", "/A/b", "/p?x", "//d", "/%7Euser"]
    queries = ["", "?", "?a=1", "?b=2&a=1", "?utm_source=x", "?a=1&a=1&",
               "?&&", "?id=9&fbclid=z&ref=t", "?A=1&a=0?c=2",
               "?utm_source_platform=web&id=1", "?utm_Source=x"]
    frags = ["", "#", "#Top", "#a#b"]
    urls = []
    for _ in range(400):
        s = rng.choice(schemes)
        u = (s + "://" if s else "") + rng.choice(hosts) + rng.choice(paths) \
            + rng.choice(queries) + rng.choice(frags)
        urls.append(u)
    got = _canon_many(spark, urls)
    got2 = _canon_many(spark, got)
    for u, g, g2 in zip(urls, got, got2):
        assert g == _py_canon(u), (u, g, _py_canon(u))
        assert g2 == g, ("not idempotent", u, g, g2)
