"""S2 literal form: OSM XML scan — round-trip, compression wrappers,
multi-file parallelism, and XML-vs-PBF-vs-table import parity."""

from __future__ import annotations

from imposm2_spark.kernels import pbf as k
from imposm2_spark.sources.osmxml import read_osm_xml, write_osm_xml


def _extract():
    nodes = [
        k.PbfNode(i, -10.0 + i * 0.0001, 5.0 + i * 0.0001,
                  {"name": f"n {i}", "odd<key>": 'va"l&'} if i % 4 == 0 else {})
        for i in range(1, 101)
    ]
    ways = [
        k.PbfWay(1000 + i, [1, 2, 3 + i], {"highway": "primary"})
        for i in range(20)
    ]
    rels = [
        k.PbfRelation(5000 + i,
                      [("way", 1000 + i, "outer"), ("node", 7, "")],
                      {"type": "multipolygon"})
        for i in range(5)
    ]
    return nodes, ways, rels


import pytest


@pytest.mark.parametrize("suffix", ["", ".gz", ".bz2"])
def test_xml_roundtrip_incl_compression(spark, tmp_path, suffix):
    nodes, ways, rels = _extract()
    path = str(tmp_path / f"x.osm.xml{suffix}")
    write_osm_xml(path, nodes, ways, rels)
    dfs = read_osm_xml(spark, path)
    got_n = {r.id: (r.lon, r.lat, dict(r.tags)) for r in dfs["nodes"].collect()}
    assert len(got_n) == 100
    assert got_n[4] == (nodes[3].lon, nodes[3].lat, nodes[3].tags)  # escapes survive
    got_w = {r.id: (list(r.refs), dict(r.tags)) for r in dfs["ways"].collect()}
    assert got_w[1001] == ([1, 2, 4], {"highway": "primary"})
    got_r = {
        r.id: sorted((m.type, m.ref, m.role) for m in r.members)
        for r in dfs["relations"].collect()
    }
    assert got_r[5000] == [("node", 7, ""), ("way", 1000, "outer")]


def test_xml_multi_file_union(spark, tmp_path):
    nodes, ways, rels = _extract()
    p1 = str(tmp_path / "a.osm.xml")
    p2 = str(tmp_path / "b.osm.xml")
    write_osm_xml(p1, nodes[:50], ways, [])
    write_osm_xml(p2, nodes[50:], [], rels)
    dfs = read_osm_xml(spark, [p1, p2])
    assert dfs["nodes"].count() == 100
    assert dfs["ways"].count() == 20 and dfs["relations"].count() == 5


def test_xml_import_parity_with_pbf_and_tables(spark, tmp_path):
    from imposm2_spark.operators import defaultmapping as dm
    from imposm2_spark.plans.import_pipeline import import_tables
    from imposm2_spark.sources import fixtures
    from imposm2_spark.sources.pbf import read_pbf

    nrows, wrows, rrows = fixtures.make_osm_fixture()
    nodes = [k.PbfNode(i, lon, lat, dict(t)) for i, lon, lat, t in nrows]
    ways = [k.PbfWay(i, list(refs), dict(t)) for i, refs, t in wrows]
    rels = [
        k.PbfRelation(i, [(t, ref, role) for ref, t, role in members], dict(tags))
        for i, members, tags in rrows
    ]
    xml_path = str(tmp_path / "f.osm.xml.gz")
    pbf_path = str(tmp_path / "f.osm.pbf")
    write_osm_xml(xml_path, nodes, ways, rels)
    k.encode_file(pbf_path, nodes, ways, rels)

    def rows(dfs):
        out = import_tables(
            spark, dfs["nodes"], dfs["ways"], dfs["relations"], [dm.LANDUSAGES]
        )["landusages"]
        return sorted((r.id, r.name, r.type, round(r.area, 9)) for r in out.collect())

    a = rows(read_osm_xml(spark, xml_path))
    b = rows(read_pbf(spark, pbf_path))
    direct = fixtures.osm_dfs(spark)
    c = rows({"nodes": direct[0], "ways": direct[1], "relations": direct[2]})
    assert a == b == c and len(a) > 0
