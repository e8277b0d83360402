"""Reference-parity ring-merge / multipolygon tests (FIXTURES.md MP-01..MP-09).

These encode the imposm2 multipolygon unit-test shapes (SURVEY.md §5.1,
imposm/test/test_multipolygon.py semantics) as pure-kernel tests; the full
DataFrame path is covered in test_assemble.py.
"""

import itertools

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from imposm2_spark.kernels import geom, rings

OUTER = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]])
INNER = np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0], [2.0, 2.0]])


def test_mp01_polygon_with_hole():
    mp = rings.build_multipolygon(rings.merge_rings([OUTER, INNER]))
    assert len(mp.polygons) == 1
    shell, *holes = mp.polygons[0]
    assert len(holes) == 1
    assert abs(geom.ring_signed_area(shell)) == 100.0
    assert abs(geom.ring_signed_area(holes[0])) == 4.0
    assert mp.area == 96.0  # hole area subtracted
    assert geom.ring_is_ccw(shell) and not geom.ring_is_ccw(holes[0])


def test_mp02_split_reversed_unordered_ways():
    """Outer ring split across 3 open ways, one reversed, members unordered —
    merge must be order/direction invariant and produce identical rings."""
    w1 = OUTER[0:2]  # (0,0)->(10,0)
    w2 = OUTER[1:4]  # (10,0)->(10,10)->(0,10)
    w3 = OUTER[3:5]  # (0,10)->(0,0)
    variants = [
        [w1, w2, w3],
        [w3, w1, w2[::-1]],
        [w2[::-1], w3[::-1], w1],
        [w2, w3, w1[::-1]],
    ]
    outputs = []
    for ways in variants:
        res = rings.merge_rings(list(ways))
        assert len(res.rings) == 1 and res.dropped_unclosed == 0
        outputs.append(res.rings[0])
    for out in outputs[1:]:
        assert np.array_equal(out, outputs[0])


def test_mp03_two_shells_one_hole():
    far = OUTER + np.array([100.0, 0.0])
    mp = rings.build_multipolygon(rings.merge_rings([OUTER, far, INNER]))
    assert len(mp.polygons) == 2
    sizes = sorted(len(p) for p in mp.polygons)
    assert sizes == [1, 2]  # one bare shell, one shell+hole
    with_hole = next(p for p in mp.polygons if len(p) == 2)
    assert abs(geom.ring_signed_area(with_hole[1])) == 4.0
    assert mp.area == 100.0 + 96.0


def test_mp04_inner_touching_outer_vertex():
    touching = np.array([[0.0, 0.0], [3.0, 1.0], [1.0, 3.0], [0.0, 0.0]])
    mp = rings.build_multipolygon(rings.merge_rings([OUTER, touching]))
    assert len(mp.polygons) == 1
    assert len(mp.polygons[0]) == 2  # still classified as hole, no crash


def test_mp05_unclosed_ring_dropped():
    gap = np.array([[20.0, 0.0], [25.0, 0.0], [25.0, 5.0], [20.0, 5.0]])  # open, no mate
    res = rings.merge_rings([OUTER, gap])
    assert res.dropped_unclosed == 1
    mp = rings.build_multipolygon(res)
    assert len(mp.polygons) == 1 and mp.dropped_unclosed == 1


def test_mp06_tag_inheritance():
    rel_tags = {"type": "multipolygon"}
    inherited = rings.inherit_tags(rel_tags, [(100.0, {"landuse": "forest"})])
    assert inherited["landuse"] == "forest"
    assert inherited["type"] == "multipolygon"
    # relation WITH own interesting tags does not inherit
    rel2 = {"type": "multipolygon", "landuse": "park"}
    assert rings.inherit_tags(rel2, [(100.0, {"landuse": "forest"})])["landuse"] == "park"
    # largest outer wins
    multi = rings.inherit_tags(rel_tags, [(1.0, {"landuse": "meadow"}), (9.0, {"landuse": "forest"})])
    assert multi["landuse"] == "forest"


def test_mp07_mp08_way_suppression_rule():
    rel = {"type": "multipolygon", "landuse": "forest"}
    assert rings.way_tags_subsumed({"landuse": "forest"}, rel)  # MP-07 suppressed
    assert rings.way_tags_subsumed({}, rel)
    assert not rings.way_tags_subsumed({"landuse": "forest", "highway": "track"}, rel)  # MP-08


def test_mp09_degenerate_zero_area():
    degen = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [0.0, 0.0]])
    res = rings.merge_rings([degen])
    assert res.rings == [] and res.dropped_invalid == 1


def test_nested_island_in_hole():
    """Ring inside a hole is a new shell (depth parity), not a hole of a hole."""
    island = np.array([[2.5, 2.5], [3.5, 2.5], [3.5, 3.5], [2.5, 3.5], [2.5, 2.5]])
    mp = rings.build_multipolygon(rings.merge_rings([OUTER, INNER, island]))
    assert len(mp.polygons) == 2
    assert mp.area == (100.0 - 4.0) + 1.0


@settings(max_examples=60, deadline=None)
@given(
    perm=st.permutations(range(3)),
    flips=st.tuples(st.booleans(), st.booleans(), st.booleans()),
)
def test_prop_merge_invariant_under_order_and_direction(perm, flips):
    parts = [OUTER[0:2], OUTER[1:4], OUTER[3:5]]
    ways = [parts[i][:: -1 if flips[i] else 1] for i in perm]
    res = rings.merge_rings(ways)
    assert len(res.rings) == 1
    baseline = rings.merge_rings(parts).rings[0]
    assert np.array_equal(res.rings[0], baseline)


def test_merge_many_fragments_shuffled():
    """A 12-segment ring cut into single edges, shuffled+flipped deterministically."""
    theta = np.linspace(0, 2 * np.pi, 13)
    ring = np.c_[np.cos(theta), np.sin(theta)]
    ring[-1] = ring[0]
    edges = [ring[i : i + 2] for i in range(12)]
    rng = np.random.default_rng(42)
    order = rng.permutation(12)
    ways = [edges[i][:: -1 if rng.integers(2) else 1] for i in order]
    res = rings.merge_rings(ways)
    assert len(res.rings) == 1 and res.dropped_unclosed == 0
    assert len(res.rings[0]) == 13


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_prop_chunked_merge_equals_single_level(data):
    """O10b associativity: merge_fragments per random chunk, then a final
    merge_rings over the chunk outputs (closed rings + open chains), equals
    a single-level merge_rings over all fragments — for any fragmentation,
    reversal, shuffling, and chunk assignment of degree-2 ring topologies."""
    rng = np.random.default_rng(data.draw(st.integers(0, 10**6)))
    n_rings = data.draw(st.integers(1, 4))
    fragments = []
    for r in range(n_rings):
        k = int(rng.integers(4, 12))
        theta = np.linspace(0, 2 * np.pi, k + 1)
        ring = np.c_[
            (r * 10.0) + (2.0 + r) * np.cos(theta), (2.0 + r) * np.sin(theta)
        ]
        ring[-1] = ring[0]
        cuts = sorted(set([0, k]) | set(rng.integers(1, k, rng.integers(0, 5)).tolist()))
        for a, b in zip(cuts, cuts[1:]):
            frag = ring[a : b + 1]
            fragments.append(frag[:: -1 if rng.integers(2) else 1])
    order = rng.permutation(len(fragments))
    fragments = [fragments[i] for i in order]

    single = rings.merge_rings(fragments)

    n_chunks = int(rng.integers(1, 5))
    chunks = [[] for _ in range(n_chunks)]
    for i, f in enumerate(fragments):
        chunks[int(rng.integers(n_chunks))].append(f)
    carried = []
    invalid = 0
    for c in chunks:
        closed, chains, inv = rings.merge_fragments(c)
        carried.extend(closed)
        carried.extend(chains)
        invalid += inv
    final = rings.merge_rings(carried)
    final.dropped_invalid += invalid

    def canon(res):
        return sorted((r.tobytes() for r in res.rings))

    assert canon(final) == canon(single)
    assert final.dropped_unclosed == single.dropped_unclosed
    assert final.dropped_invalid == single.dropped_invalid


def test_contains_builder_salvages_inconsistent_containment():
    """A ring poking through a concave shell's notch fools the point-sample
    containment into classifying it as a hole; a third ring inside it (in
    the notch) then has only-hole containers. Pre-fix this raised
    ValueError(min of empty) and killed the applyInPandas stage; now the
    orphan ring is salvaged as its own shell."""
    import numpy as np

    from imposm2_spark.kernels import rings as kr

    def sq(x0, y0, x1, y1):
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
        )

    notched = np.array(
        [[0, 0], [4, 0], [4, 6], [6, 6], [6, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
        dtype=float,
    )
    crossing = sq(1, 1, 9, 3)       # first vertex inside; pokes through the notch
    orphan = sq(4.5, 1.5, 5.5, 2.5)  # inside `crossing` only
    mp = kr.build_multipolygon(kr.MergeResult(rings=[notched, crossing, orphan]))
    assert len(mp.polygons) == 2
    assert sorted(len(p) for p in mp.polygons) == [1, 2]


def test_inherit_tags_equal_area_tie_is_order_invariant():
    """Review r5: outer_ways arrives in unordered applyInPandas group order;
    equal-|area| outers must resolve to the same inherited tags regardless
    of list order (pre-fix plain max() returned whichever came first)."""
    from imposm2_spark.kernels.rings import inherit_tags

    a = (5.0, {"landuse": "forest"})
    b = (5.0, {"natural": "water"})
    rel = {"type": "multipolygon"}
    t1 = inherit_tags(rel, [a, b])
    t2 = inherit_tags(rel, [b, a])
    assert t1 == t2
    assert "type" in t1  # relation's own keys always survive
