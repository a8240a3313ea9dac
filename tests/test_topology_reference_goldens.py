"""Transcriptions of the reference's core-topology unit tests.

- topology-test.js (buildPathTopology): exact arc decomposition — arc
  geometry, first-use append-order ids, JS-style signed refs (~id) — for
  shared edges, shared points, congruent rings, and polylines.
- segment-intersection-test.js (findSegmentIntersections): crossing,
  T-touch, and COLLINEAR-OVERLAP intersections (each subsumed endpoint is
  an intersection point, segment-geom.js:196-226).
- snapping-test.js ('-i snap'): CLI snap-interval= end-to-end.

Arc ids here are positions in first-use order (our deterministic arc_id
ranking reproduces the reference's append order); reversed refs use the
JS convention ~id == -(id+1), so the reference's [2, -2] is written
[2, -2] verbatim.
"""

import json

import pytest

from mapshaper_spark.cli import apply_commands
from mapshaper_spark.operators import topology as TP


def _build(spark, nn, xx, yy):
    """Reference buildPathTopology harness: flat coord arrays + per-path
    counts -> (paths, arcs) in the reference's assertion format."""
    rows, pos = [], 0
    for pid, n in enumerate(nn):
        rows.append((pid, [float(v) for v in xx[pos:pos + n]],
                     [float(v) for v in yy[pos:pos + n]]))
        pos += n
    paths = spark.createDataFrame(
        rows, "path_id long, xs array<double>, ys array<double>")
    arcs, refs = TP.build_topology(paths, "path_id")
    arcs_l = sorted(arcs.collect(), key=lambda r: r.arc_id)
    idx = {r.arc_id: i for i, r in enumerate(arcs_l)}
    arcs_out = [[[x, y] for x, y in zip(r.xs, r.ys)] for r in arcs_l]
    by_path: dict = {}
    for r in refs.collect():
        by_path.setdefault(r.path_id, {})[r.arc_seq] = r.signed
    paths_out = []
    for pid in range(len(nn)):
        seq = by_path[pid]
        out = []
        for s in sorted(seq):
            sid = seq[s]
            out.append(idx[sid] if sid >= 0 else ~idx[-(sid + 1)])
        paths_out.append(out)
    return paths_out, arcs_out


# every case: (name, nn, xx, yy, expected_paths, expected_arcs)
# coordinates and expectations are verbatim from topology-test.js (cited)
TOPOLOGY_CASES = [
    # topology-test.js:13-33 — hole shares two segments with enclosing path
    ("irregular_holes", [5, 4],
     [1, 2, 4, 3, 1, 1, 3, 2, 1], [1, 3, 3, 1, 1, 1, 1, 3, 1],
     [[0, 1], [2, -2]],
     [[[2, 3], [4, 3], [3, 1]],
      [[3, 1], [1, 1], [2, 3]],
      [[3, 1], [2, 3]]]),
    # :42-53 — shared point is endpoint of one ring
    ("shared_point_endpoint_of_one", [4, 4],
     [1, 2, 3, 1, 3, 4, 5, 3], [1, 3, 1, 1, 1, 3, 1, 1],
     [[0], [1]],
     [[[3, 1], [1, 1], [2, 3], [3, 1]],
      [[3, 1], [4, 3], [5, 1], [3, 1]]]),
    # :55-66 — shared point is endpoint of neither ring
    ("shared_point_endpoint_of_neither", [4, 4],
     [1, 2, 3, 1, 4, 5, 3, 4], [1, 3, 1, 1, 3, 1, 1, 3],
     [[0], [1]],
     [[[3, 1], [1, 1], [2, 3], [3, 1]],
      [[3, 1], [4, 3], [5, 1], [3, 1]]]),
    # :77-87 — hole-around-island, aligned
    ("hole_around_island_aligned", [4, 4],
     [1, 2, 3, 1, 1, 3, 2, 1], [1, 3, 1, 1, 1, 1, 3, 1],
     [[0], [-1]],
     [[[1, 1], [2, 3], [3, 1], [1, 1]]]),
    # :89-99 — hole-around-island, misaligned
    ("hole_around_island_misaligned", [4, 4],
     [1, 2, 3, 1, 3, 2, 1, 3], [1, 3, 1, 1, 1, 3, 1, 1],
     [[0], [-1]],
     [[[1, 1], [2, 3], [3, 1], [1, 1]]]),
    # :101-109 — duplicate islands, aligned
    ("duplicate_islands_aligned", [4, 4],
     [1, 2, 3, 1, 1, 2, 3, 1], [1, 3, 1, 1, 1, 3, 1, 1],
     [[0], [0]], None),
    # :111-119 — duplicate islands, misaligned
    ("duplicate_islands_misaligned", [4, 4],
     [1, 2, 3, 1, 3, 1, 2, 3], [1, 3, 1, 1, 1, 1, 3, 1],
     [[0], [0]], None),
    # :121-129 — three duplicate islands, aligned
    ("three_duplicate_islands_aligned", [4, 4, 4],
     [1, 2, 3, 1, 1, 2, 3, 1, 1, 2, 3, 1],
     [1, 3, 1, 1, 1, 3, 1, 1, 1, 3, 1, 1],
     [[0], [0], [0]], None),
    # :131-139 — three duplicate islands, misaligned
    ("three_duplicate_islands_misaligned", [4, 4, 4],
     [1, 2, 3, 1, 3, 1, 2, 3, 2, 3, 1, 2],
     [1, 3, 1, 1, 1, 1, 3, 1, 3, 1, 1, 3],
     [[0], [0], [0]], None),
    # :141-149 — two duplicate islands and a hole, misaligned
    ("two_islands_and_hole_misaligned", [4, 4, 4],
     [1, 2, 3, 1, 3, 1, 2, 3, 2, 1, 3, 2],
     [1, 3, 1, 1, 1, 1, 3, 1, 3, 1, 1, 3],
     [[0], [0], [-1]], None),
    # :161-174 — one shared segment, ring endpoints aligned
    ("shared_segment_aligned", [4, 4],
     [3, 1, 2, 3, 3, 2, 4, 3], [1, 1, 3, 1, 1, 3, 3, 1],
     [[0, 1], [-2, 2]],
     [[[3, 1], [1, 1], [2, 3]], [[2, 3], [3, 1]],
      [[2, 3], [4, 3], [3, 1]]]),
    # :176-188 — misaligned 1
    ("shared_segment_misaligned1", [4, 4],
     [3, 1, 2, 3, 2, 4, 3, 2], [1, 1, 3, 1, 3, 3, 1, 3],
     [[0, 1], [2, -2]],
     [[[3, 1], [1, 1], [2, 3]], [[2, 3], [3, 1]],
      [[2, 3], [4, 3], [3, 1]]]),
    # :190-202 — misaligned 2
    ("shared_segment_misaligned2", [4, 4],
     [3, 1, 2, 3, 4, 3, 2, 4], [1, 1, 3, 1, 3, 1, 3, 3],
     [[0, 1], [-2, 2]],
     [[[3, 1], [1, 1], [2, 3]], [[2, 3], [3, 1]],
      [[2, 3], [4, 3], [3, 1]]]),
    # :215-226 — multi-segment shared edge, ring-two endpoint within edge
    ("multiseg_shared_edge", [5, 5],
     [1, 2, 2, 2, 1, 2, 2, 3, 2, 2], [1, 3, 2, 1, 1, 2, 3, 3, 1, 2],
     [[0, 1], [2, -1]],
     [[[2, 3], [2, 2], [2, 1]], [[2, 1], [1, 1], [2, 3]],
      [[2, 3], [3, 3], [2, 1]]]),
    # :234-242 — congruent single-segment polylines, same direction
    ("congruent_lines_same_dir", [2, 2],
     [1, 2, 1, 2], [1, 1, 1, 1],
     [[0], [0]], [[[1, 1], [2, 1]]]),
    # :244-252 — congruent polylines, opposite direction
    ("congruent_lines_opposite", [2, 2],
     [1, 2, 2, 1], [1, 1, 1, 1],
     [[0], [-1]], [[[1, 1], [2, 1]]]),
    # :262-272 — polylines share one endpoint
    ("lines_share_endpoint", [2, 2],
     [1, 2, 2, 2], [1, 1, 2, 1],
     [[0], [1]],
     [[[1, 1], [2, 1]], [[2, 2], [2, 1]]]),
    # :279-289 — path 2 intersects path 1 midway
    ("line_t_intersection", [3, 2],
     [1, 2, 3, 2, 2], [1, 1, 1, 2, 1],
     [[0, 1], [2]],
     [[[1, 1], [2, 1]], [[2, 1], [3, 1]], [[2, 2], [2, 1]]]),
    # :296-306 — two paths share one segment
    ("lines_share_segment", [3, 3],
     [1, 2, 3, 1, 2, 2], [1, 1, 1, 1, 1, 2],
     [[0, 1], [0, 2]],
     [[[1, 1], [2, 1]], [[2, 1], [3, 1]], [[2, 1], [2, 2]]]),
    # :308-318 — share one segment, opposite directions
    ("lines_share_segment_opposite", [3, 3],
     [1, 2, 3, 2, 2, 1], [1, 1, 1, 2, 1, 1],
     [[0, 1], [2, -1]],
     [[[1, 1], [2, 1]], [[2, 1], [3, 1]], [[2, 2], [2, 1]]]),
]


class TestBuildPathTopologyParity:
    @pytest.mark.parametrize(
        "name,nn,xx,yy,exp_paths,exp_arcs",
        TOPOLOGY_CASES, ids=[c[0] for c in TOPOLOGY_CASES])
    def test_case(self, spark, name, nn, xx, yy, exp_paths, exp_arcs):
        paths, arcs = _build(spark, nn, xx, yy)
        assert paths == exp_paths
        if exp_arcs is not None:
            assert arcs == exp_arcs


def _find(spark, coords, same_arc=False):
    """findSegmentIntersections harness: list of arcs (each a list of
    [x, y]) -> set of distinct intersection (x, y, arc_a, arc_b)."""
    rows = [(i, [float(p[0]) for p in arc], [float(p[1]) for p in arc])
            for i, arc in enumerate(coords)]
    arcs = spark.createDataFrame(
        rows, "arc_id long, xs array<double>, ys array<double>")
    hits = TP.find_segment_intersections(arcs, n_stripes=4,
                                         same_arc=same_arc)
    return {(r.x, r.y, r.arc_a, r.arc_b) for r in hits.collect()}


class TestFindSegmentIntersectionsParity:
    # segment-intersection-test.js:14-20 — collinear, segs share one
    # endpoint, seg A contained by B
    def test_collinear_shared_endpoint(self, spark):
        got = _find(spark, [[[1, 0], [2, 0]], [[0, 0], [2, 0]]])
        assert got == {(1.0, 0.0, 0, 1)}

    # :22-28 — collinear, overlapping -> two intersections
    def test_collinear_overlapping(self, spark):
        got = _find(spark, [[[1, 0], [3, 0]], [[0, 0], [2, 0]]])
        assert got == {(1.0, 0.0, 0, 1), (2.0, 0.0, 0, 1)}

    # :30-36 — collinear, seg A contained by seg B -> two intersections
    def test_collinear_contained(self, spark):
        got = _find(spark, [[[1, 0], [2, 0]], [[0, 0], [3, 0]]])
        assert got == {(1.0, 0.0, 0, 1), (2.0, 0.0, 0, 1)}

    # :38-44 — path segs A and B fit to C -> one intersection point
    def test_collinear_two_segs_fit_one(self, spark):
        got = _find(spark, [[[0, 0], [1, 1], [2, 2]], [[0, 0], [2, 2]]])
        assert {(x, y) for x, y, *_ in got} == {(1.0, 1.0)}
        assert all((a, b) == (0, 1) for *_xy, a, b in got)

    # :46-52 and :54-58 — axis-aligned crossing, either input order
    def test_axis_aligned(self, spark):
        got = _find(spark, [[[0, 0], [3, 0]], [[2, -1], [2, 4]]])
        assert got == {(2.0, 0.0, 0, 1)}
        got2 = _find(spark, [[[2, -1], [2, 4]], [[0, 0], [3, 0]]])
        assert got2 == {(2.0, 0.0, 0, 1)}

    # :60-67 — T intersection at a vertex of arc 1
    def test_t_intersection(self, spark):
        got = _find(spark, [[[1, 0], [1, 3]], [[2, 3], [1, 2], [0, 0]]])
        assert {(x, y) for x, y, *_ in got} == {(1.0, 2.0)}

    # duplicate segments / end-to-end collinear touches: NOT intersections
    # (collinearIntersection's "segs that meet in the middle don't count"
    # and the zero-inside-endpoints case)
    def test_collinear_non_hits(self, spark):
        assert _find(spark, [[[0, 0], [1, 0]], [[0, 0], [1, 0]]]) == set()
        assert _find(spark, [[[0, 0], [1, 0]], [[1, 0], [2, 0]]]) == set()
        # parallel but not collinear
        assert _find(spark, [[[0, 0], [1, 0]], [[0, 1], [1, 1]]]) == set()


class TestSegmentGeomParity:
    """Transcribed from /root/reference/test/segment-geom-test.js —
    segmentIntersection cases not covered by segment-intersection-test.js,
    run directly against the kernel (_seg_intersections)."""

    @staticmethod
    def _si(*args):
        return TP._seg_intersections(*[float(a) for a in args])

    def test_joined_segs_are_not_intersections(self, spark):
        for args in [(0, 0, 0, 1, 0, 1, 1, 1), (0, 0, 0, 1, 0, 1, 0, 2),
                     (0, 0, 0, 1, 1, 0, 0, 0), (0, 0, 0, 1, 0, 0, 1, 0),
                     (0, 0, 1, 1, 1, 1, 2, 0), (0, 0, 1, 1, 1, 1, 2, 2),
                     (0, 0, 1, -1, 1, -1, 2, 0)]:
            assert self._si(*args) == [], args

    def test_congruent_segments_are_nully(self, spark):
        for args in [(0, 0, 1, 1, 0, 0, 1, 2), (1, 2, 0, 0, 0, 0, 1, 1),
                     (0, 0, 1, 0, 1, 0, 0, 0), (0, 1, 0, 0, 0, 1, 0, 0)]:
            assert self._si(*args) == [], args

    def test_partially_congruent_one_or_two_points(self, spark):
        assert self._si(0, 0, 1, 1, 0, 0, 2, 2) == [(1.0, 1.0)]
        assert self._si(2, 2, 0, 0, 0, 0, 1, 1) == [(1.0, 1.0)]
        assert self._si(3, 3, 0, 0, 2, 2, 1, 1) == [(2.0, 2.0), (1.0, 1.0)]
        assert self._si(0, 0, 2, 2, 1, 1, 3, 3) == [(2.0, 2.0), (1.0, 1.0)]
        assert self._si(0, 3, 0, 0, 0, 2, 0, 1) == [(0.0, 2.0), (0.0, 1.0)]
        assert self._si(0, 0, 0, 2, 0, 1, 0, 3) == [(0.0, 2.0), (0.0, 1.0)]
        assert self._si(3, 0, 0, 0, 2, 0, 1, 0) == [(2.0, 0.0), (1.0, 0.0)]
        assert self._si(0, 0, 2, 0, 1, 0, 3, 0) == [(2.0, 0.0), (1.0, 0.0)]

    def test_tiny_overlaps_are_detected(self, spark):
        tiny = 0.00000000001
        assert self._si(0, 0, 1, 1, tiny, 0, 1 - tiny, 1) != []
        assert self._si(tiny, 0, 1, 1, 0, 0, 1, tiny) != []
        assert self._si(0, 0, 1, -1, tiny, 0, 1 - tiny, -1) != []
        assert self._si(tiny, 0, 1, -1, 0, 0, 1, -tiny) != []


class TestSnappingParity:
    # snapping-test.js:31-42 — polyline A, outside threshold: unchanged
    def test_snap_outside_threshold(self, spark):
        gj = {"type": "LineString",
              "coordinates": [[0, 0], [0.1, 0.1], [1, 1]]}
        out = apply_commands(spark, "-i snap-interval=0.11 line.json -o",
                             {"line.json": json.dumps(gj)})
        coords = json.loads(out["line.json"])["geometries"][0]["coordinates"]
        assert coords == [[0, 0], [0.1, 0.1], [1, 1]]

    # snapping-test.js:45-56 — polyline A, inside threshold: snapped+deduped
    def test_snap_inside_threshold(self, spark):
        gj = {"type": "LineString",
              "coordinates": [[0, 0], [0.05, 0.05], [0.1, 0.1],
                              [1, 1], [1.1, 1.1]]}
        out = apply_commands(spark, "-i snap-interval=0.2 line.json -o",
                             {"line.json": json.dumps(gj)})
        coords = json.loads(out["line.json"])["geometries"][0]["coordinates"]
        assert coords == [[0, 0], [1, 1]]
