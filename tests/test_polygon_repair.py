"""Self-intersection repair — transcribed from the reference's
/root/reference/test/polygon-repair-test.js (removeSpikesInPath,
repairSelfIntersections CW/CCW/inverted/two-twist figures).

The reference asserts arc-id shapes ([[0, 2]] etc.) against its own
append-order arc numbering; arc ids differ across engines, so these
tests assert the KEPT RING'S COORDINATE CYCLE instead (rotation-
canonical, direction preserved) — the geometric content of the same
assertion."""

import pytest

from pyspark.sql import functions as F

from mapshaper_spark.operators.topology import (
    remove_spikes_in_path, repair_self_intersections)


def _canon(cycle):
    """Rotation-canonical form of a directed coordinate cycle (no closing
    dup): rotate so the lexicographically smallest vertex leads."""
    pts = [tuple(p) for p in cycle]
    k = pts.index(min(pts))
    return tuple(pts[k:] + pts[:k])


def _repair_one_ring(spark, coords):
    """coords: closed ring [(x, y), ...]. Returns list of kept rings as
    rotation-canonical directed cycles."""
    xs = [float(p[0]) for p in coords]
    ys = [float(p[1]) for p in coords]
    arcs = spark.createDataFrame(
        [(0, xs, ys, len(xs),
          {"xmin": min(xs), "ymin": min(ys), "xmax": max(xs), "ymax": max(ys)})],
        "arc_id long, xs array<double>, ys array<double>, n int, "
        "bbox struct<xmin:double,ymin:double,xmax:double,ymax:double>")
    feats = spark.createDataFrame([(1, [[0]])],
                                  "fid int, parts array<array<int>>")
    feats2, arcs2 = repair_self_intersections(feats, arcs, "fid")
    amap = {r["arc_id"]: (list(r["xs"]), list(r["ys"]))
            for r in arcs2.collect()}
    out = []
    for row in feats2.collect():
        for part in row["parts"]:
            cx, cy = [], []
            for s in part:
                aid = s if s >= 0 else -s - 1
                axs, ays = amap[aid]
                if s < 0:
                    axs, ays = axs[::-1], ays[::-1]
                if cx and cx[-1] == axs[0] and cy[-1] == ays[0]:
                    axs, ays = axs[1:], ays[1:]
                cx.extend(axs)
                cy.extend(ays)
            if len(cx) > 1 and (cx[0], cy[0]) == (cx[-1], cy[-1]):
                cx, cy = cx[:-1], cy[:-1]
            out.append(_canon(list(zip(cx, cy))))
    return out


class TestRemoveSpikesInPath:
    # polygon-repair-test.js:16-28
    def test_spike_pair_wrap(self):
        assert remove_spikes_in_path([0, ~0]) == []

    def test_spike_pair_adjacent(self):
        assert remove_spikes_in_path([1, ~1, ~0]) == [~0]


class TestRepairSelfIntersections:
    # abcdefga figure (polygon-repair-test.js:32-87): CW ring with an
    # inner twist triangle at (2,2)-(2,3)-(3,3); repair keeps the big ring
    BIG = _canon([(2.0, 2.0), (1.0, 1.0), (1.0, 4.0), (4.0, 4.0),
                  (4.0, 1.0), (2.0, 1.0)])

    def test_cw_self_intersection_1(self, spark):
        coords = [(2, 1), (2, 3), (3, 3), (1, 1), (1, 4), (4, 4), (4, 1),
                  (2, 1)]  # abcdefga
        rings = _repair_one_ring(spark, coords)
        assert rings == [self.BIG]

    def test_cw_self_intersection_2(self, spark):
        coords = [(2, 3), (3, 3), (1, 1), (1, 4), (4, 4), (4, 1), (2, 1),
                  (2, 3)]  # bcdefgab — different start vertex, same ring
        rings = _repair_one_ring(spark, coords)
        assert rings == [self.BIG]

    def test_self_intersection_3_inverted(self, spark):
        coords = [(2, 3), (3, 3), (1, 1), (1, 4), (4, 4), (4, 1), (2, 1),
                  (2, 3)][::-1]  # bagfedcb — reversed traversal
        rings = _repair_one_ring(spark, coords)
        assert rings == [_canon(list(self.BIG)[::-1])]

    # abcdea figure (polygon-repair-test.js:89-125): CCW ring with an
    # inverted twist triangle at (2,2)-(2,1)-(3,2)
    SQ = _canon([(2.0, 2.0), (1.0, 2.0), (1.0, 3.0), (2.0, 3.0)])

    def test_ccw_self_intersection_1(self, spark):
        coords = [(1, 3), (2, 3), (2, 1), (3, 2), (1, 2), (1, 3)]  # abcdea
        rings = _repair_one_ring(spark, coords)
        assert rings == [self.SQ]

    def test_ccw_self_intersection_2(self, spark):
        coords = [(2, 1), (3, 2), (1, 2), (1, 3), (2, 3), (2, 1)]  # cdeabc
        rings = _repair_one_ring(spark, coords)
        assert rings == [self.SQ]

    def test_two_self_intersections(self, spark):
        # polygon-repair-test.js:155-179: both twist triangles removed,
        # main ring = the (0,2)-(2,3)-ish quadrilateral
        coords = [(0, 3), (3, 3), (2, 4), (2, 1), (3, 2), (0, 2), (0, 3)]
        rings = _repair_one_ring(spark, coords)
        expect = _canon([(0.0, 3.0), (2.0, 3.0), (2.0, 2.0), (0.0, 2.0)])
        assert rings == [expect]

    def test_clean_ring_untouched(self, spark):
        coords = [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)]
        rings = _repair_one_ring(spark, coords)
        assert rings == [_canon([(0.0, 0.0), (0.0, 1.0), (1.0, 1.0),
                                 (1.0, 0.0)])]


class TestSplitPathByIds:
    # self-intersection-test.js:6-31 — pure arc-id function, verbatim
    def test1(self):
        from mapshaper_spark.operators.topology import _split_path_by_ids
        assert _split_path_by_ids([5, 6, 7, 8], [5, 7]) == [[5, 6], [7, 8]]

    def test2_unsorted_ids(self):
        from mapshaper_spark.operators.topology import _split_path_by_ids
        assert _split_path_by_ids([5, 6, 7, 8], [7, 5]) == [[5, 6], [7, 8]]

    def test3_wraparound_merge(self):
        from mapshaper_spark.operators.topology import _split_path_by_ids
        assert _split_path_by_ids([5, 6, 7, 8], [8, 7, 6]) == \
            [[5, 8], [6], [7]]

    def test4(self):
        from mapshaper_spark.operators.topology import _split_path_by_ids
        assert _split_path_by_ids([5, 6, 7, 8], [8, 5]) == [[5, 6, 7], [8]]

    def test5(self):
        from mapshaper_spark.operators.topology import _split_path_by_ids
        assert _split_path_by_ids([5, 6, 7, 8], [6, 7]) == [[5, 7, 8], [6]]
