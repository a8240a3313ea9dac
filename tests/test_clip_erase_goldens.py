"""Overlay tangency goldens transcribed from the reference's clip/erase
suite (/root/reference/test/clip-erase-test.js:99-995: spike, congruent,
shared-edge, corner-touch figures) — the vertex-grazing cases resolved by
the reference's route flags (mapshaper-pathfinder.js:41-115) and here by
the 3-state sub-arc classification + side test in overlay_rings."""

import numpy as np
import pytest

from mapshaper_spark.geom import kernels as K
from mapshaper_spark.operators.overlay import overlay_rings


def ring(pts):
    return (np.array([float(p[0]) for p in pts] + [float(pts[0][0])]),
            np.array([float(p[1]) for p in pts] + [float(pts[0][1])]))


def area(rings):
    return sum(K.planar_path_area(np.asarray(rx), np.asarray(ry))
               for rx, ry in rings)


SQ = [ring([(0, 0), (0, 2), (2, 2), (2, 0)])]

CASES = [
    # (name, target, clip, op, expected area)
    ("congruent_clip", SQ, [ring([(0, 0), (0, 2), (2, 2), (2, 0)])], "clip", 4),
    ("congruent_erase", SQ, [ring([(0, 0), (0, 2), (2, 2), (2, 0)])], "erase", 0),
    ("adjacent_clip", SQ, [ring([(2, 0), (2, 2), (4, 2), (4, 0)])], "clip", 0),
    ("adjacent_erase", SQ, [ring([(2, 0), (2, 2), (4, 2), (4, 0)])], "erase", 4),
    ("edge_touch_clip", SQ, [ring([(2, 0.5), (2, 1.5), (3, 1.5), (3, 0.5)])], "clip", 0),
    ("edge_touch_erase", SQ, [ring([(2, 0.5), (2, 1.5), (3, 1.5), (3, 0.5)])], "erase", 4),
    ("inset_shared_edge_clip", SQ, [ring([(1, 0), (1, 1), (2, 1), (2, 0)])], "clip", 1),
    ("inset_shared_edge_erase", SQ, [ring([(1, 0), (1, 1), (2, 1), (2, 0)])], "erase", 3),
    ("corner_touch_clip", SQ, [ring([(2, 2), (2, 4), (4, 4), (4, 2)])], "clip", 0),
    ("corner_touch_erase", SQ, [ring([(2, 2), (2, 4), (4, 4), (4, 2)])], "erase", 4),
]


@pytest.mark.parametrize("name,t,c,op,want", CASES, ids=[c[0] for c in CASES])
def test_tangency_case(name, t, c, op, want):
    assert area(overlay_rings(t, c, op)) == pytest.approx(want, abs=1e-9)


class TestFig4Spike:
    """clip-erase-test.js Fig. 4: clip ring carries a zero-width spike
    (arc efe) that dangles into the target; the reference keeps the spike
    on the clip output boundary (target shapes [[1, 5, 3]])."""
    T = [ring([(2, 5), (4, 5), (4, 2), (2, 2)])]
    C = [(np.array([3.0, 3, 3, 5, 5, 1, 1, 3]),
          np.array([4.0, 3, 4, 4, 1, 1, 4, 4]))]

    def test_clip_area_and_spike_kept(self):
        out = overlay_rings(self.T, self.C, "clip")
        assert area(out) == pytest.approx(4.0)
        verts = {(x, y) for rx, ry in out for x, y in zip(rx, ry)}
        assert (3.0, 3.0) in verts  # spike apex retained on the boundary

    def test_erase_complement(self):
        out = overlay_rings(self.T, self.C, "erase")
        assert area(out) == pytest.approx(2.0)


class TestFig5HoleClip:
    """clip-erase-test.js Fig. 5: polygon with a hole clipped by a square
    overlapping the hole's corner region."""

    def test_holed_polygon_clip(self):
        target = [ring([(1, 6), (6, 6), (6, 1), (1, 1)]),
                  ring([(3, 4), (3, 3), (5, 3), (5, 4)])]  # CCW hole
        clip = [ring([(2, 5), (4, 5), (4, 2), (2, 2)])]
        out = overlay_rings(target, clip, "clip")
        # 2x3 clip window minus the 1x1 overlap with the hole
        assert area(out) == pytest.approx(5.0)
        ers = overlay_rings(target, clip, "erase")
        # feature area (25 - 2 hole) minus clip result
        assert area(ers) == pytest.approx(23.0 - 5.0)


class TestSelfIntersection:
    """clip-erase-test.js 'polygon with self-intersection': a CW
    self-crossing in the target doesn't block — the output threads through
    the crossing point, covering the region with nonzero-winding
    semantics (reference target shapes [[0, 2]])."""
    T = [(np.array([3.0, 3, 4, 2, 2, 5, 5, 3]),
          np.array([2.0, 4, 4, 2, 5, 5, 2, 2]))]
    C = [ring([(1, 6), (6, 6), (6, 1), (1, 1)])]

    def test_clip_threads_through_crossing(self):
        out = overlay_rings(self.T, self.C, "clip")
        assert area(out) == pytest.approx(8.5)
        assert len(out) == 1
        # the doubly-wound lobe boundary (b=(3,4), c=(4,4)) is dropped
        verts = {(x, y) for rx, ry in out for x, y in zip(rx, ry)}
        assert verts == {(3.0, 3.0), (2.0, 2.0), (2.0, 5.0), (5.0, 5.0),
                         (5.0, 2.0), (3.0, 2.0)}

    def test_erase_complement_empty(self):
        assert area(overlay_rings(self.T, self.C, "erase")) == pytest.approx(0.0)


class TestPartialCongruent:
    """clip-erase-test.js 'erase a partially congruent polygon' (ring
    form): erasing the left half of a rect leaves exactly the right half
    (reference target [[2, ~0]])."""

    def test_erase_left_half(self):
        t = [ring([(2, 2), (2, 3), (4, 3), (4, 2)])]
        c = [ring([(2, 2), (2, 3), (3, 3), (3, 2)])]
        out = overlay_rings(t, c, "erase")
        assert area(out) == pytest.approx(1.0)
        verts = {(x, y) for rx, ry in out for x, y in zip(rx, ry)}
        assert verts == {(3.0, 3.0), (4.0, 3.0), (4.0, 2.0), (3.0, 2.0)}


class TestDissolve2Figures:
    """dissolve2-test.js figures (ring-form): adjacent triangles, filled
    triangle, hourglass stem removal, spike skipping."""

    @staticmethod
    def _d2(ring_sets):
        from mapshaper_spark.operators.overlay import dissolve2_rings
        return dissolve2_rings(ring_sets, ["g"] * len(ring_sets)).get("g", [])

    def test_fig1_adjacent_triangles(self):
        tri1 = [(np.array([3.0, 1, 2, 3]), np.array([1.0, 1, 3, 1]))]
        tri2 = [(np.array([2.0, 4, 3, 2]), np.array([3.0, 3, 1, 3]))]
        out = self._d2([tri1, tri2])
        assert len(out) == 1
        assert area(out) == pytest.approx(4.0)  # the b-c shared edge cancels

    def test_fig3_filled_triangle(self):
        holed = [(np.array([5.0, 5, 1, 1, 3, 5]), np.array([3.0, 1, 1, 3, 3, 3])),
                 (np.array([3.0, 2, 4, 3]), np.array([3.0, 2, 2, 3]))]
        fill = [(np.array([3.0, 4, 2, 3]), np.array([3.0, 2, 2, 3]))]
        out = self._d2([holed, fill])
        assert len(out) == 1
        assert area(out) == pytest.approx(8.0)  # hole exactly filled

    def test_fig5_hourglass_stem_removed(self):
        rx = [2, 1, 3, 2, 2, 3, 1, 2, 2]
        ry = [3, 4, 4, 3, 2, 1, 1, 2, 3]
        out = self._d2([[(np.array(rx, float), np.array(ry, float))]])
        assert len(out) == 2  # two triangles; the zero-width stem vanishes
        assert sorted(round(K.planar_path_area(np.asarray(a), np.asarray(b)), 9)
                      for a, b in out) == [1.0, 1.0]

    def test_fig6_spike_skipped(self):
        rx = [1, 2, 2, 2, 3, 3, 1, 1]
        ry = [3, 3, 2, 3, 3, 1, 1, 3]
        out = self._d2([[(np.array(rx, float), np.array(ry, float))]])
        assert len(out) == 1
        assert area(out) == pytest.approx(4.0)
        # the b-c spike excursion is gone; the square ring remains
        verts = {(x, y) for a, b in out for x, y in zip(a, b)}
        assert (2.0, 2.0) not in verts
