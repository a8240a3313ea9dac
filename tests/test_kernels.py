"""Kernel parity tests.

Golden values transcribed from the reference's own test suite (the node
runtime can't execute the unbuilt reference in this container, so the mocha
fixtures serve as the executable spec):

- ray casting:        /root/reference/test/shape-geom-test.js:7-59
- figure-1 diamond:   /root/reference/test/shape-geom-test.js:63-185
- planar path area:   /root/reference/test/shape-geom-test.js:188-225
- spherical area:     /root/reference/test/shape-geom-test.js:90-99
- Visvalingam:        /root/reference/test/visvalingam-test.js:9-55
- DP semantics:       /root/reference/src/simplify/mapshaper-dp.js:12-77
"""

import math

import numpy as np
import pytest

from mapshaper_spark.geom import kernels as K


def ray(px, py, ax, ay, bx, by):
    """Scalar wrapper: returns 1 (crossing), 0 (miss), or 'NaN' (boundary),
    mirroring geom.testRayIntersection's return convention."""
    crossing, on_b = K.ray_intersections(
        np.array([[px]], dtype=float), np.array([[py]], dtype=float),
        np.array([[ax]], dtype=float), np.array([[ay]], dtype=float),
        np.array([[bx]], dtype=float), np.array([[by]], dtype=float))
    if on_b[0, 0]:
        return "NaN"
    return 1 if crossing[0, 0] else 0


class TestRayIntersection:
    # shape-geom-test.js testRayIntersection() cases, verbatim
    def test_p_on_collapsed_seg(self):
        assert ray(1, 1, 1, 1, 1, 1) == "NaN"
        assert ray(0, 0, 0, 0, 0, 0) == "NaN"

    def test_p_below_collapsed_seg(self):
        assert ray(1, 0, 1, 1, 1, 1) == 0
        assert ray(0, -1, 0, 0, 0, 0) == 0

    def test_p_on_vertical_seg(self):
        assert ray(1, 1, 1, 0, 1, 2) == "NaN"
        assert ray(1, 1, 1, 1, 1, 0) == "NaN"
        assert ray(1, 1, 1, 0, 1, 1) == "NaN"
        assert ray(1, 1, 1, 1, 1, 2) == "NaN"
        assert ray(1, 1, 1, 2, 1, 1) == "NaN"

    def test_p_below_vertical_seg(self):
        assert ray(1, 0, 1, 1, 1, 2) == 0
        assert ray(1, 0, 1, 2, 1, 1) == 0

    def test_p_on_horizontal_seg(self):
        assert ray(1, 1, 0, 1, 2, 1) == "NaN"
        assert ray(1, 1, 1, 1, 2, 1) == "NaN"
        assert ray(1, 1, 2, 1, 1, 1) == "NaN"

    def test_px_below_leftmost_endpoint(self):
        assert ray(1, 0, 1, 1, 2, 2) == 0
        assert ray(1, 0, 2, 2, 1, 1) == 0

    def test_px_below_rightmost_endpoint(self):
        assert ray(1, 0, 0, 1, 1, 2) == 1
        assert ray(1, 0, 1, 2, 0, 1) == 1

    def test_p_on_left_or_right_endpoint(self):
        assert ray(0, 1, 0, 1, 1, 2) == "NaN"
        assert ray(1, 2, 0, 1, 1, 2) == "NaN"

    def test_px_below_middle_of_segment(self):
        assert ray(0.4, 0, 0, 1, 1, 2) == 1
        assert ray(0.4, 0, 1, 2, 0, 1) == 1


# Figure 1 (shape-geom-test.js:63-85): nested diamonds.
INNER = (np.array([3.0, 4, 3, 2, 3]), np.array([4.0, 3, 2, 3, 4]))  # abcda, arc 0
OUTER = (np.array([3.0, 5, 3, 1, 3]), np.array([5.0, 3, 1, 3, 5]))  # efghe, arc 1


def pir(x, y, ring):
    return int(K.points_in_ring(np.array([x], dtype=float),
                                np.array([y], dtype=float), ring[0], ring[1])[0])


class TestPointInRing:
    def test_inside(self):
        assert pir(3, 3, OUTER) == 1  # vertical ray hits a vertex on the path
        assert pir(4, 3, OUTER) == 1
        assert pir(1.3, 3, OUTER) == 1

    def test_outside(self):
        for x, y in [(5, 2), (4, 1), (1, 2), (5, 4), (3, 0.5)]:
            assert pir(x, y, OUTER) == 0, (x, y)

    def test_boundary_vertex(self):
        for x, y in [(5, 3), (3, 5), (3, 1), (1, 3)]:
            assert pir(x, y, OUTER) == -1, (x, y)


class TestPointInPolygon:
    # lyr1 = outer ring + inner ring as hole (shapes [[1], [-1]])
    RINGS = [OUTER, (INNER[0][::-1].copy(), INNER[1][::-1].copy())]

    def t(self, x, y):
        return bool(K.points_in_polygon(np.array([x], dtype=float),
                                        np.array([y], dtype=float), self.RINGS)[0])

    def test_point_in_hole(self):
        assert self.t(3, 3) is False
        assert self.t(3.1, 3.1) is False

    def test_point_outside_hole(self):
        assert self.t(3, 1.2) is True
        assert self.t(3.1, 1.3) is True

    def test_point_outside_shape(self):
        assert self.t(3.1, 1) is False
        assert self.t(3, 0.2) is False

    def test_boundary_is_inside(self):
        # testPointInPolygon: isOn || isIn (shape-geom.js:68-82)
        assert self.t(3, 5) is True
        assert self.t(4, 4) is True


class TestAreas:
    def test_figure1_ring_areas(self):
        # getPlanarShapeArea: lyr1 (outer + reversed inner hole) == 6
        outer = K.planar_path_area(*OUTER)
        inner_rev = K.planar_path_area(INNER[0][::-1], INNER[1][::-1])
        assert outer == 8
        assert inner_rev == -2
        assert outer + inner_rev == 6

    def test_cw_positive(self):
        xs = np.array([1.0, 1, 2, 2, 1])
        ys = np.array([1.0, 2, 2, 1, 1])
        assert K.planar_path_area(xs, ys) == 1

    def test_ccw_negative(self):
        xs = np.array([1.0, 2, 2, 1, 1])
        ys = np.array([1.0, 1, 2, 2, 1])
        assert K.planar_path_area(xs, ys) == -1

    def test_tiny_ccw_triangle_sign(self):
        # shape-geom-test.js "Fix: tiny CCW triangle" — float-precision case;
        # requires the subtract-first-point trick
        xs = np.array([-89.93838884833583, -89.93838904665556,
                       -89.9383888795177, -89.93838884833583])
        ys = np.array([37.87449410425668, 37.87449407735467,
                       37.87449407735467, 37.87449410425668])
        assert K.planar_path_area(xs, ys) < 0

    def test_collapsed_is_zero(self):
        xs = np.array([0.0, 1, 0])
        ys = np.array([0.0, 1, 0])
        assert K.planar_path_area(xs, ys) == 0

    def test_hemisphere_spherical_area(self):
        R = 6378137.0
        xs = np.array([-180.0, -180, 180, 180, -180])
        ys = np.array([0.0, 90, 90, 0, 0])
        area = K.spherical_path_area(xs, ys, R)
        assert abs(abs(area) - 2 * math.pi * R * R) < 0.01


class TestCentroid:
    def test_figure1_centroid(self):
        cx, cy = K.path_centroid(*OUTER)
        assert (cx, cy) == (3.0, 3.0)

    def test_degenerate_falls_back_to_vertex_avg(self):
        xs = np.array([0.0, 1, 0])
        ys = np.array([0.0, 1, 0])
        cx, cy = K.path_centroid(xs, ys)
        assert (cx, cy) == (0.5, 0.5)


class TestPointToPath:
    def d(self, x, y, ring=OUTER):
        return math.sqrt(K.point_to_path_dist_sq(x, y, ring[0], ring[1]))

    def test_exterior(self):
        assert self.d(3, 0) == 1

    def test_interior(self):
        assert self.d(3, 3) == pytest.approx(math.sqrt(2), abs=1e-12)
        assert self.d(3, 4) == pytest.approx(math.sqrt(2) / 2, abs=1e-12)
        assert self.d(4, 3) == pytest.approx(math.sqrt(2) / 2, abs=1e-12)

    def test_on_boundary(self):
        for x, y in [(3, 5), (4, 4), (1, 3), (2, 2)]:
            assert self.d(x, y) == 0, (x, y)


class TestVisvalingam:
    # visvalingam-test.js getPathSimplifier() cases; our kernel applies
    # scaledSimplify (sqrt(k)*0.65) to interior vertices, so raw golden g
    # appears as sqrt(g)*0.65.
    def test_two_vertex(self):
        zz = K.visvalingam_arc([0, 1], [0, 0])
        assert list(zz) == [math.inf, math.inf]

    def test_three_vertex(self):
        zz = K.visvalingam_arc([0, 1, 2], [0, 1, 0])
        assert zz[0] == math.inf and zz[2] == math.inf
        assert zz[1] == math.sqrt(1.0) * 0.65

    def test_four_vertex_threshold_update(self):
        zz = K.visvalingam_arc([0, 0, 1, 3], [0, 1, 0, 0])
        assert zz[0] == math.inf and zz[3] == math.inf
        # raw goldens [0.5, 0.5]: removing the first point raises the
        # second's effective area; the monotonic clamp keeps it at 0.5
        assert zz[1] == math.sqrt(0.5) * 0.65
        assert zz[2] == math.sqrt(0.5) * 0.65

    def test_five_vertex_spike(self):
        zz = K.visvalingam_arc([0, 1, 1, 1, 2], [0, 0, 1, 0, 0])
        assert list(zz) == [math.inf, 0.0, 0.0, 0.0, math.inf]

    def test_weighted_right_angle_equals_standard(self):
        # weightedMetric == standardMetric for right angles (cos == 0), so
        # identical thresholds on a right-angle zigzag
        std = K.visvalingam_arc([0, 1, 2], [0, 1, 0], weighted=False)
        wtd = K.visvalingam_arc([0, 1, 2], [0, 1, 0], weighted=True)
        assert list(std) == list(wtd)

    def test_weighted_collapsed_triangle_zero(self):
        zz = K.visvalingam_arc([1, 1, 2], [1, 1, 3], weighted=True)
        assert zz[1] == 0.0


class TestDouglasPeucker:
    def test_simple_triangle(self):
        zz = K.douglas_peucker_arc([0, 1, 2], [0, 1, 0])
        assert zz[0] == math.inf and zz[2] == math.inf
        assert zz[1] == 1.0  # sqrt(pointSegDistSq((1,1),(0,0)-(2,0)))

    def test_parent_clamp(self):
        # interior child threshold can never exceed its parent's
        xs = [0.0, 1, 2, 3, 4]
        ys = [0.0, 0.1, 2, 0.1, 0]
        zz = K.douglas_peucker_arc(xs, ys)
        peak = zz[2]
        assert zz[1] <= peak and zz[3] <= peak

    def test_island_ring_case(self):
        # square ring: depth-1 max point gets max(left, right) child
        # thresholds (dp.js:70-72), preventing a 3-vertex degenerate ring
        zz = K.douglas_peucker_arc([0, 0, 1, 1, 0], [0, 1, 1, 0, 0])
        assert zz[0] == math.inf and zz[4] == math.inf
        assert zz[2] == pytest.approx(math.sqrt(0.5), abs=1e-12)
        assert zz[1] == pytest.approx(math.sqrt(0.5), abs=1e-12)
        assert zz[3] == pytest.approx(math.sqrt(0.5), abs=1e-12)

    def test_keeps_last_max_index(self):
        # two equal-distance interior points: the later one takes the max
        # (reference uses >=, keeping the last)
        zz = K.douglas_peucker_arc([0, 1, 2, 3], [0, 1, 1, 0])
        # point 2 is the recorded max, point 1 becomes its child
        assert zz[2] >= zz[1]


class TestThresholdByPct:
    def test_rank_semantics(self):
        zz = np.array([math.inf, 0.1, 0.2, 0.3, math.inf])
        # n=3 removable, rank = floor((1-0.5)*(3+2)) = 2 -> 2nd smallest
        assert K.threshold_by_pct(zz, 0.5) == pytest.approx(0.2)

    def test_pct_one_keeps_all(self):
        zz = np.array([math.inf, 0.1, math.inf])
        assert K.threshold_by_pct(zz, 1.0) == 0.0

    def test_pct_zero_removes_all(self):
        zz = np.array([math.inf, 0.1, math.inf])
        assert K.threshold_by_pct(zz, 0.0) == math.inf


class TestPointSegDistGoldens:
    """geom-test.js pointSegDistSq / pointSegDistSq3D / nearest-point
    goldens (:40-71)."""

    def d2(self, px, py, ax, ay, cx, cy):
        return float(K.point_seg_dist_sq(np.array([px], dtype=float),
                                         np.array([py], dtype=float),
                                         ax, ay, cx, cy)[0])

    def test_perpendicular_to_vertical(self):
        assert self.d2(0, 0, 2, -1, 2, 3) == 4
        assert self.d2(1, 0, 0, 3, 2, 3) == 9

    def test_perpendicular_to_horizontal(self):
        assert self.d2(1, 1, -3, 0, -3, 3) == 16

    def test_perpendicular_to_sloping(self):
        assert self.d2(1, 1, 3, 1, 1, 3) == 2

    def test_endpoint_is_nearest(self):
        assert self.d2(0, 0, 2, 6, 2, 2) == 8

    def test_3d_sloping(self):
        got = K._point_seg_dist_sq_3d(
            np.array([1.0]), np.array([1.0]), np.array([1.0]),
            3.0, 1.0, 2.0, 1.0, 3.0, 2.0)
        assert float(got[0]) == 3

    def test_nearest_point_on_seg_goldens(self):
        # findClosestPointOnSeg cases via nearest_point_on_path
        def np_on(px, py, ax, ay, cx, cy):
            d2, qx, qy = K.nearest_point_on_path(
                px, py, np.array([ax, cx], dtype=float),
                np.array([ay, cy], dtype=float))
            return (qx, qy)
        assert np_on(0, 0, 0, 2, 2, 0) == (1, 1)
        assert np_on(0, 0, 0, -2, -2, 0) == (-1, -1)
        assert np_on(3, 0, 0, 2, 2, 0) == (2, 0)
        assert np_on(-2, 0, 0, 2, 2, 0) == (0, 2)
        assert np_on(0, 0, 0, 2, 0, 2) == (0, 2)   # zero-length segment
        assert np_on(2, 0, 0, 2, 2, 0) == (2, 0)   # coincident endpoint


class TestClipIterByBounds:
    """Transcribed from /root/reference/test/bbox-clipping-test.js — exact
    expected vertex sequences of the viewport bbox clip (corner deflection
    walk, mapshaper-bbox-clipping.js)."""

    def _t(self, expected, inp, bbox):
        from mapshaper_spark.geom.kernels import clip_iter_by_bounds
        got = clip_iter_by_bounds([list(p) for p in inp], tuple(bbox))
        assert got == [list(p) for p in expected]

    def test_2e_corner_right(self):
        self._t([[1, 1], [2, 1], [2, 2]], [[0, -10], [10, 3]], [1, 1, 2, 2])

    def test_2f_corner_left(self):
        self._t([[1, 1], [1, 2], [2, 2]], [[-10, 0], [3, 10]], [1, 1, 2, 2])

    def test_2g_corner_right2(self):
        self._t([[2, 1], [2, 2], [1, 2]], [[10, 0], [0, 10]], [1, 1, 2, 2])

    def test_2h_corner_left2(self):
        self._t([[2, 1], [1, 1], [1, 2]], [[3, -10], [0, 3]], [1, 1, 2, 2])

    def test_5a_enclosing_ring(self):
        self._t([[2, 2], [2, 1], [1, 1], [1, 2], [2, 2]],
                [[3, 3], [3, 0], [1.5, 0], [0.5, 0], [0, 0], [0, 0.5],
                 [0, 3], [3, 3]], [1, 1, 2, 2])

    def test_5b_enclosing_ring_reversed(self):
        inp = [[3, 3], [3, 0], [1.5, 0], [0.5, 0], [0, 0], [0, 0.5],
               [0, 3], [3, 3]][::-1]
        self._t([[2, 2], [2, 1], [1, 1], [1, 2], [2, 2]][::-1],
                inp, [1, 1, 2, 2])

    def test_4b_diamond_cw(self):
        self._t([[1, 2], [1, 4], [2, 5], [4, 5], [5, 4], [5, 2], [4, 1],
                 [2, 1], [1, 2]][::-1],
                [[0, 3], [3, 0], [6, 3], [3, 6], [0, 3]], [1, 1, 5, 5])

    def test_4a_diamond_ccw(self):
        self._t([[1, 4], [2, 5], [4, 5], [5, 4], [5, 2], [4, 1], [2, 1],
                 [1, 2], [1, 4]],
                [[0, 3], [3, 6], [6, 3], [3, 0], [0, 3]], [1, 1, 5, 5])

    def test_3b_cut_corner(self):
        self._t([[0, 3], [0, 0]], [[1, 5], [-5, -1]], [0, 0, 3, 3])

    def test_3a_miss(self):
        self._t([], [[1, 5], [-2, 2]], [0, 0, 3, 3])

    def test_1_inside(self):
        self._t([[1, 1], [2, 2]], [[1, 1], [2, 2]], [0, 0, 3, 3])

    def test_2a_horizontal(self):
        self._t([[0, 1], [3, 1]], [[-1, 1], [4, 1]], [0, 0, 3, 3])

    def test_2b_vertical_down(self):
        self._t([[1, 3], [1, 0]], [[1, 4], [1, -1]], [0, 0, 3, 3])

    def test_2c_vertical_up(self):
        self._t([[1, 0], [1, 3]], [[1, -1], [1, 4]], [0, 0, 3, 3])

    def test_2d_horizontal_back(self):
        self._t([[3, 1], [0, 1]], [[4, 1], [-1, 1]], [0, 0, 3, 3])
