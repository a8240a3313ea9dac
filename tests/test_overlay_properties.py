"""Property-based invariants for the overlay kernel (hypothesis):
clip + erase partition the target area for arbitrary axis-aligned and
convex inputs — a fuzz over the cut/classify/stitch pipeline."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from mapshaper_spark.geom import kernels as K
from mapshaper_spark.operators.overlay import overlay_rings


def area(rings):
    return sum(K.planar_path_area(np.asarray(rx), np.asarray(ry))
               for rx, ry in rings)


def rect(x0, y0, w, h):
    xs = [x0, x0, x0 + w, x0 + w, x0]
    ys = [y0, y0 + h, y0 + h, y0, y0]
    return (np.array(xs, float), np.array(ys, float))


coord = st.integers(min_value=0, max_value=12).map(float)
size = st.integers(min_value=1, max_value=8).map(float)


@settings(max_examples=60, deadline=None)
@given(x0=coord, y0=coord, w=size, h=size,
       cx0=coord, cy0=coord, cw=size, ch=size)
def test_clip_plus_erase_partitions_rect(x0, y0, w, h, cx0, cy0, cw, ch):
    t = [rect(x0, y0, w, h)]
    c = [rect(cx0, cy0, cw, ch)]
    a_clip = area(overlay_rings(t, c, "clip"))
    a_erase = area(overlay_rings(t, c, "erase"))
    assert a_clip + a_erase == pytest.approx(w * h, abs=1e-9)
    # clip area equals the analytic rect intersection
    ix = max(0.0, min(x0 + w, cx0 + cw) - max(x0, cx0))
    iy = max(0.0, min(y0 + h, cy0 + ch) - max(y0, cy0))
    assert a_clip == pytest.approx(ix * iy, abs=1e-9)


@settings(max_examples=40, deadline=None)
@given(cx=st.integers(1, 11).map(float), cy=st.integers(1, 11).map(float),
       r=st.integers(1, 5).map(float),
       n=st.integers(min_value=3, max_value=9))
def test_clip_plus_erase_partitions_convex_polygon(cx, cy, r, n):
    # regular n-gon target vs a fixed square clip
    th = np.linspace(0.0, 2 * np.pi, n + 1)
    t = [((cx + r * np.cos(th)).round(6), (cy + r * np.sin(th)).round(6))]
    t_area = area(t)
    c = [rect(4, 4, 5, 5)]
    a_clip = area(overlay_rings(t, c, "clip"))
    a_erase = area(overlay_rings(t, c, "erase"))
    assert a_clip + a_erase == pytest.approx(abs(t_area), rel=1e-9, abs=1e-9)
    assert a_clip >= -1e-9 and a_erase >= -1e-9


@settings(max_examples=40, deadline=None)
@given(x0=coord, y0=coord, w=size, h=size)
def test_self_clip_identity(x0, y0, w, h):
    t = [rect(x0, y0, w, h)]
    assert area(overlay_rings(t, [rect(x0, y0, w, h)], "clip")) == \
        pytest.approx(w * h, abs=1e-9)
    assert area(overlay_rings(t, [rect(x0, y0, w, h)], "erase")) == \
        pytest.approx(0.0, abs=1e-9)


@settings(max_examples=80, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_raycast_agrees_with_winding_on_simple_polygon(seed):
    """Two independent point-in-region implementations (the transcribed
    mapshaper ray cast and the overlay module's winding-number test) must
    agree everywhere off the boundary for simple polygons."""
    from mapshaper_spark.operators.overlay import _winding_inside
    rng = np.random.RandomState(seed)
    # random star-shaped simple polygon around a center
    n = rng.randint(3, 12)
    th = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(0.5, 3.0, n)
    cx, cy = rng.uniform(-1, 1, 2)
    rx = np.append(cx + r * np.cos(th), cx + r[0] * np.cos(th[0]))
    ry = np.append(cy + r * np.sin(th), cy + r[0] * np.sin(th[0]))
    pts = rng.uniform(-4, 4, (30, 2))
    eo = K.points_in_polygon(pts[:, 0], pts[:, 1], [(rx, ry)])
    for (px, py), e in zip(pts, eo):
        # skip points exactly on the boundary (measure-zero; conventions differ)
        d2 = K.point_to_path_dist_sq(float(px), float(py), rx, ry)
        if d2 < 1e-18:
            continue
        assert _winding_inside(float(px), float(py), [(rx, ry)]) == bool(e), \
            (seed, px, py)
