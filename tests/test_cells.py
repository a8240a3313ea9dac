"""Z-order cell index unit tests (mapshaper_spark.geom.cells)."""

import numpy as np

from mapshaper_spark.geom import cells as CE

BBOX = (-120.0, 25.0, -60.0, 49.0)


def test_morton_roundtrip():
    rng = np.random.RandomState(7)
    xs = rng.uniform(-120, -60, 1000)
    ys = rng.uniform(25, 49, 1000)
    for res in (4, 8, 16):
        keys = CE.morton_np(xs, ys, BBOX, res)
        ix, iy = CE.decode_np(keys)
        assert (ix == CE.scaled_int_np(xs, -120, -60, res)).all()
        assert (iy == CE.scaled_int_np(ys, 25, 49, res)).all()


def test_parent_prefix_property():
    # dropping 2 low bits of the key == the parent cell's key at res-1
    xs = np.array([-100.0, -61.2, -119.9])
    ys = np.array([30.0, 48.8, 25.1])
    k8 = CE.morton_np(xs, ys, BBOX, 8)
    k7 = CE.morton_np(xs, ys, BBOX, 7)
    assert ((k8 >> 2) == k7).all()


def test_cover_bbox_contains_point_cells():
    res = 8
    # any point inside a bbox must land in one of its cover cells
    cover = set(CE.cover_bbox(-100, 30, -90, 35, BBOX, res))
    rng = np.random.RandomState(3)
    xs = rng.uniform(-100, -90, 200)
    ys = rng.uniform(30, 35, 200)
    keys = CE.morton_np(xs, ys, BBOX, res)
    assert set(keys.tolist()) <= cover


def test_ring_cells_counts():
    key = int(CE.morton_np(np.array([-90.0]), np.array([37.0]), BBOX, 8)[0])
    assert CE.ring_cells(key, 0, 8) == [key]
    r1 = CE.ring_cells(key, 1, 8)
    assert len(r1) == 8
    r2 = CE.ring_cells(key, 2, 8)
    assert len(r2) == 16
    assert not (set(r1) & set(r2))


def test_disk_cells_cover_rings():
    key = int(CE.morton_np(np.array([-90.0]), np.array([37.0]), BBOX, 8)[0])
    rows, disks = CE.disk_cells_np(np.array([key]), 2, 8)
    expect = set(CE.ring_cells(key, 0, 8)) | set(CE.ring_cells(key, 1, 8)) \
        | set(CE.ring_cells(key, 2, 8))
    assert set(disks.tolist()) == expect
    assert (rows == 0).all()


def test_res_for_radius():
    res = CE.res_for_radius(2.0, BBOX)
    w, h = CE.cell_size(BBOX, res)
    assert w >= 2.0 and h >= 2.0
    wf, hf = CE.cell_size(BBOX, res + 1)
    assert wf < 2.0 or hf < 2.0
