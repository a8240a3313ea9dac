"""Z-order (Morton) cell index.

Plays the role of the reference's R-tree candidate pruning
(/root/reference/src/paths/mapshaper-path-index.js:8-34, rbush) but as a
*join key*: points get a cell id computed JVM-side with bitwise column
expressions (no Python in the hot path); polygons are exploded to the set of
cells covering their bbox. The spatial join is then an equi-join on cell id
— Spark's hash shuffle (or a broadcast when the polygon side is small) does
the pruning that the reference does with an in-memory R-tree.

The hierarchical-key property (parent cell = drop 2 low bits per level) gives
prefix range partitioning; ring enumeration (Chebyshev ring r around a cell)
drives progressive kNN expansion.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_RES = 16  # bits per axis; key fits in 32 bits


def _spread_col(c: Column) -> Column:
    """Interleave-ready bit spread (Part1By1) of a 16-bit int column.

    Stays entirely in JVM whole-stage codegen: shiftleft/bitwise ops only.
    """
    c = c.cast("long")
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
    return c


def scaled_int_col(v: Column, lo: float, hi: float, res: int) -> Column:
    """floor((v - lo) / (hi - lo) * 2^res) clamped to [0, 2^res - 1]."""
    n = 1 << res
    raw = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(n))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw)).cast("long")


def morton_col(x: Column, y: Column, bbox: Sequence[float], res: int) -> Column:
    """Morton key column for point coords. bbox = (xmin, ymin, xmax, ymax)."""
    if res > MAX_RES:
        raise ValueError(f"res > {MAX_RES}")
    xmin, ymin, xmax, ymax = bbox
    ix = scaled_int_col(x, xmin, xmax, res)
    iy = scaled_int_col(y, ymin, ymax, res)
    return _spread_col(ix).bitwiseOR(F.shiftleft(_spread_col(iy), 1)).alias("cell")


# ---------------------------------------------------------------------------
# numpy equivalents (for UDF-side / driver-side use)
# ---------------------------------------------------------------------------

def _spread_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def _compact_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x55555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x33333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF)
    return v


def scaled_int_np(v: np.ndarray, lo: float, hi: float, res: int) -> np.ndarray:
    n = 1 << res
    raw = np.floor((v - lo) / (hi - lo) * n)
    return np.clip(raw, 0, n - 1).astype(np.int64)


def morton_np(xs: np.ndarray, ys: np.ndarray, bbox: Sequence[float], res: int) -> np.ndarray:
    xmin, ymin, xmax, ymax = bbox
    ix = scaled_int_np(np.asarray(xs, dtype=np.float64), xmin, xmax, res)
    iy = scaled_int_np(np.asarray(ys, dtype=np.float64), ymin, ymax, res)
    return (_spread_np(ix) | (_spread_np(iy) << np.uint64(1))).astype(np.int64)


def decode_np(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = np.asarray(keys).astype(np.uint64)
    return (_compact_np(k).astype(np.int64),
            _compact_np(k >> np.uint64(1)).astype(np.int64))


def encode_ixy_np(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (_spread_np(ix.astype(np.uint64)) |
            (_spread_np(iy.astype(np.uint64)) << np.uint64(1))).astype(np.int64)


def cover_bbox(xmin: float, ymin: float, xmax: float, ymax: float,
               bbox: Sequence[float], res: int, max_cells: int = 4096) -> list[int]:
    """All cells at ``res`` whose grid square intersects the given bbox.

    Used to explode a polygon's bbox into candidate-join keys. If the bbox
    spans more than ``max_cells`` cells, callers should drop to a coarser
    resolution for that polygon (adaptive indexing, cf. the reference's
    per-polygon PolygonIndex threshold, mapshaper-path-index.js:140-150).
    """
    wxmin, wymin, wxmax, wymax = bbox
    ix0 = int(scaled_int_np(np.array([xmin]), wxmin, wxmax, res)[0])
    ix1 = int(scaled_int_np(np.array([xmax]), wxmin, wxmax, res)[0])
    iy0 = int(scaled_int_np(np.array([ymin]), wymin, wymax, res)[0])
    iy1 = int(scaled_int_np(np.array([ymax]), wymin, wymax, res)[0])
    n = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    if n > max_cells:
        raise ValueError(f"bbox covers {n} cells > max_cells={max_cells}; lower res")
    ixs, iys = np.meshgrid(np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1))
    return encode_ixy_np(ixs.ravel(), iys.ravel()).tolist()


def ring_cells(key: int, ring: int, res: int) -> list[int]:
    """Cells at Chebyshev distance exactly ``ring`` from ``key`` (ring 0 =
    the cell itself). Drives progressive kNN ring expansion."""
    ix, iy = decode_np(np.array([key], dtype=np.int64))
    ix, iy = int(ix[0]), int(iy[0])
    n = 1 << res
    out: list[tuple[int, int]] = []
    if ring == 0:
        out.append((ix, iy))
    else:
        for dx in range(-ring, ring + 1):
            for dy in (-ring, ring):
                out.append((ix + dx, iy + dy))
        for dy in range(-ring + 1, ring):
            for dx in (-ring, ring):
                out.append((ix + dx, iy + dy))
    valid = [(a, b) for a, b in out if 0 <= a < n and 0 <= b < n]
    if not valid:
        return []
    axs = np.array([a for a, _ in valid], dtype=np.uint64)
    ays = np.array([b for _, b in valid], dtype=np.uint64)
    return encode_ixy_np(axs, ays).tolist()


def disk_cells_np(keys: np.ndarray, ring: int, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized: for each input key, all cells within Chebyshev distance
    ``ring`` (a (2r+1)^2 disk). Returns (repeated_row_index, neighbor_keys)
    suitable for building an exploded join-key table inside a pandas UDF."""
    ix, iy = decode_np(np.asarray(keys, dtype=np.int64))
    n = 1 << res
    d = np.arange(-ring, ring + 1)
    dx, dy = np.meshgrid(d, d)
    dx = dx.ravel()
    dy = dy.ravel()
    m = len(dx)
    rows = np.repeat(np.arange(len(ix)), m)
    nx = np.repeat(ix, m) + np.tile(dx, len(ix))
    ny = np.repeat(iy, m) + np.tile(dy, len(iy))
    ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
    return rows[ok], encode_ixy_np(nx[ok].astype(np.uint64), ny[ok].astype(np.uint64))


def cell_size(bbox: Sequence[float], res: int) -> tuple[float, float]:
    xmin, ymin, xmax, ymax = bbox
    n = 1 << res
    return (xmax - xmin) / n, (ymax - ymin) / n


def res_for_radius(radius: float, bbox: Sequence[float]) -> int:
    """Finest resolution whose cell edge is >= radius on both axes, so a
    radius-bounded search only needs the 3x3 neighbor disk."""
    for res in range(MAX_RES, -1, -1):
        w, h = cell_size(bbox, res)
        if w >= radius and h >= radius:
            return res
    return 0
