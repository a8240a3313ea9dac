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


def polygon_cell_cover(polys_rings: DataFrame, key: str, bbox: Sequence[float],
                       res: int) -> DataFrame:
    """Explode assembled polygons (rings_x/rings_y + bbox struct) into
    (cell, key) cover rows at ``res`` (bbox cover; exact ring test happens in
    the verify stage)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_keys: list = []
            out_cells: list[int] = []
            for k, bb in zip(pdf[key], pdf["bbox"]):
                cc = CE.cover_bbox(bb["xmin"], bb["ymin"], bb["xmax"], bb["ymax"],
                                   bbox, res, max_cells=1 << 20)
                out_cells.extend(cc)
                out_keys.extend([k] * len(cc))
            yield pd.DataFrame({key: out_keys, "cell": out_cells})

    schema = T.StructType([polys_rings.schema[key], T.StructField("cell", T.LongType())])
    return polys_rings.select(key, "bbox").mapInPandas(gen, schema=schema)


def pip_candidates(points: DataFrame, x: str, y: str, polys_rings: DataFrame,
                   poly_key: str, bbox: Sequence[float], res: int,
                   broadcast_polys: bool = True) -> DataFrame:
    """Candidate (point, polygon) pairs via Morton-cell equi-join."""
    pts = points.withColumn("cell", CE.morton_col(F.col(x), F.col(y), bbox, res))
    cover = polygon_cell_cover(polys_rings, poly_key, bbox, res)
    if broadcast_polys:
        cover = F.broadcast(cover)
    return pts.join(cover, "cell").drop("cell")


def pip_join(points: DataFrame, x: str, y: str, polys_rings: DataFrame,
             poly_key: str, bbox: Sequence[float] = None, res: int = 8,
             broadcast_polys: bool = True) -> DataFrame:
    """All (point, polygon) pairs where the point is inside or on the
    boundary of the polygon — the semantics of getPointToPolygonsFunction
    (mapshaper-spatial-join.js:69-78): *all* enclosing polygons, boundary
    counts as inside (testPointInPolygon, shape-geom.js:68-82).

    Returns the points DataFrame columns + ``poly_key``.
    """
    if bbox is None:
        from mapshaper_spark.layers import DEFAULT_BBOX
        bbox = DEFAULT_BBOX
    spark = points.sparkSession
    rings_rows = polys_rings.select(poly_key, "rings_x", "rings_y").collect() \
        if broadcast_polys else None

    cand = pip_candidates(points, x, y, polys_rings, poly_key, bbox, res,
                          broadcast_polys=broadcast_polys)
    out_schema = T.StructType([f for f in cand.schema.fields])

    if broadcast_polys:
        rings_by_key = {
            r[poly_key]: [(np.array(rx, dtype=np.float64), np.array(ry, dtype=np.float64))
                          for rx, ry in zip(r["rings_x"], r["rings_y"])]
            for r in rings_rows
        }
        bc = spark.sparkContext.broadcast(rings_by_key)

        def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            rings_map = bc.value
            for pdf in it:
                if len(pdf) == 0:
                    continue
                keep = np.zeros(len(pdf), dtype=bool)
                px = pdf[x].to_numpy(dtype=np.float64)
                py = pdf[y].to_numpy(dtype=np.float64)
                for k, idx in pdf.groupby(poly_key, sort=False).indices.items():
                    rings = rings_map.get(k)
                    if rings is None:
                        continue
                    keep[idx] = K.points_in_polygon(px[idx], py[idx], rings)
                yield pdf[keep]

        return cand.mapInPandas(verify, schema=out_schema)

    # large-polygon-set path: rings travel with the candidate rows
    cand_r = cand.join(polys_rings.select(poly_key, "rings_x", "rings_y"), poly_key)

    def verify_wide(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            for i, (rxs, rys) in enumerate(zip(pdf["rings_x"], pdf["rings_y"])):
                rings = [(np.asarray(rx, dtype=np.float64), np.asarray(ry, dtype=np.float64))
                         for rx, ry in zip(rxs, rys)]
                keep[i] = bool(K.points_in_polygon(px[i:i + 1], py[i:i + 1], rings)[0])
            yield pdf[keep]

    wide_schema = T.StructType([f for f in cand_r.schema.fields])
    return (cand_r.mapInPandas(verify_wide, schema=wide_schema)
            .drop("rings_x", "rings_y"))


def spatial_join_point_to_polygon(points: DataFrame, x: str, y: str,
                                  polys_rings: DataFrame, poly_key: str,
                                  point_key: str,
                                  copy_fields: Sequence[str] = (),
                                  sum_fields: Sequence[str] = (),
                                  bbox: Sequence[float] = None, res: int = 8) -> DataFrame:
    """mapshaper ``-join`` point-method semantics on the point layer:
    copy-fields from the FIRST matching polygon (source order = poly index),
    sum-fields summed over all matches, plus a ``joins`` collision count
    (joinTables, mapshaper-join.js:93-141). Unmatched points keep null copy
    fields / 0 sums, like updateUnmatchedRecord (:171-174)."""
    pairs = pip_join(points, x, y, polys_rings, poly_key, bbox=bbox, res=res)
    attrs = polys_rings.select(poly_key, *[f for f in set(list(copy_fields) + list(sum_fields))])
    pairs = pairs.join(F.broadcast(attrs), poly_key)
    w = Window.partitionBy(point_key).orderBy(poly_key)
    ranked = pairs.withColumn("__rn", F.row_number().over(w))
    aggs = [F.count(F.lit(1)).alias("joins"),
            F.min(F.col(poly_key)).alias(f"first_{poly_key}")]
    for f in copy_fields:
        aggs.append(F.first(F.when(F.col("__rn") == 1, F.col(f)), ignorenulls=True).alias(f))
    for f in sum_fields:
        aggs.append(F.sum(f).alias(f"sum_{f}"))
    agg = ranked.groupBy(point_key).agg(*aggs)
    return points.join(agg, point_key, "left").fillna({"joins": 0})


def polygon_to_points_join(points: DataFrame, x: str, y: str,
                           polys_rings: DataFrame, poly_key: str,
                           calc_aggs: Sequence[F.Column],
                           bbox: Sequence[float] = None, res: int = 8) -> DataFrame:
    """Polygon layer receives aggregates of its contained points
    (getPolygonToPointsFunction, mapshaper-spatial-join.js:42-64)."""
    pairs = pip_join(points, x, y, polys_rings, poly_key, bbox=bbox, res=res)
    agg = pairs.groupBy(poly_key).agg(*calc_aggs)
    return polys_rings.drop("rings_x", "rings_y").join(agg, poly_key, "left")


def nearest_point_join(left: DataFrame, lx: str, ly: str, left_key: str,
                       right: DataFrame, rx: str, ry: str, right_key: str,
                       buffer: float = 1e-3,
                       bbox: Sequence[float] = None) -> DataFrame:
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

    cand = lft.join(F.broadcast(rgt.select("cell", right_key, rx, ry)), "cell")
    dx = F.col(lx) - F.col(rx)
    dy = F.col(ly) - F.col(ry)
    d2 = dx * dx + dy * dy
    cand = cand.withColumn("__d2", d2).filter(F.col("__d2") <= F.lit(buffer * buffer))
    best = (cand.groupBy(left_key)
            .agg(F.min(F.struct(F.col("__d2").alias("d2"), F.col(right_key).alias("rk"))).alias("b"))
            .select(left_key, F.col("b.rk").alias(right_key), F.col("b.d2").alias("dist_sq")))
    return left.join(best, left_key, "left")


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
