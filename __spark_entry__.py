"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps operator names (SURVEY.md §2 inventory) to callables
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL for each (pre-registered views: region nation customer supplier
part orders lineitem events documents embeddings; geo inputs are derived
deterministically from key columns / range() with identical arithmetic on
both sides so results are bit-comparable).

Float discipline: every aggregate/computed double is rounded identically on
both sides (aggregation order across partitions is the only source of
low-bit divergence; rounding at 1e-6 is ~9 orders above that noise).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapshaper_spark import layers as L
from mapshaper_spark.operators import attributes as A
from mapshaper_spark.operators import dedup as DD
from mapshaper_spark.operators import dissolve as D
from mapshaper_spark.operators import grid as G
from mapshaper_spark.operators import images as IM
from mapshaper_spark.operators import joins as J
from mapshaper_spark.operators import similarity as SIM
from mapshaper_spark.operators import spatial as S
from mapshaper_spark.operators import paths as P
from mapshaper_spark.operators import proj as PR
from mapshaper_spark.operators import text as TX
from mapshaper_spark.operators import topology as TP
from mapshaper_spark.operators import simplify as SI

BBOX = L.DEFAULT_BBOX  # (-120, 25, -60, 49)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _customer_points(spark, sf_dir):
    """Deterministic point layer from customer keys (oracle-replicable)."""
    c = _t(spark, sf_dir, "customer")
    lon = F.lit(-120.0) + (F.col("c_custkey") % 1000).cast("double") / F.lit(1000.0) * F.lit(60.0)
    lat = F.lit(25.0) + ((F.col("c_custkey") * 7) % 1000).cast("double") / F.lit(1000.0) * F.lit(24.0)
    return c.withColumn("lon", lon).withColumn("lat", lat)


_CUSTOMER_POINTS_SQL = """
    SELECT c.*,
           -120.0 + (c_custkey % 1000) / 1000.0 * 60.0 AS lon,
           25.0 + ((c_custkey * 7) % 1000) / 1000.0 * 24.0 AS lat
    FROM customer c
"""


def _supplier_points(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    lon = F.lit(-120.0) + ((F.col("s_suppkey") * 13) % 1000).cast("double") / F.lit(1000.0) * F.lit(60.0)
    lat = F.lit(25.0) + ((F.col("s_suppkey") * 29) % 1000).cast("double") / F.lit(1000.0) * F.lit(24.0)
    return s.withColumn("slon", lon).withColumn("slat", lat)


_SUPPLIER_POINTS_SQL = """
    SELECT s_suppkey,
           -120.0 + ((s_suppkey * 13) % 1000) / 1000.0 * 60.0 AS slon,
           25.0 + ((s_suppkey * 29) % 1000) / 1000.0 * 24.0 AS slat
    FROM supplier
"""

# regions: 6x4 mosaic over BBOX; w=10, h=6 (exact doubles)
_REGIONS_SQL = """
    SELECT CAST(i AS INT) AS rid,
           -120.0 + (i % 6) * 10.0 AS xmin,
           25.0 + (i // 6) * 6.0 AS ymin,
           -120.0 + (i % 6 + 1) * 10.0 AS xmax,
           25.0 + (i // 6 + 1) * 6.0 AS ymax
    FROM range(24) t(i)
"""

_IMAGES_SQL = """
    SELECT i AS id, (i * 2654435761) % 1099511627776 AS phash FROM range({n}) t(i)
"""

_FOOTPRINT_SQL = """
    SELECT id,
           -120.0 + (phash % 1048576) / 1048576.0 * 60.0 AS lon,
           25.0 + ((phash // 1048576) % 1048576) / 1048576.0 * 24.0 AS lat
    FROM imgs
"""


def _mosaic_polys(spark):
    # ring coords identical to assemble_rings(region_mosaic(...)) — covered by
    # tests/test_spark_ops.py::test_local_mosaic_matches_distributed_assembly
    return None, None, L.region_mosaic_rings_local(spark, 6, 4, BBOX)


def _ann_query_vec(dim: int = 64) -> list[float]:
    return [((j * 37) % 19 - 9) / 10.0 for j in range(dim)]


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_filter_where(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return A.filter_features(
        li, (F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


def q_project_fields(spark, sf_dir):
    return A.filter_fields(_t(spark, sf_dir, "orders"),
                           ["o_orderkey", "o_custkey", "o_totalprice"])


def q_rename_fields(spark, sf_dir):
    return A.rename_fields(
        _t(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
        {"nation_id": "n_nationkey", "nation_name": "n_name"})


def q_each_derive(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = A.each(li, {
        "revenue": F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4),
        "is_big": F.col("l_quantity") >= 25,
    })
    return out.select("l_orderkey", "l_linenumber", "revenue", "is_big")


def q_each_where(spark, sf_dir):
    """-each with where= guard: rows failing the guard keep the old value
    (null for new columns) — each.js:12-19."""
    li = _t(spark, sf_dir, "lineitem")
    out = A.each(li, {"disc_price": F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)},
        where=F.col("l_quantity") > 25)
    return out.select("l_orderkey", "l_linenumber", "disc_price")


def q_filter_remove_empty(spark, sf_dir):
    _, _, polys = _mosaic_polys(spark)
    withered = polys.select(
        "rid",
        F.when(F.col("rid") % 4 == 0, F.col("rings_x"))
         .otherwise(F.array().cast("array<array<double>>")).alias("rings_x"),
        F.col("rings_y"))
    return A.filter_remove_empty(withered).select("rid")


def q_uniq_first_order(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").withColumn(A.ROW_IDX, F.col("o_orderkey"))
    return A.uniq(o, F.col("o_custkey"), 1).select("o_orderkey", "o_custkey", "o_totalprice")


def q_sort_top100(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (o.orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
            .limit(100).select("o_orderkey", "o_totalprice"))


def q_calc_aggs(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = A.calc(li, {
        "n": ("count", "l_quantity"),
        "sum_qty": ("sum", "l_quantity"),
        "avg_price": ("average", "l_extendedprice"),
        "med_qty": ("median", "l_quantity"),
        "min_ship": ("min", "l_shipdate"),
        "max_ship": ("max", "l_shipdate"),
        "mode_flag": ("mode", "l_returnflag"),
    })
    return out.select(F.col("n"), F.round("sum_qty", 2).alias("sum_qty"),
                      F.round("avg_price", 4).alias("avg_price"),
                      F.round("med_qty", 4).alias("med_qty"),
                      "min_ship", "max_ship", "mode_flag")


def q_dissolve_customers_by_nation(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    out = D.dissolve_attributes(c, ["c_nationkey"], sum_fields=["c_acctbal"],
                                copy_fields=["c_name"], order_col="c_custkey",
                                calc={"n_cust": ("count", "c_custkey")})
    return out.select("c_nationkey", F.round("c_acctbal", 2).alias("acctbal_sum"),
                      "n_cust", F.col("c_name").alias("first_name"))


def q_join_first_match(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    out = J.join_attributes(
        n, c, ("n_nationkey", "c_nationkey"),
        copy_fields=["c_name", "c_mktsegment"], sum_fields=["c_acctbal"],
        source_order="c_custkey")
    return out.select("n_nationkey", "n_name", "joins", "c_name", "c_mktsegment",
                      F.round("sum_c_acctbal", 2).alias("sum_c_acctbal"))


def q_join_unmatched(spark, sf_dir):
    """Target rows with no source match. TPC-H foreign keys are fully
    covered, so the source side is restricted (o_custkey % 3 == 0) to make
    the anti-join NON-EMPTY — a 0-row oracle proves nothing (VERDICT r02
    What's-wrong #4)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 3 == 0)
    return J.join_unmatched(c, o, ("c_custkey", "o_custkey")) \
        .select("c_custkey", "c_name")


def q_join_unjoined(spark, sf_dir):
    """Source rows that joined no target: lineitem restricted to low order
    keys, so most parts go un-referenced and the output is NON-EMPTY."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return J.join_unjoined(li, p, ("l_partkey", "p_partkey")) \
        .select("p_partkey", "p_name")


def q_join_is_max(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer").withColumn("c_key", F.col("c_nationkey"))
    out = J.join_where_is_max(n, c, ("n_nationkey", "c_key"),
                              value_field="c_acctbal", copy_fields=["c_name", "c_acctbal"],
                              source_order="c_custkey")
    return out.select("n_nationkey", "n_name", "c_name",
                      F.round("c_acctbal", 2).alias("best_acctbal"))


def q_merge_layers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("layer"))
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("layer"))
    return A.merge_layers([c, s])


def q_top3_per_order(spark, sf_dir):
    # l_linenumber is not unique per order in this synthetic corpus; use the
    # full (unique) tuple as the deterministic feature order.
    li = _t(spark, sf_dir, "lineitem").withColumn(
        A.ROW_IDX, F.struct("l_linenumber", "l_partkey", "l_suppkey",
                            "l_quantity", "l_extendedprice"))
    return A.uniq(li, F.col("l_orderkey"), max_count=3) \
        .select("l_orderkey", "l_linenumber", "l_quantity")


# --- spatial -----------------------------------------------------------------

def q_filter_geom_bbox(spark, sf_dir):
    pts = _customer_points(spark, sf_dir)
    return S.filter_geom_bbox(pts, (-100.0, 30.0, -80.0, 40.0), x="lon", y="lat") \
        .select("c_custkey", "lon", "lat")


def q_pip_all_pairs(spark, sf_dir):
    pts = _customer_points(spark, sf_dir)
    _, _, polys = _mosaic_polys(spark)
    pairs = S.pip_join(pts, "lon", "lat", polys, "rid", bbox=BBOX, res=8,
                       cache_token="mosaic6x4r8")
    return pairs.select("c_custkey", "rid")


def q_pip_first_match(spark, sf_dir):
    pts = _customer_points(spark, sf_dir)
    _, _, polys = _mosaic_polys(spark)
    out = S.spatial_join_point_to_polygon(
        pts, "lon", "lat", polys, "rid", "c_custkey",
        copy_fields=["state"], bbox=BBOX, res=8, cache_token="mosaic6x4r8")
    return out.select("c_custkey", "joins", "first_rid", "state")


def q_region_point_stats(spark, sf_dir):
    pts = _customer_points(spark, sf_dir)
    _, _, polys = _mosaic_polys(spark)
    out = S.polygon_to_points_join(
        pts, "lon", "lat", polys, "rid",
        [F.count(F.lit(1)).alias("n_pts"),
         F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum")],
        bbox=BBOX, res=8, cache_token="mosaic6x4r8")
    return out.select("rid", "n_pts", "acctbal_sum").fillna({"n_pts": 0})


def q_split_on_grid(spark, sf_dir):
    pts = _customer_points(spark, sf_dir)
    out = G.split_on_grid(pts, 8, 8, bbox=BBOX, x="lon", y="lat", id_field="tile")
    return out.select("c_custkey", "tile")


def q_flagship_image_tiles(spark, sf_dir, n_images: int = 20000):
    # narrow projection before the spatial join: the pandas verify stage's
    # schema pins its input columns, so pruning must happen upstream —
    # candidate rows carry only (id, lon, lat), never the wide image payload
    imgs = L.footprint_cols(L.synth_images(spark, n_images)).select("id", "lon", "lat")
    _, _, polys = _mosaic_polys(spark)
    # res=9 is the measured steady-state optimum for this dimension layer
    # (44.9M img/s vs 35.2M at res=8 and 34.1M at res=10 on 200M rows —
    # finer cells shrink the boundary-verify fraction until cover-row
    # fanout wins); the one-time index build is the size-gated local path
    pairs = S.pip_join(imgs, "lon", "lat", polys, "rid", bbox=BBOX, res=9,
                       cache_token="mosaic6x4r9")
    # aggregate on the numeric (row, col) keys; format the "r{r}c{c}" tile id
    # AFTER the reduction (256 rows) — per-row string building anti-scales
    tr, tc = G.grid_rc(F.col("lon"), F.col("lat"), 16, 16, BBOX)
    return (pairs.groupBy(F.col("rid"), tr.alias("__tr"), tc.alias("__tc"))
            .agg(F.count(F.lit(1)).alias("n_images"))
            .select("rid", F.format_string("r%dc%d", "__tr", "__tc").alias("tile"),
                    "n_images"))


def q_knn_nearest(spark, sf_dir):
    pts = _customer_points(spark, sf_dir).select("c_custkey", "lon", "lat")
    sup = _supplier_points(spark, sf_dir).select("s_suppkey", "slon", "slat")
    out = S.nearest_point_join(pts, "lon", "lat", "c_custkey",
                               sup, "slon", "slat", "s_suppkey",
                               buffer=2.0, bbox=BBOX)
    return out.select("c_custkey", "s_suppkey", "dist_sq")


def q_point_grid(spark, sf_dir):
    return G.point_grid(spark, 10, 8, BBOX)


def q_polygon_grid(spark, sf_dir):
    g = G.polygon_grid(spark, 6, 4, BBOX)
    return g.select("cell_id", "row", "col",
                    F.col("bbox.xmin").alias("xmin"), F.col("bbox.ymin").alias("ymin"),
                    F.col("bbox.xmax").alias("xmax"), F.col("bbox.ymax").alias("ymax"))


def q_affine(spark, sf_dir):
    pts = _customer_points(spark, sf_dir).select("c_custkey", "lon", "lat")
    out = A.affine(pts, "lon", "lat", shift=(3.5, -1.25), scale=2.0)
    return out.select("c_custkey", F.col("lon").alias("x2"), F.col("lat").alias("y2"))


def q_round_precision(spark, sf_dir):
    pts = _customer_points(spark, sf_dir).select("c_custkey", "lon", "lat")
    return pts.select("c_custkey",
                      A.round_coords(F.col("lon"), 0.5).alias("rlon"),
                      A.round_coords(F.col("lat"), 0.5).alias("rlat"))


# --- topology ---------------------------------------------------------------

def q_dissolve_states(spark, sf_dir):
    feats, arcs = L.region_mosaic(spark, 6, 4, BBOX)
    dis = D.dissolve_polygons(feats, arcs, "state")

    from mapshaper_spark.geom import kernels as K
    import pandas as pd
    from pyspark.sql import types as T

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for st, rxs, rys in zip(pdf["state"], pdf["rings_x"], pdf["rings_y"]):
            nv = sum(len(r) for r in rxs)
            area = sum(abs(K.planar_path_area(np.asarray(rx), np.asarray(ry)))
                       for rx, ry in zip(rxs, rys))
            rows.append((st, nv, round(area, 6)))
        return pd.DataFrame(rows, columns=["state", "n_vertices", "area"])

    schema = T.StructType([dis.schema["state"],
                           T.StructField("n_vertices", T.LongType()),
                           T.StructField("area", T.DoubleType())])
    return dis.mapInPandas(lambda it: (stats(pdf) for pdf in it), schema=schema)


def q_innerlines(spark, sf_dir):
    feats, _ = L.region_mosaic(spark, 6, 4, BBOX)
    return D.innerlines(feats, "rid").select(
        F.col("aid").cast("int").alias("aid"),
        F.col("key_a").cast("int").alias("key_a"),
        F.col("key_b").cast("int").alias("key_b"))


def q_lines(spark, sf_dir):
    feats, _ = L.region_mosaic(spark, 6, 4, BBOX)
    return D.lines(feats, "state").select(
        F.col("aid").cast("int").alias("aid"), "line_type", "key_a", "key_b")


def q_neighbors(spark, sf_dir):
    feats, _ = L.region_mosaic(spark, 6, 4, BBOX)
    return D.polygon_neighbors(feats, "rid").select(
        F.col("key_a").cast("int").alias("key_a"),
        F.col("key_b").cast("int").alias("key_b"))


# --- paths / topology / proj -------------------------------------------------

def q_points_centroid(spark, sf_dir):
    _, _, polys = _mosaic_polys(spark)
    out = P.points_from_centroids(polys)
    return out.select("rid", F.round("cx", 6).alias("cx"), F.round("cy", 6).alias("cy"))


def q_points_inner(spark, sf_dir):
    _, _, polys = _mosaic_polys(spark)
    out = P.points_inner(polys.select("rid", "rings_x", "rings_y"))
    return out.select("rid", F.round("ix", 6).alias("ix"),
                      F.round("iy", 6).alias("iy"))


def q_points_vertices(spark, sf_dir):
    _, _, polys = _mosaic_polys(spark)
    return P.points_vertices(polys, "rid")


def _l_paths(spark, n=10):
    """Deterministic L-shaped polylines: feature i runs (0, 10i) -> (6, 10i)
    -> (6, 10i + 6)."""
    df = spark.range(0, n).select(F.col("id").cast("int").alias("fid"))
    y0 = F.col("fid").cast("double") * F.lit(10.0)
    return df.select(
        "fid",
        F.array(F.array(F.lit(0.0), F.lit(6.0), F.lit(6.0))).alias("rings_x"),
        F.array(F.array(y0, y0, y0 + F.lit(6.0))).alias("rings_y"),
        F.struct(F.lit(0.0).alias("xmin"), y0.alias("ymin"),
                 F.lit(6.0).alias("xmax"), (y0 + F.lit(6.0)).alias("ymax")).alias("bbox"))


def q_points_interpolated(spark, sf_dir):
    out = P.points_interpolated(_l_paths(spark), "fid", 2.5)
    return out.select("fid", "seq", F.round("x", 6).alias("x"), F.round("y", 6).alias("y"))


def _holey_poly(spark):
    """One clip polygon: rect [-110,30,-80,45] with hole [-100,35,-90,40]."""
    ox = F.array(F.lit(-110.0), F.lit(-110.0), F.lit(-80.0), F.lit(-80.0), F.lit(-110.0))
    oy = F.array(F.lit(30.0), F.lit(45.0), F.lit(45.0), F.lit(30.0), F.lit(30.0))
    hx = F.array(F.lit(-100.0), F.lit(-90.0), F.lit(-90.0), F.lit(-100.0), F.lit(-100.0))
    hy = F.array(F.lit(35.0), F.lit(35.0), F.lit(40.0), F.lit(40.0), F.lit(35.0))
    return spark.range(1).select(
        F.lit(1).alias("clip_id"),
        F.array(ox, hx).alias("rings_x"), F.array(oy, hy).alias("rings_y"),
        F.struct(F.lit(-110.0).alias("xmin"), F.lit(30.0).alias("ymin"),
                 F.lit(-80.0).alias("xmax"), F.lit(45.0).alias("ymax")).alias("bbox"))


def q_clip_points(spark, sf_dir):
    pts = _customer_points(spark, sf_dir).select("c_custkey", "lon", "lat")
    return P.clip_points(pts, "lon", "lat", _holey_poly(spark), "clip_id",
                         bbox=BBOX, res=8)


def q_erase_points(spark, sf_dir):
    pts = _customer_points(spark, sf_dir).select("c_custkey", "lon", "lat")
    return P.clip_points(pts, "lon", "lat", _holey_poly(spark), "clip_id",
                         bbox=BBOX, res=8, erase=True)


def q_clip_bbox_lines(spark, sf_dir):
    lines = spark.range(0, 10).select(
        F.col("id").cast("int").alias("fid"),
        F.array(F.array(F.lit(0.0), F.lit(20.0))).alias("rings_x"),
        F.array(F.array(F.col("id").cast("double"), F.col("id").cast("double"))).alias("rings_y"),
        F.struct(F.lit(0.0).alias("xmin"), F.col("id").cast("double").alias("ymin"),
                 F.lit(20.0).alias("xmax"), F.col("id").cast("double").alias("ymax")).alias("bbox"))
    out = P.clip_bbox_paths(lines, (5.0, 2.0, 15.0, 7.0))
    return out.select(
        "fid",
        F.element_at(F.element_at("rings_x", 1), 1).alias("x0"),
        F.element_at(F.element_at("rings_y", 1), 1).alias("y0"),
        F.element_at(F.element_at("rings_x", 1), -1).alias("x1"),
        F.element_at(F.element_at("rings_y", 1), -1).alias("y1"))


def q_filter_islands(spark, sf_dir):
    """50 multipart features; island ring area below 0.1 is removed."""
    df = spark.range(0, 50).select(F.col("id").cast("int").alias("fid"))
    x0 = F.col("fid").cast("double") * F.lit(5.0)
    s = F.lit(0.2) + F.lit(0.1) * (F.col("fid") % 5).cast("double")
    main_x = F.array(x0, x0, x0 + 2.0, x0 + 2.0, x0)
    main_y = F.array(F.lit(0.0), F.lit(2.0), F.lit(2.0), F.lit(0.0), F.lit(0.0))
    isl_x = F.array(x0, x0, x0 + s, x0 + s, x0)
    isl_y = F.array(F.lit(10.0), F.lit(10.0) + s, F.lit(10.0) + s, F.lit(10.0), F.lit(10.0))
    feats = df.select(
        "fid", F.array(main_x, isl_x).alias("rings_x"),
        F.array(main_y, isl_y).alias("rings_y"),
        F.struct(x0.alias("xmin"), F.lit(0.0).alias("ymin"),
                 (x0 + 2.0).alias("xmax"), (F.lit(10.0) + s).alias("ymax")).alias("bbox"))
    out = P.filter_islands(feats, min_area=0.1)
    return out.select("fid", F.size("rings_x").alias("n_rings"))


def q_graticule(spark, sf_dir):
    g = G.graticule(spark)
    return g.select("kind", "value", F.size("xs").alias("n"),
                    F.element_at("xs", 1).alias("x0"), F.element_at("ys", 1).alias("y0"),
                    F.element_at("xs", -1).alias("x1"), F.element_at("ys", -1).alias("y1"))


def q_proj_webmercator(spark, sf_dir):
    pts = _customer_points(spark, sf_dir).select("c_custkey", "lon", "lat")
    out = PR.project_points(pts, "lon", "lat")
    return out.select("c_custkey", F.round("lon", 4).alias("mx"),
                      F.round("lat", 4).alias("my"))


def q_svg_export(spark, sf_dir):
    """End-to-end -o svg document golden (reference svg-test.js:97-111,
    'multipolygon exported as single path'): pixel transform with margin=0
    width=900, layer <g id>, implicit-lineto path with per-ring Z. The
    oracle is the reference's own expected byte string, so the driver hash
    pins the entire export path."""
    import json as _json
    from mapshaper_spark.cli import apply_commands
    geo = _json.dumps({
        "type": "Feature", "properties": None,
        "geometry": {"type": "MultiPolygon", "coordinates": [
            [[[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]]],
            [[[3, 2], [4, 2], [4, 1], [3, 1], [3, 2]]]]}})
    out = apply_commands(spark, "-i path.json -o path.svg margin=0 width=900",
                         {"path.json": geo})
    return spark.createDataFrame([(out["path.svg"],)], "doc string")


def q_cli_pipeline(spark, sf_dir):
    """End-to-end CLI command-string pipeline (mapshaper_spark/cli.py —
    the api.runCommands analog a reference user drives): import -> filter
    -> each -> dissolve with sum-fields + calc, all from one string."""
    from mapshaper_spark.cli import run_commands
    cat = run_commands(
        spark,
        f"-i {sf_dir}/customer.parquet -filter 'c_acctbal > 1000' "
        "-each 'seg = upper(c_mktsegment)' "
        "-dissolve seg sum-fields=c_nationkey calc='n = count()'")
    return cat.df().select(
        "seg", F.col("c_nationkey").cast("long").alias("sum_nk"),
        F.col("n").cast("long").alias("n"))


def q_cli_pipeline2(spark, sf_dir):
    """Second end-to-end CLI chain, exercising the round-3 command wave:
    -each (derive coords) -> -points x=/y= -> -filter-geom bbox= ->
    -drop fields= -> -affine; every stage is plain arithmetic so the
    oracle replays the whole pipeline in one SQL query."""
    from mapshaper_spark.cli import run_commands
    cat = run_commands(
        spark,
        f"-i {sf_dir}/customer.parquet "
        "-each 'lon = -120.0 + c_custkey % 1000 / 1000.0 * 60.0, "
        "lat = 25.0 + c_custkey * 7 % 1000 / 1000.0 * 24.0' "
        "-points x=lon y=lat "
        "-drop fields=c_comment,c_address,c_phone,c_mktsegment,c_name,"
        "c_acctbal,c_nationkey,lon,lat "
        "-filter-geom bbox=-110,30,-70,45 "
        "-affine shift=3,4 scale=2 anchor=0,0")
    return cat.df().select("c_custkey",
                           F.round("x", 6).alias("ax"),
                           F.round("y", 6).alias("ay"))


def q_proj_sinu(spark, sf_dir):
    """Round-3 -proj tail: ellipsoidal sinusoidal (Snyder eq. 30-1..30-2;
    geom/projections.py Sinusoidal). Input lon/lat derive from integer
    arithmetic so Spark and DuckDB agree bit-for-bit; the oracle re-derives
    the full meridional-arc series in SQL."""
    pts = spark.range(0, 100).select(
        F.col("id"),
        (F.lit(-170.0) + (F.col("id") * 73 % 3400) / 10.0).alias("lon"),
        (F.lit(-80.0) + (F.col("id") * 117 % 1600) / 10.0).alias("lat"))
    out = PR.project_points(pts, "lon", "lat",
                            crs="+proj=sinu +lon_0=-20 +datum=WGS84")
    return out.select("id", F.round("lon", 4).alias("x"),
                      F.round("lat", 4).alias("y"))


def q_proj_wintri(spark, sf_dir):
    """Round-4 projection tail: Winkel Tripel + Equal Earth forward over
    deterministic nation-derived points. Both forwards are closed-form, so
    the DuckDB oracle recomputes them from the same published equations
    (wintri: arithmetic mean of equirectangular at acos(2/pi) and Aitoff;
    eqearth: Savric-Patterson-Jenny 2018 polynomial)."""
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey",
        ((F.col("n_nationkey") * 13 % 340) - 170).cast("double").alias("lon"),
        ((F.col("n_nationkey") * 7 % 160) - 80).cast("double").alias("lat"))
    w = PR.project_points(n, "lon", "lat", crs="+proj=wintri")
    e = PR.project_points(n, "lon", "lat", crs="+proj=eqearth")
    return (w.select("n_nationkey", F.lit("wintri").alias("which"),
                     F.round("lon", 4).alias("x"), F.round("lat", 4).alias("y"))
            .unionByName(e.select("n_nationkey", F.lit("eqearth").alias("which"),
                                  F.round("lon", 4).alias("x"),
                                  F.round("lat", 4).alias("y"))))


def q_ndjson_roundtrip(spark, sf_dir):
    """r5 distributed ndjson sink+importer as a gated query: export a
    deterministic polygon layer through the scale path
    (export_ndjson -> spark.read.text + Arrow parse -> sampled property
    flattening), then report per-feature properties and ring vertex
    counts. Oracle = VALUES literal of what a lossless round trip must
    produce."""
    import os as _os
    import tempfile as _tf
    rows = []
    for i, (gx, gy) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        x0, y0 = float(gx), float(gy)
        rows.append((i, "A" if gx == 0 else "B", 10 * (i + 1),
                     [[x0, x0 + 1, x0 + 1, x0, x0]],
                     [[y0, y0, y0 + 1, y0 + 1, y0]]))
    df = spark.createDataFrame(
        rows, "fid int, state string, pop int, "
              "rings_x array<array<double>>, rings_y array<array<double>>")
    out = _os.path.join(_tf.mkdtemp(prefix="ms_ndjq"), "layer_nd")
    from mapshaper_spark.cli import run_commands
    run_commands(spark, f"-o format=ndjson {out}", layers={"states": df})
    cat = run_commands(spark, f"-i {out}")
    back = cat.df()
    return back.select(
        F.col("fid").cast("int").alias("fid"), "state",
        F.col("pop").cast("int").alias("pop"),
        F.aggregate(F.transform("rings_x", F.size), F.lit(0),
                    lambda a, v: a + v).alias("n_vertices"))


def q_proj_utm(spark, sf_dir):
    """utm via the EXACT Poder/Engsager series (r5): the oracle row is
    PROJ's published quickstart value (echo 12 55 | proj +proj=utm
    +zone=32 -> 691875.63 6098907.83) — an independent source pinning
    the series, like the Snyder worked-example rows in proj_lcc."""
    pts = spark.createDataFrame([("pub", 12.0, 55.0)],
                                "tag string, lon double, lat double")
    out = PR.project_points(pts, "lon", "lat",
                            crs="+proj=utm +zone=32 +datum=WGS84")
    return out.select("tag", F.round("lon", 2).alias("x"),
                      F.round("lat", 2).alias("y"))


def q_csv_empty_cells(spark, sf_dir):
    """r5 exact CSV empty-vs-missing semantics as a gated query: a
    present-but-empty cell imports as \'\' in a string column / null in a
    promoted numeric one, a missing trailing field as null, RFC4180
    doubled quotes unescape, delimiters inside quotes don\'t split
    (delim-import-test.js). The csv is synthesized deterministically at
    query time; the oracle is a VALUES literal of the reference
    semantics."""
    import os as _os
    import tempfile as _tf
    d = _tf.mkdtemp(prefix="ms_csvq")
    p = _os.path.join(d, "t.csv")
    with open(p, "w") as fh:
        fh.write('ID,STATE,VALUE\n1\n2,WA,300\n3,,\n'
                 '4,"he said ""hi""",5\n5,"x,y",\n')
    from mapshaper_spark.sources.delim import import_delim
    df = import_delim(spark, p)
    return df.select(F.col("ID").cast("double").alias("id"),
                     F.col("STATE").alias("state"),
                     F.col("VALUE").cast("double").alias("value"))


def q_proj_tpeqd(spark, sf_dir):
    """Late round-4 projection tail: two-point equidistant forward over
    deterministic nation-derived points (foci (35N, 10W) and (45N, 60E)).
    The forward is closed (spherical law of cosines + the planar two-focus
    triangle), so the DuckDB oracle recomputes it from the same defining
    equations, including the great-circle side sign (A x B) . P."""
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey",
        ((F.col("n_nationkey") * 17 % 340) - 170).cast("double").alias("lon"),
        ((F.col("n_nationkey") * 11 % 160) - 80).cast("double").alias("lat"))
    t = PR.project_points(
        n, "lon", "lat",
        crs="+proj=tpeqd +lat_1=35 +lon_1=-10 +lat_2=45 +lon_2=60")
    return t.select("n_nationkey",
                    F.round("lon", 3).alias("x"),
                    F.round("lat", 3).alias("y"))


def q_proj_healpix(spark, sf_dir):
    """Round-4 pj_list completion wave: spherical HEALPix forward
    (Calabretta & Roukema 2007; reference mproj pj_healpix) over
    deterministic nation-derived points spanning both the equatorial
    Lambert band and the polar Collignon triangles. The forward is a
    closed piecewise form, so the DuckDB oracle recomputes it verbatim."""
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey",
        ((F.col("n_nationkey") * 17 % 340) - 170).cast("double").alias("lon"),
        ((F.col("n_nationkey") * 23 % 178) - 89).cast("double").alias("lat"))
    t = PR.project_points(n, "lon", "lat",
                          crs="+proj=healpix +a=6378137 +b=6378137")
    return t.select("n_nationkey",
                    F.round("lon", 3).alias("x"),
                    F.round("lat", 3).alias("y"))


def q_proj_qsc(spark, sf_dir):
    """qsc (quadrilateralized spherical cube) forward on the FRONT face
    over deterministic nation-derived points inside |lon|,|lat| < 45 —
    the O'Neill-Laubscher closed form (reference mproj pj_qsc), which the
    DuckDB oracle recomputes verbatim (sphere, so no LK12 datum shift)."""
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey",
        ((F.col("n_nationkey") * 7 % 80) - 40).cast("double").alias("lon"),
        ((F.col("n_nationkey") * 13 % 80) - 40).cast("double").alias("lat"))
    t = PR.project_points(n, "lon", "lat",
                          crs="+proj=qsc +a=6378137 +b=6378137")
    return t.select("n_nationkey",
                    F.round("lon", 3).alias("x"),
                    F.round("lat", 3).alias("y"))


def q_proj_lcc(spark, sf_dir):
    """Full -proj surface beyond webmercator: LCC / AEA / TM forward
    projections of Snyder's worked-example points (USGS PP 1395 pp. 269,
    292, 296) — the oracle rows are the PUBLISHED values, so this checks
    the implementation against an independent source."""
    pts = spark.createDataFrame(
        [("lcc", -75.0, 35.0), ("aea", -75.0, 35.0), ("tm", -73.5, 40.5)],
        "which string, lon double, lat double")
    crs = {
        "lcc": "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +ellps=clrk66",
        "aea": "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=clrk66",
        "tm": "+proj=tmerc +lon_0=-75 +k_0=0.9996 +x_0=0 +ellps=clrk66",
    }
    # ONE Arrow stage dispatching per row on `which` (r5: the previous
    # three filter->project->union branches each paid a Python-worker
    # round-trip; this was the slowest bench query at 1.2 s of pure
    # fixed overhead)
    import pandas as pd

    from mapshaper_spark.geom.projections import get_projection
    projs = {w: get_projection(d) for w, d in crs.items()}

    def gen(it):
        for pdf in it:
            xs, ys = [], []
            for w, lon, lat in zip(pdf["which"], pdf["lon"], pdf["lat"]):
                x, y = projs[w].fwd(np.array([lon]), np.array([lat]))
                xs.append(round(float(x[0]), 1))
                ys.append(round(float(y[0]), 1))
            yield pd.DataFrame({"which": pdf["which"], "x": xs, "y": ys})

    return pts.mapInPandas(gen, schema="which string, x double, y double")


def q_knn_k3(spark, sf_dir):
    pts = _customer_points(spark, sf_dir).select("c_custkey", "lon", "lat")
    sup = _supplier_points(spark, sf_dir).select("s_suppkey", "slon", "slat")
    return S.knn_join(pts, "lon", "lat", "c_custkey",
                      sup, "slon", "slat", "s_suppkey", k=3, max_radius=2.0,
                      bbox=BBOX)


def q_knn_unbounded(spark, sf_dir):
    """Unbounded 3-NN via progressive ring expansion (no radius cap)."""
    pts = _customer_points(spark, sf_dir).select("c_custkey", "lon", "lat") \
        .filter(F.col("c_custkey") <= 300)
    sup = _supplier_points(spark, sf_dir).select("s_suppkey", "slon", "slat")
    return S.knn_join_progressive(pts, "lon", "lat", "c_custkey",
                                  sup, "slon", "slat", "s_suppkey",
                                  k=3, res=4, bbox=BBOX)


def q_topology_build(spark, sf_dir):
    polys = L.region_mosaic_rings_local(spark, 6, 4, BBOX)
    paths = polys.select(F.col("rid").cast("long").alias("path_id"),
                         F.element_at("rings_x", 1).alias("xs"),
                         F.element_at("rings_y", 1).alias("ys"))
    arcs, _refs = TP.build_topology(paths, "path_id")
    # arcs store the reference's FIRST-USE traversal (topology-test.js
    # parity); normalize endpoint order here so the oracle's left->right /
    # bottom->top edge enumeration stays direction-independent
    a = F.struct(F.element_at("xs", 1).alias("x"),
                 F.element_at("ys", 1).alias("y"))
    b = F.struct(F.element_at("xs", -1).alias("x"),
                 F.element_at("ys", -1).alias("y"))
    lo, hi = F.least(a, b), F.greatest(a, b)
    return arcs.select(
        lo.x.alias("x0"), lo.y.alias("y0"),
        hi.x.alias("x1"), hi.y.alias("y1"), "n")


def q_polygons_from_lines(spark, sf_dir):
    """-polygons: rebuild the 24 mosaic faces from the bare line network."""
    feats, arcs = L.region_mosaic(spark, 6, 4, BBOX)
    faces = TP.polygons_from_lines(arcs)
    return faces.select(
        F.col("comp").cast("int").alias("comp"),
        F.round("area", 6).alias("area"),
        F.array_min("xs").alias("xmin"), F.array_min("ys").alias("ymin"))


def q_segment_intersections(spark, sf_dir):
    horiz = spark.range(0, 10).select(
        F.col("id").alias("arc_id"),
        F.array(F.lit(0.0), F.lit(9.0)).alias("xs"),
        F.array(F.col("id").cast("double"), F.col("id").cast("double")).alias("ys"))
    vert = spark.range(0, 10).select(
        (F.col("id") + 10).alias("arc_id"),
        F.array(F.col("id").cast("double"), F.col("id").cast("double")).alias("xs"),
        F.array(F.lit(0.0), F.lit(9.0)).alias("ys"))
    return TP.find_segment_intersections(horiz.unionByName(vert), n_stripes=8) \
        .select("x", "y", "arc_a", "arc_b")


def q_polyline_dissolve(spark, sf_dir):
    arcs = spark.range(0, 20).select(
        F.col("id").alias("arc_id"),
        F.array((F.col("id") % 4).cast("double"), (F.col("id") % 4 + 1).cast("double")).alias("xs"),
        F.array(F.floor(F.col("id") / 4).cast("double"), F.floor(F.col("id") / 4).cast("double")).alias("ys"))
    feats = spark.range(1).select(
        F.lit("g").alias("grp"),
        F.array(F.transform(F.sequence(F.lit(0), F.lit(19)),
                            lambda v: v.cast("int"))).alias("parts"))
    out = TP.dissolve_polylines(feats, arcs, "grp")
    return out.select(
        F.element_at("xs", 1).alias("x0"), F.element_at("ys", 1).alias("y0"),
        F.element_at("xs", -1).alias("x1"), F.element_at("ys", -1).alias("y1"),
        F.size("xs").alias("n"))


def q_dedup_coords(spark, sf_dir):
    arcs = spark.range(0, 50).select(
        F.col("id").alias("arc_id"),
        F.transform(F.sequence(F.lit(0), F.lit(9)),
                    lambda v: F.floor(v / 2).cast("double")).alias("xs"),
        F.transform(F.sequence(F.lit(0), F.lit(9)),
                    lambda v: F.floor(v / 2).cast("double") + F.col("id")).alias("ys"),
    ).withColumn("n", F.size("xs"))
    return TP.dedup_arc_coords(arcs).select("arc_id", "n")


def q_subdivide(spark, sf_dir):
    """-subdivide 'count() > 300': recursive median halving along the long
    bbox axis (mapshaper-subdivide.js); exact oracle = recursive CTE
    replaying the same split rule with the same (axis, custkey) order."""
    pts = _customer_points(spark, sf_dir).select("c_custkey", "lon", "lat")
    out = G.subdivide(pts, "lon", "lat", max_count=300,
                      order_col="c_custkey")
    return out.groupBy("split_name").agg(F.count(F.lit(1)).alias("n"))


def q_spherical_area(spark, sf_dir):
    """Spherical region areas via the exact reference kernel (the vertical
    segments contribute 0, so area = dx_rad * (sin y1 - sin y0) * R^2)."""
    _, _, polys = _mosaic_polys(spark)
    from mapshaper_spark.functions import expressions as EX
    EX.register_geometry_functions(spark)
    polys.createOrReplaceTempView("__mosaic")
    return spark.sql(
        "SELECT rid, round(ms_spherical_area(rings_x, rings_y) / 1e9, 4) AS area_km2e3 "
        "FROM __mosaic")


def q_area_expr(spark, sf_dir):
    """The -each expression surface: '$.area' translated to SQL."""
    from mapshaper_spark.functions import expressions as EX
    EX.register_geometry_functions(spark)
    _, _, polys = _mosaic_polys(spark)
    polys.createOrReplaceTempView("__mosaic2")
    expr = EX.translate_proxy_expression("round($.area, 6)")
    return spark.sql(f"SELECT rid, {expr} AS area, "
                     f"{EX.translate_proxy_expression('$.width')} AS w, "
                     f"{EX.translate_proxy_expression('$.partCount')} AS np "
                     "FROM __mosaic2")


def q_explode_parts(spark, sf_dir):
    _, _, polys = _mosaic_polys(spark)
    out = P.explode(polys.select("rid", "rings_x", "rings_y", "bbox"))
    return out.select("rid", "part_idx", F.size("rings_x").alias("n_rings"),
                      F.col("bbox.xmin").alias("xmin"))


def q_filter_slivers(spark, sf_dir):
    """Features with a hole; slivers test removes holes below min_area."""
    df = spark.range(0, 50).select(F.col("id").cast("int").alias("fid"))
    x0 = F.col("fid").cast("double") * F.lit(5.0)
    s = F.lit(0.2) + F.lit(0.1) * (F.col("fid") % 5).cast("double")
    main_x = F.array(x0, x0, x0 + 2.0, x0 + 2.0, x0)
    main_y = F.array(F.lit(0.0), F.lit(2.0), F.lit(2.0), F.lit(0.0), F.lit(0.0))
    hole_x = F.array(x0 + 0.5, x0 + 0.5 + s, x0 + 0.5 + s, x0 + 0.5, x0 + 0.5)
    hole_y = F.array(F.lit(0.5), F.lit(0.5), F.lit(0.5) + s, F.lit(0.5) + s, F.lit(0.5))
    feats = df.select(
        "fid", F.array(main_x, hole_x).alias("rings_x"),
        F.array(main_y, hole_y).alias("rings_y"),
        F.struct(x0.alias("xmin"), F.lit(0.0).alias("ymin"),
                 (x0 + 2.0).alias("xmax"), F.lit(2.0).alias("ymax")).alias("bbox"))
    out = P.filter_slivers(feats, min_area=0.1)
    return out.select("fid", F.size("rings_x").alias("n_rings"))


def q_join_calc(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    src = o.join(c, o.o_custkey == c.c_custkey).withColumn(
        "nk", F.col("c_nationkey"))
    out = J.join_attributes(
        n, src, ("n_nationkey", "nk"),
        calc={"n_orders": ("count", "o_orderkey"),
              "total": ("sum", "o_totalprice"),
              "avg_price": ("average", "o_totalprice"),
              "med_price": ("median", "o_totalprice")})
    return out.select("n_nationkey", "n_name", "joins", "n_orders",
                      F.round("total", 2).alias("total"),
                      F.round("avg_price", 4).alias("avg_price"),
                      F.round("med_price", 4).alias("med_price"))


def q_data_fill(spark, sf_dir):
    from mapshaper_spark.operators import datafill as DF_
    feats, arcs = L.region_mosaic(spark, 6, 4, BBOX)
    feats = feats.withColumn(
        "val", F.when(F.col("rid") % 3 == 0, F.col("pop")).otherwise(F.lit(None)))
    out = DF_.data_fill(feats, arcs, "rid", "val")
    return out.select("rid", F.round("val", 2).alias("val"))


def q_cluster(spark, sf_dir):
    """-cluster with the deterministic sample-seeded Lloyd spec: the
    oracle replays the identical seeding/iteration/tie-break rules in SQL
    (unrolled CTEs), so the per-point assignment is EXACT-checkable."""
    from mapshaper_spark.operators import cluster as CL
    pts = _customer_points(spark, sf_dir).select("c_custkey", "lon", "lat")
    out = CL.cluster_points(pts, "lon", "lat", count=8, iterations=8)
    return out.select("c_custkey", "cluster")


def q_filter_geom_paths(spark, sf_dir):
    """-filter-geom bbox= on a PATH layer: keep features whose bbox
    intersects (filter-geom.js:3-28 path branch)."""
    _, _, polys = _mosaic_polys(spark)
    return S.filter_geom_bbox(polys, (-95.0, 30.0, -75.0, 40.0)).select("rid")


def q_close_gaps(spark, sf_dir):
    """closeGaps undershoot repair (mapshaper-gaps.js:9-29) on a synthetic
    layer of 20 groups x 3 arcs: a nearly-closed ring (its two dangles pair
    and snap onto the lower-keyed end), a long horizontal target arc, and a
    vertical stub whose lower dangle projects onto the target path. The
    oracle replays dangle detection, pair-snapping and the exact
    nearest-point-on-segment projection formula in SQL."""
    import mapshaper_spark.operators.topology as TP
    g = spark.range(20).select(F.col("id").alias("i"),
                               (F.col("id") * 20.0).alias("x0"))
    d = lambda v: F.lit(float(v))
    ring = g.select((F.col("i") * 3).alias("arc_id"),
                    F.array(F.col("x0"), F.col("x0") + 1, F.col("x0") + 1,
                            F.col("x0"), F.col("x0")).alias("xs"),
                    F.array(d(0), d(0), d(1), d(1), d(0.01)).alias("ys"))
    horiz = g.select((F.col("i") * 3 + 1).alias("arc_id"),
                     F.array(F.col("x0") + 2, F.col("x0") + 5).alias("xs"),
                     F.array(d(5), d(5)).alias("ys"))
    stub = g.select((F.col("i") * 3 + 2).alias("arc_id"),
                    F.array(F.col("x0") + 3, F.col("x0") + 3).alias("xs"),
                    F.array(d(5.6), d(5.03)).alias("ys"))
    arcs = ring.unionByName(horiz).unionByName(stub)
    healed = TP.close_gaps(arcs, tolerance=0.05)
    r9 = lambda c: F.round(c, 9)
    return healed.select(
        "arc_id",
        r9(F.element_at("xs", 1)).alias("ax"), r9(F.element_at("ys", 1)).alias("ay"),
        r9(F.element_at("xs", -1)).alias("bx"), r9(F.element_at("ys", -1)).alias("by"))


def q_snap_sweep(spark, sf_dir):
    """Exact sorted-sweep snapping (snapping.js:31-63) over 60 jitter
    clusters (diameter << interval << separation): the sweep collapses each
    cluster onto its lexicographic-min (x, y) point, which the oracle
    computes directly from the same deterministic construction."""
    import mapshaper_spark.operators.topology as TP
    pts = spark.range(3000).select(
        (F.col("id") % 60).alias("c"),
        ((F.col("id") % 60) * 7.0 +
         ((F.col("id") / 60).cast("long") % 5) * 1e-7).alias("x"),
        (((F.col("id") % 60) * 3 % 11).cast("double") +
         ((F.col("id") / 60).cast("long") % 7) * 1e-7).alias("y"))
    out = TP.snap_coords_sweep(pts, 1e-5)
    return (out.groupBy("c")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("x"), 9).alias("x_min"),
                 F.round(F.max("x"), 9).alias("x_max"),
                 F.round(F.min("y"), 9).alias("y_min"),
                 F.round(F.max("y"), 9).alias("y_max")))


def q_proj_albersusa(spark, sf_dir):
    """albersusa mixed projection (AEA base + AK/HI LCC inset frames,
    mapshaper-projections.js:132-140); the oracle re-derives the Snyder
    formulas AND the Matrix2D frame replay numerically in DuckDB."""
    pts = spark.createDataFrame(_ALBERSUSA_POINTS,
                                "city string, lon double, lat double")
    out = PR.project_points(pts, "lon", "lat", crs="albersusa")
    return out.select("city", F.round("lon", 3).alias("x"),
                      F.round("lat", 3).alias("y"))


def q_fast_simplify(spark, sf_dir):
    """fast-simplify interval thinning (mapshaper-simplify-fast.js:3-66);
    the oracle replays the sequential keep-walk as a recursive CTE."""
    arcs = _synthetic_arcs(spark, 20).select("arc_id", "xs", "ys", "n")
    out = SI.simplify_arcs_fast(arcs, dist=2.0)
    s = lambda c: F.round(F.aggregate(c, F.lit(0.0), lambda a, v: a + v), 6)
    return out.select("arc_id", F.col("n").alias("n_kept"),
                      s("xs").alias("sx"), s("ys").alias("sy"))


def q_simplify_spherical(spark, sf_dir):
    arcs = _synthetic_arcs(spark, 100)
    with_z, zlimit = SI.simplify(arcs, method="visvalingam", pct=0.5,
                                 spherical=True)
    kept = SI.apply_zlimit(with_z, zlimit)
    return kept.select("arc_id", F.col("n").alias("n_kept"))


def q_clip_polygons(spark, sf_dir):
    """Rect-clip the mosaic polygons; clipped area must equal the exact
    rectangle intersection."""
    _, _, polys = _mosaic_polys(spark)
    clipped = P.clip_polygons_bbox(polys.select("rid", "rings_x", "rings_y", "bbox"),
                                   (-115.0, 28.0, -85.0, 40.0))
    areas = P.ring_areas_col(clipped)
    return areas.select(
        "rid", F.round(F.aggregate("ring_areas", F.lit(0.0),
                                   lambda a, v: a + v), 6).alias("area"))


def q_slice_grid(spark, sf_dir):
    """-slice by a 4x4 polygon grid: one row per (region, cell) with the
    clipped area — vector tile assignment with exact geometry."""
    _, _, polys = _mosaic_polys(spark)
    sliced = P.slice_by_grid(polys.select("rid", "rings_x", "rings_y", "bbox"),
                             4, 4, BBOX)
    areas = P.ring_areas_col(sliced)
    return areas.select(
        "rid", "cell_row", "cell_col",
        F.round(F.aggregate("ring_areas", F.lit(0.0), lambda a, v: a + v), 6).alias("area"))


def q_clip_diamond(spark, sf_dir):
    """General (non-rect) polygon clip: mosaic regions clipped by a diamond
    centered on a 4-region corner. Oracle areas hand-derived: each quadrant
    of the 200-unit diamond splits 42/8 across the two rows it spans."""
    from mapshaper_spark.operators import overlay as OV
    _, _, polys = _mosaic_polys(spark)
    diamond = spark.createDataFrame(
        [(1, [[-100.0, -90.0, -80.0, -90.0, -100.0]],
          [[37.0, 47.0, 37.0, 27.0, 37.0]],
          {"xmin": -100.0, "ymin": 27.0, "xmax": -80.0, "ymax": 47.0})],
        "cid int, rings_x array<array<double>>, rings_y array<array<double>>, "
        "bbox struct<xmin:double,ymin:double,xmax:double,ymax:double>")
    clipped = OV.clip_polygons(polys.select("rid", "rings_x", "rings_y", "bbox"),
                               diamond)
    areas = P.ring_areas_col(clipped)
    return areas.select(
        "rid", F.round(F.aggregate("ring_areas", F.lit(0.0),
                                   lambda a, v: a + v), 6).alias("area"))


def q_erase_diamond(spark, sf_dir):
    """Complement of clip_diamond: per-region area after erasing the diamond
    must be 60 minus the clipped area (exact partition)."""
    from mapshaper_spark.operators import overlay as OV
    _, _, polys = _mosaic_polys(spark)
    diamond = spark.createDataFrame(
        [(1, [[-100.0, -90.0, -80.0, -90.0, -100.0]],
          [[37.0, 47.0, 37.0, 27.0, 37.0]],
          {"xmin": -100.0, "ymin": 27.0, "xmax": -80.0, "ymax": 47.0})],
        "cid int, rings_x array<array<double>>, rings_y array<array<double>>, "
        "bbox struct<xmin:double,ymin:double,xmax:double,ymax:double>")
    erased = OV.clip_polygons(polys.select("rid", "rings_x", "rings_y", "bbox"),
                              diamond, erase=True)
    areas = P.ring_areas_col(erased)
    return areas.select(
        "rid", F.round(F.aggregate("ring_areas", F.lit(0.0),
                                   lambda a, v: a + v), 6).alias("area"))


def q_dissolve2(spark, sf_dir):
    """Overlap-safe dissolve (mosaic-based) of the mosaic by state."""
    from mapshaper_spark.operators import overlay as OV
    _, _, polys = _mosaic_polys(spark)
    out = OV.dissolve2(polys.select("state", "rings_x", "rings_y"), "state")
    return out.select("state", F.round("area", 6).alias("area"),
                      F.size("rings_x").alias("n_rings"))


def q_dissolve2_gaps(spark, sf_dir):
    """dissolve2 gap fill (reference dissolve3-test.js Fig. 14 figures):
    a 3x3 polygon with a 1x1 hole plus a separate 2x2 square, min_gap_area
    above the hole area -> the hole (an uncovered sliver face) merges into
    its only edge-neighbor; the detached square is untouched. Oracle is the
    hand-derived result (filled area 9 + 4, 2 rings)."""
    from mapshaper_spark.operators import overlay as OV
    feats = spark.createDataFrame(
        [("g", 1,
          [[0.0, 0.0, 3.0, 3.0, 0.0], [1.0, 2.0, 2.0, 1.0, 1.0]],
          [[100.0, 103.0, 103.0, 100.0, 100.0], [101.0, 101.0, 102.0, 102.0, 101.0]]),
         ("g", 2,
          [[10.0, 10.0, 12.0, 12.0, 10.0]],
          [[100.0, 102.0, 102.0, 100.0, 100.0]])],
        "grp string, fid int, rings_x array<array<double>>, "
        "rings_y array<array<double>>")
    out = OV.dissolve2(feats.select("grp", "rings_x", "rings_y"), "grp",
                       min_gap_area=1.1)
    return out.select("grp", F.size("rings_x").alias("n_rings"),
                      F.round("area", 6).alias("area"))


def q_ring_repair(spark, sf_dir):
    """Features with deliberately mis-wound rings: CCW outer + CW hole;
    repair must flip both (outer -> positive, hole -> negative)."""
    df = spark.range(0, 50).select(F.col("id").cast("int").alias("fid"))
    x0 = F.col("fid").cast("double") * F.lit(5.0)
    s = F.lit(0.2) + F.lit(0.1) * (F.col("fid") % 5).cast("double")
    outer_x = F.array(x0, x0 + 2.0, x0 + 2.0, x0, x0)           # CCW (wrong)
    outer_y = F.array(F.lit(0.0), F.lit(0.0), F.lit(2.0), F.lit(2.0), F.lit(0.0))
    hole_x = F.array(x0 + 0.5, x0 + 0.5, x0 + 0.5 + s, x0 + 0.5 + s, x0 + 0.5)
    hole_y = F.array(F.lit(0.5), F.lit(0.5) + s, F.lit(0.5) + s, F.lit(0.5), F.lit(0.5))  # CW (wrong)
    feats = df.select(
        "fid", F.array(outer_x, hole_x).alias("rings_x"),
        F.array(outer_y, hole_y).alias("rings_y"),
        F.struct(x0.alias("xmin"), F.lit(0.0).alias("ymin"),
                 (x0 + 2.0).alias("xmax"), F.lit(2.0).alias("ymax")).alias("bbox"))
    fixed = P.repair_ring_nesting(feats)
    areas = P.ring_areas_col(fixed)
    return areas.select(
        "fid",
        F.round(F.element_at("ring_areas", 1), 6).alias("outer_area"),
        F.round(F.element_at("ring_areas", 2), 6).alias("hole_area"))


def q_ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return DD.char_ngram_jaccard_pairs(docs, "doc_id", "text", k=5, threshold=0.25)


def q_ann_ivf_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(emb, "vec_id", "embedding", _ann_query_vec(), k=10,
                        n_lists=16, nprobe=6)


def q_video_frame_sample(spark, sf_dir):
    vids = spark.range(0, 20).select(
        F.format_string("vid%04d", F.col("id")).alias("media_id"),
        F.lit(None).cast("binary").alias("bytes"),
        (F.lit(3000) + F.col("id") * 500).alias("duration_ms"),
        F.lit("rawgrid").alias("fmt"))
    out = IM.sample_video_frames(vids, every_ms=1000)
    return out.select("media_id", "frame_idx", "ts_ms",
                      F.length("frame_bytes").alias("frame_len"), "fmt")


def q_audio_features(spark, sf_dir):
    # deterministic PCM16 ramps built driver-side as binary
    def pcm(i):
        import struct
        vals = [((i * 7 + j * 13) % 2001) - 1000 for j in range(256)]
        return b"".join(struct.pack("<h", v) for v in vals)
    rows = [(f"aud{i:03d}", pcm(i), "pcm16") for i in range(30)]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, fmt string")
    out = IM.extract_audio_features(df)
    return out.select("media_id", "n_samples", "rms", "zero_crossings")


def q_audio_features_wav(spark, sf_dir):
    """WAV container + G.711 mu-law decode (operators/media.py). The blobs
    carry mu-law codes c = (i*37 + j*11) % 256, so the PCM the engine must
    recover is exactly the ITU-T G.711 expansion of those codes — which the
    oracle recomputes in closed-form SQL. A wrong bit anywhere in the RIFF
    parse or the mu-law bit math changes rms/zero_crossings."""
    import numpy as np
    from mapshaper_spark.operators.media import encode_wav, ulaw_decode
    rows = []
    for i in range(24):
        codes = np.arange(240, dtype=np.int64) * 11 + i * 37
        pcm = ulaw_decode((codes % 256).astype(np.uint8))
        rows.append((f"wav{i:03d}", bytes(encode_wav(pcm, codec="ulaw")),
                     "wav"))
    df = spark.createDataFrame(rows, "media_id string, bytes binary, fmt string")
    out = IM.extract_audio_features(df)
    return out.select("media_id", "n_samples", "rms", "zero_crossings")


def q_video_frames_mjpeg(spark, sf_dir):
    """Frame sampling over REAL RIFF/AVI MJPG containers (operators/media.py
    + the baseline JPEG codec). fps=2.5 -> avih us_per_frame=400000; with a
    NULL duration column the engine must derive duration from the container
    (n_frames * 400 ms) and map each sampled ts to the on-screen frame."""
    from mapshaper_spark.operators.jpeg import encode_jpeg
    from mapshaper_spark.operators.media import encode_avi_mjpeg
    rows = []
    for i in range(8):
        n = 3 + (i % 3)
        frames = [encode_jpeg(IM.synth_pixels(i * 16 + k, 16, 16), quality=90)
                  for k in range(n)]
        rows.append((f"mv{i:03d}", bytes(encode_avi_mjpeg(frames, fps=2.5)),
                     None, "mjpeg_avi"))
    vids = spark.createDataFrame(
        rows, "media_id string, bytes binary, duration_ms long, fmt string")
    out = IM.sample_video_frames(vids, every_ms=300)
    return out.select("media_id", "frame_idx", "ts_ms",
                      F.length("frame_bytes").alias("frame_len"), "fmt")


# --- text / dedup / similarity -----------------------------------------------

def q_text_metrics(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = TX.text_metrics(docs, "text")  # fused single-tokenize plan
    return out.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                      "quality", "lang_pred", "fingerprint")


def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.exact_dedup(docs, ["text"], order_col="doc_id") \
        .select("doc_id", "source")


def q_word_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    return DD.word_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: word-Jaccard pairs (>= 0.5) -> connected
    components -> canonical member per cluster — the standard web-scale
    'detect then collapse' dedup step. Oracle = DuckDB recursive CTE over
    the identical pair graph."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    pairs = DD.word_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    out = DD.dup_clusters(pairs, docs.select("doc_id"), "doc_id")
    return out.select("doc_id", "cluster", "is_canonical")


def q_minhash_dups(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    return DD.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)


def q_simhash_dups(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    return DD.simhash_pairs(docs, "doc_id", "text", max_hamming=8)


def q_minhash_sigs(spark, sf_dir):
    """Exact minhash SIGNATURE gate (r4): the full shingle->affine-perm->min
    pipeline replayed value-for-value by the DuckDB oracle (codepoint
    polynomial hash over HUGEINT arithmetic). Exploded to scalar rows so
    the driver's value hash covers every (doc, perm) lane."""
    docs = _t(spark, sf_dir, "documents")
    sigs = DD.minhash_signatures(docs, "doc_id", "text", num_perm=16,
                                 shingle=3, seed=42)
    return (sigs.select("doc_id", F.posexplode("signature")
                        .alias("perm", "sigval"))
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col("perm").cast("int").alias("perm"), "sigval"))


def q_simhash_sigs(spark, sf_dir):
    """Exact 61-bit SimHash gate (r4): per-document hash replayed exactly
    by the DuckDB oracle (per-bit weighted sums of token hashes)."""
    docs = _t(spark, sf_dir, "documents")
    return (DD.simhash_col(docs, "doc_id", "text")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "simhash"))


def q_each_regex(spark, sf_dir):
    """Round-4 expression surface: JS regex-method idioms in -each compile
    to SQL regexp functions (match->regexp_extract/regexp_like,
    search->regexp_instr, replace /g vs first-occurrence). The DuckDB
    oracle recomputes every column with DuckDB's own regexp functions
    (whose regexp_replace is first-occurrence by default, matching the JS
    semantics the non-/g translation reproduces on Spark)."""
    from mapshaper_spark.functions.expressions import \
        translate_proxy_expression as T
    cu = _t(spark, sf_dir, "customer")
    out = A.each(cu, {
        "digits": T(r"c_name.match(/(\d+)/)[1]"),
        "short_name": T("c_name.replace(/Customer#0+/, '')"),
        "is_b_seg": T("c_mktsegment.match(/^B/)"),
        "hash_pos": T("c_name.search(/#/)"),
        "ohs": T("c_name.replace(/0/g, 'O')"),
    })
    return out.select("c_custkey", "digits", "short_name", "is_b_seg",
                      F.col("hash_pos").cast("long").alias("hash_pos"),
                      "ohs")


def q_each_js(spark, sf_dir):
    """Round-4 expression-engine fallback: -each/-filter running ORIGINAL
    JS per row (arrow functions, method chains the SQL translator cannot
    express) through functions/jsengine.py inside mapInPandas
    (operators/jseach.py). The reference executes arbitrary JS per record
    (mapshaper-expressions.js:140-162); this query proves the fallback
    engine end-to-end: split -> map(arrow) -> join, string length
    arithmetic, and a filter_js predicate. The DuckDB oracle recomputes
    with list_transform lambdas."""
    from mapshaper_spark.operators.jseach import each_js, filter_js
    cu = _t(spark, sf_dir, "customer")
    out = each_js(
        cu,
        "initials = c_name.split('#').map(w => w.charAt(0)).join('');"
        " nlen = c_name.length + c_acctbal / 1000")
    out = filter_js(out, "c_mktsegment.toLowerCase().startsWith('b')")
    return out.select("c_custkey", "initials", "nlen")


def q_events_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.col("user_id"), F.to_date("ts").alias("day"),
                       F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("value_sum")))


def q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(emb, "vec_id", "embedding", _ann_query_vec(), k=10)


def q_ann_lsh_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.lsh_topk(emb, "vec_id", "embedding", _ann_query_vec(), k=10,
                        n_planes=6, probes=4)


def q_cosine_pairs(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(F.zip_with(F.col("ea").cast("array<double>"),
                                 F.col("eb").cast("array<double>"), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(F.col("ea").cast("array<double>"), lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(F.col("eb").cast("array<double>"), lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return (pairs.withColumn("cosine", F.round(dot / (na * nb), 6))
            .filter(F.col("cosine") >= 0.2).select("id_a", "id_b", "cosine"))


def q_emb_lsh_dups(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.embedding_cosine_dup_pairs(emb, "vec_id", "embedding",
                                          threshold=0.3, n_planes=6)


def q_image_decode_stats(spark, sf_dir):
    """Every 5th image is encoded as REAL baseline JPEG, every 7th as REAL
    progressive JPEG (SOF2 spectral selection + successive approximation,
    operators/jpeg.py), every 11th as REAL lossless WebP (pure-numpy VP8L,
    operators/webp.py), every 13th as REAL GIF (LZW, operators/gif.py),
    every 17th as REAL lossy WebP (VP8 intra frame, RFC 6386,
    operators/vp8.py), and every 19th as REAL lossless JPEG (SOF3
    predictive, T.81 Annex H — r5, predictor rotating 1-7 by row id),
    and every 23rd as REAL sequential-ARITHMETIC JPEG (SOF9, the r5
    from-scratch QM coder — libjpeg-verified two-way) so all seven
    non-trivial decode paths run alongside the PNG/PPM rows."""
    from mapshaper_spark.operators.images import encode_synthetic_bytes
    imgs = L.synth_images(spark, 500)
    imgs = imgs.withColumn(
        "fmt", F.when(F.col("id") % 7 == 2, F.lit("jpeg_progressive"))
               .when(F.col("id") % 5 == 3, F.lit("jpeg"))
               .when(F.col("id") % 11 == 4, F.lit("webp"))
               .when(F.col("id") % 13 == 5, F.lit("gif"))
               .when(F.col("id") % 17 == 6, F.lit("webp_lossy"))
               .when(F.col("id") % 19 == 7, F.lit("jpeg_lossless"))
               .when(F.col("id") % 23 == 8, F.lit("jpeg_arith"))
               .otherwise(F.col("fmt")))
    return IM.decode_stats(encode_synthetic_bytes(imgs))


def q_simplify_vis(spark, sf_dir):
    arcs = _synthetic_arcs(spark, 200)
    with_z, zlimit = SI.simplify(arcs, method="visvalingam", pct=0.5)
    kept = SI.apply_zlimit(with_z, zlimit)
    return kept.select("arc_id", F.col("n").alias("n_kept"))


def q_simplify_wvis(spark, sf_dir):
    """The DEFAULT simplify method (weighted Visvalingam, inverse-cosine
    weighting 0.7) with an exact recursive-CTE oracle (r4 cont.)."""
    arcs = _synthetic_arcs(spark, 150)
    with_z, zlimit = SI.simplify(arcs, method="weighted_visvalingam",
                                 pct=0.4)
    kept = SI.apply_zlimit(with_z, zlimit)
    return kept.select("arc_id", F.col("n").alias("n_kept"))


def q_simplify_dp(spark, sf_dir):
    """DP thresholds + exact global rank threshold; the oracle replays
    procSegment (parent clamp, last-max-index ties) as a recursive CTE —
    verified bit-exact against the kernel."""
    arcs = _synthetic_arcs(spark, 200)
    with_z, zlimit = SI.simplify(arcs, method="dp", pct=0.3)
    kept = SI.apply_zlimit(with_z, zlimit)
    return kept.select("arc_id", F.col("n").alias("n_kept"))


def _synthetic_arcs(spark, n_arcs: int):
    """Deterministic zigzag polylines: arc i has 33 vertices,
    y_j = ((i*31 + j*17) % 13) * 0.25."""
    df = spark.range(0, n_arcs).withColumnRenamed("id", "arc_id")
    j = F.sequence(F.lit(0), F.lit(32))
    xs = F.transform(j, lambda v: v.cast("double"))
    ys = F.transform(j, lambda v: ((F.col("arc_id") * 31 + v * 17) % 13).cast("double") * F.lit(0.25))
    return (df.withColumn("xs", xs).withColumn("ys", ys)
            .withColumn("zs", F.lit(None).cast("array<double>"))
            .withColumn("n", F.size("xs"))
            .withColumn("bbox", F.struct(
                F.lit(0.0).alias("xmin"), F.lit(0.0).alias("ymin"),
                F.lit(32.0).alias("xmax"), F.lit(3.0).alias("ymax"))))


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------

def q_clean(spark, sf_dir):
    """-clean on the reference's overlapping_polygons fixture + a singleton
    + an empty geometry: the contested wedge goes to the larger feature
    (chooseShape weight), identities preserved, empties dropped. The tag
    attribute column rides through untouched (the reference -clean keeps
    the data table)."""
    from mapshaper_spark.operators import overlay as OV
    feats = spark.createDataFrame(
        [(1, "sq", [[0.0, 0.0, 2.0, 2.0, 0.0]], [[0.0, 2.0, 2.0, 0.0, 0.0]]),
         (2, "di", [[1.0, 3.0, 5.0, 3.0, 1.0]], [[1.0, 3.0, 1.0, -1.0, 1.0]]),
         (3, "lone", [[10.0, 10.0, 11.0, 11.0, 10.0]], [[0.0, 1.0, 1.0, 0.0, 0.0]]),
         (4, "empty", None, None)],
        "fid int, tag string, rings_x array<array<double>>, "
        "rings_y array<array<double>>")
    out = OV.clean(feats, "fid")
    areas = P.ring_areas_col(out)
    return areas.select(
        "fid", "tag", F.round(F.aggregate("ring_areas", F.lit(0.0),
                                          lambda a, v: a + v), 6).alias("area"),
        F.size("rings_x").alias("n_rings")).orderBy("fid")


def q_layer_info(spark, sf_dir):
    """-info analog: layer summary row (count, nulls, bbox, fields)."""
    _, _, polys = _mosaic_polys(spark)
    return A.layer_info(polys.select("rid", "state", "pop",
                                     "rings_x", "rings_y", "bbox"), "mosaic")


def q_phash_dups(spark, sf_dir):
    """Image near-dup pairs by perceptual-hash banded hamming (the image
    payload's counterpart of simhash dedup): pure JVM bit ops end to end,
    oracle replicates the banding+hamming in DuckDB bit functions."""
    imgs = L.synth_images(spark, 2000).select("id", "image_id", "phash")
    # plant near-dups: every 100th image carries the previous image's phash
    # with 2 bits flipped (same closed form in the oracle)
    prev_ph = ((F.col("id") - 1) * F.lit(2654435761)) % F.lit(1 << 40)
    imgs = imgs.withColumn(
        "phash", F.when(F.col("id") % 100 == 1,
                        prev_ph.bitwiseXOR(F.lit(3))).otherwise(F.col("phash")))
    return DD.phash_hamming_pairs(imgs.select("image_id", "phash"),
                                  "image_id", "phash",
                                  max_hamming=6, bands=4, bits=40)


def q_each_assign(spark, sf_dir):
    """-each with an assignment-string expression ('a = ..., b = a ...'):
    sequential semantics (later assignments see earlier results),
    getAssignedVars parsing (expressions.js:115-123)."""
    from mapshaper_spark.functions.expressions import each_expr
    li = _t(spark, sf_dir, "lineitem")
    out = each_expr(li, "revenue = round(l_extendedprice * (1 - l_discount), 4), "
                        "big = revenue > 10000")
    return out.select("l_orderkey", "l_linenumber", "revenue", "big")


def q_colorizer_breaks(spark, sf_dir):
    """-colorizer sequential breaks applied to a real column; the oracle is
    the equivalent SQL CASE cascade."""
    from mapshaper_spark.operators.styling import colorizer
    c = colorizer("q_acct_col", ["low", "mid", "high"], breaks=[0, 5000],
                  nodata="none")
    cust = _t(spark, sf_dir, "customer")
    return cust.select("c_custkey",
                       c(F.col("c_acctbal")).alias("color"))


def q_shape_freehand(spark, sf_dir):
    """-shape from coordinates + offsets (mapshaper-shape.js:3-37)."""
    s = G.shape(spark, [0, 0, 4, 0], offsets=[0, 3, -4, 0], closed=True)
    return s.select(
        "name", "geometry_type",
        F.round(F.element_at(F.flatten("rings_x"), -2), 1).alias("last_x"),
        F.size(F.element_at("rings_x", 1)).alias("n_vertices"))


def q_stitch_antimeridian(spark, sf_dir):
    """-stitch: a polygon cut at the antimeridian merges to one ring with
    no seam edge (stitch.js:11-37)."""
    feats = spark.createDataFrame(
        [(1, [[170.0, 170.0, 180.0, 180.0, 170.0],
              [-180.0, -180.0, -170.0, -170.0, -180.0]],
          [[-10.0, 10.0, 10.0, -10.0, -10.0],
           [10.0, -10.0, -10.0, 10.0, 10.0]]),
         (2, [[0.0, 0.0, 10.0, 10.0, 0.0]], [[0.0, 5.0, 5.0, 0.0, 0.0]])],
        "fid int, rings_x array<array<double>>, rings_y array<array<double>>")
    out = P.stitch(feats)
    return out.select("fid", F.size("rings_x").alias("n_rings"),
                      F.size(F.flatten("rings_x")).alias("n_vertices")) \
        .orderBy("fid")


def q_intersection_cuts(spark, sf_dir):
    """Standalone addIntersectionCuts: overlapping squares -> 4 arcs whose
    endpoints include both intersection points."""
    arcs = spark.createDataFrame(
        [(0, [0.0, 0.0, 2.0, 2.0, 0.0], [0.0, 2.0, 2.0, 0.0, 0.0], 5,
          {"xmin": 0.0, "ymin": 0.0, "xmax": 2.0, "ymax": 2.0}),
         (1, [1.0, 1.0, 3.0, 3.0, 1.0], [1.0, 3.0, 3.0, 1.0, 1.0], 5,
          {"xmin": 1.0, "ymin": 1.0, "xmax": 3.0, "ymax": 3.0})],
        "arc_id long, xs array<double>, ys array<double>, n int, "
        "bbox struct<xmin:double,ymin:double,xmax:double,ymax:double>")
    feats = spark.createDataFrame([(10, [[0]]), (20, [[1]])],
                                  "fid int, parts array<array<int>>")
    _f2, a2 = TP.add_intersection_cuts(feats, arcs, "fid")
    return a2.select("arc_id", "n",
                     F.element_at("xs", 1).alias("x0"),
                     F.element_at("ys", 1).alias("y0"),
                     F.element_at("xs", -1).alias("x1"),
                     F.element_at("ys", -1).alias("y1"))


def q_repair_self(spark, sf_dir):
    """repairSelfIntersections (polygon-repair.js:77-116): one twisted quad
    per nation row — ring A(0,0) B(0,2) C(1,2) D(-u,0) with u=(k+1)/50,
    which self-crosses segment AB at X=(0, 2u/(1+u)). The repair keeps the
    larger piece (X,B,C): 4 vertices, area 1/(1+u) — closed-form, so the
    oracle is exact arithmetic over the nation table."""
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("fid"),
        ((F.col("n_nationkey") + 1) / F.lit(50.0)).alias("u"),
        (F.col("n_nationkey").cast("double") * 10).alias("ox"))
    ox, u = F.col("ox"), F.col("u")
    arcs = n.select(
        F.col("fid").cast("long").alias("arc_id"),
        F.array(ox, ox, ox + 1, ox - u, ox).alias("xs"),
        F.array(F.lit(0.0), F.lit(2.0), F.lit(2.0), F.lit(0.0),
                F.lit(0.0)).alias("ys"),
        F.lit(5).alias("n"),
        F.struct((ox - u).alias("xmin"), F.lit(0.0).alias("ymin"),
                 (ox + 1).alias("xmax"), F.lit(2.0).alias("ymax"))
        .alias("bbox"))
    feats = n.select("fid", F.array(F.array(F.col("fid"))).alias("parts"))
    feats2, arcs2 = TP.repair_self_intersections(feats, arcs, "fid")
    # reassemble kept-part stats: vertex count = sum(arc n) - (n_arcs - 1)
    # shared joints; area = |sum of signed shoelace contributions| / 2
    contrib = F.aggregate(
        F.sequence(F.lit(1), F.size("xs") - 1), F.lit(0.0),
        lambda acc, i: acc + F.element_at("xs", i) * F.element_at("ys", i + 1)
        - F.element_at("xs", i + 1) * F.element_at("ys", i))
    info = arcs2.select(F.col("arc_id").alias("aid"), F.col("n").alias("an"),
                        contrib.alias("C"))
    ex = (feats2.select("fid", F.size("parts").alias("n_parts"),
                        F.posexplode("parts").alias("pi", "refs"))
          .filter(F.col("pi") == 0)
          .select("fid", "n_parts", F.size("refs").alias("n_arcs"),
                  F.explode("refs").alias("signed"))
          .withColumn("aid", F.when(F.col("signed") >= 0, F.col("signed"))
                      .otherwise(-F.col("signed") - 1).cast("long"))
          .withColumn("sgn", F.when(F.col("signed") >= 0, F.lit(1.0))
                      .otherwise(F.lit(-1.0))))
    out = (ex.join(info, "aid")
           .groupBy("fid", "n_parts", "n_arcs")
           .agg((F.sum("an") - (F.first("n_arcs") - 1)).alias("n_vertices"),
                F.round(F.abs(F.sum(F.col("sgn") * F.col("C"))) / 2, 5)
                .alias("kept_area")))
    return (out.select("fid", "n_parts",
                       F.col("n_vertices").cast("long").alias("n_vertices"),
                       "kept_area")
            .orderBy("fid"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PIP join of synthetic image footprints against the region
    mosaic + split-on-grid tile assignment + per-(region, tile) counts."""
    return q_flagship_image_tiles(spark, "/root/testdata/sf0.001", n_images=2000)


def q_mosaic_faces(spark, sf_dir):
    """-mosaic (overlay.mosaic, round 3): arrangement faces of 25
    overlapping square pairs (one per nation key; A at [10k,10k+2]^2,
    B shifted +1). Each pair mosaics into exactly 3 faces — the 1x1
    overlap (covered by both inputs) and two area-3 L-shapes — so the
    face set is arithmetic in the fixture and the oracle re-derives
    (xmin, ymin, area, n_members) per face in plain SQL
    (reference: src/commands/mapshaper-mosaic.js -> MosaicIndex)."""
    from mapshaper_spark.operators.overlay import mosaic
    n = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey").cast("double") * 10).alias("x0"))
    feats = (n.select(F.explode(F.array(
        F.struct(F.col("x0").alias("x0"), F.lit(0.0).alias("y0")),
        F.struct((F.col("x0") + 1).alias("x0"), F.lit(1.0).alias("y0"))))
        .alias("s"))
        .select(F.col("s.x0").alias("x0"), F.col("s.y0").alias("y0")))
    x0, y0 = F.col("x0"), F.col("y0")
    sq = feats.select(
        F.concat_ws("_", x0, y0).alias("fid"),
        F.array(F.array(x0, x0, x0 + 2, x0 + 2, x0)).alias("rings_x"),
        F.array(F.array(y0, y0 + 2, y0 + 2, y0, y0)).alias("rings_y"))
    faces = mosaic(sq, key="fid")
    return faces.select(
        F.round(F.array_min(F.transform("rings_x", F.array_min)), 6).alias("xmin"),
        F.round(F.array_min(F.transform("rings_y", F.array_min)), 6).alias("ymin"),
        F.round("area", 6).alias("area"),
        F.col("n_members"))


def q_slice_layer(spark, sf_dir):
    """-slice source= (overlay.slice_polygons, round 3): 25 nation squares
    [2k+1, 2k+3] x [0, 2] sliced by an aligned 2-unit polygon grid — each
    square straddles exactly two cells (area 2 each); the row above is
    tangent and must contribute nothing (the tangency contract of the
    overlay kernel). Oracle: two arithmetic rows per nation."""
    from mapshaper_spark.operators.overlay import slice_polygons
    n = _t(spark, sf_dir, "nation").select("n_nationkey")
    x0 = F.col("n_nationkey").cast("double") * 2 + 1
    sq = n.select(
        F.col("n_nationkey").alias("fid"),
        F.array(F.array(x0, x0, x0 + 2, x0 + 2, x0)).alias("rings_x"),
        F.array(F.array(F.lit(0.0), F.lit(2.0), F.lit(2.0), F.lit(0.0),
                        F.lit(0.0))).alias("rings_y"))
    grid = G.polygon_grid(spark, 27, 3, (-1.0, -1.0, 53.0, 5.0))
    out = slice_polygons(sq, grid, id_field="cell_id", key="fid")
    areas = P.ring_areas_col(out)
    return areas.select(
        "fid", "slice_id",
        F.round(F.aggregate("ring_areas", F.lit(0.0), lambda a, v: a + v),
                6).alias("area"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict order matters: the driver's correctness gate covers the FIRST
    50 entries, so the riskiest / newest operator families (overlay clip,
    dissolve2, simplify, the LLM-pipeline ops) sit inside that window;
    trivial attribute ops rotate to the tail (VERDICT r01 item 5)."""
    return {
        # spatial join + tiling core
        "flagship_image_tiles": q_flagship_image_tiles,
        "pip_all_pairs": q_pip_all_pairs,
        "pip_first_match": q_pip_first_match,
        "region_point_stats": q_region_point_stats,
        # r4: knn_nearest rotates below the window after three green rounds
        # (knn_k3/knn_unbounded keep the family in-window); svg_export takes
        # the slot — a byte-exact reference-golden document oracle
        "svg_export": q_svg_export,
        "knn_k3": q_knn_k3,
        # r4 late: minhash_sigs rotates IN (exact signature oracle, new);
        # split_on_grid rotates out after three green rounds
        "minhash_sigs": q_minhash_sigs,
        # overlay family (newly distributed this round)
        "mosaic_faces": q_mosaic_faces,
        "slice_layer": q_slice_layer,
        "slice_grid": q_slice_grid,
        "clip_diamond": q_clip_diamond,
        "clip_polygons": q_clip_polygons,
        "dissolve2": q_dissolve2,
        "dissolve2_gaps": q_dissolve2_gaps,
        # topology family
        "topology_build": q_topology_build,
        "polygons_from_lines": q_polygons_from_lines,
        # r5 late rotation: segment_intersections + innerlines (driver-
        # green 4 rounds) move below the boundary; the two brand-new
        # r5 queries take the slots (never driver-hashed)
        "csv_empty_cells": q_csv_empty_cells,
        # r4 late: simhash_sigs rotates IN (exact oracle, new);
        # polyline_dissolve rotates out after three green rounds
        "simhash_sigs": q_simhash_sigs,
        "proj_wintri": q_proj_wintri,  # new r4: rotated in (dissolve_states
        # out — driver-green since r1, still covered by check_oracle)
        "ndjson_roundtrip": q_ndjson_roundtrip,
        "each_regex": q_each_regex,  # new r4: rotated in (neighbors out —
        # driver-green since r1, still covered by check_oracle)
        "each_js": q_each_js,  # new r4: JS-interpreter fallback engine
        # path / ring ops (+ CLI end-to-end, late r3)
        "cli_pipeline": q_cli_pipeline,
        # r5 rotation (VERDICT r04 #10): long-stable rows green 3+ rounds
        # (filter_islands, filter_slivers, ring_repair, close_gaps,
        # snap_sweep, data_fill, lines, proj_albersusa) rotate below the
        # boundary; never-driver-hashed exact oracles rotate in
        # (ann_lsh_topk, ann_ivf_topk, emb_lsh_dups, word_jaccard,
        # dedup_exact, simplify_dp, simplify_spherical, and
        # image_decode_stats — newly exact via the r5 golden parquet).
        # Everything stays covered by tools/check_oracle.py.
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "emb_lsh_dups": q_emb_lsh_dups,
        "word_jaccard": q_word_jaccard,
        "dedup_exact": q_dedup_exact,
        "simplify_dp": q_simplify_dp,
        "simplify_spherical": q_simplify_spherical,
        "image_decode_stats": q_image_decode_stats,
        "clean": q_clean,
        # round-3 operators with NEW exact oracles sit inside the window
        "cluster": q_cluster,
        "fast_simplify": q_fast_simplify,
        # geometry expressions / proj / simplify
        "proj_lcc": q_proj_lcc,
        # late-r4 projection tail: the two newest exact proj oracles sit
        # inside the window (text_metrics/dedup_exact rotate out after
        # multiple green rounds; check_oracle.py still covers them)
        "proj_tpeqd": q_proj_tpeqd,
        "proj_healpix": q_proj_healpix,
        "proj_qsc": q_proj_qsc,
        # LLM-data-pipeline family
        "ann_topk": q_ann_topk,
        # media codec queries (operators/media.py, late r3)
        "audio_features_wav": q_audio_features_wav,
        "video_frames_mjpeg": q_video_frames_mjpeg,
        # rotated INTO the window r4 (VERDICT r03 #10: never driver-hashed
        # before; join variants / point clip / filter_geom_paths rotate out
        # after three green rounds — all still covered by check_oracle.py)
        "cli_pipeline2": q_cli_pipeline2,
        "dedup_clusters": q_dedup_clusters,
        "cosine_pairs": q_cosine_pairs,
        "video_frame_sample": q_video_frame_sample,
        "audio_features": q_audio_features,
        "stitch_antimeridian": q_stitch_antimeridian,
        "intersection_cuts": q_intersection_cuts,
        # r4 late: subdivide + simplify_dp rotate IN on gaining exact
        # oracles; knn_unbounded + erase_diamond rotate out after three
        # green rounds (family representatives knn_k3 / clip_diamond stay)
        "subdivide": q_subdivide,
        # r4 cont.: simplify_wvis (the DEFAULT simplify method, brand-new
        # exact oracle) takes the #50 slot; simplify_dp (driver-green this
        # round) rotates just below, still check_oracle-covered
        "simplify_wvis": q_simplify_wvis,
        # ---- entry #50 boundary: below here = not driver-hash-checked ----
        # (rotated out r3 after two green rounds: area_expr, spherical_area,
        # calc_aggs, events_rollup, dissolve_customers_by_nation, and —
        # late r3, for the media codec slots — word_jaccard, ngram_jaccard;
        # r4: proj_sinu rotates out (green r2+r3; proj family keeps two
        # in-window representatives) so intersection_cuts fits at #50;
        # knn_nearest rotates out for svg_export after three green rounds;
        # all still oracle-checked by tools/check_oracle.py)
        "split_on_grid": q_split_on_grid,
        "filter_islands": q_filter_islands,
        "filter_slivers": q_filter_slivers,
        "ring_repair": q_ring_repair,
        "close_gaps": q_close_gaps,
        "snap_sweep": q_snap_sweep,
        "data_fill": q_data_fill,
        "lines": q_lines,
        "proj_albersusa": q_proj_albersusa,
        "polyline_dissolve": q_polyline_dissolve,
        "join_first_match": q_join_first_match,
        "knn_unbounded": q_knn_unbounded,
        "erase_diamond": q_erase_diamond,
        "text_metrics": q_text_metrics,
        "repair_self": q_repair_self,
        "proj_sinu": q_proj_sinu,
        "knn_nearest": q_knn_nearest,
        "ngram_jaccard": q_ngram_jaccard,
        "join_calc": q_join_calc,
        "join_is_max": q_join_is_max,
        "join_unjoined": q_join_unjoined,
        "join_unmatched": q_join_unmatched,
        "clip_points": q_clip_points,
        "erase_points": q_erase_points,
        "filter_geom_paths": q_filter_geom_paths,
        "points_centroid": q_points_centroid,
        "points_inner": q_points_inner,
        "proj_webmercator": q_proj_webmercator,
        "proj_utm": q_proj_utm,
        "segment_intersections": q_segment_intersections,
        "innerlines": q_innerlines,
        "dissolve_states": q_dissolve_states,
        "neighbors": q_neighbors,
        "explode_parts": q_explode_parts,
        "area_expr": q_area_expr,
        "spherical_area": q_spherical_area,
        "calc_aggs": q_calc_aggs,
        "events_rollup": q_events_rollup,
        "dissolve_customers_by_nation": q_dissolve_customers_by_nation,
        "points_vertices": q_points_vertices,
        "points_interpolated": q_points_interpolated,
        "clip_bbox_lines": q_clip_bbox_lines,
        "dedup_coords": q_dedup_coords,
        "filter_geom_bbox": q_filter_geom_bbox,
        "minhash_dups": q_minhash_dups,
        "simhash_dups": q_simhash_dups,
        "simplify_vis": q_simplify_vis,
        "filter_where": q_filter_where,
        "project_fields": q_project_fields,
        "rename_fields": q_rename_fields,
        "each_derive": q_each_derive,
        "each_where": q_each_where,
        "filter_remove_empty": q_filter_remove_empty,
        "uniq_first_order": q_uniq_first_order,
        "sort_top100": q_sort_top100,
        "merge_layers": q_merge_layers,
        "top3_per_order": q_top3_per_order,
        "point_grid": q_point_grid,
        "polygon_grid": q_polygon_grid,
        "affine": q_affine,
        "round_precision": q_round_precision,
        "graticule": q_graticule,
        # round-2 operators (oracle-checked via tools/check_oracle.py; the
        # driver gate window is already full of the riskier families)
        "each_assign": q_each_assign,
        "phash_dups": q_phash_dups,
        "layer_info": q_layer_info,
        "colorizer_breaks": q_colorizer_breaks,
        "shape_freehand": q_shape_freehand,
    }


_ALBERSUSA_POINTS = [
    ("ks", -96.0, 40.0), ("nyc", -74.006, 40.7128), ("sf", -122.42, 37.77),
    ("miami", -80.19, 25.77), ("seattle", -122.33, 47.6),
    ("anchorage", -149.9, 61.22), ("fairbanks", -147.72, 64.84),
    ("juneau", -134.42, 58.3), ("honolulu", -157.858, 21.307),
    ("hilo", -155.09, 19.72), ("kauai", -159.5, 22.05)]


def _albersusa_oracle_sql(ndigits: int = 3) -> str:
    """SQL re-derivation of the albersusa composite from first principles:
    the Snyder AEA/LCC 2SP formulas (USGS PP 1395 eq. 14-x / 15-x) and the
    reference's Matrix2D frame replay (mapshaper-mixed-projection.js) are
    all recomputed numerically by DuckDB — no constants copied from the
    Python implementation."""
    D2R = "(pi()/180.0)"

    def msfn(latdeg):
        p = f"({latdeg}*{D2R})"
        return f"(cos({p})/sqrt(1-es*sin({p})*sin({p})))"

    def qsfn(latdeg):
        s = f"sin({latdeg}*{D2R})"
        return (f"((1-es)*({s}/(1-es*{s}*{s})"
                f" - (0.5/e)*ln((1-e*{s})/(1+e*{s}))))")

    def tsfn(latdeg):
        p = f"({latdeg}*{D2R})"
        return (f"(tan(0.5*(pi()/2 - {p}))"
                f"/power((1-e*sin({p}))/(1+e*sin({p})), 0.5*e))")

    vals = ",\n            ".join(f"('{n}', {lon!r}, {lat!r})"
                                  for n, lon, lat in _ALBERSUSA_POINTS)
    return f"""
        WITH k AS (
          SELECT 6378137.0 AS a, 0.0066943799901413165 AS es,
                 sqrt(0.0066943799901413165) AS e
        ),
        ka AS (
          SELECT *, {msfn('29.5')} AS m1a, {msfn('45.5')} AS m2a,
                 {qsfn('29.5')} AS q1a, {qsfn('45.5')} AS q2a,
                 {qsfn('37.5')} AS q0a
          FROM k),
        ka2 AS (SELECT *, (m1a*m1a - m2a*m2a)/(q2a - q1a) AS an FROM ka),
        ka3 AS (SELECT *, m1a*m1a + an*q1a AS ac FROM ka2),
        ka4 AS (SELECT *, a*sqrt(ac - an*q0a)/an AS arho0 FROM ka3),
        kl AS (
          SELECT *, {msfn('33.0')} AS m1l, {msfn('45.0')} AS m2l,
                 {tsfn('33.0')} AS t1l, {tsfn('45.0')} AS t2l,
                 {tsfn('39.0')} AS t0l
          FROM ka4),
        kl2 AS (SELECT *, (ln(m1l) - ln(m2l))/(ln(t1l) - ln(t2l)) AS nl FROM kl),
        kl3 AS (SELECT *, m1l/(nl*power(t1l, nl)) AS fl FROM kl2),
        c AS (SELECT *, a*fl*power(t0l, nl) AS lrho0 FROM kl3),
        pts(city, lon, lat) AS (VALUES
            {vals}),
        b1 AS (SELECT p.city, p.lon, p.lat, {qsfn('p.lat')} AS qv
               FROM pts p, c),
        b2 AS (SELECT b1.*, a*sqrt(ac - an*qv)/an AS rho,
                      an*(lon + 96.0)*{D2R} AS th FROM b1, c),
        base AS (SELECT b2.city, b2.lon, b2.lat,
                        rho*sin(th)/a AS bx, (arho0 - rho*cos(th))/a AS by
                 FROM b2, c),
        f0(fi, c1lon, c1lat, c2lon, c2lat, fw, fh, s, rot) AS (VALUES
            (0, -152.0, 63.0, -115.0, 27.0, 6000000.0, 3000000.0, 0.31, 29.2),
            (1, -157.0, 20.9, -106.6, 28.2, 3000000.0, 5000000.0, 0.9, 40.0)),
        f1 AS (SELECT f.*, {qsfn('f.c1lat')} AS q1v,
                      {qsfn('f.c2lat')} AS q2v FROM f0 f, c),
        f2 AS (SELECT f1.*, a*sqrt(ac - an*q1v)/an AS rho1,
                      an*(c1lon + 96.0)*{D2R} AS th1,
                      a*sqrt(ac - an*q2v)/an AS rho2,
                      an*(c2lon + 96.0)*{D2R} AS th2
               FROM f1, c),
        f3 AS (SELECT f2.*, rho1*sin(th1)/a AS x1, (arho0 - rho1*cos(th1))/a AS y1,
                      rho2*sin(th2)/a AS x2, (arho0 - rho2*cos(th2))/a AS y2,
                      cos(rot*{D2R}) AS cr, sin(rot*{D2R}) AS sr
               FROM f2, c),
        f4 AS (SELECT f3.*, s*cr AS ma, -s*sr AS mc, s*sr AS mb, s*cr AS md,
                      x1 - x1*cr + y1*sr AS tx0, y1 - x1*sr - y1*cr AS ty0
               FROM f3),
        f5 AS (SELECT fi, ma, mb, mc, md,
                      tx0 + x2 - (x1*ma + y1*mc + tx0) AS tx,
                      ty0 + y2 - (x1*mb + y1*md + ty0) AS ty,
                      x1 - fw/(2*a) AS bxmin, x1 + fw/(2*a) AS bxmax,
                      y1 - fh/(2*a) AS bymin, y1 + fh/(2*a) AS bymax
               FROM f4, c),
        hit AS (SELECT b.city, min(f.fi) AS fi
                FROM base b JOIN f5 f
                  ON b.bx >= f.bxmin AND b.bx <= f.bxmax
                 AND b.by >= f.bymin AND b.by <= f.bymax
                GROUP BY b.city),
        l1 AS (SELECT b.city, f.ma, f.mb, f.mc, f.md, f.tx, f.ty,
                      a*fl*power({tsfn('b.lat')}, nl) AS rho,
                      nl*(b.lon + 96.0)*{D2R} AS th
               FROM base b
               JOIN hit h ON b.city = h.city
               JOIN f5 f ON f.fi = h.fi, c),
        l2 AS (SELECT l1.*, rho*sin(th)/a AS lx, (lrho0 - rho*cos(th))/a AS ly
               FROM l1, c),
        framed AS (SELECT l2.city, (lx*ma + ly*mc + tx)*a AS x,
                          (lx*mb + ly*md + ty)*a AS y FROM l2, c)
        SELECT b.city,
               round(coalesce(fr.x, b.bx*(SELECT a FROM k)), {ndigits}) AS x,
               round(coalesce(fr.y, b.by*(SELECT a FROM k)), {ndigits}) AS y
        FROM base b LEFT JOIN framed fr ON b.city = fr.city
    """


def _cluster_oracle_sql(count: int = 8, iterations: int = 8,
                        cap: int = 10_000) -> str:
    """SQL replay of operators/cluster.py cluster_points: same bounded
    (x, y)-sorted sample, same evenly-spaced seeding, ``iterations``
    unrolled Lloyd rounds with centers rounded to 9 dp (an emptied
    cluster keeps its previous center), ties broken by lowest cluster id
    at every stage, final nearest-center assignment over the full table.
    Converged rounds are fixed points, so the Spark side's early exit
    lands on the same centers as the fixed unroll."""
    parts = [f"""
        WITH pts AS (
            SELECT c_custkey AS id,
                   -120.0 + (c_custkey % 1000) / 1000.0 * 60.0 AS x,
                   25.0 + ((c_custkey * 7) % 1000) / 1000.0 * 24.0 AS y
            FROM customer),
        samp AS (SELECT x, y FROM pts ORDER BY x, y LIMIT {cap}),
        idx AS (SELECT x, y, row_number() OVER (ORDER BY x, y) - 1 AS rn
                FROM samp),
        prm AS (SELECT greatest(1, count(*) // {count}) AS step FROM samp),
        c0 AS (SELECT CAST(rn // step AS INT) AS cid, x AS cx, y AS cy
               FROM idx, prm WHERE rn % step = 0 AND rn // step < {count})"""]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f""",
        a{i} AS (SELECT rn, x, y, cid FROM (
            SELECT i.rn, i.x, i.y, c.cid,
                   row_number() OVER (PARTITION BY i.rn
                       ORDER BY (i.x - c.cx) * (i.x - c.cx)
                              + (i.y - c.cy) * (i.y - c.cy), c.cid) AS rnk
            FROM idx i CROSS JOIN c{p} c) WHERE rnk = 1),
        c{i} AS (SELECT s.cid,
                        coalesce(round(n.mx, 9), s.cx) AS cx,
                        coalesce(round(n.my, 9), s.cy) AS cy
                 FROM c{p} s LEFT JOIN (
                     SELECT cid, avg(x) AS mx, avg(y) AS my
                     FROM a{i} GROUP BY cid) n USING (cid))""")
    parts.append(f"""
        SELECT id AS c_custkey, cid AS cluster FROM (
            SELECT p.id, c.cid,
                   row_number() OVER (PARTITION BY p.id
                       ORDER BY (p.x - c.cx) * (p.x - c.cx)
                              + (p.y - c.cy) * (p.y - c.cy), c.cid) AS rnk
            FROM pts p CROSS JOIN c{iterations} c) WHERE rnk = 1""")
    return "".join(parts)


def oracle_sql() -> dict[str, str]:
    qvec = _ann_query_vec()
    qnorm = float(np.sqrt(sum(v * v for v in qvec)))
    qvals = ", ".join(f"({j}, {v!r}::DOUBLE)" for j, v in enumerate(qvec))

    sqls: dict[str, str] = {}

    # exact golden oracle for image_decode_stats (r5): the corpus is
    # sf-independent (deterministic synth_images(500) + seed-free
    # encoders), decoded ONCE at fixture-build time
    # (tools/make_image_decode_golden.py) and pinned as parquet; codec
    # correctness is separately established by libpng/libwebp byte-interop
    # + PSNR tests. DuckDB replays the golden, catching any regression in
    # the decode/stat pipeline.
    import os as _os
    _golden = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            "tests", "fixtures",
                            "image_decode_stats_golden.parquet")
    if _os.path.exists(_golden):
        sqls["image_decode_stats"] = (
            "SELECT image_id, dec_w, dec_h, mean_r, mean_g, mean_b, ahash "
            f"FROM read_parquet('{_golden}')")

    # exact dedup-signature oracles (r4): the minhash/simhash pipelines are
    # replayed value-for-value in DuckDB — codepoint polynomial token hash
    # via list_reduce over HUGEINT, shingle fold, affine permutations with
    # the SAME RandomState(42) constants inlined below
    _M61 = "2305843009213693951"
    _rng = np.random.RandomState(42)
    _A = _rng.randint(1, (1 << 61) - 1, size=16, dtype=np.uint64)
    _B = _rng.randint(0, (1 << 61) - 1, size=16, dtype=np.uint64)
    _perms = ", ".join(f"({i}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
                       for i, (a, b) in enumerate(zip(_A, _B)))
    _tok_cte = f"""
        toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text,''), '\\s+'),
                             t -> t <> '') AS tk
          FROM documents
        ), thash AS (
          SELECT doc_id, list_transform(tk, t ->
              list_reduce(list_prepend(0::HUGEINT,
                  list_transform(range(1, length(t) + 1),
                                 i -> unicode(substr(t, i, 1))::HUGEINT)),
                (a, c) -> (a * 131 + c) % {_M61})) AS h
          FROM toks
        )"""
    sqls["minhash_sigs"] = f"""
        WITH {_tok_cte},
        padded AS (
          SELECT doc_id, CASE WHEN len(h) < 3
                 THEN list_concat(h, list_transform(range(3 - len(h)),
                                                    i -> 0::HUGEINT))
                 ELSE h END AS h
          FROM thash
        ), sh AS (
          SELECT doc_id, unnest(list_transform(range(1, len(h) - 1),
              j -> ((h[j] * 1000003 + h[j+1]) * 1000003 + h[j+2]) % {_M61}
              )) AS sv
          FROM padded
        ), perms(perm, a, b) AS (VALUES {_perms})
        SELECT sh.doc_id AS doc_id, perms.perm AS perm,
               CAST(min((perms.a * sh.sv + perms.b) % {_M61}) AS BIGINT)
                   AS sigval
        FROM sh, perms GROUP BY sh.doc_id, perms.perm
    """
    sqls["simhash_sigs"] = f"""
        WITH {_tok_cte},
        tb AS (
          SELECT doc_id, CAST(unnest(h) AS BIGINT) AS hv FROM thash
        ), bits AS (
          SELECT doc_id, r.range AS bit,
                 sum(CASE WHEN (hv >> r.range) & 1 = 1 THEN 1 ELSE -1 END)
                     AS v
          FROM tb, range(61) r GROUP BY doc_id, r.range
        ), sim AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit)
                          ELSE 0 END) AS BIGINT) AS simhash
          FROM bits GROUP BY doc_id
        )
        SELECT d.doc_id AS doc_id, coalesce(sim.simhash, 0) AS simhash
        FROM documents d LEFT JOIN sim USING (doc_id)
    """


    # exact Visvalingam oracle (r4 cont.): the min-heap removal loop
    # (smallest effective area, ties -> smallest index, monotonic clamp,
    # scaledSimplify sqrt*0.65) replayed per arc as a recursive CTE over a
    # compact alive-list state; same exact-rank threshold as simplify_dp
    sqls["simplify_vis"] = """
        WITH RECURSIVE f AS (
          SELECT arc_id,
                 list_transform(range(0, 33), j -> j) AS alive,
                 list_transform(range(0, 33), j ->
                     CASE WHEN j = 0 OR j = 32 THEN 'infinity'::DOUBLE
                          ELSE abs((((CAST((arc_id*31 + ((j-1))*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + ((j+1))*17) % 13 AS DOUBLE) * 0.25)) * (CAST(j AS DOUBLE) - CAST((j+1) AS DOUBLE)) + ((CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + ((j+1))*17) % 13 AS DOUBLE) * 0.25)) * (CAST((j+1) AS DOUBLE) - CAST((j-1) AS DOUBLE))) / 2.0) END) AS kka,
                 '-infinity'::DOUBLE AS maxv,
                 CAST(NULL AS BIGINT) AS rem, CAST(NULL AS DOUBLE) AS z
          FROM range(0, 200) t(arc_id)
          UNION ALL
          SELECT arc_id, new_alive,
                 list_transform(range(1, len(new_alive) + 1), q ->
                     CASE WHEN q = 1 OR q = CAST(len(new_alive) AS BIGINT)
                          THEN 'infinity'::DOUBLE
                          WHEN q = p - 1 OR q = p THEN
                            abs((((CAST((arc_id*31 + (new_alive[q-1])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q+1])*17) % 13 AS DOUBLE) * 0.25)) * (CAST(new_alive[q] AS DOUBLE) - CAST(new_alive[q+1] AS DOUBLE)) + ((CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q+1])*17) % 13 AS DOUBLE) * 0.25)) * (CAST(new_alive[q+1] AS DOUBLE) - CAST(new_alive[q-1] AS DOUBLE))) / 2.0)
                          ELSE kka[CASE WHEN q < p THEN q ELSE q + 1 END]
                     END) AS kka,
                 z AS maxv, rem, z
          FROM (
            SELECT arc_id, alive, kka, maxv,
                   list_position(kka, m) AS p,
                   alive[list_position(kka, m)] AS rem,
                   CASE WHEN m < maxv THEN maxv ELSE m END AS z,
                   list_concat(
                       list_slice(alive, 1, list_position(kka, m) - 1),
                       list_slice(alive, list_position(kka, m) + 1,
                                  len(alive))) AS new_alive
            FROM (SELECT arc_id, alive, kka, maxv,
                         list_min(list_slice(kka, 2, len(kka) - 1)) AS m
                  FROM f WHERE len(alive) > 2) s
          ) g
        ),
        zvals AS (SELECT arc_id, sqrt(z) * 0.65 AS z FROM f
                  WHERE rem IS NOT NULL),
        lim AS (
          SELECT z AS zlimit FROM zvals ORDER BY z
          LIMIT 1 OFFSET (SELECT CAST(floor(0.5 * (count(*) + 2)) AS BIGINT)
                          - 1 FROM zvals)
        )
        SELECT arc_id,
               CAST(2 + count(*) FILTER (WHERE z >= (SELECT zlimit FROM lim))
               AS INT) AS n_kept
        FROM zvals GROUP BY arc_id
    """


    # hyperplane-LSH exact oracles (r4 cont.): the RandomState(42) plane
    # matrix is inlined; bucket signs + candidate sets + cosine rerank
    # replayed fully in SQL. (Sign sums are far from 0 on this
    # deterministic dataset, so unordered SQL summation cannot flip a
    # bucket bit — verified value-exact against the Spark path.)
    _planes = np.random.RandomState(42).normal(size=(6, len(qvec)))
    _pv = ", ".join(f"({j}, {i}, {_planes[j, i]!r}::DOUBLE)"
                    for j in range(6) for i in range(len(qvec)))
    _qsig = int(np.sum(((_planes @ np.asarray(qvec)) > 0) *
                       (1 << np.arange(6, dtype=np.int64))))
    _buckets = ", ".join(str(b) for b in
                         ([_qsig] + [_qsig ^ (1 << b) for b in range(6)])[:5])
    _lsh_cte = f"""
        p(j, i, c) AS (VALUES {_pv}),
        e AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
                     generate_subscripts(embedding, 1) - 1 AS i
              FROM embeddings),
        dots AS (SELECT e.vec_id, p.j, sum(e.v * p.c) AS d
                 FROM e JOIN p ON e.i = p.i GROUP BY e.vec_id, p.j),
        bk AS (SELECT vec_id,
                      sum(CASE WHEN d > 0 THEN (1::BIGINT << j) ELSE 0 END)
                          AS bucket
               FROM dots GROUP BY vec_id)"""
    sqls["ann_lsh_topk"] = f"""
        WITH {_lsh_cte},
        q(i, qv) AS (VALUES {qvals}),
        cand AS (SELECT vec_id FROM bk WHERE bucket IN ({_buckets})),
        s AS (SELECT e.vec_id,
                     round(sum(e.v * q.qv) / (sqrt(sum(e.v * e.v)) *
                           {qnorm!r}), 6) AS score
              FROM e JOIN q ON e.i = q.i
              WHERE e.vec_id IN (SELECT vec_id FROM cand)
              GROUP BY e.vec_id)
        SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10
    """
    sqls["emb_lsh_dups"] = f"""
        WITH {_lsh_cte},
        pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
               FROM bk a JOIN bk b ON a.bucket = b.bucket
                                  AND a.vec_id < b.vec_id),
        dt AS (SELECT pr.id_a, pr.id_b, sum(ea.v * eb.v) AS dot,
                      sqrt(sum(ea.v * ea.v)) AS na,
                      sqrt(sum(eb.v * eb.v)) AS nb
               FROM pr JOIN e ea ON ea.vec_id = pr.id_a
                       JOIN e eb ON eb.vec_id = pr.id_b AND ea.i = eb.i
               GROUP BY pr.id_a, pr.id_b)
        SELECT id_a, id_b, round(dot / (na * nb), 6) AS cosine
        FROM dt WHERE round(dot / (na * nb), 6) >= 0.3
    """


    # pair-level exact oracles for the minhash/simhash DUP queries
    # (r4 cont.): banding by exact band tuples (Spark buckets by xxhash64
    # of the same tuples — equal tuples bucket together either way), then
    # the same exact-Jaccard / hamming verification in SQL
    _rng64 = np.random.RandomState(42)
    _A64 = _rng64.randint(1, (1 << 61) - 1, size=64, dtype=np.uint64)
    _B64 = _rng64.randint(0, (1 << 61) - 1, size=64, dtype=np.uint64)
    _perms64 = ", ".join(f"({i}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
                         for i, (a, b) in enumerate(zip(_A64, _B64)))
    _tok250 = f"""
        toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text,''), '\\s+'),
                             t -> t <> '') AS tk
          FROM documents WHERE doc_id < 250
        ), thash AS (
          SELECT doc_id, list_transform(tk, t ->
              list_reduce(list_prepend(0::HUGEINT,
                  list_transform(range(1, length(t) + 1),
                                 i -> unicode(substr(t, i, 1))::HUGEINT)),
                (a, c) -> (a * 131 + c) % {_M61})) AS h
          FROM toks
        )"""
    sqls["minhash_dups"] = f"""
        WITH {_tok250},
        padded AS (
          SELECT doc_id, CASE WHEN len(h) < 3
                 THEN list_concat(h, list_transform(range(3 - len(h)),
                                                    i -> 0::HUGEINT))
                 ELSE h END AS h
          FROM thash
        ), shl AS (
          SELECT doc_id, list_transform(range(1, len(h) - 1),
              j -> ((h[j] * 1000003 + h[j+1]) * 1000003 + h[j+2]) % {_M61}
              ) AS s
          FROM padded
        ), shu AS (SELECT doc_id, unnest(list_distinct(s)) AS sv FROM shl),
        sizes AS (SELECT doc_id, len(list_distinct(s)) AS nsh FROM shl),
        perms(perm, a, b) AS (VALUES {_perms64}),
        sig AS (
          SELECT q.doc_id, perms.perm,
                 min((perms.a * q.sv2 + perms.b) % {_M61}) AS m
          FROM (SELECT doc_id, unnest(s) AS sv2 FROM shl) q, perms
          GROUP BY q.doc_id, perms.perm
        ), bands AS (
          SELECT doc_id, band, list(m ORDER BY perm) AS tup
          FROM (SELECT doc_id, perm, m, perm // 4 AS band FROM sig) t
          GROUP BY doc_id, band
        ), sized AS (
          SELECT doc_id, band, tup,
                 count(*) OVER (PARTITION BY band, tup) AS bsz
          FROM bands
        ), keptb AS (SELECT * FROM sized WHERE bsz <= 1000),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM keptb a JOIN keptb b ON a.band = b.band AND a.tup = b.tup
                                    AND a.doc_id < b.doc_id
        ), inter AS (
          SELECT c.id_a, c.id_b, count(*) AS ni
          FROM cand c JOIN shu x ON x.doc_id = c.id_a
                      JOIN shu y ON y.doc_id = c.id_b AND y.sv = x.sv
          GROUP BY c.id_a, c.id_b
        ), jac AS (
          SELECT c.id_a, c.id_b,
                 round(coalesce(i.ni, 0)::DOUBLE /
                       (sa.nsh + sb.nsh - coalesce(i.ni, 0)), 6) AS jaccard
          FROM cand c LEFT JOIN inter i ON i.id_a = c.id_a
                                       AND i.id_b = c.id_b
               JOIN sizes sa ON sa.doc_id = c.id_a
               JOIN sizes sb ON sb.doc_id = c.id_b
        )
        SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5
    """
    sqls["simhash_dups"] = f"""
        WITH {_tok250},
        th AS (SELECT doc_id, CAST(unnest(h) AS BIGINT) AS hv FROM thash),
        bits AS (
          SELECT doc_id, r.range AS bit,
                 sum(CASE WHEN (hv >> r.range) & 1 = 1 THEN 1 ELSE -1 END)
                     AS v
          FROM th, range(61) r GROUP BY doc_id, r.range
        ), sim0 AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit)
                          ELSE 0 END) AS BIGINT) AS simhash
          FROM bits GROUP BY doc_id
        ), sim AS (
          SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
          FROM (SELECT doc_id FROM documents WHERE doc_id < 250) d
          LEFT JOIN sim0 s USING (doc_id)
        ), ch AS (
          SELECT doc_id, simhash, b.range AS band,
                 (simhash >> (b.range * 16)) & 65535 AS chunk
          FROM sim, range(4) b
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                          a.simhash AS sa, b.simhash AS sb
          FROM ch a JOIN ch b ON a.band = b.band AND a.chunk = b.chunk
                              AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 8
    """


    # exact SPHERICAL Visvalingam oracle (r4 cont.): same recursive removal
    # loop as simplify_vis with the 3D triangle-area metric over
    # lngLatToXYZ coordinates (triangleArea3D det-sum form); DuckDB's
    # cos/sin agree with numpy's on this deterministic grid, verified
    # value-exact
    sqls["simplify_spherical"] = """
WITH RECURSIVE base AS (
  SELECT arc_id,
         list_transform(range(0, 33), j -> cos(radians(CAST(j AS DOUBLE))) * cos(radians((CAST((arc_id*31 + j*17) % 13 AS DOUBLE) * 0.25))) * 6378137.0) AS xx,
         list_transform(range(0, 33), j -> sin(radians(CAST(j AS DOUBLE))) * cos(radians((CAST((arc_id*31 + j*17) % 13 AS DOUBLE) * 0.25))) * 6378137.0) AS yy,
         list_transform(range(0, 33), j -> sin(radians((CAST((arc_id*31 + j*17) % 13 AS DOUBLE) * 0.25))) * 6378137.0) AS zz
  FROM range(0, 100) t(arc_id)
), f AS (
  SELECT arc_id, xx, yy, zz,
         list_transform(range(0, 33), j -> j) AS alive,
         list_transform(range(0, 33), j ->
             CASE WHEN j = 0 OR j = 32 THEN 'infinity'::DOUBLE
                  ELSE (0.5 * sqrt(((xx[((j-1))+1]*yy[(j)+1] - xx[((j-1))+1]*yy[((j+1))+1] + xx[(j)+1]*yy[((j+1))+1] - xx[(j)+1]*yy[((j-1))+1] + xx[((j+1))+1]*yy[((j-1))+1] - xx[((j+1))+1]*yy[(j)+1]) * (xx[((j-1))+1]*yy[(j)+1] - xx[((j-1))+1]*yy[((j+1))+1] + xx[(j)+1]*yy[((j+1))+1] - xx[(j)+1]*yy[((j-1))+1] + xx[((j+1))+1]*yy[((j-1))+1] - xx[((j+1))+1]*yy[(j)+1])) + ((xx[((j-1))+1]*zz[(j)+1] - xx[((j-1))+1]*zz[((j+1))+1] + xx[(j)+1]*zz[((j+1))+1] - xx[(j)+1]*zz[((j-1))+1] + xx[((j+1))+1]*zz[((j-1))+1] - xx[((j+1))+1]*zz[(j)+1]) * (xx[((j-1))+1]*zz[(j)+1] - xx[((j-1))+1]*zz[((j+1))+1] + xx[(j)+1]*zz[((j+1))+1] - xx[(j)+1]*zz[((j-1))+1] + xx[((j+1))+1]*zz[((j-1))+1] - xx[((j+1))+1]*zz[(j)+1])) + ((yy[((j-1))+1]*zz[(j)+1] - yy[((j-1))+1]*zz[((j+1))+1] + yy[(j)+1]*zz[((j+1))+1] - yy[(j)+1]*zz[((j-1))+1] + yy[((j+1))+1]*zz[((j-1))+1] - yy[((j+1))+1]*zz[(j)+1]) * (yy[((j-1))+1]*zz[(j)+1] - yy[((j-1))+1]*zz[((j+1))+1] + yy[(j)+1]*zz[((j+1))+1] - yy[(j)+1]*zz[((j-1))+1] + yy[((j+1))+1]*zz[((j-1))+1] - yy[((j+1))+1]*zz[(j)+1])))) END) AS kka,
         '-infinity'::DOUBLE AS maxv,
         CAST(NULL AS BIGINT) AS rem, CAST(NULL AS DOUBLE) AS z
  FROM base
  UNION ALL
  SELECT arc_id, xx, yy, zz, new_alive,
         list_transform(range(1, len(new_alive) + 1), q ->
             CASE WHEN q = 1 OR q = CAST(len(new_alive) AS BIGINT) THEN 'infinity'::DOUBLE
                  WHEN q = p - 1 OR q = p THEN
                    (0.5 * sqrt(((xx[(new_alive[q-1])+1]*yy[(new_alive[q])+1] - xx[(new_alive[q-1])+1]*yy[(new_alive[q+1])+1] + xx[(new_alive[q])+1]*yy[(new_alive[q+1])+1] - xx[(new_alive[q])+1]*yy[(new_alive[q-1])+1] + xx[(new_alive[q+1])+1]*yy[(new_alive[q-1])+1] - xx[(new_alive[q+1])+1]*yy[(new_alive[q])+1]) * (xx[(new_alive[q-1])+1]*yy[(new_alive[q])+1] - xx[(new_alive[q-1])+1]*yy[(new_alive[q+1])+1] + xx[(new_alive[q])+1]*yy[(new_alive[q+1])+1] - xx[(new_alive[q])+1]*yy[(new_alive[q-1])+1] + xx[(new_alive[q+1])+1]*yy[(new_alive[q-1])+1] - xx[(new_alive[q+1])+1]*yy[(new_alive[q])+1])) + ((xx[(new_alive[q-1])+1]*zz[(new_alive[q])+1] - xx[(new_alive[q-1])+1]*zz[(new_alive[q+1])+1] + xx[(new_alive[q])+1]*zz[(new_alive[q+1])+1] - xx[(new_alive[q])+1]*zz[(new_alive[q-1])+1] + xx[(new_alive[q+1])+1]*zz[(new_alive[q-1])+1] - xx[(new_alive[q+1])+1]*zz[(new_alive[q])+1]) * (xx[(new_alive[q-1])+1]*zz[(new_alive[q])+1] - xx[(new_alive[q-1])+1]*zz[(new_alive[q+1])+1] + xx[(new_alive[q])+1]*zz[(new_alive[q+1])+1] - xx[(new_alive[q])+1]*zz[(new_alive[q-1])+1] + xx[(new_alive[q+1])+1]*zz[(new_alive[q-1])+1] - xx[(new_alive[q+1])+1]*zz[(new_alive[q])+1])) + ((yy[(new_alive[q-1])+1]*zz[(new_alive[q])+1] - yy[(new_alive[q-1])+1]*zz[(new_alive[q+1])+1] + yy[(new_alive[q])+1]*zz[(new_alive[q+1])+1] - yy[(new_alive[q])+1]*zz[(new_alive[q-1])+1] + yy[(new_alive[q+1])+1]*zz[(new_alive[q-1])+1] - yy[(new_alive[q+1])+1]*zz[(new_alive[q])+1]) * (yy[(new_alive[q-1])+1]*zz[(new_alive[q])+1] - yy[(new_alive[q-1])+1]*zz[(new_alive[q+1])+1] + yy[(new_alive[q])+1]*zz[(new_alive[q+1])+1] - yy[(new_alive[q])+1]*zz[(new_alive[q-1])+1] + yy[(new_alive[q+1])+1]*zz[(new_alive[q-1])+1] - yy[(new_alive[q+1])+1]*zz[(new_alive[q])+1]))))
                  ELSE kka[CASE WHEN q < p THEN q ELSE q + 1 END] END) AS kka,
         z AS maxv, rem, z
  FROM (
    SELECT arc_id, xx, yy, zz, alive, kka, maxv,
           list_position(kka, m) AS p,
           alive[list_position(kka, m)] AS rem,
           CASE WHEN m < maxv THEN maxv ELSE m END AS z,
           list_concat(list_slice(alive, 1, list_position(kka, m) - 1),
                       list_slice(alive, list_position(kka, m) + 1, len(alive))) AS new_alive
    FROM (SELECT arc_id, xx, yy, zz, alive, kka, maxv,
                 list_min(list_slice(kka, 2, len(kka) - 1)) AS m
          FROM f WHERE len(alive) > 2) s
  ) g
),
zvals AS (SELECT arc_id, sqrt(z) * 0.65 AS z FROM f WHERE rem IS NOT NULL),
lim AS (
  SELECT z AS zlimit FROM zvals ORDER BY z
  LIMIT 1 OFFSET (SELECT CAST(floor(0.5 * (count(*) + 2)) AS BIGINT) - 1 FROM zvals)
)
SELECT arc_id, CAST(2 + count(*) FILTER (WHERE z >= (SELECT zlimit FROM lim)) AS INT) AS n_kept
FROM zvals GROUP BY arc_id ORDER BY arc_id
"""


    # IVF exact oracle (r4 cont.): the quantizer trains on a DETERMINISTIC
    # sample (first 1024 rows by vec_id) with fixed seeding + 5 Lloyd
    # iterations, so the trained centroids are a pure function of the
    # sf0.01 table — replicated here in numpy from the parquet (the
    # correctness gate runs at sf=0.01 per TESTDATA.md) and inlined as SQL
    # literals; assignment (argmin with the -2x.c+|c|^2 form, ties ->
    # lowest list), probe-list selection, and cosine rerank are all
    # re-derived in SQL. Guarded: if the table is unreadable the query
    # stays rows-only.
    try:
        import duckdb as _dk
        _icon = _dk.connect()
        _irows = _icon.execute(
            "SELECT embedding::DOUBLE[] FROM "
            "'/root/testdata/sf0.01/embeddings.parquet' "
            "ORDER BY vec_id LIMIT 1024").fetchall()
        _X = np.stack([np.asarray(r[0], dtype=np.float64) for r in _irows])
        _nl = max(1, min(16, len(_X)))
        _ord = np.argsort(_X[:, 0], kind="stable")
        _step = max(1, len(_X) // _nl)
        _cents = _X[_ord[::_step][:_nl]].copy()
        for _ in range(5):
            _d2 = ((_X[:, None, :] - _cents[None, :, :]) ** 2).sum(axis=2)
            _lab = _d2.argmin(axis=1)
            for _li in range(_nl):
                _m = _lab == _li
                if _m.any():
                    _cents[_li] = _X[_m].mean(axis=0)
        _q = np.asarray(qvec, dtype=np.float64)
        _probe = [l for _, l in sorted(
            (float(((c - _q) ** 2).sum()), i)
            for i, c in enumerate(_cents))[:6]]
        _cv = ", ".join(f"({l}, {i}, {_cents[l, i]!r}::DOUBLE)"
                        for l in range(_nl) for i in range(len(_q)))
        _cl2 = ", ".join(
            f"({l}, {float((_cents[l] * _cents[l]).sum())!r}::DOUBLE)"
            for l in range(_nl))
        sqls["ann_ivf_topk"] = f"""
            WITH c(l, i, cv) AS (VALUES {_cv}),
            c2(l, n2) AS (VALUES {_cl2}),
            q(i, qv) AS (VALUES {qvals}),
            e AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
                         generate_subscripts(embedding, 1) - 1 AS i
                  FROM embeddings),
            d AS (SELECT e.vec_id, c.l,
                         -2.0 * sum(e.v * c.cv) + any_value(c2.n2) AS dist
                  FROM e JOIN c ON e.i = c.i JOIN c2 ON c2.l = c.l
                  GROUP BY e.vec_id, c.l),
            asg AS (SELECT vec_id,
                           (min(struct_pack(dist := dist, l := l))).l
                               AS list_id
                    FROM d GROUP BY vec_id),
            cand AS (SELECT vec_id FROM asg
                     WHERE list_id IN ({", ".join(map(str, _probe))})),
            s AS (SELECT e.vec_id,
                         round(sum(e.v * q.qv) / (sqrt(sum(e.v * e.v)) *
                               {qnorm!r}), 6) AS score
                  FROM e JOIN q ON e.i = q.i
                  WHERE e.vec_id IN (SELECT vec_id FROM cand)
                  GROUP BY e.vec_id)
            SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10
        """
    except Exception:
        pass  # embeddings table unreadable -> ann_ivf_topk stays rows-only


    # exact WEIGHTED Visvalingam oracle (r4 cont.): the engine's DEFAULT
    # simplify method — inverse-cosine weighting (-cos*0.7 + 1) * area in
    # the same recursive removal replay
    sqls["simplify_wvis"] = """
WITH RECURSIVE f AS (
  SELECT arc_id,
         list_transform(range(0, 33), j -> j) AS alive,
         list_transform(range(0, 33), j ->
             CASE WHEN j = 0 OR j = 32 THEN 'infinity'::DOUBLE
                  ELSE (((-(CASE WHEN (sqrt((CAST((j-1) AS DOUBLE) - CAST(j AS DOUBLE))*(CAST((j-1) AS DOUBLE) - CAST(j AS DOUBLE)) + ((CAST((arc_id*31 + ((j-1))*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25))*((CAST((arc_id*31 + ((j-1))*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25))) * sqrt((CAST(j AS DOUBLE) - CAST((j+1) AS DOUBLE))*(CAST(j AS DOUBLE) - CAST((j+1) AS DOUBLE)) + ((CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + ((j+1))*17) % 13 AS DOUBLE) * 0.25))*((CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + ((j+1))*17) % 13 AS DOUBLE) * 0.25)))) > 0 THEN least(1.0, greatest(-1.0, ((CAST((j-1) AS DOUBLE) - CAST(j AS DOUBLE))*(CAST((j+1) AS DOUBLE) - CAST(j AS DOUBLE)) + ((CAST((arc_id*31 + ((j-1))*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25))*((CAST((arc_id*31 + ((j+1))*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25))) / (sqrt((CAST((j-1) AS DOUBLE) - CAST(j AS DOUBLE))*(CAST((j-1) AS DOUBLE) - CAST(j AS DOUBLE)) + ((CAST((arc_id*31 + ((j-1))*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25))*((CAST((arc_id*31 + ((j-1))*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25))) * sqrt((CAST(j AS DOUBLE) - CAST((j+1) AS DOUBLE))*(CAST(j AS DOUBLE) - CAST((j+1) AS DOUBLE)) + ((CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + ((j+1))*17) % 13 AS DOUBLE) * 0.25))*((CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + ((j+1))*17) % 13 AS DOUBLE) * 0.25)))))) ELSE 0.0 END)) * 0.7 + 1.0) * abs((((CAST((arc_id*31 + ((j-1))*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + ((j+1))*17) % 13 AS DOUBLE) * 0.25)) * (CAST(j AS DOUBLE) - CAST((j+1) AS DOUBLE)) + ((CAST((arc_id*31 + (j)*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + ((j+1))*17) % 13 AS DOUBLE) * 0.25)) * (CAST((j+1) AS DOUBLE) - CAST((j-1) AS DOUBLE))) / 2.0)) END) AS kka,
         '-infinity'::DOUBLE AS maxv,
         CAST(NULL AS BIGINT) AS rem, CAST(NULL AS DOUBLE) AS z
  FROM range(0, 150) t(arc_id)
  UNION ALL
  SELECT arc_id, new_alive,
         list_transform(range(1, len(new_alive) + 1), q ->
             CASE WHEN q = 1 OR q = CAST(len(new_alive) AS BIGINT) THEN 'infinity'::DOUBLE
                  WHEN q = p - 1 OR q = p THEN
                    (((-(CASE WHEN (sqrt((CAST(new_alive[q-1] AS DOUBLE) - CAST(new_alive[q] AS DOUBLE))*(CAST(new_alive[q-1] AS DOUBLE) - CAST(new_alive[q] AS DOUBLE)) + ((CAST((arc_id*31 + (new_alive[q-1])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25))*((CAST((arc_id*31 + (new_alive[q-1])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25))) * sqrt((CAST(new_alive[q] AS DOUBLE) - CAST(new_alive[q+1] AS DOUBLE))*(CAST(new_alive[q] AS DOUBLE) - CAST(new_alive[q+1] AS DOUBLE)) + ((CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q+1])*17) % 13 AS DOUBLE) * 0.25))*((CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q+1])*17) % 13 AS DOUBLE) * 0.25)))) > 0 THEN least(1.0, greatest(-1.0, ((CAST(new_alive[q-1] AS DOUBLE) - CAST(new_alive[q] AS DOUBLE))*(CAST(new_alive[q+1] AS DOUBLE) - CAST(new_alive[q] AS DOUBLE)) + ((CAST((arc_id*31 + (new_alive[q-1])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25))*((CAST((arc_id*31 + (new_alive[q+1])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25))) / (sqrt((CAST(new_alive[q-1] AS DOUBLE) - CAST(new_alive[q] AS DOUBLE))*(CAST(new_alive[q-1] AS DOUBLE) - CAST(new_alive[q] AS DOUBLE)) + ((CAST((arc_id*31 + (new_alive[q-1])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25))*((CAST((arc_id*31 + (new_alive[q-1])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25))) * sqrt((CAST(new_alive[q] AS DOUBLE) - CAST(new_alive[q+1] AS DOUBLE))*(CAST(new_alive[q] AS DOUBLE) - CAST(new_alive[q+1] AS DOUBLE)) + ((CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q+1])*17) % 13 AS DOUBLE) * 0.25))*((CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q+1])*17) % 13 AS DOUBLE) * 0.25)))))) ELSE 0.0 END)) * 0.7 + 1.0) * abs((((CAST((arc_id*31 + (new_alive[q-1])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q+1])*17) % 13 AS DOUBLE) * 0.25)) * (CAST(new_alive[q] AS DOUBLE) - CAST(new_alive[q+1] AS DOUBLE)) + ((CAST((arc_id*31 + (new_alive[q])*17) % 13 AS DOUBLE) * 0.25) - (CAST((arc_id*31 + (new_alive[q+1])*17) % 13 AS DOUBLE) * 0.25)) * (CAST(new_alive[q+1] AS DOUBLE) - CAST(new_alive[q-1] AS DOUBLE))) / 2.0))
                  ELSE kka[CASE WHEN q < p THEN q ELSE q + 1 END] END) AS kka,
         z AS maxv, rem, z
  FROM (
    SELECT arc_id, alive, kka, maxv,
           list_position(kka, m) AS p,
           alive[list_position(kka, m)] AS rem,
           CASE WHEN m < maxv THEN maxv ELSE m END AS z,
           list_concat(list_slice(alive, 1, list_position(kka, m) - 1),
                       list_slice(alive, list_position(kka, m) + 1, len(alive))) AS new_alive
    FROM (SELECT arc_id, alive, kka, maxv,
                 list_min(list_slice(kka, 2, len(kka) - 1)) AS m
          FROM f WHERE len(alive) > 2) s
  ) g
),
zvals AS (SELECT arc_id, sqrt(z) * 0.65 AS z FROM f WHERE rem IS NOT NULL),
lim AS (
  SELECT z AS zlimit FROM zvals ORDER BY z
  LIMIT 1 OFFSET (SELECT CAST(floor(0.6 * (count(*) + 2)) AS BIGINT) - 1 FROM zvals)
)
SELECT arc_id, CAST(2 + count(*) FILTER (WHERE z >= (SELECT zlimit FROM lim)) AS INT) AS n_kept
FROM zvals GROUP BY arc_id ORDER BY arc_id
"""

    sqls["filter_where"] = """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
    """
    sqls["project_fields"] = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    sqls["rename_fields"] = ("SELECT n_nationkey AS nation_id, n_name AS nation_name "
                             "FROM nation")
    sqls["each_derive"] = """
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1.0 - l_discount), 4) AS revenue,
               l_quantity >= 25 AS is_big
        FROM lineitem
    """
    sqls["each_regex"] = r"""
        SELECT c_custkey,
               regexp_extract(c_name, '(\d+)', 1) AS digits,
               regexp_replace(c_name, 'Customer#0+', '') AS short_name,
               regexp_matches(c_mktsegment, '^B') AS is_b_seg,
               CAST(instr(c_name, '#') - 1 AS BIGINT) AS hash_pos,
               regexp_replace(c_name, '0', 'O', 'g') AS ohs
        FROM customer
    """
    sqls["each_js"] = """
        SELECT c_custkey,
               array_to_string(list_transform(string_split(c_name, '#'),
                                              w -> w[1]), '') AS initials,
               CAST(length(c_name) AS DOUBLE) + c_acctbal / 1000 AS nlen
        FROM customer
        WHERE lower(c_mktsegment) LIKE 'b%'
    """
    sqls["each_where"] = """
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity > 25
                    THEN round(l_extendedprice * (1.0 - l_discount), 4) END AS disc_price
        FROM lineitem
    """
    sqls["filter_remove_empty"] = """
        SELECT CAST(i AS INT) AS rid FROM range(24) t(i) WHERE i % 4 = 0
    """
    sqls["uniq_first_order"] = """
        SELECT o_orderkey, o_custkey, o_totalprice FROM (
            SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
            FROM orders) WHERE rn = 1
    """
    sqls["sort_top100"] = """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """
    sqls["calc_aggs"] = """
        SELECT count(l_quantity) AS n,
               round(sum(l_quantity), 2) AS sum_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(median(l_quantity), 4) AS med_qty,
               min(l_shipdate) AS min_ship,
               max(l_shipdate) AS max_ship,
               mode(l_returnflag) AS mode_flag
        FROM lineitem
    """
    sqls["dissolve_customers_by_nation"] = """
        SELECT c_nationkey,
               round(sum(c_acctbal), 2) AS acctbal_sum,
               count(*) AS n_cust,
               min_by(c_name, c_custkey) AS first_name
        FROM customer GROUP BY c_nationkey
    """
    sqls["join_first_match"] = """
        WITH agg AS (
            SELECT c_nationkey,
                   count(*) AS joins,
                   min_by(c_name, c_custkey) AS c_name,
                   min_by(c_mktsegment, c_custkey) AS c_mktsegment,
                   round(sum(c_acctbal), 2) AS sum_c_acctbal
            FROM customer GROUP BY c_nationkey)
        SELECT n_nationkey, n_name,
               coalesce(a.joins, 0) AS joins, a.c_name, a.c_mktsegment,
               coalesce(a.sum_c_acctbal, 0) AS sum_c_acctbal
        FROM nation n LEFT JOIN agg a ON n.n_nationkey = a.c_nationkey
    """
    sqls["join_unmatched"] = """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_custkey % 3 = 0)
    """
    sqls["join_unjoined"] = """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                                WHERE l_orderkey <= 1000)
    """
    sqls["join_is_max"] = """
        WITH best AS (
            SELECT c_nationkey, c_name, c_acctbal,
                   row_number() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn,
                   max(c_acctbal) OVER (PARTITION BY c_nationkey) AS mx
            FROM customer)
        SELECT n_nationkey, n_name, b.c_name,
               round(b.c_acctbal, 2) AS best_acctbal
        FROM nation n LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
             ON n.n_nationkey = b.c_nationkey
    """
    sqls["merge_layers"] = """
        SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS layer FROM customer
        UNION ALL
        SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS layer FROM supplier
    """
    sqls["top3_per_order"] = """
        SELECT l_orderkey, l_linenumber, l_quantity FROM (
            SELECT *, row_number() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
            FROM lineitem) WHERE rn <= 3
    """

    pts = _CUSTOMER_POINTS_SQL
    sqls["filter_geom_bbox"] = f"""
        WITH pts AS ({pts})
        SELECT c_custkey, lon, lat FROM pts
        WHERE lon >= -100.0 AND lon <= -80.0 AND lat >= 30.0 AND lat <= 40.0
    """
    sqls["pip_all_pairs"] = f"""
        WITH pts AS ({pts}), regions AS ({_REGIONS_SQL})
        SELECT p.c_custkey, r.rid FROM pts p JOIN regions r
          ON p.lon >= r.xmin AND p.lon <= r.xmax AND p.lat >= r.ymin AND p.lat <= r.ymax
    """
    sqls["pip_first_match"] = f"""
        WITH pts AS ({pts}), regions AS ({_REGIONS_SQL}),
        pairs AS (
            SELECT p.c_custkey, r.rid FROM pts p JOIN regions r
              ON p.lon >= r.xmin AND p.lon <= r.xmax AND p.lat >= r.ymin AND p.lat <= r.ymax),
        agg AS (
            SELECT c_custkey, count(*) AS joins, min(rid) AS first_rid
            FROM pairs GROUP BY c_custkey)
        SELECT p.c_custkey, coalesce(a.joins, 0) AS joins, a.first_rid,
               'S' || CAST((a.first_rid // 6 // 2) * 2 + (a.first_rid % 6 // 3) AS VARCHAR) AS state
        FROM pts p LEFT JOIN agg a ON p.c_custkey = a.c_custkey
    """
    sqls["region_point_stats"] = f"""
        WITH pts AS ({pts}), regions AS ({_REGIONS_SQL}),
        pairs AS (
            SELECT p.c_acctbal, r.rid FROM pts p JOIN regions r
              ON p.lon >= r.xmin AND p.lon <= r.xmax AND p.lat >= r.ymin AND p.lat <= r.ymax)
        SELECT r.rid, coalesce(a.n_pts, 0) AS n_pts, a.acctbal_sum
        FROM regions r LEFT JOIN (
            SELECT rid, count(*) AS n_pts, round(sum(c_acctbal), 2) AS acctbal_sum
            FROM pairs GROUP BY rid) a ON r.rid = a.rid
    """
    sqls["split_on_grid"] = f"""
        WITH pts AS ({pts})
        SELECT c_custkey,
               'r' || CAST(greatest(0, least(7, CAST(floor((lat - 25.0) / 24.0 * 8) AS BIGINT))) AS VARCHAR)
               || 'c' || CAST(greatest(0, least(7, CAST(floor((lon - -120.0) / 60.0 * 8) AS BIGINT))) AS VARCHAR)
               AS tile
        FROM pts
    """
    sqls["flagship_image_tiles"] = f"""
        WITH imgs AS ({_IMAGES_SQL.format(n=20000)}),
        pts AS ({_FOOTPRINT_SQL}),
        regions AS ({_REGIONS_SQL}),
        pairs AS (
            SELECT p.id, p.lon, p.lat, r.rid FROM pts p JOIN regions r
              ON p.lon >= r.xmin AND p.lon <= r.xmax AND p.lat >= r.ymin AND p.lat <= r.ymax)
        SELECT rid,
               'r' || CAST(greatest(0, least(15, CAST(floor((lat - 25.0) / 24.0 * 16) AS BIGINT))) AS VARCHAR)
               || 'c' || CAST(greatest(0, least(15, CAST(floor((lon - -120.0) / 60.0 * 16) AS BIGINT))) AS VARCHAR)
               AS tile,
               count(*) AS n_images
        FROM pairs GROUP BY 1, 2
    """
    sqls["knn_nearest"] = f"""
        WITH pts AS ({pts}), sup AS ({_SUPPLIER_POINTS_SQL}),
        cand AS (
            SELECT c.c_custkey, s.s_suppkey,
                   (c.lon - s.slon) * (c.lon - s.slon) + (c.lat - s.slat) * (c.lat - s.slat) AS d2
            FROM pts c CROSS JOIN sup s),
        best AS (
            SELECT c_custkey, s_suppkey, d2,
                   row_number() OVER (PARTITION BY c_custkey ORDER BY d2, s_suppkey) AS rn
            FROM cand WHERE d2 <= 4.0)
        SELECT p.c_custkey, b.s_suppkey, b.d2 AS dist_sq
        FROM pts p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
             ON p.c_custkey = b.c_custkey
    """
    sqls["point_grid"] = """
        SELECT CAST(i % 10 AS INT) AS col, CAST(i // 10 AS INT) AS row,
               -117.0 + (i % 10) * 6.0 AS x,
               26.5 + (i // 10) * 3.0 AS y
        FROM range(80) t(i)
    """
    # reference polygon-grid: cells between the 6x4 point-grid centers
    # -> 5x3 cells starting at (-115, 28)
    sqls["polygon_grid"] = """
        SELECT 'r' || CAST(i // 5 AS VARCHAR) || 'c' || CAST(i % 5 AS VARCHAR) AS cell_id,
               CAST(i // 5 AS INT) AS row, CAST(i % 5 AS INT) AS col,
               -115.0 + (i % 5) * 10.0 AS xmin, 28.0 + (i // 5) * 6.0 AS ymin,
               -105.0 + (i % 5) * 10.0 AS xmax, 34.0 + (i // 5) * 6.0 AS ymax
        FROM range(15) t(i)
    """
    sqls["affine"] = f"""
        WITH pts AS ({pts})
        SELECT c_custkey, 2.0 * lon + 3.5 AS x2, 2.0 * lat + -1.25 AS y2 FROM pts
    """
    sqls["round_precision"] = f"""
        WITH pts AS ({pts})
        SELECT c_custkey, floor(lon * 2.0 + 0.5) / 2.0 AS rlon,
               floor(lat * 2.0 + 0.5) / 2.0 AS rlat
        FROM pts
    """
    sqls["dissolve_states"] = """
        SELECT 'S' || CAST(i AS VARCHAR) AS state,
               CAST(11 AS BIGINT) AS n_vertices, CAST(360.0 AS DOUBLE) AS area
        FROM range(4) t(i)
    """
    sqls["innerlines"] = """
        SELECT CAST(r * 6 + c AS INT) AS aid,
               CAST((r - 1) * 6 + c AS INT) AS key_a, CAST(r * 6 + c AS INT) AS key_b
        FROM range(1, 4) t(r), range(0, 6) u(c)
        UNION ALL
        SELECT CAST(30 + r * 7 + c AS INT) AS aid,
               CAST(r * 6 + c - 1 AS INT) AS key_a, CAST(r * 6 + c AS INT) AS key_b
        FROM range(0, 4) t(r), range(1, 6) u(c)
    """
    # 6x4 mosaic arc ids: horizontal = r*6+c (r 0..4), vertical = 30+r*7+c
    # (r 0..3, c 0..6); states = 3x2-cell blocks -> boundaries at r=2 / c=3
    sqls["lines"] = """
        -- horizontal arc r*6+c separates cell rows (r-1) and r
        WITH h AS (
            SELECT r, c,
                   'S' || CAST((greatest(r - 1, 0) // 2) * 2 + (c // 3) AS VARCHAR) AS s_below,
                   'S' || CAST((least(r, 3) // 2) * 2 + (c // 3) AS VARCHAR) AS s_above
            FROM range(5) t(r), range(6) u(c)),
        v AS (
            SELECT r, c,
                   'S' || CAST((r // 2) * 2 + (greatest(c - 1, 0) // 3) AS VARCHAR) AS s_left,
                   'S' || CAST((r // 2) * 2 + (least(c, 5) // 3) AS VARCHAR) AS s_right
            FROM range(4) t(r), range(7) u(c))
        SELECT CAST(r * 6 + c AS INT) AS aid,
               CASE WHEN r IN (0, 4) THEN 'outer'
                    WHEN s_below != s_above THEN 'state' ELSE 'inner' END AS line_type,
               least(s_below, s_above) AS key_a,
               CASE WHEN r IN (0, 4) THEN NULL
                    ELSE greatest(s_below, s_above) END AS key_b
        FROM h
        UNION ALL
        SELECT CAST(30 + r * 7 + c AS INT) AS aid,
               CASE WHEN c IN (0, 6) THEN 'outer'
                    WHEN s_left != s_right THEN 'state' ELSE 'inner' END AS line_type,
               least(s_left, s_right) AS key_a,
               CASE WHEN c IN (0, 6) THEN NULL
                    ELSE greatest(s_left, s_right) END AS key_b
        FROM v
    """
    sqls["neighbors"] = """
        SELECT CAST((r - 1) * 6 + c AS INT) AS key_a, CAST(r * 6 + c AS INT) AS key_b
        FROM range(1, 4) t(r), range(0, 6) u(c)
        UNION ALL
        SELECT CAST(r * 6 + c - 1 AS INT) AS key_a, CAST(r * 6 + c AS INT) AS key_b
        FROM range(0, 4) t(r), range(1, 6) u(c)
    """

    sqls["points_centroid"] = """
        SELECT CAST(i AS INT) AS rid,
               round(-120.0 + (i % 6) * 10.0 + 5.0, 6) AS cx,
               round(25.0 + (i // 6) * 6.0 + 3.0, 6) AS cy
        FROM range(24) t(i)
    """
    sqls["points_inner"] = """
        SELECT CAST(i AS INT) AS rid,
               round(-120.0 + (i % 6) * 10.0 + 5.0, 6) AS ix,
               round(25.0 + (i // 6) * 6.0 + 3.0, 6) AS iy
        FROM range(24) t(i)
    """
    # mosaic ring vertex order: (x0,y0),(x0,y1),(x1,y1),(x1,y0) (closing pt dropped)
    sqls["points_vertices"] = """
        SELECT CAST(i AS INT) AS rid, CAST(0 AS INT) AS ring_idx,
               CAST(v AS INT) AS vertex_idx,
               CASE WHEN v IN (0, 1) THEN -120.0 + (i % 6) * 10.0
                    ELSE -120.0 + (i % 6 + 1) * 10.0 END AS x,
               CASE WHEN v IN (0, 3) THEN 25.0 + (i // 6) * 6.0
                    ELSE 25.0 + (i // 6 + 1) * 6.0 END AS y
        FROM range(24) t(i), range(4) u(v)
    """
    sqls["points_interpolated"] = """
        WITH f AS (SELECT CAST(i AS INT) AS fid, i * 10.0 AS y0 FROM range(10) t(i)),
        s AS (SELECT CAST(j AS INT) AS seq FROM range(6) u(j))
        SELECT fid, seq,
               round(CASE seq WHEN 0 THEN 0.0 WHEN 1 THEN 2.5 WHEN 2 THEN 5.0
                              ELSE 6.0 END, 6) AS x,
               round(CASE seq WHEN 3 THEN y0 + 1.5 WHEN 4 THEN y0 + 4.0
                              WHEN 5 THEN y0 + 6.0 ELSE y0 END, 6) AS y
        FROM f, s
    """
    # clip region: [-110,30,-80,45] minus OPEN hole (-100,-90)x(35,40)
    # (hole boundary counts as inside the polygon per testPointInPolygon)
    _in_clip = """(lon >= -110.0 AND lon <= -80.0 AND lat >= 30.0 AND lat <= 45.0
               AND NOT (lon > -100.0 AND lon < -90.0 AND lat > 35.0 AND lat < 40.0))"""
    sqls["clip_points"] = f"""
        WITH pts AS ({pts})
        SELECT c_custkey, lon, lat FROM pts WHERE {_in_clip}
    """
    sqls["erase_points"] = f"""
        WITH pts AS ({pts})
        SELECT c_custkey, lon, lat FROM pts WHERE NOT {_in_clip}
    """
    sqls["clip_bbox_lines"] = """
        SELECT CAST(i AS INT) AS fid, 5.0 AS x0, CAST(i AS DOUBLE) AS y0,
               15.0 AS x1, CAST(i AS DOUBLE) AS y1
        FROM range(2, 8) t(i)
    """
    sqls["filter_islands"] = """
        SELECT CAST(i AS INT) AS fid,
               CASE WHEN i % 5 >= 2 THEN 2 ELSE 1 END AS n_rings
        FROM range(50) t(i)
    """
    sqls["graticule"] = """
        SELECT 'meridian' AS kind, CAST(-180 + i * 10 AS INT) AS value,
               CASE WHEN (-180 + i * 10) % 90 = 0 THEN 181 ELSE 161 END AS n,
               CAST(-180 + i * 10 AS DOUBLE) AS x0,
               CASE WHEN (-180 + i * 10) % 90 = 0 THEN -90.0 ELSE -80.0 END AS y0,
               CAST(-180 + i * 10 AS DOUBLE) AS x1,
               CASE WHEN (-180 + i * 10) % 90 = 0 THEN 90.0 ELSE 80.0 END AS y1
        FROM range(37) t(i)
        UNION ALL
        SELECT 'parallel', CAST(-90 + i * 10 AS INT), 361,
               -180.0, CAST(-90 + i * 10 AS DOUBLE),
               180.0, CAST(-90 + i * 10 AS DOUBLE)
        FROM range(19) t(i)
    """
    sqls["proj_webmercator"] = f"""
        WITH pts AS ({pts})
        SELECT c_custkey,
               round(6378137.0 * radians(lon), 4) AS mx,
               round(6378137.0 * ln(tan(pi() / 4.0 + radians(lat) / 2.0)), 4) AS my
        FROM pts
    """
    sqls["knn_k3"] = f"""
        WITH pts AS ({pts}), sup AS ({_SUPPLIER_POINTS_SQL}),
        cand AS (
            SELECT c.c_custkey, s.s_suppkey,
                   (c.lon - s.slon) * (c.lon - s.slon) + (c.lat - s.slat) * (c.lat - s.slat) AS d2
            FROM pts c CROSS JOIN sup s),
        ranked AS (
            SELECT c_custkey, s_suppkey, d2,
                   row_number() OVER (PARTITION BY c_custkey ORDER BY d2, s_suppkey) AS rn
            FROM cand WHERE d2 <= 4.0)
        SELECT c_custkey, s_suppkey, d2 AS dist_sq, CAST(rn AS INT) AS knn_rank
        FROM ranked WHERE rn <= 3
    """
    sqls["knn_unbounded"] = f"""
        WITH pts AS ({pts}), sup AS ({_SUPPLIER_POINTS_SQL}),
        cand AS (
            SELECT c.c_custkey, s.s_suppkey,
                   (c.lon - s.slon) * (c.lon - s.slon)
                   + (c.lat - s.slat) * (c.lat - s.slat) AS d2
            FROM pts c CROSS JOIN sup s WHERE c.c_custkey <= 300)
        SELECT c_custkey, s_suppkey, d2 AS dist_sq, CAST(rn AS INT) AS knn_rank
        FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey
                                           ORDER BY d2, s_suppkey) AS rn
              FROM cand) WHERE rn <= 3
    """
    # shared-arc topology of the 6x4 mosaic: every grid corner shared by >=2
    # cells is a node; the 4 outer corners are single-traversal (NOT nodes),
    # so each corner cell fuses its two outer edges into one 3-point L-arc.
    sqls["topology_build"] = """
        -- horizontal edges (left->right), minus the 4 corner-adjacent ones
        SELECT -120.0 + c * 10.0 AS x0, 25.0 + r * 6.0 AS y0,
               -120.0 + (c + 1) * 10.0 AS x1, 25.0 + r * 6.0 AS y1, 2 AS n
        FROM range(5) t(r), range(6) u(c)
        WHERE NOT ((r = 0 AND c = 0) OR (r = 0 AND c = 5)
                OR (r = 4 AND c = 0) OR (r = 4 AND c = 5))
        UNION ALL
        -- vertical edges (bottom->top), minus the 4 corner-adjacent ones
        SELECT -120.0 + c * 10.0, 25.0 + r * 6.0,
               -120.0 + c * 10.0, 25.0 + (r + 1) * 6.0, 2
        FROM range(4) t(r), range(7) u(c)
        WHERE NOT ((r = 0 AND c = 0) OR (r = 0 AND c = 6)
                OR (r = 3 AND c = 0) OR (r = 3 AND c = 6))
        UNION ALL
        SELECT * FROM (VALUES (-120.0, 31.0, -110.0, 25.0, 3),
                              (-70.0, 25.0, -60.0, 31.0, 3),
                              (-120.0, 43.0, -110.0, 49.0, 3),
                              (-70.0, 49.0, -60.0, 43.0, 3)) v(x0, y0, x1, y1, n)
    """
    sqls["polygons_from_lines"] = """
        SELECT 0 AS comp, 60.0 AS area,
               -120.0 + c * 10.0 AS xmin, 25.0 + r * 6.0 AS ymin
        FROM range(4) t(r), range(6) u(c)
    """
    sqls["segment_intersections"] = """
        -- endpoint-of-BOTH-segments touches are excluded (the reference's
        -- endpointHit rule, mapshaper-segment-geom.js:227-233): the four
        -- grid corners where a horizontal and a vertical line both END
        SELECT CAST(j AS DOUBLE) AS x, CAST(i AS DOUBLE) AS y,
               i AS arc_a, 10 + j AS arc_b
        FROM range(10) t(i), range(10) u(j)
        WHERE NOT ((i = 0 OR i = 9) AND (j = 0 OR j = 9))
    """
    sqls["polyline_dissolve"] = """
        SELECT 0.0 AS x0, CAST(i AS DOUBLE) AS y0, 4.0 AS x1,
               CAST(i AS DOUBLE) AS y1, 5 AS n
        FROM range(5) t(i)
    """
    sqls["dedup_coords"] = "SELECT i AS arc_id, 5 AS n FROM range(50) t(i)"

    sqls["clip_polygons"] = """
        WITH r AS (
            SELECT CAST(i AS INT) AS rid,
                   -120.0 + (i % 6) * 10.0 AS x0, 25.0 + (i // 6) * 6.0 AS y0,
                   -120.0 + (i % 6 + 1) * 10.0 AS x1, 25.0 + (i // 6 + 1) * 6.0 AS y1
            FROM range(24) t(i))
        SELECT rid,
               round((least(x1, -85.0) - greatest(x0, -115.0))
                     * (least(y1, 40.0) - greatest(y0, 28.0)), 6) AS area
        FROM r
        WHERE least(x1, -85.0) > greatest(x0, -115.0)
          AND least(y1, 40.0) > greatest(y0, 28.0)
    """
    sqls["slice_grid"] = """
        WITH r AS (
            SELECT CAST(i AS INT) AS rid,
                   -120.0 + (i % 6) * 10.0 AS x0, 25.0 + (i // 6) * 6.0 AS y0,
                   -120.0 + (i % 6 + 1) * 10.0 AS x1, 25.0 + (i // 6 + 1) * 6.0 AS y1
            FROM range(24) t(i)),
        g AS (
            SELECT CAST(gr AS INT) AS cell_row, CAST(gc AS INT) AS cell_col,
                   -120.0 + gc * 15.0 AS gx0, 25.0 + gr * 6.0 AS gy0,
                   -120.0 + (gc + 1) * 15.0 AS gx1, 25.0 + (gr + 1) * 6.0 AS gy1
            FROM range(4) t(gr), range(4) u(gc))
        SELECT rid, cell_row, cell_col,
               round((least(x1, gx1) - greatest(x0, gx0))
                     * (least(y1, gy1) - greatest(y0, gy0)), 6) AS area
        FROM r, g
        WHERE least(x1, gx1) > greatest(x0, gx0)
          AND least(y1, gy1) > greatest(y0, gy0)
    """
    sqls["mosaic_faces"] = """
        WITH n AS (SELECT CAST(n_nationkey AS DOUBLE) * 10 AS x0 FROM nation)
        SELECT round(x0, 6) AS xmin, 0.0 AS ymin,
               CAST(3.0 AS DOUBLE) AS area, CAST(1 AS INT) AS n_members
        FROM n
        UNION ALL
        SELECT round(x0 + 1, 6), 1.0, 3.0, CAST(1 AS INT) FROM n
        UNION ALL
        SELECT round(x0 + 1, 6), 1.0, 1.0, CAST(2 AS INT) FROM n
    """
    sqls["slice_layer"] = """
        SELECT n_nationkey AS fid,
               'r0c' || CAST(n_nationkey AS VARCHAR) AS slice_id,
               CAST(2.0 AS DOUBLE) AS area
        FROM nation
        UNION ALL
        SELECT n_nationkey, 'r0c' || CAST(n_nationkey + 1 AS VARCHAR), 2.0
        FROM nation
    """
    sqls["clip_diamond"] = """
        SELECT * FROM (VALUES
            (2, 8.0), (3, 8.0), (8, 42.0), (9, 42.0),
            (14, 42.0), (15, 42.0), (20, 8.0), (21, 8.0)) v(rid, area)
    """
    sqls["erase_diamond"] = """
        WITH clip(rid, a) AS (VALUES
            (2, 8.0), (3, 8.0), (8, 42.0), (9, 42.0),
            (14, 42.0), (15, 42.0), (20, 8.0), (21, 8.0))
        SELECT CAST(i AS INT) AS rid, 60.0 - coalesce(a, 0.0) AS area
        FROM range(24) t(i) LEFT JOIN clip ON clip.rid = i
    """
    sqls["dissolve2"] = """
        SELECT 'S' || CAST(i AS VARCHAR) AS state, 360.0 AS area, 1 AS n_rings
        FROM range(4) t(i)
    """
    sqls["dissolve2_gaps"] = """
        -- hand-derived: 3x3 square whose 1x1 hole (gap face) is filled
        -- (min_gap_area=1.1 > 1.0) + the detached 2x2 square -> 2 rings,
        -- signed area 9 + 4
        SELECT 'g' AS grp, 2 AS n_rings, 13.0 AS area
    """
    sqls["clean"] = """
        -- hand-derived from the reference's expected output rings
        -- (clean-test.js 'Removes overlapping section'): square cedes the
        -- wedge (ring area 3.0), diamond keeps it (8.0), singleton 1.0;
        -- attribute column (tag) carried through like the reference's
        -- data table
        SELECT * FROM (VALUES (1, 'sq', 3.0, 1), (2, 'di', 8.0, 1),
                              (3, 'lone', 1.0, 1))
            t(fid, tag, area, n_rings)
    """
    sqls["layer_info"] = """
        SELECT 'mosaic' AS layer, 'polygon/polyline' AS geometry_type,
               24::BIGINT AS n_features, 0::BIGINT AS n_null_geoms,
               -120.0 AS xmin, 25.0 AS ymin, -60.0 AS xmax, 49.0 AS ymax,
               'rid,state,pop' AS fields
    """
    sqls["phash_dups"] = """
        -- same synthetic phash derivation as layers.synth_images, banded
        -- pigeonhole blocking + exact hamming via DuckDB bit functions
        WITH img AS (
            SELECT 'img' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,
                   CASE WHEN i % 100 = 1
                        THEN xor(((i - 1) * 2654435761) % 1099511627776, 3)
                        ELSE (i * 2654435761) % 1099511627776 END AS phash
            FROM range(2000) t(i)),
        banded AS (
            SELECT image_id, phash, b.band,
                   (phash // power(2, b.band * 10)::BIGINT)::BIGINT % 1024 AS chunk
            FROM img, (SELECT unnest(range(4)) AS band) b),
        cand AS (
            SELECT DISTINCT a.image_id AS id_a, b.image_id AS id_b,
                   a.phash AS ph_a, b.phash AS ph_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.chunk = b.chunk
             AND a.image_id < b.image_id)
        SELECT id_a, id_b, bit_count(xor(ph_a, ph_b)) AS hamming
        FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 6
    """
    sqls["each_assign"] = """
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 4) AS revenue,
               round(l_extendedprice * (1 - l_discount), 4) > 10000 AS big
        FROM lineitem
    """
    sqls["colorizer_breaks"] = """
        SELECT c_custkey,
               CASE WHEN c_acctbal IS NULL THEN 'none'
                    WHEN c_acctbal < 0 THEN 'low'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS color
        FROM customer
    """
    sqls["shape_freehand"] = """
        SELECT 'shape' AS name, 'polygon' AS geometry_type,
               0.0 AS last_x, 5 AS n_vertices
    """
    sqls["stitch_antimeridian"] = """
        -- hand-derived: the two antimeridian halves merge into one 7-vertex
        -- ring (seam removed); the non-edge square is untouched
        SELECT * FROM (VALUES (1, 1, 7), (2, 1, 5))
            t(fid, n_rings, n_vertices)
    """
    sqls["repair_self"] = """
        -- closed-form repair result of the twisted quad A(0,0) B(0,2)
        -- C(1,2) D(-u,0), u=(k+1)/50: self-crossing at X=(0, 2u/(1+u));
        -- the kept (larger) piece is the 4-vertex ring X,B,C,X with
        -- area 1/(1+u) (the twist triangle X,D,A has area u^2/(1+u))
        SELECT CAST(n_nationkey AS INT) AS fid,
               1 AS n_parts,
               CAST(4 AS BIGINT) AS n_vertices,
               round(1.0 / (1.0 + (n_nationkey + 1) / 50.0), 5) AS kept_area
        FROM nation
        ORDER BY fid
    """
    sqls["intersection_cuts"] = """
        -- hand-derived arc split of two overlapping unit-2 squares: four
        -- arcs between the intersection points (1,2) and (2,1), each
        -- running in its source ring's traversal direction after rotation
        -- to the first cut (the reference keeps original arc direction;
        -- ring 0 = [0,0 0,2 2,2 2,0], ring 1 = [1,1 1,3 3,3 3,1], both CW
        -- in screen coords, first cut encountered = (1,2))
        SELECT * FROM (VALUES
            (0, 3, 1.0, 2.0, 2.0, 1.0),
            (1, 5, 2.0, 1.0, 1.0, 2.0),
            (2, 5, 1.0, 2.0, 2.0, 1.0),
            (3, 3, 2.0, 1.0, 1.0, 2.0))
            t(arc_id, n, x0, y0, x1, y1)
    """
    # the reference's own expected document (svg-test.js:105-106) as a SQL
    # literal: the driver's value hash pins the export byte-for-byte
    _svg_golden = (
        '<?xml version="1.0"?>\n'
        '<svg xmlns="http://www.w3.org/2000/svg" version="1.2" '
        'baseProfile="tiny" width="900" height="300" viewBox="0 0 900 300" '
        'stroke-linecap="round" stroke-linejoin="round">\n<g id="path">\n'
        '<path d="M 0 300 0 0 300 0 300 300 0 300 Z '
        'M 600 0 900 0 900 300 600 300 600 0 Z"/>\n</g>\n</svg>')
    sqls["svg_export"] = (
        "SELECT '" + _svg_golden.replace("'", "''").replace("\n", "' || chr(10) || '")
        + "' AS doc")
    sqls["cli_pipeline"] = """
        SELECT upper(c_mktsegment) AS seg,
               CAST(sum(c_nationkey) AS BIGINT) AS sum_nk,
               CAST(count(*) AS BIGINT) AS n
        FROM customer WHERE c_acctbal > 1000
        GROUP BY upper(c_mktsegment)
    """
    sqls["cli_pipeline2"] = """
        WITH pts AS (
            SELECT c_custkey,
                   -120.0 + (c_custkey % 1000) / 1000.0 * 60.0 AS lon,
                   25.0 + (c_custkey * 7 % 1000) / 1000.0 * 24.0 AS lat
            FROM customer)
        SELECT c_custkey,
               round(lon * 2 + 3, 6) AS ax,
               round(lat * 2 + 4, 6) AS ay
        FROM pts
        WHERE lon BETWEEN -110 AND -70 AND lat BETWEEN 30 AND 45
    """
    sqls["proj_sinu"] = """
        -- ellipsoidal sinusoidal, Snyder eq. 30-1..30-2 re-derived in SQL
        -- (WGS84, lon_0 = -20): x = a*lam*cos(phi)/sqrt(1-es*sin^2 phi),
        -- y = meridional arc M(phi) by the eq. 3-21 series
        WITH pts AS (
            SELECT i AS id,
                   -170.0 + (i * 73 % 3400) / 10.0 AS lon,
                   -80.0 + (i * 117 % 1600) / 10.0 AS lat
            FROM range(100) t(i)),
        f AS (
            SELECT id, radians(lat) AS phi, radians(lon + 20.0) AS lam,
                   CAST(6378137.0 AS DOUBLE) AS a,
                   CAST(0.0066943799901413165 AS DOUBLE) AS es
            FROM pts)
        SELECT id,
            round(a * lam * cos(phi) / sqrt(1 - es * sin(phi) * sin(phi)), 4) AS x,
            round(a * ((1 - es/4 - 3*es*es/64 - 5*es*es*es/256) * phi
                     - (3*es/8 + 3*es*es/32 + 45*es*es*es/1024) * sin(2*phi)
                     + (15*es*es/256 + 45*es*es*es/1024) * sin(4*phi)
                     - (35*es*es*es/3072) * sin(6*phi)), 4) AS y
        FROM f
    """
    sqls["proj_wintri"] = """
        WITH pts AS (
            SELECT n_nationkey,
                   radians(CAST((n_nationkey * 13 % 340) - 170 AS DOUBLE)) AS lam,
                   radians(CAST((n_nationkey * 7 % 160) - 80 AS DOUBLE)) AS phi
            FROM nation),
        wt AS (
            SELECT n_nationkey, lam, phi,
                   acos(least(1.0, greatest(-1.0, cos(phi) * cos(lam / 2)))) AS alpha
            FROM pts),
        wt2 AS (
            SELECT n_nationkey, lam, phi,
                   CASE WHEN abs(alpha) < 1e-12 THEN 1.0
                        ELSE sin(alpha) / alpha END AS sinca
            FROM wt),
        ee AS (
            SELECT n_nationkey, lam, phi,
                   asin(least(1.0, greatest(-1.0, sqrt(3) / 2 * sin(phi)))) AS t
            FROM pts)
        SELECT n_nationkey, 'wintri' AS which,
               round(6378137.0 / 2 * (lam * (2 / pi()) +
                     2 * cos(phi) * sin(lam / 2) / sinca), 4) AS x,
               round(6378137.0 / 2 * (phi + sin(phi) / sinca), 4) AS y
        FROM wt2
        UNION ALL
        SELECT n_nationkey, 'eqearth',
               round(6378137.0 * lam * cos(t) / ((sqrt(3) / 2) *
                     (1.340264 + 3 * (-0.081106) * t * t +
                      pow(t, 6) * (7 * 0.000893 + 9 * 0.003796 * t * t))), 4),
               round(6378137.0 * t * (1.340264 + (-0.081106) * t * t +
                     pow(t, 6) * (0.000893 + 0.003796 * t * t)), 4)
        FROM ee
    """
    sqls["proj_tpeqd"] = """
        WITH c AS (
            SELECT radians(35.0) AS p1, radians(-10.0) AS l1,
                   radians(45.0) AS p2, radians(60.0) AS l2
        ), k AS (
            SELECT p1, l1,
                   acos(sin(p1) * sin(p2) +
                        cos(p1) * cos(p2) * cos(l2 - l1)) AS d2,
                   -- N = A x B, A/B the unit vectors of the two foci
                   cos(p1) * sin(l1) * sin(p2) -
                       sin(p1) * cos(p2) * sin(l2) AS nx,
                   sin(p1) * cos(p2) * cos(l2) -
                       cos(p1) * cos(l1) * sin(p2) AS ny,
                   cos(p1) * cos(l1) * cos(p2) * sin(l2) -
                       cos(p1) * sin(l1) * cos(p2) * cos(l2) AS nz
            FROM c
        ), pts AS (
            SELECT n_nationkey,
                   radians(CAST((n_nationkey * 17 % 340) - 170 AS DOUBLE))
                       AS lam,
                   radians(CAST((n_nationkey * 11 % 160) - 80 AS DOUBLE))
                       AS phi
            FROM nation
        ), z AS (
            SELECT n_nationkey, d2 / 2 AS d,
                   acos(least(1.0, greatest(-1.0,
                       sin(phi) * sin(p1) +
                       cos(phi) * cos(p1) * cos(lam - l1)))) AS za,
                   acos(least(1.0, greatest(-1.0,
                       sin(phi) * sin(radians(45.0)) +
                       cos(phi) * cos(radians(45.0)) *
                       cos(lam - radians(60.0))))) AS zb,
                   CASE WHEN cos(phi) * cos(lam) * nx +
                             cos(phi) * sin(lam) * ny +
                             sin(phi) * nz >= 0
                        THEN 1.0 ELSE -1.0 END AS side
            FROM pts, k
        ), xy AS (
            SELECT n_nationkey, side,
                   (za * za - zb * zb) / (4 * d) AS xr,
                   za, d
            FROM z
        )
        SELECT n_nationkey,
               round(6378137.0 * xr, 3) AS x,
               round(6378137.0 * side *
                     sqrt(greatest(za * za - (xr + d) * (xr + d), 0.0)),
                     3) AS y
        FROM xy
    """
    sqls["proj_healpix"] = """
        WITH pts AS (
            SELECT n_nationkey,
                   radians(CAST((n_nationkey * 17 % 340) - 170 AS DOUBLE))
                       AS lam,
                   radians(CAST((n_nationkey * 23 % 178) - 89 AS DOUBLE))
                       AS phi
            FROM nation
        ), pol AS (
            SELECT n_nationkey, lam, phi,
                   sqrt(3 * (1 - abs(sin(phi)))) AS sig,
                   least(floor(2 * lam / pi() + 2), 3) AS cn
            FROM pts
        ), f AS (
            SELECT n_nationkey, lam, phi, sig,
                   -3 * pi() / 4 + (pi() / 2) * cn AS lamc
            FROM pol
        )
        SELECT n_nationkey,
               round(6378137.0 * CASE
                   WHEN abs(phi) <= asin(2.0 / 3.0) THEN lam
                   ELSE lamc + (lam - lamc) * sig END, 3) AS x,
               round(6378137.0 * CASE
                   WHEN abs(phi) <= asin(2.0 / 3.0)
                       THEN 3 * pi() / 8 * sin(phi)
                   ELSE sign(phi) * (pi() / 4) * (2 - sig) END, 3) AS y
        FROM f
    """
    sqls["proj_qsc"] = """
        WITH pts AS (
            SELECT n_nationkey,
                   radians(CAST((n_nationkey * 7 % 80) - 40 AS DOUBLE))
                       AS lam,
                   radians(CAST((n_nationkey * 13 % 80) - 40 AS DOUBLE))
                       AS phi
            FROM nation
        ), c AS (
            SELECT n_nationkey,
                   cos(phi) * cos(lam) AS q,
                   cos(phi) * sin(lam) AS r,
                   sin(phi) AS s
            FROM pts
        ), th0 AS (
            SELECT n_nationkey, acos(least(1.0, greatest(-1.0, q))) AS pc,
                   CASE WHEN acos(least(1.0, greatest(-1.0, q))) < 1e-10
                        THEN 0.0 ELSE atan2(s, r) END AS th_raw
            FROM c
        ), ar AS (
            SELECT n_nationkey, pc,
                   CASE
                     WHEN abs(th_raw) <= pi()/4 THEN 0
                     WHEN th_raw > pi()/4 AND th_raw <= 3*pi()/4 THEN 1
                     WHEN th_raw > 3*pi()/4 OR th_raw <= -3*pi()/4 THEN 2
                     ELSE 3 END AS area,
                   CASE
                     WHEN abs(th_raw) <= pi()/4 THEN th_raw
                     WHEN th_raw > pi()/4 AND th_raw <= 3*pi()/4
                         THEN th_raw - pi()/2
                     WHEN th_raw > 3*pi()/4 THEN th_raw - pi()
                     WHEN th_raw <= -3*pi()/4 THEN th_raw + pi()
                     ELSE th_raw + pi()/2 END AS th
            FROM th0
        ), mu0 AS (
            SELECT n_nationkey, pc, area, th,
                   atan((12.0/pi()) * (th + acos(least(1.0, greatest(-1.0,
                       sin(th) * cos(pi()/4)))) - pi()/2)) AS mu
            FROM ar
        ), t0 AS (
            SELECT n_nationkey, area, mu,
                   sqrt(greatest((1 - cos(pc)) /
                       (cos(mu) * cos(mu) *
                        (1 - cos(atan(1.0 / cos(th))))), 0.0)) AS t
            FROM mu0
        )
        SELECT n_nationkey,
               round(6378137.0 * t * cos(mu + area * pi()/2), 3) AS x,
               round(6378137.0 * t * sin(mu + area * pi()/2), 3) AS y
        FROM t0
    """
    sqls["proj_lcc"] = """
        -- published Snyder worked-example values (USGS PP 1395):
        -- LCC p.296, AEA p.292, TM p.269-270 (Clarke 1866)
        SELECT * FROM (VALUES
            ('lcc', 1894410.9, 1564649.5),
            ('aea', 1885472.7, 1535925.0),
            ('tm',   127106.5, 4484124.4)) t(which, x, y)
    """
    sqls["proj_utm"] = """
        -- PROJ documentation quickstart: echo 12 55 | proj +proj=utm
        -- +zone=32  ->  691875.63  6098907.83
        SELECT * FROM (VALUES ('pub', 691875.63, 6098907.83)) t(tag, x, y)
    """
    sqls["csv_empty_cells"] = """
        -- reference import semantics (delim-import-test.js): ID/VALUE
        -- promote numeric ('' and missing -> null); STATE stays string
        -- (missing -> null, present-empty -> '', quotes unescaped)
        SELECT * FROM (VALUES
            (1.0, NULL,            NULL),
            (2.0, 'WA',            300.0),
            (3.0, '',              NULL),
            (4.0, 'he said "hi"',  5.0),
            (5.0, 'x,y',           NULL)) t(id, state, value)
    """
    sqls["ndjson_roundtrip"] = """
        SELECT * FROM (VALUES
            (0, 'A', 10, 5), (1, 'A', 20, 5),
            (2, 'B', 30, 5), (3, 'B', 40, 5)) t(fid, state, pop, n_vertices)
    """
    sqls["ring_repair"] = """
        SELECT CAST(i AS INT) AS fid, 4.0 AS outer_area,
               round(-power(0.2 + 0.1 * (i % 5), 2), 6) AS hole_area
        FROM range(50) t(i)
    """
    sqls["ngram_jaccard"] = """
        WITH g0 AS (
            SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 5) AS g
            FROM (SELECT doc_id, text,
                         unnest(generate_series(1, greatest(length(text) - 4, 0))) AS i
                  FROM documents WHERE doc_id < 150)),
        -- max_df=10000 vocabulary cap (matches char_ngram_jaccard_pairs)
        g AS (SELECT * FROM g0 WHERE g IN (
              SELECT g FROM g0 GROUP BY g HAVING count(*) <= 10000)),
        sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
            FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(CAST(ni AS DOUBLE) / CAST(sa.sz + sb.sz - ni AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        WHERE CAST(ni AS DOUBLE) / CAST(sa.sz + sb.sz - ni AS DOUBLE) >= 0.25
    """
    sqls["video_frame_sample"] = """
        SELECT 'vid' || lpad(CAST(i AS VARCHAR), 4, '0') AS media_id,
               CAST(k AS INT) AS frame_idx, k * 1000 AS ts_ms,
               781 AS frame_len, 'ppm' AS fmt
        FROM range(20) t(i), range(15) u(k)
        WHERE k * 1000 < 3000 + i * 500
    """
    sqls["audio_features"] = """
        WITH samples AS (
            SELECT i, j, ((i * 7 + j * 13) % 2001) - 1000 AS v
            FROM range(30) t(i), range(256) u(j))
        SELECT 'aud' || lpad(CAST(i AS VARCHAR), 3, '0') AS media_id,
               CAST(256 AS BIGINT) AS n_samples,
               round(sqrt(avg(CAST(v AS DOUBLE) * v)), 6) AS rms,
               CAST(sum(CASE WHEN j > 0 AND ((v < 0) !=
                   ((((i * 7 + (j - 1) * 13) % 2001) - 1000) < 0))
                   THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        FROM samples GROUP BY i
    """
    sqls["audio_features_wav"] = """
        -- G.711 mu-law expansion in closed form (ITU-T G.711): byte c ->
        -- u = ~c; pcm = sign * (((mant*8 + 132) << exp) - 132)
        WITH dec AS (
            SELECT i, j,
                   CASE WHEN (255 - c) >= 128 THEN -1 ELSE 1 END *
                   ((((255 - c) % 16) * 8 + 132) *
                    (1 << (((255 - c) // 16) % 8)) - 132) AS v
            FROM (SELECT i, j, (i * 37 + j * 11) % 256 AS c
                  FROM range(24) t(i), range(240) u(j))),
        lagged AS (
            SELECT i, j, v,
                   lag(v) OVER (PARTITION BY i ORDER BY j) AS prev
            FROM dec)
        SELECT 'wav' || lpad(CAST(i AS VARCHAR), 3, '0') AS media_id,
               CAST(240 AS BIGINT) AS n_samples,
               round(sqrt(avg(CAST(v AS DOUBLE) * v)), 6) AS rms,
               CAST(sum(CASE WHEN j > 0 AND ((v < 0) != (prev < 0))
                             THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        FROM lagged GROUP BY i
    """
    sqls["video_frames_mjpeg"] = """
        -- avih us_per_frame = 400000 (fps 2.5); duration_ms is NULL so
        -- duration = n_frames * 400 ms; frame on screen at ts = ts // 400
        WITH vids AS (SELECT i, 3 + (i % 3) AS n FROM range(8) t(i))
        SELECT 'mv' || lpad(CAST(i AS VARCHAR), 3, '0') AS media_id,
               CAST(least(k * 300 // 400, n - 1) AS INT) AS frame_idx,
               k * 300 AS ts_ms, 781 AS frame_len, 'ppm' AS fmt
        FROM vids, range(7) u(k)
        WHERE k * 300 < n * 400
    """
    sqls["spherical_area"] = """
        SELECT CAST(i AS INT) AS rid,
               round(radians(10.0)
                     * (sin(radians(25.0 + (i // 6 + 1) * 6.0))
                        - sin(radians(25.0 + (i // 6) * 6.0)))
                     * 6378137.0 * 6378137.0 / 1e9, 4) AS area_km2e3
        FROM range(24) t(i)
    """
    sqls["area_expr"] = """
        SELECT CAST(i AS INT) AS rid, 60.0 AS area, 10.0 AS w,
               CAST(1 AS INT) AS np
        FROM range(24) t(i)
    """
    sqls["explode_parts"] = """
        SELECT CAST(i AS INT) AS rid, CAST(0 AS INT) AS part_idx, 1 AS n_rings,
               -120.0 + (i % 6) * 10.0 AS xmin
        FROM range(24) t(i)
    """
    sqls["filter_slivers"] = """
        SELECT CAST(i AS INT) AS fid,
               CASE WHEN i % 5 >= 2 THEN 2 ELSE 1 END AS n_rings
        FROM range(50) t(i)
    """
    sqls["join_calc"] = """
        WITH src AS (
            SELECT o.o_orderkey, o.o_totalprice, c.c_nationkey AS nk
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        agg AS (
            SELECT nk, count(*) AS joins, count(o_orderkey) AS n_orders,
                   round(sum(o_totalprice), 2) AS total,
                   round(avg(o_totalprice), 4) AS avg_price,
                   round(median(o_totalprice), 4) AS med_price
            FROM src GROUP BY nk)
        SELECT n_nationkey, n_name, coalesce(a.joins, 0) AS joins,
               a.n_orders, a.total, a.avg_price, a.med_price
        FROM nation n LEFT JOIN agg a ON n.n_nationkey = a.nk
    """
    # data_fill on the 6x4 mosaic, seeds at rid % 3 == 0 (columns 0 and 3 of
    # every row): vertical neighbors of empty cells are also empty, so fills
    # propagate horizontally: c=1 <- c=0, c=2 <- c=3, c=4 <- c=3,
    # c=5 <- c=4 (second pass, value originally from c=3)
    sqls["data_fill"] = """
        SELECT CAST(i AS INT) AS rid,
               round(CASE
                   WHEN i % 6 IN (0, 3) THEN (i * 37) % 1000 + 100
                   WHEN i % 6 = 1 THEN ((i - 1) * 37) % 1000 + 100
                   ELSE ((i // 6 * 6 + 3) * 37) % 1000 + 100
               END, 2) AS val
        FROM range(24) t(i)
    """

    # mosaic cell (r,c) bbox intersects [-95,30,-75,40] iff c in 2..4, r in 0..2
    sqls["filter_geom_paths"] = """
        SELECT CAST(r * 6 + c AS INT) AS rid
        FROM range(3) t(r), range(2, 5) u(c)
    """
    stop_pat = r"\b(" + "|".join(TX.STOPWORDS) + r")\b"
    pat_en = r"\b(" + "|".join(TX.LANG_MARKERS["en"]) + r")\b"
    pat_es = r"\b(" + "|".join(TX.LANG_MARKERS["es"]) + r")\b"
    pat_fr = r"\b(" + "|".join(TX.LANG_MARKERS["fr"]) + r")\b"
    pat_de = r"\b(" + "|".join(TX.LANG_MARKERS["de"]) + r")\b"
    sqls["text_metrics"] = f"""
        WITH m AS (
            SELECT doc_id, text,
                   length(regexp_extract_all(text, '\\S+')) AS n_tokens,
                   length(text) AS nc,
                   length(text) - length(regexp_replace(text, '[,;:!?.]', '', 'g')) AS punct,
                   length(regexp_extract_all(lower(text), '{stop_pat}')) AS stop,
                   length(regexp_extract_all(lower(text), '{pat_en}')) AS c_en,
                   length(regexp_extract_all(lower(text), '{pat_es}')) AS c_es,
                   length(regexp_extract_all(lower(text), '{pat_fr}')) AS c_fr,
                   length(regexp_extract_all(lower(text), '{pat_de}')) AS c_de
            FROM documents)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               round(0.4 * least(1.0, n_tokens / 100.0)
                     + 0.3 * (1.0 - punct / greatest(nc, 1))
                     + 0.3 * least(1.0, 4.0 * (stop / greatest(n_tokens, 1))), 6) AS quality,
               CASE WHEN greatest(c_en, c_es, c_fr, c_de) = 0 THEN 'und'
                    WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en'
                    WHEN c_es >= c_fr AND c_es >= c_de THEN 'es'
                    WHEN c_fr >= c_de THEN 'fr'
                    ELSE 'de' END AS lang_pred,
               md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
        FROM m
    """
    sqls["dedup_exact"] = """
        SELECT doc_id, source FROM (
            SELECT doc_id, source, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents) WHERE rn = 1
    """
    sqls["word_jaccard"] = """
        WITH w0 AS (
            SELECT doc_id, unnest(list_distinct(regexp_extract_all(text, '\\S+'))) AS w
            FROM documents WHERE doc_id < 250),
        -- max_df=10000 vocabulary cap (matches word_jaccard_pairs)
        w AS (SELECT * FROM w0 WHERE w IN (
              SELECT w FROM w0 GROUP BY w HAVING count(*) <= 10000)),
        sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
            FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(CAST(ni AS DOUBLE) / CAST(sa.sz + sb.sz - ni AS DOUBLE), 6) AS jaccard
        FROM inter
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE CAST(ni AS DOUBLE) / CAST(sa.sz + sb.sz - ni AS DOUBLE) >= 0.5
    """
    sqls["dedup_clusters"] = """
        WITH w0 AS (
            SELECT doc_id, unnest(list_distinct(regexp_extract_all(text, '\\S+'))) AS w
            FROM documents WHERE doc_id < 250),
        w AS (SELECT * FROM w0 WHERE w IN (
              SELECT w FROM w0 GROUP BY w HAVING count(*) <= 10000)),
        sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
            FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
        pairs AS (
            SELECT id_a, id_b FROM inter
            JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
            WHERE CAST(ni AS DOUBLE) / CAST(sa.sz + sb.sz - ni AS DOUBLE) >= 0.5),
        edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        nodes AS (SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 250),
        walk AS (
            -- connected components: min reachable id via recursive closure
            WITH RECURSIVE r(id, comp) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT e.b, r.comp FROM r JOIN edges e ON e.a = r.id)
            SELECT id, min(comp) AS comp FROM r GROUP BY id)
        SELECT id AS doc_id, comp AS cluster, id = comp AS is_canonical
        FROM walk
    """
    sqls["events_rollup"] = """
        SELECT user_id, CAST(ts AS DATE) AS day, event_type,
               count(*) AS n, round(sum(value), 2) AS value_sum
        FROM events GROUP BY 1, 2, 3
    """
    sqls["cluster"] = _cluster_oracle_sql(count=8, iterations=8, cap=10_000)
    sqls["proj_albersusa"] = _albersusa_oracle_sql()
    sqls["close_gaps"] = """
        -- replay of closeGaps on the synthetic fixture: every endpoint
        -- coordinate is unique -> all 6 endpoints/group are dangles;
        -- within-tolerance dangles pair (mover = higher (arc, which) key);
        -- remaining dangles project onto other arcs' segments with the
        -- EXACT kernel formula (t = dot/seg2 clipped, q = a + d*t)
        WITH g AS (SELECT CAST(i AS BIGINT) AS i, CAST(i AS DOUBLE)*20.0 AS x0
                   FROM range(20) t(i)),
        -- (px, py) = the dangle's neighbor vertex, the anchor of the
        -- reference's tiny-overshoot extension (mapshaper-gaps.js:96-118)
        ends(arc_id, wh, ex, ey, px, py) AS (
            SELECT 3*i, 0, x0, 0.0, x0+1.0, 0.0 FROM g
            UNION ALL SELECT 3*i, 1, x0, 0.01, x0, 1.0 FROM g
            UNION ALL SELECT 3*i+1, 0, x0+2.0, 5.0, x0+5.0, 5.0 FROM g
            UNION ALL SELECT 3*i+1, 1, x0+5.0, 5.0, x0+2.0, 5.0 FROM g
            UNION ALL SELECT 3*i+2, 0, x0+3.0, 5.6, x0+3.0, 5.03 FROM g
            UNION ALL SELECT 3*i+2, 1, x0+3.0, 5.03, x0+3.0, 5.6 FROM g),
        prs AS (
            SELECT a.arc_id AS aa, a.wh AS aw, b.arc_id AS ba, b.wh AS bw,
                   a.ex, a.ey
            FROM ends a JOIN ends b
              ON (a.ex-b.ex)*(a.ex-b.ex) + (a.ey-b.ey)*(a.ey-b.ey) <= 0.0025
             AND (a.arc_id < b.arc_id
                  OR (a.arc_id = b.arc_id AND a.wh < b.wh))),
        taken AS (SELECT aa AS arc_id, aw AS wh FROM prs
                  UNION ALL SELECT ba, bw FROM prs),
        rem AS (SELECT e.* FROM ends e
                LEFT JOIN taken t ON e.arc_id = t.arc_id AND e.wh = t.wh
                WHERE t.arc_id IS NULL),
        segs(arc_id, sax, say, sbx, sby) AS (
            SELECT 3*i, x0, 0.0, x0+1.0, 0.0 FROM g
            UNION ALL SELECT 3*i, x0+1.0, 0.0, x0+1.0, 1.0 FROM g
            UNION ALL SELECT 3*i, x0+1.0, 1.0, x0, 1.0 FROM g
            UNION ALL SELECT 3*i, x0, 1.0, x0, 0.01 FROM g
            UNION ALL SELECT 3*i+1, x0+2.0, 5.0, x0+5.0, 5.0 FROM g
            UNION ALL SELECT 3*i+2, x0+3.0, 5.6, x0+3.0, 5.03 FROM g),
        pr0 AS (
            SELECT r.arc_id, r.wh, r.px, r.py, tt,
                   s.sax + (s.sbx - s.sax) * tt AS qx,
                   s.say + (s.sby - s.say) * tt AS qy
            FROM rem r JOIN segs s ON s.arc_id != r.arc_id,
            LATERAL (SELECT least(greatest(
                       ((r.ex - s.sax)*(s.sbx - s.sax)
                        + (r.ey - s.say)*(s.sby - s.say))
                       / ((s.sbx - s.sax)*(s.sbx - s.sax)
                          + (s.sby - s.say)*(s.sby - s.say)), 0.0), 1.0) AS tt)),
        -- interior hits get the tiny overshoot: q' = p + (d+1e-6)/d*(q-p)
        pr1 AS (
            SELECT arc_id, wh, qx AS qx0, qy AS qy0,
                   CASE WHEN tt > 0 AND tt < 1 AND dd > 0
                        THEN px + (dd + 1e-6)/dd * (qx - px) ELSE qx END AS qx,
                   CASE WHEN tt > 0 AND tt < 1 AND dd > 0
                        THEN py + (dd + 1e-6)/dd * (qy - py) ELSE qy END AS qy
            FROM (SELECT p.*, sqrt((qx-px)*(qx-px) + (qy-py)*(qy-py)) AS dd
                  FROM pr0 p)),
        hits AS (
            SELECT arc_id, wh, qx, qy,
                   row_number() OVER (PARTITION BY arc_id, wh
                                      ORDER BY d2, qx, qy) AS rn
            FROM (SELECT p.*, (qx0 - r.ex)*(qx0 - r.ex)
                            + (qy0 - r.ey)*(qy0 - r.ey) AS d2
                  FROM pr1 p JOIN rem r USING (arc_id, wh))
            WHERE d2 <= 0.0025),
        moves AS (SELECT ba AS arc_id, bw AS wh, ex AS qx, ey AS qy FROM prs
                  UNION ALL SELECT arc_id, wh, qx, qy FROM hits WHERE rn = 1)
        SELECT e.arc_id,
               round(coalesce(m0.qx, s0.ex), 9) AS ax,
               round(coalesce(m0.qy, s0.ey), 9) AS ay,
               round(coalesce(m1.qx, s1.ex), 9) AS bx,
               round(coalesce(m1.qy, s1.ey), 9) AS by
        FROM (SELECT DISTINCT arc_id FROM ends) e
        JOIN ends s0 ON s0.arc_id = e.arc_id AND s0.wh = 0
        JOIN ends s1 ON s1.arc_id = e.arc_id AND s1.wh = 1
        LEFT JOIN moves m0 ON m0.arc_id = e.arc_id AND m0.wh = 0
        LEFT JOIN moves m1 ON m1.arc_id = e.arc_id AND m1.wh = 1
    """
    sqls["snap_sweep"] = """
        -- isolated jitter clusters (diameter << interval << separation):
        -- the serial sweep provably collapses each cluster onto its
        -- lexicographic-min (x, y) point = the zero-offset base point
        SELECT CAST(i AS BIGINT) AS c, CAST(50 AS BIGINT) AS n,
               round(i*7.0, 9) AS x_min, round(i*7.0, 9) AS x_max,
               round(CAST(i*3 % 11 AS DOUBLE), 9) AS y_min,
               round(CAST(i*3 % 11 AS DOUBLE), 9) AS y_max
        FROM range(60) t(i)
    """
    sqls["fast_simplify"] = """
        WITH RECURSIVE v AS (
          SELECT arc_id, j AS i, CAST(j AS DOUBLE) AS x,
                 CAST((arc_id*31 + j*17) % 13 AS DOUBLE) * 0.25 AS y
          FROM range(0, 20) t(arc_id), range(0, 33) s(j)
        ),
        keep AS (
          SELECT arc_id, i, x, y FROM v WHERE i = 0
          UNION ALL
          SELECT nxt.arc_id, nxt.i, nxt.x, nxt.y
          FROM keep k, LATERAL (
            SELECT v.arc_id, v.i, v.x, v.y FROM v
            WHERE v.arc_id = k.arc_id AND v.i > k.i
              AND (v.x - k.x)*(v.x - k.x) + (v.y - k.y)*(v.y - k.y) > 4.0
            ORDER BY v.i LIMIT 1) nxt
        ),
        lastk AS (SELECT arc_id, max(i) AS mi FROM keep GROUP BY arc_id),
        extra AS (
          SELECT lv.arc_id, 32 AS i, lv.x, lv.y
          FROM (SELECT arc_id, x, y FROM v WHERE i = 32) lv
          JOIN lastk lk USING (arc_id)
          JOIN keep k ON k.arc_id = lv.arc_id AND k.i = lk.mi
          WHERE lv.x != k.x OR lv.y != k.y
        ),
        allk AS (SELECT * FROM keep UNION ALL SELECT * FROM extra)
        SELECT arc_id, count(*) AS n_kept,
               round(sum(x), 6) AS sx, round(sum(y), 6) AS sy
        FROM allk GROUP BY arc_id
    """
    sqls["simplify_dp"] = """

WITH RECURSIVE v AS (
  SELECT arc_id, j AS i, CAST(j AS DOUBLE) AS x,
         CAST((arc_id*31 + j*17) % 13 AS DOUBLE) * 0.25 AS y
  FROM range(0,200) t(arc_id), range(0,33) s(j)
),
f AS (
  SELECT arc_id, 0 AS s, 32 AS e, 1.7976931348623157e308 AS clamp,
         CAST(NULL AS BIGINT) AS mi, CAST(NULL AS DOUBLE) AS z
  FROM range(0,200) t(arc_id)
  UNION ALL
  SELECT g.arc_id, u.s2, u.e2, g.md AS clamp, u.mi2, u.z2
  FROM (
    SELECT fr.arc_id, fr.s, fr.e, m.mi, least(fr.clamp, m.maxd) AS md
    FROM f fr, LATERAL (
      SELECT d.i AS mi, d.dist AS maxd
      FROM (
        SELECT t.i,
          greatest(
            CASE WHEN t.ac2 = 0 THEN t.ab2
                 WHEN t.ab2 >= t.bc2 + t.ac2 THEN t.bc2
                 WHEN t.bc2 >= t.ab2 + t.ac2 THEN t.ab2
                 ELSE t.ab2 - t.dval * t.dval / t.ac2 * 0.25 END, 0.0) AS dist
        FROM (
          SELECT vv.i,
            (a.x - vv.x)*(a.x - vv.x) + (a.y - vv.y)*(a.y - vv.y) AS ab2,
            (vv.x - c.x)*(vv.x - c.x) + (vv.y - c.y)*(vv.y - c.y) AS bc2,
            (a.x - c.x)*(a.x - c.x) + (a.y - c.y)*(a.y - c.y) AS ac2,
            ((a.x - vv.x)*(a.x - vv.x) + (a.y - vv.y)*(a.y - vv.y))
            + ((a.x - c.x)*(a.x - c.x) + (a.y - c.y)*(a.y - c.y))
            - ((vv.x - c.x)*(vv.x - c.x) + (vv.y - c.y)*(vv.y - c.y)) AS dval
          FROM v vv
          JOIN v a ON a.arc_id = vv.arc_id AND a.i = fr.s
          JOIN v c ON c.arc_id = vv.arc_id AND c.i = fr.e
          WHERE vv.arc_id = fr.arc_id AND vv.i > fr.s AND vv.i < fr.e
        ) t
      ) d
      ORDER BY d.dist DESC, d.i DESC
      LIMIT 1
    ) m
    WHERE fr.mi IS NULL AND fr.e - fr.s > 1
  ) g,
  LATERAL (VALUES
    (CAST(0 AS BIGINT), CAST(0 AS BIGINT), g.mi, sqrt(g.md)),
    (g.s, g.mi, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)),
    (g.mi, g.e, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE))
  ) u(s2, e2, mi2, z2)
  WHERE u.mi2 IS NOT NULL OR u.e2 - u.s2 > 1
),
zv AS (SELECT arc_id, mi, z FROM f WHERE mi IS NOT NULL),
lim AS (
  SELECT z AS zlimit FROM zv
  ORDER BY z
  LIMIT 1 OFFSET (SELECT CAST(floor(0.7 * (count(*) + 2)) AS BIGINT) - 1
                  FROM zv)
)
SELECT arc_id, CAST(2 + count(*) FILTER (WHERE z >= (SELECT zlimit FROM lim))
               AS INT) AS n_kept
FROM zv GROUP BY arc_id

    """
    sqls["subdivide"] = f"""
        WITH RECURSIVE pts AS (
          SELECT c_custkey AS k, lon AS x, lat AS y
          FROM ({_CUSTOMER_POINTS_SQL})
        ),
        s AS (
          SELECT k, x, y, '' AS path FROM pts
          UNION ALL
          SELECT k, x, y,
                 path || CASE WHEN rk < (cnt + 1) // 2 THEN 'L' ELSE 'R' END
          FROM (
            SELECT k, x, y, path, cnt,
                   row_number() OVER (PARTITION BY path
                     ORDER BY CASE WHEN wide THEN x ELSE y END, k) - 1 AS rk
            FROM (
              SELECT k, x, y, path,
                     count(*) OVER w AS cnt,
                     (max(x) OVER w - min(x) OVER w) >
                     (max(y) OVER w - min(y) OVER w) AS wide
              FROM s
              WINDOW w AS (PARTITION BY path)
            )
          )
          WHERE cnt > 300
        )
        SELECT 'split-' || dense_rank() OVER (ORDER BY path) AS split_name,
               n
        FROM (
          SELECT path, count(*) AS n FROM s t
          WHERE length(path) = (SELECT max(length(path)) FROM s t2
                                WHERE t2.k = t.k)
          GROUP BY path
        )
    """
    sqls["ann_topk"] = f"""
        WITH q(i, qv) AS (VALUES {qvals}),
        e AS (
            SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
                   generate_subscripts(embedding, 1) - 1 AS i
            FROM embeddings),
        s AS (
            SELECT e.vec_id,
                   round(sum(e.v * q.qv) / (sqrt(sum(e.v * e.v)) * {qnorm!r}), 6) AS score
            FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id)
        SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT 10
    """
    sqls["cosine_pairs"] = """
        WITH e AS (
            SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE vec_id < 150),
        n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
        d AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2)
        SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
        FROM d JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
        WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.2
    """
    return sqls
