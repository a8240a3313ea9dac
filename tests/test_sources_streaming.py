"""Sources (GeoJSON/TopoJSON/Shapefile/CSV), expression functions, and
Structured Streaming tests — including parity reads of the reference's own
shapefile fixtures."""

import json
import os

import pytest
from pyspark.sql import functions as F

from mapshaper_spark import layers as L
from mapshaper_spark.sources import geojson as GJ
from mapshaper_spark.sources import shapefile as SHP
from mapshaper_spark.sources import topojson as TJ

REF = "/root/reference/test/test_data"


class TestGeoJSON:
    def test_import_polygon_collection(self, spark):
        obj = {"type": "GeometryCollection", "geometries": [
            {"type": "Polygon", "coordinates": [[[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]]},
            {"type": "Point", "coordinates": [3.5, 4.5]},
        ]}
        df = GJ.import_geojson(spark, obj)
        rows = {r.fid: r for r in df.collect()}
        assert rows[0].geometry_type == "Polygon"
        assert rows[0].rings_x == [[0.0, 0.0, 1.0, 1.0, 0.0]]
        assert rows[1].x == 3.5 and rows[1].y == 4.5

    def test_roundtrip_polygon(self, spark):
        _, _, polys = (None, None, L.region_mosaic_rings_local(spark, 2, 2, (0, 0, 2, 2)))
        text = GJ.export_geojson(polys.select("rid", "rings_x", "rings_y"),
                                 geometry_type="Polygon", property_cols=["rid"])
        back = GJ.import_geojson(spark, text)
        assert back.count() == 4
        r0 = back.filter(F.col("properties").contains('"rid": 0')
                         | F.col("properties").contains('"rid":0')).collect()
        assert len(r0) == 1
        assert r0[0].rings_x == [[0.0, 0.0, 1.0, 1.0, 0.0]]

    def test_point_features_ndjson_shape(self, spark):
        pts = spark.createDataFrame([(1, 2.0, 3.0)], "pid int, x double, y double")
        out = GJ.to_geojson_features(pts, "Point", x="x", y="y",
                                     property_cols=["pid"]).collect()
        f = json.loads(out[0].feature_json)
        assert f["geometry"] == {"type": "Point", "coordinates": [2.0, 3.0]}
        assert f["properties"]["pid"] == 1


class TestTopoJSON:
    def test_roundtrip_mosaic(self, spark):
        feats, arcs = L.region_mosaic(spark, 3, 2, (0.0, 0.0, 3.0, 2.0))
        topo = TJ.export_topojson(arcs, feats, "rid", quantization=10001)
        assert topo["type"] == "Topology"
        assert len(topo["arcs"]) == arcs.count()
        arcs2, feats2 = TJ.import_topojson(spark, topo)
        assert arcs2.count() == arcs.count()
        assert feats2.count() == 6
        # quantized coords reconstruct on-grid coordinates within half a step
        a0 = {r.arc_id: r for r in arcs.collect()}
        a2 = {r.arc_id: r for r in arcs2.collect()}
        for aid, r in a0.items():
            for v0, v1 in zip(r.xs, a2[aid].xs):
                assert abs(v0 - v1) < 3.0 / 10000


class TestShapefile:
    def test_three_points_fixture(self, spark):
        with open(f"{REF}/three_points.shp", "rb") as f:
            shp = f.read()
        with open(f"{REF}/three_points.dbf", "rb") as f:
            dbf = f.read()
        df = SHP.import_shapefile(spark, shp, dbf)
        rows = df.orderBy("fid").collect()
        assert len(rows) == 3
        assert all(r.shp_type == SHP.SHP_POINT for r in rows)
        # known fixture content: three waterfalls
        names = sorted(r.name for r in rows)
        assert names == ["Iguazu Falls", "Niagara Falls", "Salto Angel"]
        assert rows[0].x == pytest.approx(-79.0441178, abs=1e-6)

    def test_two_states_fixture(self, spark):
        with open(f"{REF}/two_states.shp", "rb") as f:
            shp = f.read()
        with open(f"{REF}/two_states.dbf", "rb") as f:
            dbf = f.read()
        df = SHP.import_shapefile(spark, shp, dbf)
        rows = df.orderBy("fid").collect()
        assert len(rows) == 2
        assert all(r.shp_type == SHP.SHP_POLYGON for r in rows)
        assert sorted(r.STATE for r in rows) == ["OR", "WA"]
        assert sorted(r.STATE_NAME for r in rows) == ["Oregon", "Washington"]
        # polygon ring coordinate sanity: lon/lat of the northwest US
        for r in rows:
            xs = [v for ring in r.rings_x for v in ring]
            ys = [v for ring in r.rings_y for v in ring]
            assert all(-125 < v < -116 for v in xs)
            assert all(41 < v < 50 for v in ys)

    def test_ne_admin_lines(self, spark):
        with open(f"{REF}/ne/ne_110m_admin_0_boundary_lines_land.shp", "rb") as f:
            shp = f.read()
        geoms = SHP.read_shp(shp)
        assert len(geoms) > 100
        assert all(g["type"] == SHP.SHP_POLYLINE for g in geoms)


class TestExpressions:
    def test_register_and_translate(self, spark):
        from mapshaper_spark.functions import expressions as EX
        EX.register_geometry_functions(spark)
        polys = L.region_mosaic_rings_local(spark, 2, 2, (0.0, 0.0, 4.0, 4.0))
        polys.createOrReplaceTempView("polys_t")
        sql_expr = EX.translate_proxy_expression("round($.area, 6)")
        out = spark.sql(f"SELECT rid, {sql_expr} AS a FROM polys_t").collect()
        assert all(r.a == 4.0 for r in out)
        assert EX.translate_proxy_expression("$.width * 2") == "(bbox.xmax - bbox.xmin) * 2"

    def test_js_idiom_translation(self):
        """Round-3 translator widening: the JS idioms of the reference's
        -each corpus (string methods, Math.*, ternaries, null tests)
        compile to Spark SQL — the documented no-JS-engine strategy."""
        from mapshaper_spark.functions import expressions as EX
        T = EX.translate_proxy_expression
        # the reference's own -each example (mapshaper-options.js):
        # 'STATE_FIPS=CNTY_FIPS.substr(0, 2)' — JS substr is 0-based
        assert T("CNTY_FIPS.substr(0, 2)") == "substr(CNTY_FIPS, 1, 2)"
        assert T('bar.split(",")[0]') == "split_part(bar, ',', 1)"
        assert T("name.trim().toUpperCase()") == "upper(trim(name))"
        assert T("a ? b : c ? d : e") == "IF(a, b, IF(c, d, e))"
        assert T("Math.pow(y, 2) + Math.round(x)") == "power(y, 2) + round(x)"
        assert T("v == null ? 0 : v") == "IF(v  IS NULL, 0, v)"
        assert T("v != null") == "v  IS NOT NULL"
        # SQL spellings pass through untouched
        assert T("sum(x) > 5 AND y IS NULL") == "sum(x) > 5 AND y IS NULL"

    def test_js_idioms_through_each(self, spark):
        from mapshaper_spark.functions.expressions import each_expr
        df = spark.createDataFrame(
            [("  ab-cd  ", 12.0, None), ("x-y", 3.0, 5.0)],
            "s string, v double, w double")
        out = each_expr(
            df,
            "first = s.trim().toUpperCase().split('-')[0], "
            "band = v > 10 ? 'hi' : 'lo', "
            "wz = w == null ? 0 : w").collect()
        assert [r.first for r in out] == ["AB", "X"]
        assert [r.band for r in out] == ["hi", "lo"]
        assert [r.wz for r in out] == [0.0, 5.0]

    def test_centroid_functions(self, spark):
        from mapshaper_spark.functions import expressions as EX
        EX.register_geometry_functions(spark)
        polys = L.region_mosaic_rings_local(spark, 1, 1, (0.0, 0.0, 2.0, 2.0))
        polys.createOrReplaceTempView("one_poly")
        r = spark.sql("SELECT ms_centroid_x(rings_x, rings_y) cx, "
                      "ms_centroid_y(rings_x, rings_y) cy FROM one_poly").collect()[0]
        assert (r.cx, r.cy) == (1.0, 1.0)


class TestStreaming:
    def test_streaming_rollup_available_now(self, spark, tmp_path):
        from mapshaper_spark.streaming import pipeline as SP
        src = str(tmp_path / "ev2")
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        ev.write.mode("overwrite").parquet(src)
        n_src = ev.count()
        schema = spark.read.parquet(src).schema
        # watermark wider than the data's time span -> no rows counted late,
        # so the drained stream must equal the batch aggregate exactly
        stream = SP.streaming_events_rollup(spark, src, schema, watermark="3650 days")
        q = SP.run_available_now(stream, "rollup_t")
        got = spark.sql("SELECT sum(n) AS total FROM rollup_t").collect()[0].total
        assert got == n_src
        batch = (ev.groupBy(F.to_date("ts").alias("day"), "user_id", "event_type")
                 .agg(F.count(F.lit(1)).alias("n")))
        a = {(r.day, r.user_id, r.event_type): r.n for r in batch.collect()}
        b = {(r.day, r.user_id, r.event_type): r.n
             for r in spark.sql("SELECT * FROM rollup_t").collect()}
        assert a == b
        q.stop()

    def test_streaming_pip_tiles(self, spark, tmp_path):
        from mapshaper_spark.streaming import pipeline as SP
        src = str(tmp_path / "imgs")
        imgs = L.synth_images(spark, 5000).select("id", "phash")
        imgs.write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        polys = L.region_mosaic_rings_local(spark, 6, 4, L.DEFAULT_BBOX)
        stream = SP.streaming_pip_tiles(spark, src, schema, polys, "rid",
                                        L.DEFAULT_BBOX, cache_token="stream-test")
        q = SP.run_available_now(stream, "tiles_t")
        total = spark.sql("SELECT sum(n_images) t FROM tiles_t").collect()[0].t
        assert total == 5000  # every footprint lands in exactly one region
        q.stop()


class TestSvg:
    def test_svg_paths_and_document(self, spark):
        # reference-shaped document (exportSVG template + pixel transform):
        # deeper structural assertions live in tests/test_svg_export.py
        from mapshaper_spark.sources import svg as SVG
        polys = L.region_mosaic_rings_local(spark, 2, 1, (0.0, 0.0, 2.0, 1.0))
        doc = SVG.export_svg(polys)
        assert doc.startswith('<?xml version="1.0"?>')
        assert doc.count("<path") == 2
        # 2:1 content at default width 800 / margin 1 -> 401px tall
        assert 'viewBox="0 0 800 401"' in doc
        # pixel corners: (0,0)->1,400  (1,1)->400,1 (margin = 1px)
        assert "1 400" in doc and "400 1" in doc


class TestTopoPresimplify:
    def test_z_values_embedded(self, spark):
        from mapshaper_spark.operators import simplify as SI
        from mapshaper_spark.sources import topojson as TJ
        feats, arcs = L.region_mosaic(spark, 2, 1, (0.0, 0.0, 2.0, 1.0))
        with_z = SI.compute_thresholds(arcs, method="dp")
        topo = TJ.export_topojson(with_z, feats, "rid", presimplify=True)
        for arc in topo["arcs"]:
            assert all(len(p) == 3 for p in arc)
            # 2-point arcs: both endpoints protected; Infinity -> 0 like
            # getPresimplifyFunction (topojson-presimplify.js:8)
            assert arc[0][2] == 0 and arc[-1][2] == 0

    def test_presimplify_function_parity(self, spark):
        """topojson-presimplify-test.js: width 100000 -> k = 0.1, so
        Infinity -> 0, 0 -> 0, z=100 -> 10, z=500 -> 50."""
        from mapshaper_spark.sources import topojson as TJ
        inf = float("inf")
        arcs = spark.createDataFrame(
            [(0, [0.0, 100000.0], [0.0, 1.0], [inf, 0.0]),
             (1, [0.0, 100000.0], [0.0, 1.0], [100.0, 500.0])],
            "arc_id long, xs array<double>, ys array<double>, "
            "zs array<double>").withColumn(
                "bbox", F.struct(
                    F.array_min("xs").alias("xmin"),
                    F.array_min("ys").alias("ymin"),
                    F.array_max("xs").alias("xmax"),
                    F.array_max("ys").alias("ymax")))
        feats = spark.createDataFrame([(0, [[0]]), (1, [[1]])],
                                      "rid long, parts array<array<int>>")
        topo = TJ.export_topojson(arcs, feats, "rid", presimplify=True)
        assert [p[2] for p in topo["arcs"][0]] == [0, 0]
        assert [p[2] for p in topo["arcs"][1]] == [10, 50]


class TestStatefulSessionize:
    def test_stream_sessions_match_batch(self, spark, tmp_path):
        from mapshaper_spark.streaming import sessionize as SS
        src = str(tmp_path / "sess_ev")
        ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .select("user_id", "ts", "value"))
        ev.write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        sess = SS.sessionize(stream, gap_s=3600)
        q = (sess.writeStream.format("memory").queryName("sessions_t")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = spark.sql(
            "SELECT user_id, session_start, n_events, value_sum "
            "FROM sessions_t").collect()
        q.stop()
        batch = SS.batch_sessionize(ev, gap_s=3600).collect()
        bkeys = {(r.user_id, r.session_start, r.n_events, r.value_sum)
                 for r in batch}
        gkeys = {(r.user_id, r.session_start, r.n_events, r.value_sum)
                 for r in got}
        # append-mode stream emits only CLOSED sessions (gap exceeded or
        # timed out before end-of-input); every emitted session must match
        # a batch session exactly
        assert len(gkeys) > 0
        assert gkeys <= bkeys


class TestGeoJSONReferenceFixtures:
    def test_two_states_geojson_matches_shapefile(self, spark):
        """two_states.json parsed by our GeoJSON importer must carry the
        same attributes and equivalent ring geometry as the .shp read."""
        with open(f"{REF}/two_states.json") as f:
            gj = GJ.import_geojson(spark, f.read())
        rows = gj.collect()
        assert len(rows) == 2
        import json as _json
        props = [_json.loads(r.properties) for r in rows]
        assert sorted(p["STATE_NAME"] for p in props) == ["Oregon", "Washington"]
        # geometry equivalence vs the shapefile read (same vertex sets)
        with open(f"{REF}/two_states.shp", "rb") as f:
            shp_rows = SHP.import_shapefile(spark, f.read()).collect()
        gj_pts = {round(v, 6) for r in rows for ring in r.rings_x for v in ring}
        shp_pts = {round(v, 6) for r in shp_rows for ring in r.rings_x for v in ring}
        assert gj_pts == shp_pts

    def test_null_geometry_features(self, spark):
        """six_counties_three_null.json: features with null geometry import
        as geometry_type 'null' with empty rings (the reference's NULL shape
        handling, geojson-import.js)."""
        with open(f"{REF}/six_counties_three_null.json") as f:
            df = GJ.import_geojson(spark, f.read())
        rows = df.collect()
        assert len(rows) == 6
        nulls = [r for r in rows if r.geometry_type == "null"]
        assert len(nulls) == 3
        assert all(r.rings_x == [] for r in nulls)

    def test_ccw_polygon_winding_repair(self, spark):
        """ccw_polygon.json: a counter-clockwise outer ring is REWOUND to
        CW (positive signed area) at import, like the reference's
        PathImporter.importRing (mapshaper-path-import.js:105-113);
        repair_ring_nesting then has nothing to fix and leaves it alone."""
        from mapshaper_spark.operators import paths as P2
        import numpy as np
        from mapshaper_spark.geom import kernels as K2
        with open(f"{REF}/ccw_polygon.json") as f:
            df = GJ.import_geojson(spark, f.read())
        r = df.collect()[0]
        a = K2.planar_path_area(np.asarray(r.rings_x[0]), np.asarray(r.rings_y[0]))
        assert a > 0
        fixed = P2.repair_ring_nesting(df.select("fid", "rings_x", "rings_y", "bbox"))
        r2 = fixed.collect()[0]
        a2 = K2.planar_path_area(np.asarray(r2.rings_x[0]), np.asarray(r2.rings_y[0]))
        assert a2 == pytest.approx(a, rel=1e-12)
        assert a2 > 0


class TestStreamingDedup:
    def test_stream_dedup_matches_batch(self, spark, tmp_path):
        import datetime
        from mapshaper_spark.streaming.pipeline import (streaming_exact_dedup,
                                                        run_available_now)
        from pyspark.sql import types as T
        rows = []
        base = datetime.datetime(2026, 1, 1)
        for i in range(200):
            rows.append((f"doc{i % 50}",  # 4x duplicated keys
                         base + datetime.timedelta(minutes=i),
                         float(i)))
        src = tmp_path / "in"
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        df.write.parquet(str(src))
        schema = T.StructType([T.StructField("k", T.StringType()),
                               T.StructField("ts", T.TimestampType()),
                               T.StructField("v", T.DoubleType())])
        out = streaming_exact_dedup(spark, str(src), schema, ["k"])
        q = run_available_now(out, "dedup_stream", output_mode="append")
        got = spark.sql("SELECT k FROM dedup_stream").collect()
        # exactly one row per key survives within one watermark horizon
        assert sorted(r.k for r in got) == sorted(f"doc{i}" for i in range(50))
        q.stop()
