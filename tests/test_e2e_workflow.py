"""End-to-end reference-user workflow: the command chain a mapshaper user
runs daily, through this engine's operators —

    -i two_states.shp -clean -dissolve2 -simplify -o out.shp / out.json

Import a reference-produced shapefile, repair overlaps, dissolve, simplify,
export through our writers, and re-read the result.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapshaper_spark.geom import kernels as K


class TestReferenceUserWorkflow:
    def test_shapefile_to_shapefile_pipeline(self, spark):
        from mapshaper_spark.sources import shapefile as SH
        from mapshaper_spark.operators.overlay import clean, dissolve2
        from mapshaper_spark.operators.paths import ring_areas_col

        shp = open("/root/reference/test/test_data/two_states.shp", "rb").read()
        dbf = open("/root/reference/test/test_data/two_states.dbf", "rb").read()
        df = SH.import_shapefile(spark, shp, dbf)
        assert df.count() == 2

        # this fixture is REAL data: the shared border is only nearly
        # coincident (micro overlaps + micro gaps). -clean repairs both;
        # per-feature area moves by at most a sliver envelope
        a0 = {r.fid: sum(K.planar_path_area(np.asarray(rx), np.asarray(ry))
                         for rx, ry in zip(r.rings_x, r.rings_y))
              for r in df.collect()}
        cleaned = clean(df.select("fid", "rings_x", "rings_y"), "fid")
        a1 = {r.fid: sum(K.planar_path_area(np.asarray(rx), np.asarray(ry))
                         for rx, ry in zip(r.rings_x, r.rings_y))
              for r in cleaned.collect()}
        assert set(a1) == set(a0)
        for fid, a in a1.items():
            assert abs(a - a0[fid]) < 0.01 * max(a0.values())

        # -dissolve2 all features into one group
        merged = dissolve2(cleaned.select(F.lit("all").alias("grp"),
                                          "rings_x", "rings_y"), "grp").collect()
        assert len(merged) == 1
        # dissolved area = cleaned (gap-filled) total
        total_in = sum(a1.values())
        assert merged[0].area == pytest.approx(total_in, rel=1e-9)

        # export -> re-read through our own writers
        out_shp, _shx, out_dbf = SH.export_shapefile(
            cleaned.join(df.select("fid", "STATE_NAME"), "fid"))
        back = SH.read_shp(out_shp)
        recs = SH.read_dbf(out_dbf)
        assert len(back) == 2 and len(recs) == 2
        assert {r["STATE_NAME"] for r in recs} == \
            {r.STATE_NAME for r in df.select("STATE_NAME").collect()}
        # geometry survives the round trip exactly
        back_area = sum(
            K.planar_path_area(np.array([p[0] for p in part]),
                               np.array([p[1] for p in part]))
            for g in back for part in g["parts"])
        assert back_area == pytest.approx(total_in, rel=1e-12)

    def test_simplify_then_geojson_export(self, spark):
        from mapshaper_spark import layers as L
        from mapshaper_spark.sources.geojson import export_geojson
        import json
        feats, arcs = L.region_mosaic(spark, 3, 2, (0.0, 0.0, 3.0, 2.0))
        import mapshaper_spark.operators.simplify as SI
        with_z, zlimit = SI.simplify(arcs, method="visvalingam", pct=1.0)
        kept = SI.apply_zlimit(with_z, zlimit)
        assembled = L.assemble_rings(feats, kept.select(
            "arc_id", "xs", "ys", "n", "bbox"), key="rid")
        gj = export_geojson(assembled.select("rid", "rings_x", "rings_y"))
        obj = gj if isinstance(gj, dict) else json.loads(gj)
        # no property_cols requested -> attribute-less export -> the
        # reference emits a GeometryCollection (geojson-export.js)
        assert obj["type"] == "GeometryCollection"
        assert len(obj["geometries"]) == 6
        # with rid exported as a property it stays a FeatureCollection
        gj2 = export_geojson(assembled.select("rid", "rings_x", "rings_y"),
                             property_cols=["rid"])
        obj2 = json.loads(gj2)
        assert obj2["type"] == "FeatureCollection"
        assert len(obj2["features"]) == 6


class TestSixCounties:
    """Real-data regression: six adjacent counties (~14k vertices, fully
    shared borders). clean must preserve every feature's area exactly
    (topologically clean input) and dissolve2 must merge to the exact
    total — this fixture exposed the coincident-arc face-walk bug."""

    def test_clean_and_dissolve2(self, spark):
        from mapshaper_spark.sources import shapefile as SH
        from mapshaper_spark.operators.overlay import clean, dissolve2
        shp = open("/root/reference/test/test_data/six_counties.shp",
                   "rb").read()
        df = SH.import_shapefile(spark, shp)
        a0 = {r.fid: sum(K.planar_path_area(np.asarray(rx), np.asarray(ry))
                         for rx, ry in zip(r.rings_x, r.rings_y))
              for r in df.collect()}
        cleaned = clean(df.select("fid", "rings_x", "rings_y"), "fid").collect()
        a1 = {r.fid: sum(K.planar_path_area(np.asarray(rx), np.asarray(ry))
                         for rx, ry in zip(r.rings_x, r.rings_y))
              for r in cleaned}
        assert set(a1) == set(a0)
        for fid in a0:
            # micro-sliver gap-fill envelope on the shared borders (the
            # default threshold is mean-segment-length^2 ~ 1e-6 deg^2 here;
            # a handful of filled border slivers per county)
            assert a1[fid] == pytest.approx(a0[fid], rel=1e-4)
            assert a1[fid] >= a0[fid] - 1e-12  # fills only ever add area
        merged = dissolve2(df.select(F.lit("all").alias("g"),
                                     "rings_x", "rings_y"), "g").collect()
        assert len(merged) == 1
        assert merged[0].area == pytest.approx(sum(a0.values()), rel=1e-9)


class TestNaturalEarthStates:
    """51 US states/provinces (Natural Earth 110m) dissolve into the
    country outline — the canonical real-world -dissolve2 use."""

    def test_states_dissolve_to_country(self, spark):
        from mapshaper_spark.sources import shapefile as SH
        from mapshaper_spark.operators.overlay import dissolve2
        base = "/root/reference/test/test_data/ne/ne_110m_admin_1_states_provinces_shp"
        df = SH.import_shapefile(spark, open(base + ".shp", "rb").read(),
                                 open(base + ".dbf", "rb").read())
        assert df.count() == 51
        a0 = sum(sum(K.planar_path_area(np.asarray(rx), np.asarray(ry))
                     for rx, ry in zip(r.rings_x, r.rings_y))
                 for r in df.collect())
        merged = dissolve2(df.select(F.lit("us").alias("g"),
                                     "rings_x", "rings_y"), "g").collect()
        assert len(merged) == 1
        # continental outline + Alaska/Hawaii/island parts
        assert 5 <= len(merged[0].rings_x) <= 20
        # area preserved up to the border-sliver gap-fill envelope
        assert merged[0].area == pytest.approx(a0, rel=1e-5)
        assert merged[0].area >= a0 - 1e-9

    def test_two_level_mosaic_matches_single_task(self, spark):
        """The forced cell-decomposed path (per-cell mosaic kernels +
        distributed edge-cancel) reproduces the single-task country outline
        ring-for-ring on real Natural Earth geometry."""
        from mapshaper_spark.sources import shapefile as SH
        from mapshaper_spark.operators.overlay import dissolve2
        base = "/root/reference/test/test_data/ne/ne_110m_admin_1_states_provinces_shp"
        df = SH.import_shapefile(spark, open(base + ".shp", "rb").read(),
                                 open(base + ".dbf", "rb").read())
        src = df.select(F.lit("us").alias("g"), "rings_x", "rings_y")
        single = dissolve2(src, "g").collect()[0]
        two = dissolve2(src, "g", cluster_threshold=0, max_task_features=5,
                        target_per_cell=4).collect()[0]

        def ring_areas(r):
            return sorted(round(K.planar_path_area(np.asarray(rx),
                                                   np.asarray(ry)), 9)
                          for rx, ry in zip(r.rings_x, r.rings_y))

        assert len(two.rings_x) == len(single.rings_x)
        assert ring_areas(two) == ring_areas(single)
        assert two.area == pytest.approx(single.area, rel=1e-12)


class TestEnclaveTopology:
    """Enclave (donut) counties: a feature whose outer ring coincides with
    another feature's hole ring must share ONE arc after build_topology —
    rotation+direction canonicalization of node-free closed rings (this
    fixture exposed the missed dedup: county 4 is an enclave of county 2)."""

    def test_six_counties_enclave_neighbors(self, spark):
        from mapshaper_spark.sources import shapefile as SH
        import mapshaper_spark.operators.topology as TP
        from mapshaper_spark.operators.dissolve import polygon_neighbors
        shp = open("/root/reference/test/test_data/six_counties.shp",
                   "rb").read()
        geoms = SH.read_shp(shp)
        rows = []
        for fi, g in enumerate(geoms):
            for ri, part in enumerate(g["parts"]):
                rows.append((f"{fi}#{ri}", [float(p[0]) for p in part],
                             [float(p[1]) for p in part]))
        paths = spark.createDataFrame(
            rows, "path_id string, xs array<double>, ys array<double>")
        arcs, refs = TP.build_topology(paths, "path_id")
        feats = (refs.withColumn(
            "fid", F.substring_index("path_id", "#", 1).cast("int"))
            .groupBy("fid", "path_id")
            .agg(F.transform(F.sort_array(F.collect_list(
                F.struct("arc_seq", F.col("signed").alias("s")))),
                lambda st: st["s"].cast("int")).alias("ring"))
            .groupBy("fid").agg(F.collect_list("ring").alias("parts")))
        got = sorted((r.key_a, r.key_b)
                     for r in polygon_neighbors(feats, "fid").collect())
        assert (2, 4) in got  # the enclave adjacency
        assert got == [(0, 1), (1, 2), (1, 3), (2, 3), (2, 4)]
        # winding survives the canonicalized shared arc
        from mapshaper_spark import layers as L
        asm = L.assemble_rings(feats, arcs, key="fid") \
            .filter(F.col("fid") == 4).collect()[0]
        areas = [K.planar_path_area(np.asarray(rx), np.asarray(ry))
                 for rx, ry in zip(asm.rings_x, asm.rings_y)]
        orig = [K.planar_path_area(np.array([p[0] for p in part]),
                                   np.array([p[1] for p in part]))
                for part in geoms[4]["parts"]]
        assert sum(areas) == pytest.approx(sum(orig), rel=1e-12)
