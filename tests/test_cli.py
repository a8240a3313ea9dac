"""run_commands: the mapshaper CLI surface over the engine's operators.

Chains mirror the reference's own integration style (its tests call
api.runCommands with the same strings a terminal user types —
/root/reference/test/*.js). Each test checks the string-driven result
against a direct operator call or a known value.
"""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapshaper_spark.cli import Catalog, parse_commands, run_commands

REF = "/root/reference/test/test_data"


@pytest.fixture
def states(spark):
    # 2x2 grid of unit squares: states A (left col) and B (right col)
    rows = []
    for i, (gx, gy) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        x0, y0 = float(gx), float(gy)
        rows.append((i, "A" if gx == 0 else "B", 10 * (i + 1),
                     [[x0, x0 + 1, x0 + 1, x0, x0]],
                     [[y0, y0, y0 + 1, y0 + 1, y0]]))
    return spark.createDataFrame(
        rows, "fid int, state string, pop int, "
              "rings_x array<array<double>>, rings_y array<array<double>>")


class TestParser:
    def test_tokens_options_flags(self):
        cmds = parse_commands(
            "-i in.shp name=st -filter 'POP > 10' remove-empty "
            "-join src keys=a,b fields=x,y -o out.json format=geojson")
        assert [c.name for c in cmds] == ["i", "filter", "join", "o"]
        assert cmds[0].opt("name") == "st"
        assert cmds[1].values == ["POP > 10"] and cmds[1].flag("remove-empty")
        assert cmds[2].csv("keys") == ["a", "b"]
        assert cmds[3].opt("format") == "geojson"

    def test_leading_tokens_are_implicit_input(self):
        cmds = parse_commands("states.shp -info")
        assert cmds[0].name == "i" and cmds[0].values == ["states.shp"]

    def test_negative_numbers_are_values_not_commands(self):
        cmds = parse_commands("-clip bbox=-10,-5,10,5")
        assert cmds[0].csv("bbox") == ["-10", "-5", "10", "5"]


class TestAttributeChains:
    def test_filter_each_sort(self, spark, states):
        cat = run_commands(
            spark,
            "-filter 'pop >= 20' -each 'dens = pop * 2' -sort dens descending",
            layers={"states": states})
        got = cat.df().collect()
        assert [r.dens for r in got] == [80, 60, 40]

    def test_js_flavored_expression(self, spark, states):
        cat = run_commands(spark,
                           "-filter 'state === \"A\" && pop > 10'",
                           layers={"states": states})
        assert cat.df().count() == 1

    def test_dissolve_table_aggregation(self, spark, states):
        cat = run_commands(spark,
                           "-dissolve state sum-fields=pop calc='n = count()'",
                           layers={"states": states.drop("rings_x", "rings_y")})
        got = {r.state: (r.pop, r.n) for r in cat.df().collect()}
        assert got == {"A": (30, 2), "B": (70, 2)}

    def test_join_with_calc(self, spark, states):
        src = spark.createDataFrame(
            [("A", 5), ("A", 7), ("B", 1)], "st string, v int")
        cat = run_commands(
            spark, "-join src keys=state,st calc='total = sum(v)'",
            layers={"states": states.drop("rings_x", "rings_y"), "src": src})
        cat2 = run_commands(spark, "-target states", layers=dict(
            states=cat.df("states")))
        got = {r.fid: r.total for r in cat.df("states").collect()}
        assert got[0] == 12 and got[2] == 1

    def test_uniq_and_filter_fields(self, spark, states):
        cat = run_commands(spark, "-uniq state -filter-fields state,pop",
                           layers={"states": states})
        df = cat.df()
        assert df.count() == 2
        assert set(df.columns) >= {"state", "pop", "rings_x"}
        assert "fid" not in df.columns


class TestGeometryChains:
    def test_dissolve_polygons_merges_shared_edges(self, spark, states):
        # -dissolve state: columns of unit squares dissolve into 1x2 rects
        cat = run_commands(spark, "-dissolve state sum-fields=pop",
                           layers={"states": states})
        got = cat.df().collect()
        assert len(got) == 2
        from mapshaper_spark.geom import kernels as K
        for r in got:
            area = sum(abs(K.planar_path_area(np.asarray(rx), np.asarray(ry)))
                       for rx, ry in zip(r.rings_x, r.rings_y))
            assert area == pytest.approx(2.0)
        assert {r.pop for r in got} == {30, 70}

    def test_clip_bbox_points(self, spark):
        pts = spark.range(0, 100).select(
            (F.col("id") % 10).cast("double").alias("lon"),
            (F.col("id") / 10).cast("double").alias("lat"))
        cat = run_commands(spark, "-clip bbox=0,0,4.5,4.5",
                           layers={"pts": pts})
        assert cat.df().count() == 25

    def test_clip_polygons_by_layer(self, spark, states):
        clip = spark.createDataFrame(
            [(0, [[0.5, 1.5, 1.5, 0.5, 0.5]], [[0.5, 0.5, 1.5, 1.5, 0.5]])],
            "cid int, rings_x array<array<double>>, rings_y array<array<double>>")
        cat = run_commands(spark, "-target states -clip c",
                           layers={"states": states, "c": clip})
        from mapshaper_spark.geom import kernels as K
        got = cat.df().collect()
        total = sum(abs(K.planar_path_area(np.asarray(rx), np.asarray(ry)))
                    for r in got
                    for rx, ry in zip(r.rings_x, r.rings_y))
        assert total == pytest.approx(1.0)  # 4 quarter-squares survive

    def test_simplify_preserves_shared_borders(self, spark):
        # two polygons sharing a jagged border: simplify through the CLI,
        # then check the shared edge stays IDENTICAL from both sides
        zig = [(0.5 + 0.02 * ((i % 2) * 2 - 1), float(i) / 10.0)
               for i in range(11)]
        left_x = [0.0] + [p[0] for p in zig] + [0.0, 0.0]
        left_y = [0.0] + [p[1] for p in zig] + [1.0, 0.0]
        right_x = [1.0] + [p[0] for p in zig] + [1.0, 1.0]
        right_y = [0.0] + [p[1] for p in zig] + [1.0, 0.0]
        df = spark.createDataFrame(
            [(0, [left_x], [left_y]), (1, [right_x], [right_y])],
            "fid int, rings_x array<array<double>>, rings_y array<array<double>>")
        cat = run_commands(spark, "-simplify 40% keep-shapes",
                           layers={"polys": df})
        got = {r.fid: (r.rings_x[0], r.rings_y[0]) for r in cat.df().collect()}
        # both features survive with >= 4 ring points
        assert len(got) == 2
        for rx, ry in got.values():
            assert len(rx) >= 4
        # shared border: the interior vertices each side kept are identical
        shared0 = {(round(x, 9), round(y, 9))
                   for x, y in zip(*got[0]) if 0.4 < x < 0.6}
        shared1 = {(round(x, 9), round(y, 9))
                   for x, y in zip(*got[1]) if 0.4 < x < 0.6}
        assert shared0 == shared1 and shared0

    def test_innerlines_and_explode(self, spark, states):
        cat = run_commands(spark, "-innerlines state",
                           layers={"states": states})
        # one shared border between columns A and B (possibly several arcs)
        assert cat.df().count() >= 1
        cat2 = run_commands(spark, "-explode", layers={"states": states})
        assert cat2.df().count() == 4

    def test_proj_points(self, spark):
        pts = spark.createDataFrame([(0.0, 0.0), (10.0, 45.0)], "lon double, lat double")
        cat = run_commands(spark, "-proj webmercator", layers={"p": pts})
        got = sorted(cat.df().collect(), key=lambda r: r.lon)
        assert got[0].lon == pytest.approx(0.0, abs=1e-6)
        assert got[1].lon == pytest.approx(1113194.9079327357, rel=1e-9)

    def test_points_centroid(self, spark, states):
        cat = run_commands(spark, "-points", layers={"states": states})
        df = cat.df()
        assert {"cx", "cy"} <= set(df.columns)
        assert df.count() == 4


class TestReferenceFixtures:
    def test_two_states_shapefile_pipeline(self, spark, tmp_path):
        out = str(tmp_path / "out.json")
        cat = run_commands(
            spark, f"-i {REF}/two_states.shp -filter-fields STATE_NAME "
                   f"-each 'name2 = upper(STATE_NAME)' -o {out}")
        obj = json.load(open(out))
        assert obj["type"] == "FeatureCollection"
        assert len(obj["features"]) == 2
        names = {f["properties"]["name2"] for f in obj["features"]}
        assert all(n == n.upper() for n in names)

    def test_csv_join_chain(self, spark, tmp_path, states):
        csv = tmp_path / "pop.csv"
        csv.write_text("st,extra\nA,100\nB,200\n")
        cat = run_commands(
            spark, f"-i {csv} -target states -join pop keys=state,st fields=extra",
            layers={"states": states.drop("rings_x", "rings_y")})
        got = {r.fid: r.extra for r in cat.df("states").collect()}
        assert got[0] == 100 and got[3] == 200

    def test_o_shapefile_roundtrip(self, spark, states, tmp_path):
        from mapshaper_spark.sources import shapefile as SH
        out = str(tmp_path / "sq.shp")
        run_commands(spark, f"-dissolve state -o {out}",
                     layers={"states": states})
        geoms = SH.read_shp(open(out, "rb").read())
        recs = SH.read_dbf(open(str(tmp_path / "sq.dbf"), "rb").read())
        assert len(geoms) == 2 and len(recs) == 2
        assert {r["state"] for r in recs} == {"A", "B"}

    def test_unknown_command_errors(self, spark, states):
        with pytest.raises(ValueError, match="unknown command"):
            run_commands(spark, "-frobnicate", layers={"states": states})


class TestProjPolygons:
    def test_proj_polygon_rings_webmercator(self, spark, states):
        cat = run_commands(spark, "-proj webmercator",
                           layers={"states": states})
        got = {r.fid: r for r in cat.df().collect()}
        assert len(got) == 4
        import math
        R = 6378137.0
        # vertex (1, 1) -> webmercator
        exp_x = math.radians(1.0) * R
        exp_y = R * math.log(math.tan(math.pi / 4 + math.radians(1.0) / 2))
        rx, ry = got[0].rings_x[0], got[0].rings_y[0]
        assert len(rx) == 5
        xs = sorted(set(round(v, 6) for v in rx))
        assert xs == [0.0, round(exp_x, 6)]
        assert round(max(ry), 6) == round(exp_y, 6)

    def test_proj_polygon_proj_string(self, spark, states):
        cat = run_commands(
            spark, "-proj +proj=sinu +lon_0=0 +datum=WGS84",
            layers={"states": states})
        out = cat.df().collect()
        assert len(out) == 4
        assert all(len(r.rings_x) == 1 for r in out)
