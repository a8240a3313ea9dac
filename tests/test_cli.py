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
        # -points REPLACES geometry: x/y coords, source rings dropped
        assert {"x", "y"} <= set(df.columns)
        assert "rings_x" not in df.columns
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


class TestRound3Commands:
    """The 17 commands wired in round 3: layer creation (point-grid,
    polygon-grid, graticule, rectangle, shape), layer surgery (drop,
    filter-geom, mosaic, polygons, slice, stitch, subdivide, cluster,
    data-fill) and styling (style/svg-style, colorizer, include)."""

    def test_point_grid_reference_golden(self, spark):
        # createPointGrid rows/cols: cell centers with half-cell margins
        cat = run_commands(spark, "-point-grid 2,2 bbox=10,10,20,20")
        pts = sorted((r.x, r.y) for r in cat.df().collect())
        assert pts == [(12.5, 12.5), (12.5, 17.5), (17.5, 12.5), (17.5, 17.5)]

    def test_polygon_grid_and_slice(self, spark, states):
        # aligned grid: cells coincide with the unit squares — tangent
        # neighbors contribute NO degenerate slivers, each square maps to
        # exactly its own cell
        grid = run_commands(spark, "-polygon-grid 3,3 bbox=-0.5,-0.5,2.5,2.5")
        assert grid.df().count() == 4
        cat = run_commands(spark, "-slice grid id-field=cell_id",
                           layers={"states": states, "grid": grid.df()})
        got = sorted((r.fid, r.slice_id) for r in cat.df().collect())
        assert got == [(0, "r0c0"), (1, "r1c0"), (2, "r0c1"), (3, "r1c1")]

        # shifted grid (cells offset by 0.5): partial intersections
        grid2 = run_commands(spark, "-polygon-grid 3,3 bbox=0,0,3,3")
        cat2 = run_commands(spark, "-slice grid2 id-field=cell_id",
                            layers={"states": states, "grid2": grid2.df()})
        out = cat2.df()
        assert out.count() == 9  # 4 + 2 + 2 + 1 overlapping pairs
        total = out.select(F.aggregate(
            F.zip_with("rings_x", "rings_y", lambda rx, ry: F.aggregate(
                F.sequence(F.lit(0), F.size(rx) - 2), F.lit(0.0),
                lambda a, i: a + (rx[i + 1] - rx[0]) * (ry[i] - ry[0]) -
                (rx[i] - rx[0]) * (ry[i + 1] - ry[0]),
                lambda s: s / 2)),
            F.lit(0.0), lambda a, v: a + v).alias("a")) \
            .agg(F.sum(F.abs("a"))).collect()[0][0]
        # slices tile states ∩ [0.5,2.5]^2 = [0.5,2]^2
        assert abs(total - 2.25) < 1e-9

    def test_graticule_shape_rectangle(self, spark):
        g = run_commands(spark, "-graticule").df()
        assert g.count() == 37 + 19
        r = run_commands(spark, "-rectangle bbox=1,2,3,4 offset=1").df()
        b = r.collect()[0]["bbox"]
        assert (b["xmin"], b["ymin"], b["xmax"], b["ymax"]) == (0, 1, 4, 5)
        s = run_commands(spark,
                         "-shape coordinates=0,0,1,0,1,1 closed").df()
        row = s.collect()[0]
        assert row["geometry_type"] == "polygon"
        assert row["rings_x"][0][0] == row["rings_x"][0][-1]

    def test_mosaic_two_overlapping_squares(self, spark):
        rows = [("a", [[0.0, 0.0, 2.0, 2.0, 0.0]], [[0.0, 2.0, 2.0, 0.0, 0.0]]),
                ("b", [[1.0, 1.0, 3.0, 3.0, 1.0]], [[1.0, 3.0, 3.0, 1.0, 1.0]])]
        df = spark.createDataFrame(
            rows, "fid string, rings_x array<array<double>>, "
                  "rings_y array<array<double>>")
        faces = run_commands(spark, "-mosaic", layers={"p": df}).df()
        got = sorted((round(r.area, 9), r.n_members) for r in faces.collect())
        assert got == [(1.0, 2), (3.0, 1), (3.0, 1)]

    def test_mosaic_singleton_jvm_path_area_sign(self, spark):
        # disjoint features: pure JVM path; area positive for CW rings
        rows = [("a", [[0.0, 0.0, 1.0, 1.0, 0.0]], [[0.0, 1.0, 1.0, 0.0, 0.0]]),
                ("b", [[5.0, 5.0, 7.0, 7.0, 5.0]], [[5.0, 7.0, 7.0, 5.0, 5.0]])]
        df = spark.createDataFrame(
            rows, "fid string, rings_x array<array<double>>, "
                  "rings_y array<array<double>>")
        faces = run_commands(spark, "-mosaic", layers={"p": df}).df()
        got = sorted((round(r.area, 9), r.n_members) for r in faces.collect())
        assert got == [(1.0, 1), (4.0, 1)]

    def test_polygons_from_lines(self, spark):
        lines = spark.createDataFrame([
            (1, [0.0, 2.0], [0.0, 0.0]), (2, [0.0, 2.0], [1.0, 1.0]),
            (3, [0.0, 0.0], [0.0, 1.0]), (4, [1.0, 1.0], [0.0, 1.0]),
            (5, [2.0, 2.0], [0.0, 1.0]),
        ], "lid int, xs array<double>, ys array<double>")
        cat = run_commands(spark, "-polygons", layers={"l": lines})
        areas = sorted(round(r.area, 9) for r in cat.df().collect())
        assert areas == [1.0, 1.0]

    def test_cluster_pct_on_polygons(self, spark, states):
        cat = run_commands(spark, "-cluster pct=50%", layers={"s": states})
        out = cat.df()
        assert out.select("cluster").distinct().count() == 2
        assert "__cx" not in out.columns

    def test_subdivide_points(self, spark):
        pts = spark.range(0, 40).select(
            (F.col("id") % 8).cast("double").alias("x"),
            (F.col("id") / 8).cast("double").alias("y"))
        cat = run_commands(spark, "-subdivide 'count() > 12'",
                           layers={"pts": pts})
        sizes = {r["split_name"]: r["count"] for r in
                 cat.df().groupBy("split_name").count().collect()}
        assert sum(sizes.values()) == 40
        assert all(v <= 12 for v in sizes.values())

    def test_subdivide_reference_parity(self, spark):
        """subdivide-test.js: 'true' divides to singletons named split-1..n
        in left-to-right leaf order; 'sum(foo) > 5' groups like the
        reference's recursion (halves of size 1 emitted without re-eval)."""
        pts = spark.createDataFrame(
            [(float(i), 0.0, foo) for i, foo in
             enumerate([1, 0, 39, 3])], "x double, y double, foo int")
        cat = run_commands(spark, "-subdivide 'sum(foo) > 5'",
                           layers={"pts": pts})
        groups = {r["split_name"]: sorted(rr.foo for rr in g)
                  for r in cat.df().select("split_name").distinct().collect()
                  for g in [cat.df().filter(
                      F.col("split_name") == r["split_name"]).collect()]}
        assert groups == {"pts-1": [0, 1], "pts-2": [39], "pts-3": [3]}

    def test_subdivide_true_splits_to_singletons(self, spark):
        pts = spark.createDataFrame(
            [(float(i), 0.0) for i in range(5)], "x double, y double")
        cat = run_commands(spark, "-subdivide true", layers={"foo": pts})
        rows = sorted((r["split_name"], r.x) for r in cat.df().collect())
        assert rows == [(f"foo-{i + 1}", float(i)) for i in range(5)]

    def test_subdivide_job_count_is_o_depth(self, spark):
        """r5 level-batching evidence: Spark-job count scales with the
        recursion DEPTH, not the piece count. Doubling the depth twice
        (4 -> 16 -> 64 leaves, i.e. 7 -> 31 -> 127 tree pieces) must grow
        the job count roughly linearly in depth: the old per-piece
        recursion ran ~3 jobs per PIECE, so its 2-extra-levels ratio is
        ~4x; level-batching keeps it under ~2x."""
        from mapshaper_spark.operators.grid import subdivide
        sc = spark.sparkContext

        def run(n, group):
            pts = spark.range(0, n).select(
                (F.col("id") % 8).cast("double").alias("x"),
                (F.col("id") / 8).cast("double").alias("y"))
            sc.setJobGroup(group, "job-count probe")
            try:
                out = subdivide(pts, "x", "y", max_count=7)
                counts = {r["split_name"]: r["count"] for r in
                          out.groupBy("split_name").count().collect()}
            finally:
                sc.setJobGroup("", "")
            assert sum(counts.values()) == n
            assert all(v <= 7 for v in counts.values())
            return len(counts), len(sc.statusTracker()
                                    .getJobIdsForGroup(group))
        leaves1, jobs1 = run(28, "subdiv-d1")    # depth 2: 4 leaves of 7
        leaves2, jobs2 = run(448, "subdiv-d2")   # depth 6: 64 leaves of 7
        assert leaves1 == 4 and leaves2 == 64
        # O(pieces) would scale jobs by ~127/7 = 18x; O(depth) by ~7/3
        assert jobs2 < 3.5 * jobs1, (jobs1, jobs2)

    def test_data_fill_string_keys(self, spark):
        rows = []
        for i in range(4):
            x0 = float(i)
            rows.append((f"g{i}", "A" if i == 0 else None,
                         [[x0, x0, x0 + 1, x0 + 1, x0]],
                         [[0.0, 1.0, 1.0, 0.0, 0.0]]))
        strip = spark.createDataFrame(
            rows, "fid string, grp string, rings_x array<array<double>>, "
                  "rings_y array<array<double>>")
        cat = run_commands(spark, "-data-fill field=grp", layers={"s": strip})
        assert sorted((r.fid, r.grp) for r in cat.df().collect()) == \
            [(f"g{i}", "A") for i in range(4)]

    def test_drop_fields_geometry_layer(self, spark, states):
        cat = run_commands(spark, "-drop fields=pop", layers={"s": states})
        assert "pop" not in cat.df().columns
        cat = run_commands(spark, "-drop geometry", layers={"s": states})
        assert "rings_x" not in cat.df().columns
        cat = Catalog(spark)
        cat.add("a", states)
        cat.add("b", states.select("fid"))
        run_commands  # keep flake quiet
        from mapshaper_spark.cli import COMMANDS, Command
        COMMANDS["drop"](cat, Command("drop"))
        assert cat.order == ["a"] and cat.target == "a"

    def test_filter_geom_bbox_polygons(self, spark, states):
        cat = run_commands(spark, "-filter-geom bbox=1.5,1.5,3,3",
                           layers={"s": states})
        assert [r.fid for r in cat.df().collect()] == [3]

    def test_style_colorizer_each_include(self, spark, states, tmp_path):
        # the reference's canonical colorizer example shape
        cat = run_commands(
            spark,
            "-colorizer name=getColor breaks=15,35 colors=red,green,blue "
            "-each 'fill = getColor(pop)' "
            "-style stroke=black stroke-width=2 opacity=0.5",
            layers={"s": states})
        rows = {r.fid: (r.fill, r["stroke"], r["stroke-width"], r.opacity)
                for r in cat.df().collect()}
        assert rows[0][0] == "red" and rows[1][0] == "green" \
            and rows[3][0] == "blue"
        assert all(v[1:] == ("black", 2.0, 0.5) for v in rows.values())
        # -style with an expression value (field-name rule)
        cat = run_commands(spark, "-style fill=state", layers={"s": states})
        assert {r.fill for r in cat.df().collect()} == {"A", "B"}
        # -include: defs file usable from -each
        p = tmp_path / "defs.py"
        p.write_text("def double_pop(col):\n    return col * 2\n")
        cat = run_commands(spark,
                           f"-include {p} -each 'p2 = double_pop(pop)'",
                           layers={"s": states})
        assert {r.p2 for r in cat.df().collect()} == {20, 40, 60, 80}

    def test_stitch_passthrough(self, spark, states):
        cat = run_commands(spark, "-stitch", layers={"s": states})
        assert cat.df().count() == 4

    def test_o_topojson_shared_arcs(self, spark, states):
        cat = run_commands(spark, "-o format=topojson", layers={"states": states})
        topo = json.loads(cat.outputs["states.json"])
        assert topo["type"] == "Topology"
        geoms = topo["objects"]["states"]["geometries"]
        assert len(geoms) == 4
        # 2x2 grid of unit squares: shared borders serialize ONCE -> the
        # arc pool is smaller than 4 independent rings (4x4=16 segments
        # collapse to 12 distinct arcs at most)
        assert 4 <= len(topo["arcs"]) <= 12
        # every geometry references arcs within range
        for g in geoms:
            for ring in g["arcs"]:
                for a in ring:
                    idx = a if a >= 0 else ~a
                    assert 0 <= idx < len(topo["arcs"])

    def test_simplify_polyline_layer(self, spark):
        xs = [float(i) for i in range(11)]
        ys = [0.0, 0.05, -0.05, 0.04, -0.04, 0.03, -0.03, 0.02, -0.02,
              0.01, 0.0]
        lines = spark.createDataFrame(
            [(1, xs, ys)], "lid int, xs array<double>, ys array<double>")
        cat = run_commands(spark, "-simplify 30% dp", layers={"l": lines})
        r = cat.df().collect()[0]
        # endpoints always survive; the wiggle interior thins out
        assert len(r.xs) < 11 and r.xs[0] == 0.0 and r.xs[-1] == 10.0


class TestRound4OptionParity:
    """Option surfaces added late round 4: -explode naive, -join force,
    -dissolve2 min-gap-area/calc/sum-fields, -clean min-gap-area,
    -dissolve field= (reference option table, mapshaper-options.js)."""

    def _donut(self, spark):
        # CW outer 3x3 + CCW 1x1 hole (mapshaper winding convention)
        return spark.createDataFrame(
            [(1, "g",
              [[0.0, 0.0, 3.0, 3.0, 0.0], [1.0, 2.0, 2.0, 1.0, 1.0]],
              [[0.0, 3.0, 3.0, 0.0, 0.0], [1.0, 1.0, 2.0, 2.0, 1.0]])],
            "fid int, grp string, rings_x array<array<double>>, "
            "rings_y array<array<double>>")

    def test_explode_naive_vs_grouped(self, spark):
        donut = self._donut(spark)
        grouped = run_commands(spark, "-explode", layers={"d": donut})
        assert grouped.df().count() == 1  # hole stays with its ring
        naive = run_commands(spark, "-explode naive", layers={"d": donut})
        assert naive.df().count() == 2  # explodePolygonNaive: ring-per-part

    def test_join_force_overwrites_and_nulls_unmatched(self, spark, states):
        tgt = states.drop("rings_x", "rings_y")
        src = spark.createDataFrame([("A", 99)], "st string, pop int")
        # without force: same-named source field is skipped (join.js:255)
        cat = run_commands(spark, "-join src keys=state,st",
                           layers={"states": tgt, "src": src})
        assert {r.pop for r in cat.df().collect()} == {10, 20, 30, 40}
        # with force: matched rows take the source value, unmatched go null
        cat = run_commands(spark, "-join src keys=state,st force",
                           layers={"states": tgt, "src": src})
        got = {r.state: r.pop for r in cat.df().collect()}
        assert got == {"A": 99, "B": None}

    def test_dissolve2_min_gap_area_gates_fill(self, spark):
        donut = self._donut(spark)
        filled = run_commands(spark, "-dissolve2 grp min-gap-area=1.1",
                              layers={"d": donut})
        assert filled.df().select(F.size("rings_x")).first()[0] == 1
        kept = run_commands(spark, "-dissolve2 grp min-gap-area=0.5",
                            layers={"d": donut})
        assert kept.df().select(F.size("rings_x")).first()[0] == 2

    def test_dissolve2_aggregates_attributes(self, spark, states):
        cat = run_commands(
            spark, "-dissolve2 state sum-fields=pop calc='n = count()'",
            layers={"states": states})
        got = {r.state: (r.pop, r.n) for r in cat.df().collect()}
        assert got == {"A": (30, 2), "B": (70, 2)}

    def test_dissolve_field_option_spelling(self, spark, states):
        cat = run_commands(spark, "-dissolve field=state sum-fields=pop",
                           layers={"states": states})
        got = {r.state: r.pop for r in cat.df().collect()}
        assert got == {"A": 30, "B": 70}

    def test_clean_min_gap_area_parses(self, spark):
        donut = self._donut(spark)
        cat = run_commands(spark, "-clean min-gap-area=1.1",
                           layers={"d": donut})
        assert cat.df().count() == 1


class TestMetaCommands:
    """-inspect/-projections/-encodings/-version/-help/-quiet/-verbose/-debug
    (cli/mapshaper-commands.js dispatch; commands/mapshaper-inspect.js)."""

    def test_inspect_single_match(self, spark, states):
        cat = run_commands(spark, "-inspect 'pop == 30'", layers={"s": states})
        info = cat.info[-1]
        assert info["attributes"]["pop"] == 30
        geo = info["geometry"]
        # the fixture square winds CCW under the kernel's sign convention
        # (positive = CW, matching the reference's getPathArea)
        assert geo["rings_cw"] == 0 and geo["rings_ccw"] == 1
        assert abs(geo["planar_area"] - (-1.0)) < 1e-12

    def test_inspect_multi_and_zero_match(self, spark, states):
        cat = run_commands(spark, "-inspect 'pop > 15'", layers={"s": states})
        assert "matched 3 features" in cat.info[-1]["inspect"]
        cat = run_commands(spark, "-inspect 'pop > 99'", layers={"s": states})
        assert "matched 0 features" in cat.info[-1]["inspect"]

    def test_projections_and_encodings_lists(self, spark):
        from mapshaper_spark.geom.projections import get_projection
        cat = run_commands(spark, "-projections -encodings -version -help")
        projs = cat.info[0]["projections"]
        # every listed +proj= name must actually resolve in get_projection
        # params for families with no valid bare form (proj itself rejects
        # eqdc with lat_1 = lat_2 = 0, and utm needs a zone)
        needs = {"utm": "+proj=utm +zone=15",
                 "lcc": "+proj=lcc +lat_1=33 +lat_2=45",
                 "eqdc": "+proj=eqdc +lat_1=20 +lat_2=60",
                 "urmfps": "+proj=urmfps +n=0.8",
                 "gn_sinu": "+proj=gn_sinu +m=0.5 +n=1.785",
                 "tpeqd": "+proj=tpeqd +lat_1=35 +lon_1=-10 "
                          "+lat_2=45 +lon_2=60",
                 "ob_tran": "+proj=ob_tran +o_proj=moll +o_lat_p=45 "
                            "+o_lon_p=-90",
                 # round-4 pj_list completion wave
                 "urm5": "+proj=urm5 +n=0.8 +q=0.414524 +alpha=2",
                 "ocea": "+proj=ocea +lat_1=40 +lat_2=60 +lon_1=-10 "
                         "+lon_2=30",
                 "chamb": "+proj=chamb +lat_1=22 +lon_1=-110 +lat_2=22 "
                          "+lon_2=-70 +lat_3=60 +lon_3=-90"}
        conic = "+proj={} +lat_1=30 +lat_2=50"
        for name in ("tissot", "murd1", "murd2", "murd3", "euler",
                     "pconic", "vitk1"):
            needs[name] = conic.format(name)
        for name in projs:
            get_projection(needs.get(name, f"+proj={name}"))
        assert "albersusa" in cat.info[0]["aliases"]
        assert "utf-8" in cat.info[1]["encodings"]
        assert cat.info[2]["version"]
        assert "clip" in cat.info[3]["commands"]

    def test_verbosity_flags(self, spark, states):
        cat = run_commands(spark, "-quiet -filter 'pop > 15'",
                           layers={"s": states})
        assert "quiet" in cat.flags
        assert cat.df().count() == 3


class TestDbfOutput:
    def test_o_format_dbf_roundtrip(self, spark, states, tmp_path):
        """-o format=dbf writes the attribute table alone (the reference's
        dbf output type); re-importable by the dbf reader."""
        from mapshaper_spark.sources.shapefile import read_dbf
        out = tmp_path / "attrs.dbf"
        cat = run_commands(spark, f"-o {out}", layers={"s": states})
        recs = read_dbf(out.read_bytes())
        assert len(recs) == 4
        assert set(recs[0]) == {"fid", "state", "pop"}  # geometry dropped
        assert sorted(r["pop"] for r in recs) == [10, 20, 30, 40]


class TestOptionListParsing:
    """option-parser-test.js + chunker-test.js splitTokens transcriptions."""

    def test_parse_string_list_single_quoted(self):
        # option-parser-test.js:8-17
        from mapshaper_spark.cli import parse_string_list
        assert parse_string_list('"County FIPS,State FIPS"') == \
            ["County FIPS", "State FIPS"]
        assert parse_string_list('"County FIPS","State FIPS"') == \
            ["County FIPS", "State FIPS"]

    def test_parse_color_list(self):
        # option-parser-test.js:20-45
        from mapshaper_spark.cli import parse_color_list
        for t in ('"white black"', '"white","black"', '"white, black"',
                  '"white", "black"'):
            assert parse_color_list(t) == ["white", "black"], t
        assert parse_color_list(
            'rgba(0, 0, 0, 0), rgb(22,32,0),aliceblue') == \
            ['rgba(0,0,0,0)', 'rgb(22,32,0)', 'aliceblue']

    def test_split_tokens_quoted(self):
        # chunker-test.js:13-16
        from mapshaper_spark.cli import split_tokens
        assert split_tokens('foo, "foo bar",baz ', ', ') == \
            ['foo', 'foo bar', 'baz']

    def test_shared_target_option_parses(self):
        from mapshaper_spark.cli import parse_commands
        cmds = parse_commands("-clip target=a bbox=0,0,1,1")
        assert cmds[0].options["target"] == "a"
        assert cmds[0].values == []


class TestNdjsonSink:
    """-o format=ndjson: the scale-safe text sink — a distributed
    df.write.text directory write, one GeoJSON Feature per line, with
    no driver-side document assembly (engine extension, round 5)."""

    def _read_lines(self, outdir):
        lines = []
        for name in sorted(os.listdir(outdir)):
            if name.startswith("part-"):
                with open(os.path.join(outdir, name)) as f:
                    lines += [ln for ln in f.read().splitlines() if ln]
        return lines

    def test_features_match_single_file_geojson(self, spark, states,
                                                tmp_path):
        out = tmp_path / "states_nd"
        cat = run_commands(spark, f"-o format=ndjson {out}",
                           layers={"states": states})
        assert str(out) in cat.outputs
        lines = self._read_lines(str(out))
        assert len(lines) == 4
        feats = sorted((json.loads(ln) for ln in lines),
                       key=lambda f: f["properties"]["fid"])
        # the single-file export's features are the reference baseline
        cat2 = run_commands(spark, "-o states.json",
                            layers={"states": states})
        doc = json.loads(cat2.outputs["states.json"])
        ref = sorted(doc["features"],
                     key=lambda f: f["properties"]["fid"])
        assert feats == ref

    def test_ndjson_extension_spelling(self, spark, states, tmp_path):
        out = tmp_path / "st.ndjson"
        run_commands(spark, f"-o {out}", layers={"states": states})
        lines = self._read_lines(str(out))
        assert len(lines) == 4
        assert all(json.loads(ln)["type"] == "Feature" for ln in lines)

    def test_table_layer_writes_json_lines(self, spark, states, tmp_path):
        out = tmp_path / "tbl_nd"
        run_commands(spark, f"-o format=ndjson {out}",
                     layers={"t": states.drop("rings_x", "rings_y")})
        lines = self._read_lines(str(out))
        recs = sorted((json.loads(ln) for ln in lines),
                      key=lambda r: r["fid"])
        assert len(recs) == 4 and recs[0]["state"] == "A"

    def test_ndjson_round_trip_import(self, spark, states, tmp_path):
        """-o format=ndjson then -i of the directory reproduces the layer:
        same features, same flattened property columns, polygon kind."""
        out = tmp_path / "rt_nd"
        run_commands(spark, f"-o format=ndjson {out}",
                     layers={"states": states})
        cat = run_commands(spark, f"-i {out}")
        df = cat.df()
        assert {"state", "pop", "rings_x", "rings_y"} <= set(df.columns)
        rows = sorted((r["state"], r["pop"]) for r in df.collect())
        assert rows == [("A", 10), ("A", 20), ("B", 30), ("B", 40)]
        assert cat.kinds[cat.target] == "polygon"
        # geometry round-trips: total ring vertex count preserved
        n = df.select(F.sum(F.aggregate(
            F.transform("rings_x", F.size), F.lit(0),
            lambda a, v: a + v))).collect()[0][0]
        assert n == 4 * 5

    def test_ndjson_point_import_kind(self, spark, tmp_path):
        p = tmp_path / "pts.ndjson"
        lines = [
            '{"type":"Feature","geometry":{"type":"Point",'
            f'"coordinates":[{i}.5,{i}.25]}},"properties":{{"n":{i}}}}}'
            for i in range(5)]
        p.write_text("\n".join(lines) + "\n")
        cat = run_commands(spark, f"-i {p}")
        df = cat.df()
        assert cat.kinds[cat.target] == "point"
        assert sorted((r["n"], r.x, r.y) for r in df.collect()) == \
            [(i, i + 0.5, i + 0.25) for i in range(5)]
