"""Full-fidelity TopoJSON import/export through the CLI.

Transcribed from /root/reference/test/topojson-test.js: crs preservation
(:47), exportProperties id handling (:70-137), points-only topology
(:181), -o singles (:203), width/height/margin pixel transforms
(:236-362), extension= (:374), quantized point goldens (:381-400), the
no-geometry dataset (:403), polygon-with-hole arc sharing (:415), and the
Export/Import roundtrip suite (:519-550).

Deviation (documented in DEVIATIONS.md): the reference's TopoJSON import
preserves the file's arc table verbatim, so its round trip is
byte-stable after ONE cycle. This importer decodes arcs into catalog
ring geometry and the exporter re-derives shared arcs with the
distributed build_topology, so arc factoring stabilizes after one
quantization cycle: we assert export #2 == export #3 byte-for-byte plus
property/type parity between #1 and #2.
"""
import json
import os

import pytest

from mapshaper_spark.cli import run_commands
from mapshaper_spark.sources import topojson as TJ

TD = "/root/reference/test/test_data"


def _out(cat):
    return json.loads(list(cat.outputs.values())[0])


class TestTopoJSONImportExport:
    def test_preserve_top_level_crs(self, spark, tmp_path):
        crs = {"type": "name",
               "properties": {"name": "urn:ogc:def:crs:OGC:1.3:CRS84"}}
        src = {"crs": crs, "type": "Topology",
               "objects": {"point": {"type": "Point",
                                     "coordinates": [0, 0]}}}
        p = tmp_path / "in.topojson"
        p.write_text(json.dumps(src))
        out = _out(run_commands(spark, f"-i {p} -o"))
        assert out["crs"] == crs
        assert out["objects"]["point"]["geometries"][0] == {
            "type": "Point", "coordinates": [0.0, 0.0]}

    def test_preserve_feature_ids(self, spark, tmp_path):
        src = {"type": "Topology", "arcs": [],
               "objects": {"a": {"type": "GeometryCollection",
                                 "geometries": [{"type": None, "id": 0},
                                                {"type": None, "id": 1}]}}}
        p = tmp_path / "ids.topojson"
        p.write_text(json.dumps(src))
        assert _out(run_commands(spark, f"-i {p} -o")) == src

    def test_points_only_topology_roundtrip(self, spark, tmp_path):
        src = {"type": "Topology", "arcs": [], "objects": {"points": {
            "type": "GeometryCollection", "geometries": [
                {"type": "Point", "coordinates": [1.0, 2.0]},
                {"type": "MultiPoint",
                 "coordinates": [[2.0, 3.0], [3.0, 4.0]]},
                {"type": None}]}}}
        p = tmp_path / "pts.topojson"
        p.write_text(json.dumps(src))
        assert _out(run_commands(spark, f"-i {p} -o")) == src

    def test_polygon_hole_and_null_shape_roundtrip(self, spark, tmp_path):
        # abcda / efghe diamond-in-diamond (topojson-test.js:415)
        src = {"type": "Topology",
               "arcs": [[[3.0, 4.0], [4.0, 3.0], [3.0, 2.0], [2.0, 3.0],
                         [3.0, 4.0]],
                        [[3.0, 5.0], [5.0, 3.0], [3.0, 1.0], [1.0, 3.0],
                         [3.0, 5.0]]],
               "objects": {"polygons": {
                   "type": "GeometryCollection", "geometries": [
                       {"type": None},
                       {"type": "Polygon", "arcs": [[0]]},
                       {"type": "Polygon", "arcs": [[1], [-1]]}]}}}
        p = tmp_path / "holes.topojson"
        p.write_text(json.dumps(src))
        out = _out(run_commands(spark, f"-i {p} -o no-quantization"))
        assert out == src

    def test_object_name_becomes_layer_name(self, spark, tmp_path):
        src = {"type": "Topology", "arcs": [],
               "objects": {"cities": {"type": "Point",
                                      "coordinates": [5, 6]}}}
        p = tmp_path / "named.topojson"
        p.write_text(json.dumps(src))
        cat = run_commands(spark, f"-i {p} -o")
        assert "cities.json" in cat.outputs


class TestTopoJSONExportOptions:
    def test_singles(self, spark, tmp_path):
        src = {"type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [0, 0]},
            {"type": "LineString", "coordinates": [[1, 1], [2, 2]]},
            {"type": "Polygon",
             "coordinates": [[[3, 3], [3, 4], [4, 3], [3, 3]]]}]}
        p = tmp_path / "in.json"
        p.write_text(json.dumps(src))
        cat = run_commands(
            spark, f"-i {p} -rename-layers points,lines,polygons "
            "-o format=topojson no-quantization singles")
        points = json.loads(cat.outputs["points.json"])
        lines = json.loads(cat.outputs["lines.json"])
        polygons = json.loads(cat.outputs["polygons.json"])
        assert points["objects"]["points"] == {
            "type": "GeometryCollection",
            "geometries": [{"type": "Point", "coordinates": [0.0, 0.0]}]}
        assert lines["objects"]["lines"]["geometries"][0]["type"] == \
            "LineString"
        assert len(lines["objects"]["lines"]["geometries"]) == 1
        assert polygons["objects"]["polygons"]["geometries"][0]["type"] == \
            "Polygon"

    def test_extension_override(self, spark):
        cat = run_commands(
            spark, f"-i {TD}/two_states.shp "
            "-o format=topojson extension=TOPOJSON")
        assert "two_states.TOPOJSON" in cat.outputs

    @pytest.mark.parametrize("cmd,bbox,coords", [
        ("width=800 margin=2", [2, 2, 798, 798], [[2, 798], [798, 2]]),
    ])
    def test_width_margin_points(self, spark, tmp_path, cmd, bbox, coords):
        src = {"type": "MultiPoint", "coordinates": [[1, 1], [2, 2]]}
        p = tmp_path / "mp.json"
        p.write_text(json.dumps(src))
        out = _out(run_commands(
            spark, f"-i {p} -o format=topojson {cmd} bbox "
            "no-quantization precision=0.001"))
        assert out["bbox"] == bbox
        assert out["objects"]["mp"]["geometries"][0]["coordinates"] == coords

    def test_height_margin_points(self, spark, tmp_path):
        src = {"type": "MultiPoint", "coordinates": [[1, 1], [2, 3]]}
        p = tmp_path / "mp.json"
        p.write_text(json.dumps(src))
        out = _out(run_commands(
            spark, f"-i {p} -o format=topojson height=800 margin=2 bbox "
            "no-quantization precision=0.001"))
        assert out["bbox"] == [2, 2, 400, 798]
        assert out["objects"]["mp"]["geometries"][0]["coordinates"] == \
            [[2, 798], [400, 2]]

    def test_wide_bbox_centers_horizontally(self, spark, tmp_path):
        src = {"type": "MultiPoint", "coordinates": [[1, 1], [2, 3]]}
        p = tmp_path / "mp.json"
        p.write_text(json.dumps(src))
        out = _out(run_commands(
            spark, f"-i {p} -o format=topojson height=80 width=80 margin=2 "
            "bbox no-quantization precision=0.001"))
        assert out["bbox"] == [21, 2, 59, 78]
        assert out["objects"]["mp"]["geometries"][0]["coordinates"] == \
            [[21, 78], [59, 2]]

    def test_tall_bbox_centers_vertically(self, spark, tmp_path):
        src = {"type": "MultiPoint", "coordinates": [[1, 1], [3, 2]]}
        p = tmp_path / "mp.json"
        p.write_text(json.dumps(src))
        out = _out(run_commands(
            spark, f"-i {p} -o format=topojson height=80 width=80 margin=2 "
            "bbox no-quantization precision=0.001"))
        assert out["bbox"] == [2, 21, 78, 59]
        assert out["objects"]["mp"]["geometries"][0]["coordinates"] == \
            [[2, 59], [78, 21]]


class TestQuantizedPointGoldens:
    """Reference output transcribed from the topojson program itself
    (topojson-test.js:381-400)."""

    def test_one_point(self, spark):
        cat = run_commands(
            spark,
            f"-i {TD}/one_point.geojson -o format=topojson "
            "quantization=10000 bbox")
        out = json.loads(cat.outputs["one_point.json"])
        gold = json.loads(
            '{"type":"Topology","objects":{"one_point":{"type":'
            '"GeometryCollection","geometries":[{"type":"Point",'
            '"properties":{"scalerank":2,"featurecla":"waterfall","name":'
            '"Niagara Falls","comment":"","name_alt":"","lat_y":43.087653,'
            '"long_x":-79.044073,"region":"North America","subregion":""},'
            '"coordinates":[0,0]}]}},"arcs":[],"bbox":[-79.04411780507252,'
            '43.08771393436908,-79.04411780507252,43.08771393436908],'
            '"transform":{"scale":[1,1],"translate":[-79.04411780507252,'
            '43.08771393436908]}}')
        assert out == gold

    def test_three_points(self, spark):
        cat = run_commands(
            spark,
            f"-i {TD}/three_points.geojson -o format=topojson "
            "quantization=10000 bbox")
        out = json.loads(cat.outputs["three_points.json"])
        geoms = out["objects"]["three_points"]["geometries"]
        assert [g["coordinates"] for g in geoms] == \
            [[0, 9999], [6942, 4552], [9999, 0]]
        assert out["transform"] == {
            "scale": [0.0024463566962164966, 0.0068662872146589655],
            "translate": [-79.04411780507252, -25.568291925005923]}
        assert out["bbox"] == [-79.04411780507252, -25.568291925005923,
                               -54.58299719960377, 43.08771393436908]


class TestRoundTripStability:
    """topoJSONRoundTrip (topojson-test.js:556-566), adapted per the
    module docstring: byte-stable from the second export on."""

    @pytest.mark.parametrize("fname", [
        "two_states.json",
        "three_points.geojson",
        "six_counties_three_null.json",
        "ne/ne_110m_admin_1_states_provinces_lines.json",
    ])
    def test_roundtrip(self, spark, tmp_path, fname):
        path = os.path.join(TD, fname)
        cat1 = run_commands(
            spark, f"-i {path} -o format=topojson quantization=10000")
        c1 = list(cat1.outputs.values())[0]
        p2 = tmp_path / "rt.topojson"
        p2.write_text(c1)
        cat2 = run_commands(
            spark, f"-i {p2} -o format=topojson quantization=10000")
        c2 = list(cat2.outputs.values())[0]
        p3 = tmp_path / "rt2.topojson"
        p3.write_text(c2)
        cat3 = run_commands(
            spark, f"-i {p3} -o format=topojson quantization=10000")
        c3 = list(cat3.outputs.values())[0]
        assert c2 == c3  # byte-stable once coordinates sit on the grid
        g1 = list(json.loads(c1)["objects"].values())[0]["geometries"]
        g2 = list(json.loads(c2)["objects"].values())[0]["geometries"]
        assert [(g.get("properties"), g.get("id"), g["type"])
                for g in g1] == \
               [(g.get("properties"), g.get("id"), g["type"])
                for g in g2]


class TestTopoJSONImportReferenceParity:
    """Transcribed from /root/reference/test/topojson-import-test.js
    (coordinate-level assertions — the repo decodes arc refs to catalog
    ring geometry on import)."""

    def test_nested_geometrycollection_single_type(self, spark):
        topo = {"arcs": [], "objects": {"points": {
            "type": "GeometryCollection",
            "geometries": [{
                "type": "GeometryCollection",
                "properties": {"type": "A"},
                "geometries": [{"type": "Point",
                                "properties": {"type": "B"},  # ignored
                                "coordinates": [1, 2]}]}]}}}
        layers = TJ.import_topojson_layers(spark, topo)
        assert len(layers) == 1
        name, df, kind, _ = layers[0]
        assert (name, kind) == ("points", "point")
        row = df.collect()[0]
        assert (row.x, row.y) == (1.0, 2.0)
        assert row.type == "A"  # outer properties win

    def test_winding_order_updated(self, spark):
        # both rings CCW in the file; import rewinds shell CW, hole CCW
        topo = {"arcs": [
            [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
            [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]]],
            "objects": {"layer1": {"type": "Polygon", "arcs": [[0], [1]]}}}
        _, df, kind, _ = TJ.import_topojson_layers(spark, topo)[0]
        assert kind == "polygon"
        row = df.collect()[0]
        shell = list(zip(row.rings_x[0], row.rings_y[0]))
        hole = list(zip(row.rings_x[1], row.rings_y[1]))
        # shell reversed to clockwise (math area < 0)
        assert shell == [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0),
                         (0.0, 0.0)]
        # hole reversed to counter-clockwise
        assert hole == [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0),
                        (1.0, 1.0)]

    def test_zero_area_rings_dropped(self, spark):
        topo = {"arcs": [
            [[0, 0], [4, 0], [4, 4]],
            [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]]],
            "objects": {"layer1": {"type": "Polygon",
                                   "arcs": [[0, -1], [1]]}}}  # [0, ~0]
        _, df, kind, _ = TJ.import_topojson_layers(spark, topo)[0]
        row = df.collect()[0]
        # the spike ring vanishes; the CCW square becomes the (rewound)
        # shell since ring 0 of the file had zero area
        assert row.rings_x is None or len(row.rings_x) <= 1

    def test_zero_area_holes_dropped(self, spark):
        topo = {"arcs": [
            [[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]],
            [[1, 1], [1, 2], [2, 2], [2, 1]]],
            "objects": {"layer1": {"type": "Polygon",
                                   "arcs": [[0], [1, -2]]}}}  # [1, ~1]
        _, df, _, _ = TJ.import_topojson_layers(spark, topo)[0]
        row = df.collect()[0]
        assert len(row.rings_x) == 1  # only the shell survives

    def test_error_on_nested_mixed_types(self, spark):
        topo = {"arcs": [[[0, 0], [0, 1]]], "objects": {"points": {
            "type": "GeometryCollection",
            "geometries": [{
                "type": "GeometryCollection",
                "properties": {"type": "A"},
                "geometries": [
                    {"type": "Point", "coordinates": [1, 2]},
                    {"type": "LineString", "arcs": [0]}]}]}}}
        with pytest.raises(ValueError, match="mixed"):
            TJ.import_topojson_layers(spark, topo)

    def test_mixed_types_split_into_layers(self, spark):
        topo = {"type": "Topology", "arcs": [
            [[3, 4], [4, 3], [3, 2], [2, 3], [3, 4]],
            [[3, 5], [5, 3], [3, 1], [1, 3], [3, 5]]],
            "objects": {"features": {
                "type": "GeometryCollection",
                "geometries": [
                    {"type": "MultiPolygon",
                     "arcs": [[[0]], [[1], [-1]]]},
                    {"type": "Point", "coordinates": [0, 0]}]}}}
        layers = TJ.import_topojson_layers(spark, topo)
        kinds = {k: (n, df) for n, df, k, _ in layers}
        assert set(kinds) == {"polygon", "point"}
        assert kinds["polygon"][0] == "features"
        poly = kinds["polygon"][1].collect()[0]
        assert len(poly.rings_x) == 3  # shell + shell + hole
        pt = kinds["point"][1].collect()[0]
        assert (pt.x, pt.y) == (0.0, 0.0)

    def test_all_null_geometries_imports_table(self, spark):
        topo = {"arcs": [], "objects": {"t": {
            "type": "GeometryCollection",
            "geometries": [{"type": None, "properties": {"foo": "a"}}]}}}
        name, df, kind, _ = TJ.import_topojson_layers(spark, topo)[0]
        assert kind is None
        assert df.collect()[0].foo == "a"
