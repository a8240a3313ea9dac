"""Byte-exact SVG document goldens transcribed from
/root/reference/test/svg-test.js (line refs per test). These pin the whole
export path — pixel transform, layer groups, defaults, ids, escaping,
number formatting — against the reference's own expected strings.
"""

import json

from mapshaper_spark.cli import apply_commands

_SHELL = ('<?xml version="1.0"?>\n'
          '<svg xmlns="http://www.w3.org/2000/svg" version="1.2" '
          'baseProfile="tiny" width="{w}" height="{h}" viewBox="0 0 {w} {h}" '
          'stroke-linecap="round" stroke-linejoin="round">\n{body}\n</svg>')


class TestSvgGoldens:
    # svg-test.js:70-88 'default scaling w/ 1px margin, single point'
    def test_default_scaling_single_point(self, spark):
        geo = json.dumps({"type": "Feature",
                          "properties": {"stroke": "purple"},
                          "geometry": {"type": "Point",
                                       "coordinates": [0, 0]}})
        out = apply_commands(
            spark, "-i point.json -rename-layers dot -o format=svg",
            {"point.json": geo})
        assert out["dot.svg"] == _SHELL.format(
            w=800, h=800,
            body='<g id="dot">\n<circle cx="400" cy="400" stroke="purple"/>'
                 '\n</g>')

    # svg-test.js:97-111 'multipolygon exported as single path'
    def test_multipolygon_single_path(self, spark):
        geo = json.dumps({
            "type": "Feature", "properties": None,
            "geometry": {"type": "MultiPolygon", "coordinates": [
                [[[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]]],
                [[[3, 2], [4, 2], [4, 1], [3, 1], [3, 2]]]]}})
        out = apply_commands(spark, "-i path.json -o path.svg margin=0 width=900",
                             {"path.json": geo})
        assert out["path.svg"] == _SHELL.format(
            w=900, h=300,
            body='<g id="path">\n'
                 '<path d="M 0 300 0 0 300 0 300 300 0 300 Z '
                 'M 600 0 900 0 900 300 600 300 600 0 Z"/>\n</g>')

    # svg-test.js:114-133 'default scaling w/ 1px margin, polyline'
    def test_default_scaling_polyline(self, spark):
        geo = json.dumps({"type": "Feature", "properties": None,
                          "geometry": {"type": "LineString",
                                       "coordinates": [[0, 0], [1, 2]]}})
        out = apply_commands(
            spark, "-i aline.json -rename-layers line -o format=svg",
            {"aline.json": geo})
        assert out["line.svg"] == _SHELL.format(
            w=800, h=1598,
            body='<g id="line" fill="none" stroke="black" stroke-width="1">\n'
                 '<path d="M 1 1597 799 1"/>\n</g>')

    # svg-test.js:135-153 'id-field= works'
    def test_id_field_option(self, spark):
        geo = json.dumps({"type": "Feature",
                          "geometry": {"type": "MultiPoint",
                                       "coordinates": [[0, 2], [2, 0]]},
                          "properties": {"name": "dots"}})
        out = apply_commands(spark, "-i layer1.json -o id-field=name format=svg",
                             {"layer1.json": geo})
        assert out["layer1.svg"] == _SHELL.format(
            w=800, h=800,
            body='<g id="layer1">\n<g id="dots">\n<circle cx="1" cy="1"/>\n'
                 '<circle cx="799" cy="799"/>\n</g>\n</g>')

    # svg-test.js:155-173 'XML entities are replaced'
    def test_xml_entities(self, spark):
        geo = json.dumps({"type": "Feature",
                          "geometry": {"type": "MultiPoint",
                                       "coordinates": [[0, 2], [2, 0]]},
                          "properties": {"name": "\"1980's\" & <now>"}})
        out = apply_commands(spark, "-i layer1.json -o id-field=name format=svg",
                             {"layer1.json": geo})
        assert out["layer1.svg"] == _SHELL.format(
            w=800, h=800,
            body='<g id="layer1">\n'
                 '<g id="&quot;1980&apos;s&quot; &amp; &lt;now&gt;">\n'
                 '<circle cx="1" cy="1"/>\n<circle cx="799" cy="799"/>\n'
                 '</g>\n</g>')

    # svg-test.js:175-195 'width= and margin= options work'
    def test_width_and_margin_options(self, spark):
        geo = json.dumps({"type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [0, -10]},
            {"type": "Point", "coordinates": [-10, 10]}]})
        out = apply_commands(spark, "-i layer1.json -o width=10 margin=0 format=svg",
                             {"layer1.json": geo})
        assert out["layer1.svg"] == _SHELL.format(
            w=10, h=20,
            body='<g id="layer1">\n<circle cx="10" cy="20"/>\n'
                 '<circle cx="0" cy="0"/>\n</g>')
