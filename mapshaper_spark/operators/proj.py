"""Projections as column math (-proj analog).

The reference delegates to the mproj library
(/root/reference/src/commands/mapshaper-proj.js:8,95-150 projectArcs maps
every vertex; definition index /root/reference/src/geom/mapshaper-projections.js:4-66
— 'webmercator' and 'merc' are among the named aliases). A native proj
dependency is not available here, so the engine ships the closed-form
projections as pure Catalyst expressions (exactly what projectArcs does per
vertex, but whole-stage-codegen over columns); pyproj can be slotted into a
pandas UDF behind the same signatures when present.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

R = 6378137.0  # spherical mercator radius, matches mapshaper webmercator


def webmercator_x(lon: Column) -> Column:
    return F.radians(lon) * F.lit(R)


def webmercator_y(lat: Column) -> Column:
    # y = R * ln(tan(pi/4 + phi/2))
    return F.lit(R) * F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / F.lit(2.0)))


def webmercator_inv_lon(x: Column) -> Column:
    return F.degrees(x / F.lit(R))


def webmercator_inv_lat(y: Column) -> Column:
    return F.degrees(F.lit(2.0) * F.atan(F.exp(y / F.lit(R))) - F.lit(math.pi / 2.0))


def project_points(df: DataFrame, x: str, y: str, crs: str = "webmercator") -> DataFrame:
    """Project point columns in place (the -proj target semantics)."""
    if crs in ("webmercator", "merc", "EPSG:3857"):
        return (df.withColumn("__px", webmercator_x(F.col(x)))
                .withColumn(y, webmercator_y(F.col(y)))
                .withColumn(x, F.col("__px")).drop("__px"))
    if crs in ("wgs84", "EPSG:4326"):  # inverse webmercator
        return (df.withColumn("__lon", webmercator_inv_lon(F.col(x)))
                .withColumn(y, webmercator_inv_lat(F.col(y)))
                .withColumn(x, F.col("__lon")).drop("__lon"))
    raise ValueError(f"unknown crs {crs}")


def project_arcs(arcs: DataFrame, crs: str = "webmercator") -> DataFrame:
    """-proj over an arcs table: transform every vertex of every arc
    (projectArcs, mapshaper-proj.js:135-150) with array transforms — still
    zero Python."""
    if crs not in ("webmercator", "merc", "EPSG:3857"):
        raise ValueError(f"unknown crs {crs}")
    k = math.pi / 180.0 * R
    new_xs = F.transform("xs", lambda v: v * F.lit(k))
    new_ys = F.transform("ys", lambda v: F.lit(R) * F.log(
        F.tan(F.lit(math.pi / 4.0) + v * F.lit(math.pi / 360.0))))
    out = arcs.withColumn("xs", new_xs).withColumn("ys", new_ys)
    return out.withColumn("bbox", F.struct(
        F.array_min("xs").alias("xmin"), F.array_min("ys").alias("ymin"),
        F.array_max("xs").alias("xmax"), F.array_max("ys").alias("ymax")))
