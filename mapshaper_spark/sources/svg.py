"""SVG sink (-o .svg analog).

The reference renders layers to SVG via exportSVG
(/root/reference/src/io/mapshaper-export.js exporter map :120-127,
src/svg/). This sink covers the geometry-to-<path> core: per-feature "d"
path strings are built JVM-side (concat_ws over transformed ring arrays —
no Python), the document shell is assembled on the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def svg_path_col(precision: int = 6) -> F.Column:
    """SVG "d" attribute from rings_x/rings_y: "M x y L x y ... Z" per ring."""
    ring_d = F.transform(
        F.arrays_zip(F.col("rings_x").alias("rx"), F.col("rings_y").alias("ry")),
        lambda r: F.concat(
            F.lit("M "),
            F.array_join(
                F.zip_with(r["rx"], r["ry"],
                           lambda a, b: F.concat(F.round(a, precision).cast("string"),
                                                 F.lit(" "),
                                                 F.round(-b, precision).cast("string"))),
                " L "),
            F.lit(" Z")))
    return F.array_join(ring_d, " ")


def to_svg_paths(df: DataFrame, precision: int = 6) -> DataFrame:
    """One <path> element string per feature (y negated: SVG y grows down)."""
    return df.select(
        F.concat(F.lit('<path d="'), svg_path_col(precision),
                 F.lit('" fill="none" stroke="black"/>')).alias("svg_path"))


def export_svg(df: DataFrame, width: int = 800, precision: int = 6) -> str:
    """Driver-side SVG document assembly (fixture-scale)."""
    b = df.agg(F.min("bbox.xmin"), F.min("bbox.ymin"),
               F.max("bbox.xmax"), F.max("bbox.ymax")).collect()[0]
    xmin, ymin, xmax, ymax = (float(v) for v in b)
    height = width * (ymax - ymin) / (xmax - xmin) if xmax > xmin else width
    paths = "\n".join(r.svg_path for r in to_svg_paths(df, precision).collect())
    return (f'<svg xmlns="http://www.w3.org/2000/svg" '
            f'viewBox="{xmin} {-ymax} {xmax - xmin} {ymax - ymin}" '
            f'width="{width}" height="{height:.0f}">\n{paths}\n</svg>')
