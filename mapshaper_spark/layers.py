"""Core data model + deterministic synthetic geo layers.

Mirrors the reference's two-table model (SURVEY.md §1):

- ``features``: one row per feature — ``parts`` = array of arrays of *signed*
  arc ids (negative id means "arc traversed reversed", encoded JS-style as
  ``~id = -(id+1)``; /root/reference/src/topology/mapshaper-topology.js:40),
  plus attributes and a precomputed ``bbox`` struct.
- ``arcs``: per-arc coordinate arrays (``xs``, ``ys``), vertex count ``n``,
  optional ``zs`` simplification thresholds, ``bbox``
  (/root/reference/src/paths/mapshaper-arcs.js:11-16).

The synthetic region mosaic reproduces FIXTURES.md §2: an R x C grid of
rectangular "counties" over a bbox, with *shared* borders (each interior
edge is a single arc referenced +id by one cell and ~id by its neighbor) —
exercising the shared-arc topology exactly as two_states.shp does in the
reference test suite.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapshaper_spark.plans.scale import maybe_broadcast

DEFAULT_BBOX = (-120.0, 25.0, -60.0, 49.0)

BBOX_TYPE = T.StructType([
    T.StructField("xmin", T.DoubleType()),
    T.StructField("ymin", T.DoubleType()),
    T.StructField("xmax", T.DoubleType()),
    T.StructField("ymax", T.DoubleType()),
])

ARCS_SCHEMA = T.StructType([
    T.StructField("arc_id", T.LongType(), False),
    T.StructField("xs", T.ArrayType(T.DoubleType()), False),
    T.StructField("ys", T.ArrayType(T.DoubleType()), False),
    T.StructField("zs", T.ArrayType(T.DoubleType()), True),
    T.StructField("n", T.IntegerType(), False),
    T.StructField("bbox", BBOX_TYPE, False),
])


def encode_reversed(arc_id: int) -> int:
    """JS ``~id`` encoding of a reversed arc reference."""
    return -(arc_id + 1)


def absolute_arc_id_col(signed: F.Column) -> F.Column:
    """abs id of a signed arc reference: id if >=0 else -(id+1)."""
    return F.when(signed >= 0, signed).otherwise(-(signed + 1))


def region_mosaic(spark: SparkSession, cols: int = 6, rows: int = 4,
                  bbox: Sequence[float] = DEFAULT_BBOX,
                  state_block: tuple[int, int] = (3, 2)):
    """Deterministic R x C rectangular county mosaic with shared arcs.

    Returns (features_df, arcs_df). Arc layout:
    - horizontal edges: id = r*cols + c   for r in [0, rows], c in [0, cols)
      (2 points, left -> right)
    - vertical edges:   id = H + r*(cols+1) + c  for r in [0, rows),
      c in [0, cols]  (2 points, bottom -> top), H = (rows+1)*cols
    Cell (r, c) ring (positive-area orientation per the reference's signed
    shoelace, shape-geom.js:270-288):
      +V(r,c), +H(r+1,c), ~V(r,c+1), ~H(r,c)
    """
    xmin, ymin, xmax, ymax = bbox
    w = (xmax - xmin) / cols
    h = (ymax - ymin) / rows
    H = (rows + 1) * cols

    arcs = []
    for r in range(rows + 1):
        y = ymin + r * h
        for c in range(cols):
            x0, x1 = xmin + c * w, xmin + (c + 1) * w
            arcs.append((r * cols + c, [x0, x1], [y, y], None, 2,
                         {"xmin": x0, "ymin": y, "xmax": x1, "ymax": y}))
    for r in range(rows):
        y0, y1 = ymin + r * h, ymin + (r + 1) * h
        for c in range(cols + 1):
            x = xmin + c * w
            arcs.append((H + r * (cols + 1) + c, [x, x], [y0, y1], None, 2,
                         {"xmin": x, "ymin": y0, "xmax": x, "ymax": y1}))
    import pyarrow as pa

    # Arrow-backed creation: evaluating these DataFrames is pure JVM work
    # (a pickled-list parallelize would spawn Python deserializer tasks on
    # every downstream job — ruinous for iterative algorithms)
    arcs_df = spark.createDataFrame(pa.table({
        "arc_id": pa.array([a[0] for a in arcs], pa.int64()),
        "xs": pa.array([a[1] for a in arcs], pa.list_(pa.float64())),
        "ys": pa.array([a[2] for a in arcs], pa.list_(pa.float64())),
        "zs": pa.array([a[3] for a in arcs], pa.list_(pa.float64())),
        "n": pa.array([a[4] for a in arcs], pa.int32()),
        "bbox": pa.array([a[5] for a in arcs],
                         pa.struct([("xmin", pa.float64()), ("ymin", pa.float64()),
                                    ("xmax", pa.float64()), ("ymax", pa.float64())])),
    }))

    feats = []
    sb_c, sb_r = state_block
    for r in range(rows):
        for c in range(cols):
            rid = r * cols + c
            v_l = H + r * (cols + 1) + c
            v_r = H + r * (cols + 1) + c + 1
            h_b = r * cols + c
            h_t = (r + 1) * cols + c
            parts = [[v_l, h_t, encode_reversed(v_r), encode_reversed(h_b)]]
            state = f"S{(r // sb_r) * ((cols + sb_c - 1) // sb_c) + (c // sb_c)}"
            pop = float((rid * 37) % 1000 + 100)
            feats.append((f"R{r}C{c}", rid, state, pop, f"county {rid}", parts,
                          {"xmin": xmin + c * w, "ymin": ymin + r * h,
                           "xmax": xmin + (c + 1) * w, "ymax": ymin + (r + 1) * h}))
    features_df = spark.createDataFrame(pa.table({
        "region_id": pa.array([f[0] for f in feats], pa.string()),
        "rid": pa.array([f[1] for f in feats], pa.int32()),
        "state": pa.array([f[2] for f in feats], pa.string()),
        "pop": pa.array([f[3] for f in feats], pa.float64()),
        "name": pa.array([f[4] for f in feats], pa.string()),
        "parts": pa.array([f[5] for f in feats], pa.list_(pa.list_(pa.int32()))),
        "bbox": pa.array([f[6] for f in feats],
                         pa.struct([("xmin", pa.float64()), ("ymin", pa.float64()),
                                    ("xmax", pa.float64()), ("ymax", pa.float64())])),
    }))
    return features_df, arcs_df


RINGS_TYPE = T.StructType([
    T.StructField("rings_x", T.ArrayType(T.ArrayType(T.DoubleType()))),
    T.StructField("rings_y", T.ArrayType(T.ArrayType(T.DoubleType()))),
])


def assemble_rings(features: DataFrame, arcs: DataFrame, key: str = "rid") -> DataFrame:
    """Join features' signed arc-id parts with the arcs table and concatenate
    per-ring coordinate arrays (reversing arcs referenced with ~id).

    Distributed plan: posexplode parts -> posexplode arc refs -> equi-join on
    abs(arc_id) (the arcs side is typically broadcast) -> groupBy feature +
    applyInPandas concat. Scales with #features; each ring must fit in a row
    (same envelope as the reference, which holds whole arcs in memory).
    """
    exploded = (
        features.select(key, F.posexplode("parts").alias("part_idx", "refs"))
        .select(key, "part_idx", F.posexplode("refs").alias("seq", "signed"))
        .withColumn("aid", absolute_arc_id_col(F.col("signed")).cast("long"))
        .withColumn("rev", F.col("signed") < 0)
    )
    joined = exploded.join(maybe_broadcast(arcs.select("arc_id", "xs", "ys")),
                           exploded.aid == arcs.arc_id, "left")

    def _concat(pdf: pd.DataFrame) -> pd.DataFrame:
        kv = pdf[["k", "part_idx"]].iloc[0]
        pdf = pdf.sort_values("seq")
        xs_out: list[float] = []
        ys_out: list[float] = []
        for xs, ys, rev in zip(pdf["xs"], pdf["ys"], pdf["rev"]):
            xa = np.asarray(xs, dtype=np.float64)
            ya = np.asarray(ys, dtype=np.float64)
            if rev:
                xa, ya = xa[::-1], ya[::-1]
            if xs_out and xs_out[-1] == xa[0] and ys_out[-1] == ya[0]:
                xa, ya = xa[1:], ya[1:]
            xs_out.extend(xa.tolist())
            ys_out.extend(ya.tolist())
        return pd.DataFrame({"k": [kv.iloc[0]], "part_idx": [kv.iloc[1]],
                             "ring_x": [xs_out], "ring_y": [ys_out]})

    ring_schema = T.StructType([
        T.StructField("k", joined.schema[key].dataType),
        T.StructField("part_idx", T.IntegerType()),
        T.StructField("ring_x", T.ArrayType(T.DoubleType())),
        T.StructField("ring_y", T.ArrayType(T.DoubleType())),
    ])
    rings = (
        joined.withColumnRenamed(key, "k")
        .groupBy("k", "part_idx")
        .applyInPandas(_concat, schema=ring_schema)
    )
    per_feature = (
        rings.groupBy("k")
        .agg(F.sort_array(F.collect_list(F.struct("part_idx", "ring_x", "ring_y"))).alias("rs"))
        .select(F.col("k").alias(key),
                F.col("rs.ring_x").alias("rings_x"),
                F.col("rs.ring_y").alias("rings_y"))
    )
    return features.join(per_feature, key)


def region_mosaic_rings_local(spark: SparkSession, cols: int = 6, rows: int = 4,
                              bbox: Sequence[float] = DEFAULT_BBOX,
                              state_block: tuple[int, int] = (3, 2)) -> DataFrame:
    """Driver-side assembled version of region_mosaic + assemble_rings for the
    (tiny) polygon dimension: identical ring coordinates, zero Spark stages.

    The polygon side of the flagship join is a broadcast dimension; building
    it distributed costs several shuffle barriers per query for a table of a
    few dozen rows. At 100 TB the points side is the scan — the dimension
    belongs on the driver (then sc.broadcast), exactly like any other
    broadcast dim table.
    """
    xmin, ymin, xmax, ymax = bbox
    w = (xmax - xmin) / cols
    h = (ymax - ymin) / rows
    sb_c, sb_r = state_block
    rows_out = []
    for r in range(rows):
        for c in range(cols):
            rid = r * cols + c
            x0, x1 = xmin + c * w, xmin + (c + 1) * w
            y0, y1 = ymin + r * h, ymin + (r + 1) * h
            ring_x = [x0, x0, x1, x1, x0]
            ring_y = [y0, y1, y1, y0, y0]
            state = f"S{(r // sb_r) * ((cols + sb_c - 1) // sb_c) + (c // sb_c)}"
            pop = float((rid * 37) % 1000 + 100)
            rows_out.append((f"R{r}C{c}", rid, state, pop, f"county {rid}",
                             {"xmin": x0, "ymin": y0, "xmax": x1, "ymax": y1},
                             [ring_x], [ring_y]))
    import pyarrow as pa

    # build through Arrow so evaluating this DataFrame is pure JVM work —
    # a plain createDataFrame(list) parallelizes *pickled* rows, and every
    # downstream use then spawns Python deserializer tasks (observed: more
    # wall time than the 20M-row fact scan it feeds)
    table = pa.table({
        "region_id": pa.array([r[0] for r in rows_out], pa.string()),
        "rid": pa.array([r[1] for r in rows_out], pa.int32()),
        "state": pa.array([r[2] for r in rows_out], pa.string()),
        "pop": pa.array([r[3] for r in rows_out], pa.float64()),
        "name": pa.array([r[4] for r in rows_out], pa.string()),
        "bbox": pa.array([r[5] for r in rows_out],
                         pa.struct([("xmin", pa.float64()), ("ymin", pa.float64()),
                                    ("xmax", pa.float64()), ("ymax", pa.float64())])),
        "rings_x": pa.array([r[6] for r in rows_out], pa.list_(pa.list_(pa.float64()))),
        "rings_y": pa.array([r[7] for r in rows_out], pa.list_(pa.list_(pa.float64()))),
    })
    return spark.createDataFrame(table)


def synth_images(spark: SparkSession, n: int, with_bytes: bool = False,
                 partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic images table (FIXTURES.md §1 / input_hint).

    Schema: (image_id string, bytes binary|null, w int, h int, fmt string,
    caption string, phash long). The footprint derivation used downstream is
    lon = -120 + (phash % 2^20)/2^20*60, lat = 25 + ((phash>>20) % 2^20)/2^20*24.

    ``phash`` is a Knuth multiplicative mix of the row id — chosen (over
    splitmix64) so the identical arithmetic is expressible in ANSI SQL for
    the DuckDB oracle without 64-bit overflow.
    """
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    df = (
        df.withColumn("image_id", F.format_string("img%012d", F.col("id")))
        .withColumn("phash", (F.col("id") * F.lit(2654435761)) % F.lit(1 << 40))
        .withColumn("w", F.element_at(F.array(F.lit(16), F.lit(32), F.lit(64)),
                                      (F.col("id") % 3 + 1).cast("int")).cast("int"))
        .withColumn("h", F.element_at(F.array(F.lit(16), F.lit(32), F.lit(64)),
                                      ((F.col("id") + 1) % 3 + 1).cast("int")).cast("int"))
        .withColumn("fmt", F.when(F.col("id") % 2 == 0, F.lit("png")).otherwise(F.lit("ppm")))
        .withColumn("caption", F.format_string("synthetic caption %d tok%d", F.col("id"), F.col("id") % 97))
    )
    if with_bytes:
        from mapshaper_spark.operators.images import encode_synthetic_bytes
        df = encode_synthetic_bytes(df)
    else:
        df = df.withColumn("bytes", F.lit(None).cast("binary"))
    return df.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "id")


def footprint_cols(df: DataFrame, phash: str = "phash") -> DataFrame:
    """Point footprint from phash (FIXTURES.md §1 derivation)."""
    p = F.col(phash)
    lon = F.lit(-120.0) + (p % F.lit(1 << 20)).cast("double") / F.lit(float(1 << 20)) * F.lit(60.0)
    lat = F.lit(25.0) + (F.shiftright(p, 20) % F.lit(1 << 20)).cast("double") / F.lit(float(1 << 20)) * F.lit(24.0)
    return df.withColumn("lon", lon).withColumn("lat", lat)
