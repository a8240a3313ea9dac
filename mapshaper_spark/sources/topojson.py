"""TopoJSON source/sink.

Our native model (arcs table + features with signed arc refs) IS
TopoJSON-shaped; export is quantization + delta encoding
(/root/reference/src/topojson/topojson-export.js:13,66-100 — transform
scale = extent/(q-1), translate = (xmin, ymin), per-arc delta-encoded
integer coords), import is the inverse
(/root/reference/src/topojson/topojson-import.js).

Signed arc refs use the same complement convention (~id) as the reference
and the TopoJSON spec.

Quantization/delta math runs distributed as array transforms (pure JVM);
document assembly is driver-side (a TopoJSON file is a single JSON object).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_topojson(arcs: DataFrame, features: DataFrame, key: str,
                    object_name: str = "layer", quantization: int = 10000,
                    presimplify: bool = False) -> dict:
    """arcs(arc_id, xs, ys) + features(key, parts) -> TopoJSON dict.

    ``presimplify`` embeds the per-vertex simplification thresholds from the
    ``zs`` column as a third coordinate per point (the reference's
    -o presimplify, /root/reference/src/topojson/topojson-presimplify.js:3-10
    — thresholds quantized like mapbox topojson-simplify expects)."""
    b = arcs.agg(F.min("bbox.xmin"), F.min("bbox.ymin"),
                 F.max("bbox.xmax"), F.max("bbox.ymax")).collect()[0]
    xmin, ymin, xmax, ymax = (float(v) for v in b)
    kx = (xmax - xmin) / (quantization - 1) if xmax > xmin else 1.0
    ky = (ymax - ymin) / (quantization - 1) if ymax > ymin else 1.0

    qx = F.transform("xs", lambda v: F.round((v - F.lit(xmin)) / F.lit(kx)).cast("long"))
    qy = F.transform("ys", lambda v: F.round((v - F.lit(ymin)) / F.lit(ky)).cast("long"))
    cols = [F.col("arc_id"), qx.alias("qx"), qy.alias("qy")]
    if presimplify:
        kz = min(kx, ky)
        qz = F.transform("zs", lambda v: F.when(
            v == F.lit(float("inf")), F.lit(-1)
        ).otherwise(F.round(v / F.lit(kz))).cast("long"))
        cols.append(qz.alias("qz"))
    quant = arcs.select(*cols).orderBy("arc_id")

    topo_arcs = []
    for r in quant.collect():
        pts = []
        px = py = 0
        zs = r.qz if presimplify else None
        for i, (x, y) in enumerate(zip(r.qx, r.qy)):
            p = [int(x), int(y)] if i == 0 else [int(x - px), int(y - py)]
            if zs is not None:
                p.append(int(zs[i]))
            pts.append(p)
            px, py = x, y
        topo_arcs.append(pts)

    geoms = []
    for r in features.select(key, "parts").orderBy(key).collect():
        rings = [[int(sid) for sid in part] for part in r.parts]
        geoms.append({"type": "Polygon", "arcs": rings,
                      "properties": {key: r[key]}})

    return {
        "type": "Topology",
        "transform": {"scale": [kx, ky], "translate": [xmin, ymin]},
        "arcs": topo_arcs,
        "objects": {object_name: {"type": "GeometryCollection", "geometries": geoms}},
    }


def import_topojson(spark: SparkSession, topo: dict | str, object_name: str | None = None):
    """TopoJSON dict -> (arcs_df, features_df(key='fid', parts))."""
    import pyarrow as pa

    if isinstance(topo, str):
        topo = json.loads(topo)
    tr = topo.get("transform")
    kx, ky = (tr["scale"] if tr else (1.0, 1.0))
    tx, ty = (tr["translate"] if tr else (0.0, 0.0))

    arc_ids, xss, yss, ns, bbs = [], [], [], [], []
    for i, arc in enumerate(topo["arcs"]):
        xs, ys = [], []
        cx = cy = 0
        for j, p in enumerate(arc):
            dx, dy = p[0], p[1]  # optional 3rd value (presimplify z) ignored
            if tr:
                cx = dx if j == 0 else cx + dx
                cy = dy if j == 0 else cy + dy
                xs.append(cx * kx + tx)
                ys.append(cy * ky + ty)
            else:
                xs.append(float(dx))
                ys.append(float(dy))
        arc_ids.append(i)
        xss.append(xs)
        yss.append(ys)
        ns.append(len(xs))
        bbs.append({"xmin": min(xs), "ymin": min(ys), "xmax": max(xs), "ymax": max(ys)})
    arcs = spark.createDataFrame(pa.table({
        "arc_id": pa.array(arc_ids, pa.int64()),
        "xs": pa.array(xss, pa.list_(pa.float64())),
        "ys": pa.array(yss, pa.list_(pa.float64())),
        "n": pa.array(ns, pa.int32()),
        "bbox": pa.array(bbs, pa.struct([("xmin", pa.float64()), ("ymin", pa.float64()),
                                         ("xmax", pa.float64()), ("ymax", pa.float64())])),
    }))

    if object_name is None:
        object_name = next(iter(topo["objects"]))
    geoms = topo["objects"][object_name]["geometries"]
    fids, parts = [], []
    for i, g in enumerate(geoms):
        fids.append(i)
        parts.append([[int(s) for s in ring] for ring in g["arcs"]])
    features = spark.createDataFrame(pa.table({
        "fid": pa.array(fids, pa.int64()),
        "parts": pa.array(parts, pa.list_(pa.list_(pa.int32()))),
    }))
    return arcs, features
