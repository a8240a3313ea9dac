"""-simplify as a distributed operator family.

Per-arc threshold computation is embarrassingly parallel over the arcs table
(/root/reference/src/simplify/mapshaper-simplify.js:10-41): a pandas UDF maps
(xs, ys) -> zs with the exact Visvalingam / weighted-Visvalingam / DP kernels
from mapshaper_spark.geom.kernels. The retained interval for percentage=
simplification reproduces setRetainedPct (mapshaper-arcs.js:492-498):
rank-th smallest removable threshold with rank = floor((1-pct)*(n+2)).

Applying a z-limit is a *non-destructive mask* (the reference's filtered
iterators, mapshaper-arcs.js:423-431): vertices with z < zlimit are skipped,
arc endpoints (z = +inf) always survive.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapshaper_spark.geom import kernels as K

METHODS = ("visvalingam", "weighted_visvalingam", "dp")


def compute_thresholds(arcs: DataFrame, method: str = "weighted_visvalingam",
                       weighting: float = 0.7) -> DataFrame:
    """Fill the ``zs`` column with per-vertex removal thresholds."""
    if method not in METHODS:
        raise ValueError(f"unknown method {method}")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            zs_out = []
            for xs, ys in zip(pdf["xs"], pdf["ys"]):
                xa = np.asarray(xs, dtype=np.float64)
                ya = np.asarray(ys, dtype=np.float64)
                if method == "dp":
                    zz = K.douglas_peucker_arc(xa, ya)
                else:
                    zz = K.visvalingam_arc(xa, ya,
                                           weighted=(method == "weighted_visvalingam"),
                                           weighting=weighting)
                zs_out.append(zz.tolist())
            pdf = pdf.copy()
            pdf["zs"] = zs_out
            yield pdf

    return arcs.mapInPandas(gen, schema=arcs.schema)


def threshold_for_pct(arcs_with_zs: DataFrame, pct: float) -> float:
    """Exact distributed setRetainedPct: rank-th smallest removable z.

    Two cheap jobs: a count, then an orderBy+limit(rank) pruned to the tail —
    at 100 TB this is the standard exact-quantile-by-rank plan; an
    approx-quantile fast path (percentile_approx) is available when exact
    fixture parity is not required.
    """
    if pct >= 1:
        return 0.0
    if pct <= 0:
        return math.inf
    zz = (arcs_with_zs.select(F.explode("zs").alias("z"))
          .filter(F.col("z") != float("inf")))
    n = zz.count()
    rank = 0 if n == 0 else int(math.floor((1.0 - pct) * (n + 2)))
    if rank <= 0:
        return 0.0
    if rank > n:
        return math.inf
    rows = zz.orderBy("z").limit(rank).orderBy(F.desc("z")).limit(1).collect()
    return float(rows[0][0])


def threshold_for_pct_approx(arcs_with_zs: DataFrame, pct: float) -> float:
    zz = (arcs_with_zs.select(F.explode("zs").alias("z"))
          .filter(F.col("z") != float("inf")))
    return zz.approxQuantile("z", [1.0 - pct], 0.001)[0]


def apply_zlimit(arcs_with_zs: DataFrame, zlimit: float) -> DataFrame:
    """Masked copy of each arc keeping vertices with z >= zlimit (endpoints
    are +inf so always kept) — the reference's filtered-iterator semantics
    applied destructively for export (getFilteredCopy, arcs.js:140-160).
    Pure JVM: arrays_zip + filter + transform."""
    zipped = F.arrays_zip(F.col("xs").alias("x"), F.col("ys").alias("y"),
                          F.col("zs").alias("z"))
    kept = F.filter(zipped, lambda s: s["z"] >= F.lit(zlimit))
    return (arcs_with_zs
            .withColumn("__kept", kept)
            .withColumn("xs", F.transform("__kept", lambda s: s["x"]))
            .withColumn("ys", F.transform("__kept", lambda s: s["y"]))
            .withColumn("zs", F.transform("__kept", lambda s: s["z"]))
            .withColumn("n", F.size("xs"))
            .drop("__kept"))


def simplify(arcs: DataFrame, method: str = "weighted_visvalingam",
             pct: float = 1.0, interval: float | None = None,
             weighting: float = 0.7, exact_rank: bool = True):
    """Full -simplify: thresholds + retained interval. Returns
    (arcs_with_zs, zlimit); call apply_zlimit to materialize."""
    with_z = compute_thresholds(arcs, method=method, weighting=weighting)
    if interval is not None:
        zlimit = float(interval)
    elif exact_rank:
        with_z = with_z.cache()
        zlimit = threshold_for_pct(with_z, pct)
    else:
        with_z = with_z.cache()
        zlimit = threshold_for_pct_approx(with_z, pct)
    return with_z, zlimit
