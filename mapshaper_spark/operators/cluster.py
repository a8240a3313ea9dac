"""-cluster analog: group features into ``count`` spatial clusters.

The reference uses greedy pairwise agglomeration of polygon centroids
(/root/reference/src/commands/mapshaper-cluster.js:15-42) — inherently
serial O(n^2). DOCUMENTED DEVIATION (SURVEY §2.9 plan): at scale we run
deterministic Lloyd iterations (k-means); same contract (every feature
gets a cluster id in [0, count)), different (but stable) assignment in
ambiguous configurations.

Physical plan (the ivf_index pattern, VERDICT r02 item 1):

1. bounded deterministic SAMPLE — TakeOrdered of (x, y) capped at
   ``sample_cap`` rows (no global Window, no full sort shuffle);
2. seeding + Lloyd iterations DRIVER-SIDE in numpy over the sample
   (centers rounded to 9 dp per iteration so any engine replaying the
   same spec lands on bit-identical centers);
3. ONE map-only JVM projection assigns every row: ``least()`` over
   (d2, cid) structs with the final centers inlined as literals — no
   crossJoin, no re-groupBy of the full table, no Python for k <= 64
   (a vectorized pandas argmin takes over for wide k).

Every step is SQL-replicable, so the driver oracle can verify the
assignment EXACTLY (ties broken by lowest cluster id at every stage).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lloyd_centers(X: np.ndarray, count: int, iterations: int) -> np.ndarray:
    """Deterministic seeding + Lloyd on a (n, 2) sample matrix.

    Seeds: rows 0, step, 2*step, ... of the (x, y)-sorted sample with
    step = n // count. Each iteration assigns by squared euclidean
    distance (ties -> lowest cluster id), recomputes centers as the
    member mean rounded to 9 decimals; an emptied cluster keeps its
    previous center. Converged centers are a fixed point, so early exit
    equals running all ``iterations`` rounds (the SQL oracle unrolls the
    fixed count)."""
    count = max(1, min(count, len(X)))
    step = max(1, len(X) // count)
    cents = X[::step][:count].copy()
    for _ in range(iterations):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)  # ties -> lowest index, like the SQL order
        new = cents.copy()
        for ci in range(len(cents)):
            m = lab == ci
            if m.any():
                new[ci] = np.round(X[m].mean(axis=0), 9)
        if np.array_equal(new, cents):
            break
        cents = new
    return cents


def assign_nearest(df: DataFrame, x: str, y: str, cents: np.ndarray,
                   id_field: str = "cluster") -> DataFrame:
    """Map-only nearest-center assignment; ties -> lowest cluster id."""
    if len(cents) == 1:
        return df.withColumn(id_field, F.lit(0))
    if len(cents) <= 64:
        structs = []
        for ci, (cx, cy) in enumerate(cents):
            dx = F.col(x).cast("double") - F.lit(float(cx))
            dy = F.col(y).cast("double") - F.lit(float(cy))
            structs.append(F.struct((dx * dx + dy * dy).alias("d2"),
                                    F.lit(ci).alias("cid")))
        return df.withColumn(id_field, F.least(*structs)["cid"])

    # wide-k path: vectorized argmin with the center matrix in the closure.
    # (mapInPandas, not @pandas_udf — type-hint inference breaks under
    # `from __future__ import annotations` in PySpark 4.1.)
    from pyspark.sql import types as T

    C = np.asarray(cents, dtype=np.float64)
    out_schema = T.StructType(list(df.schema.fields) +
                              [T.StructField(id_field, T.IntegerType())])

    def gen(it):
        for pdf in it:
            P = np.stack([pdf[x].to_numpy(np.float64),
                          pdf[y].to_numpy(np.float64)], axis=1)
            d2 = ((P[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            pdf = pdf.copy()
            pdf[id_field] = d2.argmin(axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def cluster_points(df: DataFrame, x: str, y: str, count: int,
                   iterations: int = 8, id_field: str = "cluster",
                   sample_cap: int = 10_000) -> DataFrame:
    """Assign a cluster id in [0, count) to every row."""
    if count <= 1:
        return df.withColumn(id_field, F.lit(0))
    sample = (df.select(F.col(x).cast("double").alias("sx"),
                        F.col(y).cast("double").alias("sy"))
              .orderBy("sx", "sy").limit(sample_cap).collect())
    if not sample:
        return df.withColumn(id_field, F.lit(0))
    X = np.array([(r.sx, r.sy) for r in sample], dtype=np.float64)
    cents = lloyd_centers(X, count, iterations)
    return assign_nearest(df, x, y, cents, id_field)
