"""-cluster analog: group features into ``count`` spatial clusters.

The reference uses greedy pairwise agglomeration of polygon centroids
(/root/reference/src/commands/mapshaper-cluster.js:15-42) — inherently
serial O(n^2). DOCUMENTED DEVIATION (SURVEY §2.9 plan): at scale we run
deterministic Lloyd iterations (k-means) over the centroid points with
grid-quantile seeding; same contract (every feature gets a cluster id in
[0, count)), different (but stable) assignment in ambiguous configurations.

All iterations are broadcast-join + groupBy — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_points(df: DataFrame, x: str, y: str, count: int,
                   iterations: int = 10, id_field: str = "cluster") -> DataFrame:
    """Assign a cluster id in [0, count) to every row."""
    n = df.count()
    if n == 0 or count <= 1:
        return df.withColumn(id_field, F.lit(0))
    count = min(count, n)
    # deterministic seeding: evenly spaced rows of the globally sorted points
    from pyspark.sql import Window
    w = Window.orderBy("cx", "cy")
    seeds = (df.select(F.col(x).alias("cx"), F.col(y).alias("cy"))
             .withColumn("__rk", F.row_number().over(w))
             .filter(((F.col("__rk") - 1) % F.lit(max(1, n // count)) == 0))
             .limit(count)
             .withColumn(id_field, F.row_number().over(Window.orderBy("cx", "cy")) - 1)
             .select(id_field, "cx", "cy"))

    centers = [(r[id_field], r.cx, r.cy) for r in seeds.collect()]
    for _ in range(iterations):
        cdf = F.broadcast(df.sparkSession.createDataFrame(
            centers, f"{id_field} int, cx double, cy double"))
        d2 = (F.col(x) - F.col("cx")) ** 2 + (F.col(y) - F.col("cy")) ** 2
        assigned = (df.crossJoin(cdf)
                    .groupBy(*df.columns)
                    .agg(F.min(F.struct(d2.alias("d2"),
                                        F.col(id_field).alias("cid"))).alias("b"))
                    .withColumn(id_field, F.col("b.cid")).drop("b"))
        new_centers = (assigned.groupBy(id_field)
                       .agg(F.avg(x).alias("cx"), F.avg(y).alias("cy")))
        nc = [(r[id_field], r.cx, r.cy) for r in new_centers.collect()]
        if sorted(nc) == sorted(centers):
            break
        centers = nc
    cdf = F.broadcast(df.sparkSession.createDataFrame(
        centers, f"{id_field} int, cx double, cy double"))
    d2 = (F.col(x) - F.col("cx")) ** 2 + (F.col(y) - F.col("cy")) ** 2
    return (df.crossJoin(cdf)
            .groupBy(*df.columns)
            .agg(F.min(F.struct(d2.alias("d2"), F.col(id_field).alias("cid"))).alias("b"))
            .withColumn(id_field, F.col("b.cid")).drop("b"))
