"""spark-submit entry point for the flagship pipeline, with checkpointed
stages (north_rule launch mode: spark-submit --py-files on a multi-executor
cluster; resume from snapshot on restart).

    spark-submit --master <url> --py-files dist/mapshaper_spark.zip \
        jobs/flagship_job.py --images 10000000 --checkpoint /tmp/ms_ckpt

On a cluster, replace the synthetic images stage with
``spark.read.format("iceberg").load(<images table>)`` — the rest of the
pipeline is unchanged (stage fns receive DataFrames).
"""

from __future__ import annotations

import argparse
import os
import sys

# plain-python fallback; under spark-submit --py-files the zip provides this
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1_000_000)
    ap.add_argument("--checkpoint", default="/tmp/ms_flagship_ckpt")
    ap.add_argument("--grid", type=int, default=16)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("mapshaper-spark-flagship").getOrCreate()

    from mapshaper_spark import layers as L
    from mapshaper_spark.operators import grid as G
    from mapshaper_spark.operators import spatial as S
    from mapshaper_spark.plans.checkpoint import Stage, StageRunner

    BBOX = L.DEFAULT_BBOX

    def st_images(spark, deps):
        return (L.footprint_cols(L.synth_images(spark, args.images))
                .select("id", "lon", "lat"))

    def st_pip(spark, deps):
        polys = L.region_mosaic_rings_local(spark, 6, 4, BBOX)
        return S.pip_join(deps["images"], "lon", "lat", polys, "rid",
                          bbox=BBOX, res=9, cache_token="flagship-mosaic")

    def st_tiles(spark, deps):
        tr, tc = G.grid_rc(F.col("lon"), F.col("lat"), args.grid, args.grid, BBOX)
        return (deps["pip"]
                .groupBy(F.col("rid"), tr.alias("__tr"), tc.alias("__tc"))
                .agg(F.count(F.lit(1)).alias("n_images"))
                .select("rid",
                        F.format_string("r%dc%d", "__tr", "__tc").alias("tile"),
                        "n_images"))

    runner = StageRunner(spark, args.checkpoint)
    done = runner.run([
        Stage("images", st_images),
        Stage("pip", st_pip, inputs=("images",)),
        Stage("tiles", st_tiles, inputs=("pip",), partition_by=("rid",)),
    ])
    print({k: {"rows": v["rows"], "wall_s": v["wall_s"]} for k, v in done.items()})


if __name__ == "__main__":
    main()
