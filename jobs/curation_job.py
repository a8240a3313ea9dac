"""spark-submit entry point for a training-data curation pipeline over the
image+caption table: decode-stats -> caption quality/lang -> exact +
near-dedup -> spatial tile assignment — the full "what a 100 TB pretraining
pipeline needs" path (BUILD requirement), checkpointed per stage.

    spark-submit --py-files dist/mapshaper_spark.zip jobs/curation_job.py \
        --images 100000 --checkpoint /tmp/ms_curation

Stages (each an immutable snapshot; rerun resumes after the last complete):
  images    synthetic image+caption rows (swap for the Iceberg scan)
  stats     decode pixels -> channel stats + ahash (Arrow-batched)
  text      caption token counts / quality / language id
  dedup     exact caption dedup + ahash-band near-dup pairs
  tiles     footprint -> PIP join -> per-(region, tile) counts
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
    ap.add_argument("--images", type=int, default=100_000)
    ap.add_argument("--checkpoint", default="/tmp/ms_curation_ckpt")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("mapshaper-spark-curation").getOrCreate()

    from mapshaper_spark import layers as L
    from mapshaper_spark.operators import dedup as DD
    from mapshaper_spark.operators import grid as G
    from mapshaper_spark.operators import images as IM
    from mapshaper_spark.operators import spatial as S
    from mapshaper_spark.operators import text as TX
    from mapshaper_spark.plans.checkpoint import Stage, StageRunner

    BBOX = L.DEFAULT_BBOX

    def st_images(spark, deps):
        return L.synth_images(spark, args.images, with_bytes=(args.images <= 200_000))

    def st_stats(spark, deps):
        imgs = deps["images"]
        if args.images > 200_000:  # bytes skipped at large synthetic scale
            return imgs.select("image_id", "phash")
        return IM.decode_stats(imgs)

    def st_text(spark, deps):
        docs = deps["images"].select("image_id", F.col("caption").alias("text"))
        return (TX.text_metrics(docs, "text")  # fused single-tokenize plan
                .select("image_id", "n_tokens", "quality", "lang_pred",
                        "fingerprint"))

    def st_dedup(spark, deps):
        t = deps["text"]
        from pyspark.sql import Window
        w = Window.partitionBy("fingerprint").orderBy("image_id")
        return (t.withColumn("dup_rank", F.row_number().over(w))
                .withColumn("is_canonical", F.col("dup_rank") == 1))

    def st_near_dups(spark, deps):
        # image-side near-dups via perceptual-hash banded hamming (JVM only)
        imgs = deps["images"].select("image_id", "phash")
        return DD.phash_hamming_pairs(imgs, "image_id", "phash",
                                      max_hamming=6, bands=4, bits=40)

    def st_tiles(spark, deps):
        pts = (L.footprint_cols(deps["images"].select("image_id", "phash"))
               .select("image_id", "lon", "lat"))
        polys = L.region_mosaic_rings_local(spark, 6, 4, BBOX)
        pairs = S.pip_join(pts, "lon", "lat", polys, "rid", bbox=BBOX, res=9,
                           cache_token="curation-mosaic")
        tr, tc = G.grid_rc(F.col("lon"), F.col("lat"), 16, 16, BBOX)
        return (pairs.groupBy(F.col("rid"), tr.alias("tr"), tc.alias("tc"))
                .agg(F.count(F.lit(1)).alias("n_images")))

    runner = StageRunner(spark, args.checkpoint)
    done = runner.run([
        Stage("images", st_images),
        Stage("stats", st_stats, inputs=("images",)),
        Stage("text", st_text, inputs=("images",)),
        Stage("dedup", st_dedup, inputs=("text",)),
        Stage("near_dups", st_near_dups, inputs=("images",)),
        Stage("tiles", st_tiles, inputs=("images",), partition_by=("rid",)),
    ])
    print({k: {"rows": v["rows"], "wall_s": v["wall_s"]} for k, v in done.items()})


if __name__ == "__main__":
    main()
