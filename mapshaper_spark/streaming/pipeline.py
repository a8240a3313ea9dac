"""Structured Streaming surface.

The reference is batch-only (SURVEY §2.12); these are the graft's streaming
counterparts of its core operators, built so a 100 TB backfill and its
incremental tail share one code path:

- streaming_events_rollup: the events_rollup query as a watermarked
  windowed aggregate (late rows beyond the watermark are dropped
  deterministically);
- streaming_pip_tiles: the flagship spatial-join + tile-assignment as a
  stream-static join — the PolygonIndex cover is a static broadcast side,
  so the streaming plan is identical to the batch plan per micro-batch.

Both run with ``trigger(availableNow=True)`` for batch-equivalent runs in
tests (and with a processing-time trigger in production).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_events_rollup(spark: SparkSession, path: str, schema,
                            watermark: str = "1 day",
                            window: str = "1 day") -> DataFrame:
    ev = (spark.readStream.schema(schema).parquet(path)
          # TIMESTAMP_NTZ (parquet isoformat) is not a valid event-time type
          .withColumn("ts", F.col("ts").cast("timestamp"))
          .withWatermark("ts", watermark))
    return (ev.groupBy(F.window("ts", window).alias("w"),
                       F.col("user_id"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("value_sum"))
            .select(F.to_date("w.start").alias("day"),
                    "user_id", "event_type", "n", "value_sum"))


def streaming_pip_tiles(spark: SparkSession, path: str, schema,
                        polys_rings: DataFrame, poly_key: str,
                        bbox: Sequence[float], res: int = 9,
                        grid: int = 16,
                        cache_token: str | None = "streaming-pip") -> DataFrame:
    """Streaming images -> footprint -> PIP join (static broadcast cover) ->
    tile counts per micro-batch window."""
    from mapshaper_spark import layers as L
    from mapshaper_spark.operators import grid as G
    from mapshaper_spark.operators.spatial import pip_join

    stream = spark.readStream.schema(schema).parquet(path)
    pts = L.footprint_cols(stream).select("id", "lon", "lat")
    pairs = pip_join(pts, "lon", "lat", polys_rings, poly_key,
                     bbox=bbox, res=res, cache_token=cache_token)
    tr, tc = G.grid_rc(F.col("lon"), F.col("lat"), grid, grid, bbox)
    return (pairs.groupBy(F.col(poly_key), tr.alias("__tr"), tc.alias("__tc"))
            .agg(F.count(F.lit(1)).alias("n_images"))
            .select(poly_key,
                    F.format_string("r%dc%d", "__tr", "__tc").alias("tile"),
                    "n_images"))


def run_available_now(stream_df: DataFrame, query_name: str,
                      output_mode: str = "complete", timeout_s: int = 120):
    """Drain all available input into an in-memory table and stop —
    batch-equivalent execution for tests/backfills."""
    q = (stream_df.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    return q


def streaming_exact_dedup(spark: SparkSession, path: str, schema,
                          key_cols: Sequence[str],
                          ts_col: str = "ts",
                          watermark: str = "1 day") -> DataFrame:
    """Streaming exact dedup: keep the first row per key within the
    watermark horizon (dropDuplicatesWithinWatermark — state is bounded by
    the watermark, so the operator holds O(keys-per-horizon) state at 100 TB
    instead of all-time keys). The streaming counterpart of
    dedup.exact_dedup for the incremental tail of a backfill."""
    st = (spark.readStream.schema(schema).parquet(path)
          .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
          .withWatermark(ts_col, watermark))
    return st.dropDuplicatesWithinWatermark(list(key_cols))
