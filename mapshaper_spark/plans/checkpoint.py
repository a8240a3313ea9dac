"""Snapshot checkpointing + per-partition lineage/metrics + resume planner.

north_rule: "resumable from Iceberg-snapshot checkpoints with per-partition
lineage and metrics tables". Iceberg's runtime jar is not in this container,
so the snapshot layer is pluggable: the default ``ParquetSnapshotStore``
writes each stage output as an immutable parquet snapshot directory plus a
JSON manifest (= the Iceberg snapshot metadata role); an Iceberg catalog
implementation only needs to override ``write``/``read``/``exists`` with
``df.writeTo(table).createOrReplace()`` and snapshot-id bookkeeping.

Layout:
    <root>/<stage>/<snapshot_id>/data/*.parquet     immutable snapshot data
    <root>/<stage>/<snapshot_id>/manifest.json      rows, schema, inputs, wall
    <root>/_lineage/*.parquet                       per-partition lineage rows
    <root>/_metrics/*.parquet                       per-stage metrics rows

The reference has no checkpointing (eager single-process pipeline,
/root/reference/src/cli/mapshaper-commands.js:133); this is the scale-out
requirement the graft adds: a 100 TB multi-stage job must replan from the
last complete snapshot instead of recomputing stage 1 on a mid-job failure.

Lineage rows are collected with a zero-extra-pass trick: a
``spark_partition_id()`` + count aggregate runs on the SAME DataFrame that
feeds the write, so the scan is shared when the plan is cached, or costs one
cheap extra action otherwise (row counts only — no data movement).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _schema_fingerprint(df: DataFrame) -> str:
    return hashlib.sha256(df.schema.json().encode()).hexdigest()[:16]


class ParquetSnapshotStore:
    """Immutable parquet snapshots + JSON manifests under a root dir."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def latest_complete(self, stage: str) -> dict | None:
        """Newest snapshot of a stage whose manifest says 'complete'."""
        sdir = self._stage_dir(stage)
        if not os.path.isdir(sdir):
            return None
        best = None
        for snap in os.listdir(sdir):
            mpath = os.path.join(sdir, snap, "manifest.json")
            if not os.path.exists(mpath):
                continue
            with open(mpath) as f:
                m = json.load(f)
            if m.get("complete") and (best is None or m["ts"] > best["ts"]):
                best = m
        return best

    def write(self, stage: str, df: DataFrame, inputs: Sequence[str],
              partition_by: Sequence[str] = ()) -> dict:
        snap_id = f"s{int(time.time() * 1000):x}"
        snap_dir = os.path.join(self._stage_dir(stage), snap_id)
        data_dir = os.path.join(snap_dir, "data")
        t0 = time.time()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        wall = time.time() - t0
        out = self.spark.read.parquet(data_dir)
        rows = out.count()
        manifest = {
            "stage": stage, "snapshot_id": snap_id, "path": data_dir,
            "rows": rows, "schema": _schema_fingerprint(df),
            "inputs": list(inputs), "wall_s": round(wall, 3),
            "ts": time.time(), "complete": True,
        }
        with open(os.path.join(snap_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        return manifest

    def read(self, manifest: dict) -> DataFrame:
        return self.spark.read.parquet(manifest["path"])


@dataclass
class Stage:
    name: str
    fn: Callable[..., DataFrame]      # (spark, {input_stage: DataFrame}) -> DataFrame
    inputs: Sequence[str] = field(default_factory=tuple)
    partition_by: Sequence[str] = field(default_factory=tuple)


class StageRunner:
    """Executes a linear/DAG list of stages with snapshot checkpointing.

    resume semantics: a stage is skipped iff a complete snapshot exists AND
    every input's snapshot id matches what that snapshot was built from
    (input drift invalidates downstream, like Iceberg snapshot lineage).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.store = ParquetSnapshotStore(spark, root)
        self.root = root

    def _log_lineage(self, stage: str, snap: dict, df: DataFrame):
        lin = (df.groupBy(F.spark_partition_id().alias("partition_id"))
               .agg(F.count(F.lit(1)).alias("rows"))
               .withColumn("stage", F.lit(stage))
               .withColumn("snapshot_id", F.lit(snap["snapshot_id"])))
        lin.write.mode("append").parquet(os.path.join(self.root, "_lineage"))
        met = self.spark.createDataFrame(
            [(stage, snap["snapshot_id"], snap["rows"], snap["wall_s"], snap["ts"])],
            "stage string, snapshot_id string, rows long, wall_s double, ts double")
        met.write.mode("append").parquet(os.path.join(self.root, "_metrics"))

    def run(self, stages: Sequence[Stage], force: Sequence[str] = ()) -> dict[str, dict]:
        done: dict[str, dict] = {}
        outputs: dict[str, DataFrame] = {}
        for st in stages:
            input_snaps = [done[i]["snapshot_id"] for i in st.inputs]
            prior = self.store.latest_complete(st.name)
            if (prior is not None and st.name not in force
                    and prior["inputs"] == input_snaps):
                done[st.name] = prior
                outputs[st.name] = self.store.read(prior)
                continue
            df = st.fn(self.spark, {i: outputs[i] for i in st.inputs})
            manifest = self.store.write(st.name, df, input_snaps, st.partition_by)
            self._log_lineage(st.name, manifest, self.store.read(manifest))
            done[st.name] = manifest
            outputs[st.name] = self.store.read(manifest)
        return done

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_lineage"))

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_metrics"))
