"""StageRunner resume semantics: skip complete stages, invalidate on input
drift, lineage/metrics tables populated."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mapshaper_spark.plans.checkpoint import Stage, StageRunner


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="ms_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


CALLS = []


def _stages(n=1000):
    def ingest(spark, deps):
        CALLS.append("ingest")
        return spark.range(n).withColumn("v", F.col("id") * 2)

    def enrich(spark, deps):
        CALLS.append("enrich")
        return deps["ingest"].withColumn("w", F.col("v") + 1)

    def agg(spark, deps):
        CALLS.append("agg")
        return deps["enrich"].agg(F.sum("w").alias("total"))

    return [Stage("ingest", ingest),
            Stage("enrich", enrich, inputs=("ingest",)),
            Stage("agg", agg, inputs=("enrich",))]


def test_full_run_then_resume_skips_everything(spark, root):
    CALLS.clear()
    r = StageRunner(spark, root)
    done = r.run(_stages())
    assert CALLS == ["ingest", "enrich", "agg"]
    assert done["agg"]["rows"] == 1
    total = r.store.read(done["agg"]).collect()[0].total
    assert total == sum(2 * i + 1 for i in range(1000))

    CALLS.clear()
    done2 = StageRunner(spark, root).run(_stages())
    assert CALLS == []  # everything resumed from snapshots
    assert done2["agg"]["snapshot_id"] == done["agg"]["snapshot_id"]


def test_force_invalidates_downstream(spark, root):
    CALLS.clear()
    r = StageRunner(spark, root)
    r.run(_stages())
    CALLS.clear()
    done = StageRunner(spark, root).run(_stages(), force=("enrich",))
    # enrich re-runs; agg's recorded input snapshot no longer matches -> re-runs
    assert CALLS == ["enrich", "agg"]
    assert done["agg"]["complete"]


def test_lineage_and_metrics_tables(spark, root):
    CALLS.clear()
    r = StageRunner(spark, root)
    r.run(_stages())
    lin = r.lineage()
    assert set(lin.columns) == {"partition_id", "rows", "stage", "snapshot_id"}
    per_stage = {row.stage: row.total for row in
                 lin.groupBy("stage").agg(F.sum("rows").alias("total")).collect()}
    assert per_stage["ingest"] == 1000
    assert per_stage["agg"] == 1
    met = r.metrics()
    assert met.count() == 3
    assert met.filter(F.col("wall_s") <= 0).count() == 0
