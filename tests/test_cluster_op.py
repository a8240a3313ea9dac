"""-cluster (operators/cluster.py): deterministic sample-seeded Lloyd.

Reference contract: /root/reference/src/commands/mapshaper-cluster.js:15-42
(every feature gets a cluster id in [0, count)); the Lloyd substitution is
a documented deviation, so these tests pin OUR spec: deterministic seeding,
9-dp-rounded centers, lowest-id tie-breaks, nearest-center assignment.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapshaper_spark.operators.cluster import (assign_nearest, cluster_points,
                                               lloyd_centers)


def _pts(spark, n=400):
    return spark.range(n).select(
        (F.col("id") % 37).cast("double").alias("px"),
        ((F.col("id") * 13) % 41).cast("double").alias("py"))


class TestClusterPoints:
    def test_ids_in_range_and_total(self, spark):
        out = cluster_points(_pts(spark), "px", "py", count=8).collect()
        assert len(out) == 400
        assert all(0 <= r.cluster < 8 for r in out)
        assert len({r.cluster for r in out}) == 8

    def test_assignment_is_nearest_final_center(self, spark):
        df = _pts(spark)
        X = np.array([(r.sx, r.sy) for r in
                      df.select(F.col("px").alias("sx"), F.col("py").alias("sy"))
                      .orderBy("sx", "sy").limit(10_000).collect()])
        cents = lloyd_centers(X, 8, 8)
        out = cluster_points(df, "px", "py", count=8).collect()
        for r in out:
            d2 = ((cents - np.array([r.px, r.py])) ** 2).sum(axis=1)
            assert r.cluster == int(d2.argmin())

    def test_deterministic_across_partitioning(self, spark):
        df = _pts(spark)
        a = sorted((r.px, r.py, r.cluster) for r in
                   cluster_points(df, "px", "py", count=6).collect())
        b = sorted((r.px, r.py, r.cluster) for r in
                   cluster_points(df.repartition(13), "px", "py", count=6).collect())
        assert a == b

    def test_wide_k_pandas_path_matches_jvm_path(self, spark):
        df = _pts(spark)
        X = np.array([(r.sx, r.sy) for r in
                      df.select(F.col("px").alias("sx"), F.col("py").alias("sy"))
                      .orderBy("sx", "sy").limit(10_000).collect()])
        cents = lloyd_centers(X, 64, 3)
        key = lambda rows: sorted((r.px, r.py, r.cluster) for r in rows)
        jvm = key(assign_nearest(df, "px", "py", cents, "cluster").collect())
        far = cents[:1] + 1e9  # 65th center no point can win -> pandas path
        wide = key(assign_nearest(df, "px", "py", np.vstack([cents, far]),
                                  "cluster").collect())
        assert jvm == wide

    def test_count_one_and_empty(self, spark):
        df = _pts(spark, 5)
        assert all(r.cluster == 0 for r in
                   cluster_points(df, "px", "py", count=1).collect())
        assert cluster_points(df.limit(0), "px", "py", count=4).count() == 0

    def test_plan_is_map_only(self, spark):
        """The final assignment must be a single projection: no Exchange,
        no Window, no CartesianProduct (VERDICT r02 item 1)."""
        out = cluster_points(_pts(spark), "px", "py", count=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        for bad in ("Exchange", "Window", "CartesianProduct", "BroadcastNestedLoop"):
            assert bad not in plan, f"{bad} in plan:\n{plan}"


GC_POLYS = {
    "type": "GeometryCollection",
    "geometries": [
        {"type": "Polygon",
         "coordinates": [[[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]]},
        {"type": "Polygon",
         "coordinates": [[[1, 0], [1, 1], [3, 1], [3, 0], [1, 0]]]},
        {"type": "Polygon",
         "coordinates": [[[0, 1], [0, 4], [1, 4], [1, 1], [0, 1]]]},
        {"type": "Polygon",
         "coordinates": [[[1, 1], [1, 5], [3, 5], [3, 1], [1, 1]]]},
    ],
}


class TestClusterReferenceParity:
    """Transcribed from /root/reference/test/cluster-test.js — the
    reference's greedy neighbor agglomeration with exact expected ids."""

    def _run(self, spark, cmd):
        import json
        from mapshaper_spark.cli import apply_commands
        out = apply_commands(spark, f"-i polys.json {cmd} -o out.csv format=csv",
                             {"polys.json": json.dumps(GC_POLYS)})
        return out["out.csv"].strip()

    # cluster-test.js:25-33
    def test_clusters_everything_by_default(self, spark):
        assert self._run(spark, "-cluster") == "cluster\n0\n0\n0\n0"

    # cluster-test.js:35-41
    def test_max_height(self, spark):
        assert self._run(spark, "-cluster id-field=aggId max-height=1") == \
            "aggId\n2\n2\n0\n1"

    # cluster-test.js:43-49
    def test_max_width(self, spark):
        assert self._run(spark, "-cluster id-field=aggId max-width=1") == \
            "aggId\n2\n0\n2\n1"

    # cluster-test.js:51-57
    def test_pct_50_percent(self, spark):
        assert self._run(spark, "-cluster id-field=aggId pct=50%") == \
            "aggId\n1\n1\n1\n0"

    # cluster-test.js:59-65
    def test_pct_1_percent(self, spark):
        assert self._run(spark, "-cluster id-field=aggId pct=1%") == \
            "aggId\n0\n1\n2\n3"

    # cluster-test.js:67-73
    def test_pct_1(self, spark):
        assert self._run(spark, "-cluster id-field=aggId pct=1") == \
            "aggId\n0\n0\n0\n0"

    # cluster-test.js:75-82
    def test_with_dissolve(self, spark):
        assert self._run(spark, "-cluster id-field=aggId -dissolve aggId") \
            == "aggId\n0"

    # cluster-test.js:84-91
    def test_with_dissolve_pct(self, spark):
        assert self._run(spark, "-cluster id-field=aggId pct=0.5 "
                         "-dissolve aggId") == "aggId\n1\n0"

    # cluster-test.js:93-131
    def test_group_by_maintains_groups(self, spark):
        import json
        from mapshaper_spark.cli import apply_commands
        fc = {"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"group": "a"},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]]}},
            {"type": "Feature", "properties": {"group": "a"},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[1, 0], [1, 1], [3, 1], [3, 0], [1, 0]]]}},
            {"type": "Feature", "properties": {"group": "b"},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[0, 1], [0, 4], [1, 4], [1, 1], [0, 1]]]}},
            {"type": "Feature", "properties": {"group": "b"},
             "geometry": {"type": "Polygon", "coordinates":
                          [[[1, 1], [1, 4], [3, 4], [3, 1], [1, 1]]]}},
        ]}
        out = apply_commands(
            spark,
            "-i polys.json -cluster group-by=group id-field=grouping "
            "-o out.csv format=csv",
            {"polys.json": json.dumps(fc)})
        assert out["out.csv"].strip() == \
            "group,grouping\na,0\na,0\nb,1\nb,1"


class TestAgglomerativeDeterminism:
    def test_same_ids_across_partitioning(self, spark):
        """The distributed plan (per-component kernels + prefix-max
        interleave) must give identical reference ids regardless of how
        the input is partitioned."""
        import json
        from mapshaper_spark.cli import apply_commands
        out1 = apply_commands(
            spark, "-i polys.json -cluster id-field=g pct=50% -o o.csv "
            "format=csv", {"polys.json": json.dumps(GC_POLYS)})
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        try:
            out2 = apply_commands(
                spark, "-i polys.json -cluster id-field=g pct=50% -o o.csv "
                "format=csv", {"polys.json": json.dumps(GC_POLYS)})
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        assert out1["o.csv"] == out2["o.csv"] == "g\n1\n1\n1\n0"
