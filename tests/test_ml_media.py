"""Tests: IVF ANN recall, keep-shapes, cluster, media (video/audio) plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapshaper_spark import layers as L
from mapshaper_spark.operators import images as IM
from mapshaper_spark.operators import similarity as SIM
from mapshaper_spark.operators import simplify as SI


class TestIVF:
    def test_ivf_recall_vs_brute_force(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        q = [((j * 37) % 19 - 9) / 10.0 for j in range(64)]
        exact = {r.vec_id for r in
                 SIM.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()}
        approx = {r.vec_id for r in
                  SIM.ivf_topk(emb, "vec_id", "embedding", q, k=10,
                               n_lists=16, nprobe=8).collect()}
        # probing half the lists must recover most of the exact top-10
        assert len(exact & approx) >= 5

    def test_ivf_full_probe_equals_brute_force(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = [((j * 37) % 19 - 9) / 10.0 for j in range(64)]
        exact = [(r.vec_id, r.score) for r in
                 SIM.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()]
        approx = [(r.vec_id, r.score) for r in
                  SIM.ivf_topk(emb, "vec_id", "embedding", q, k=10,
                               n_lists=8, nprobe=8).collect()]
        assert exact == approx  # probing every list == exhaustive scan


class TestKeepShapes:
    def test_smallest_shape_survives_full_simplification(self, spark):
        feats, arcs = L.region_mosaic(spark, 3, 2, (0.0, 0.0, 3.0, 2.0))
        with_z = SI.compute_thresholds(arcs, method="visvalingam")
        protected = SI.keep_shapes(feats, with_z, "rid")
        # every feature's largest ring keeps at least one protected interior
        # vertex or the ring is all-2-point arcs (nothing removable)
        total_inf_before = (with_z.select(F.explode("zs").alias("z"))
                            .filter(F.col("z") == float("inf")).count())
        total_inf_after = (protected.select(F.explode("zs").alias("z"))
                           .filter(F.col("z") == float("inf")).count())
        assert total_inf_after >= total_inf_before

    def test_protects_max_z_vertex(self, spark):
        # one feature, one triangle-ish ring arc with removable vertices.
        # protectPolygonRing (keep-shapes.js:45-62) locks max-z vertices in
        # decreasing z order UNTIL the ring re-inflates past 1e-10 — here
        # the ring needs >= 3 distinct retained vertices, so the top-2 z
        # vertices get locked and the lowest stays removable
        import math
        arcs = spark.createDataFrame(
            [(0, [0.0, 1.0, 2.0, 2.0, 0.0], [0.0, 0.8, 0.0, 2.0, 0.0], None, 5,
              {"xmin": 0.0, "ymin": 0.0, "xmax": 2.0, "ymax": 2.0})],
            L.ARCS_SCHEMA)
        feats = spark.createDataFrame([(7, [[0]])], "rid int, parts array<array<int>>")
        with_z = SI.compute_thresholds(arcs, method="visvalingam")
        protected = SI.keep_shapes(feats, with_z, "rid")
        zs0 = with_z.collect()[0].zs
        zs1 = protected.collect()[0].zs
        interior = sorted((z for z in zs0 if z != float("inf")), reverse=True)
        max_idx = zs0.index(interior[0])
        assert zs1[max_idx] == float("inf")
        changed = [i for i, (a, b) in enumerate(zip(zs0, zs1)) if a != b]
        assert all(zs1[i] == float("inf") for i in changed)
        # locked in decreasing-z order: the changed set is the TOP of the
        # z order, and the retained ring now has positive area
        locked_zs = sorted((zs0[i] for i in changed), reverse=True)
        assert locked_zs == interior[:len(changed)]
        xs = [0.0, 1.0, 2.0, 2.0, 0.0]
        ys = [0.0, 0.8, 0.0, 2.0, 0.0]
        keep = [(x, y) for x, y, z in zip(xs, ys, zs1) if z == math.inf]
        area = 0.0
        for (x1, y1), (x2, y2) in zip(keep, keep[1:] + keep[:1]):
            area += x1 * y2 - x2 * y1
        assert abs(area / 2.0) > 1e-10


class TestSphericalSimplify:
    def test_spherical_thresholds_in_meters_scale(self, spark):
        arcs = spark.createDataFrame(
            [(0, [0.0, 0.5, 1.0], [0.0, 0.5, 0.0], None, 3,
              {"xmin": 0.0, "ymin": 0.0, "xmax": 1.0, "ymax": 0.5})],
            L.ARCS_SCHEMA)
        planar = SI.compute_thresholds(arcs, method="visvalingam").collect()[0].zs
        sph = SI.compute_thresholds(arcs, method="visvalingam",
                                    spherical=True).collect()[0].zs
        # spherical thresholds are in 3D meters: hugely larger than degrees
        assert sph[1] > planar[1] * 1e4
        assert sph[0] == float("inf") and sph[2] == float("inf")


class TestMedia:
    def test_video_frame_count_and_decode(self, spark):
        vids = spark.createDataFrame(
            [("v1", None, 2500, "rawgrid")],
            "media_id string, bytes binary, duration_ms long, fmt string")
        frames = IM.sample_video_frames(vids, every_ms=1000).collect()
        assert [f.frame_idx for f in frames] == [0, 1, 2]
        px = IM.decode_ppm(bytes(frames[0].frame_bytes))
        assert px.shape == (16, 16, 3)

    def test_video_codec_stubbed(self, spark):
        vids = spark.createDataFrame(
            [("v1", b"\x00", 1000, "h264")],
            "media_id string, bytes binary, duration_ms long, fmt string")
        with pytest.raises(Exception):  # NotImplementedError inside the UDF
            IM.sample_video_frames(vids).collect()

    def test_audio_features_exact(self, spark):
        import struct
        pcm = struct.pack("<4h", 100, -100, 50, 0)
        df = spark.createDataFrame([("a1", pcm, "pcm16")],
                                   "media_id string, bytes binary, fmt string")
        r = IM.extract_audio_features(df).collect()[0]
        assert r.n_samples == 4
        assert r.rms == pytest.approx(np.sqrt((100**2 + 100**2 + 50**2) / 4), abs=1e-6)
        assert r.zero_crossings == 2  # +100 -> -100 -> +50 (0 is non-negative)


class TestPostSimplifyRepair:
    def test_unwinds_simplification_intersection(self, spark):
        from mapshaper_spark import layers as L2
        # arc 0: prominent corner peak; arc 1: path dodging over the peak.
        # At zlimit=2 the dodge vertex is removed -> straight line cuts the
        # peak (2 intersections); repair must re-add the dodge vertex.
        arcs = spark.createDataFrame(
            [(0, [0.0, 5.0, 10.0], [0.0, 5.5, 0.0], None, 3,
              {"xmin": 0.0, "ymin": 0.0, "xmax": 10.0, "ymax": 5.5}),
             (1, [0.0, 5.0, 10.0], [5.0, 5.8, 5.0], None, 3,
              {"xmin": 0.0, "ymin": 5.0, "xmax": 10.0, "ymax": 5.8})],
            L2.ARCS_SCHEMA)
        with_z = SI.compute_thresholds(arcs, method="visvalingam")
        zlimit = 2.0
        from mapshaper_spark.operators.topology import find_segment_intersections
        before = find_segment_intersections(
            SI.apply_zlimit(with_z, zlimit).select("arc_id", "xs", "ys"),
            same_arc=True)
        assert before.count() == 2  # straight arc 1 cuts the peak twice

        repaired = SI.post_simplify_repair(with_z, zlimit)
        after_arcs = SI.apply_zlimit(repaired, zlimit)
        after = find_segment_intersections(
            after_arcs.select("arc_id", "xs", "ys"), same_arc=True)
        assert after.count() == 0
        ns = {r.arc_id: r.n for r in after_arcs.collect()}
        assert ns[1] == 3  # dodge vertex re-added
        assert ns[0] == 3  # peak never removed

    def test_clean_input_unchanged(self, spark):
        from mapshaper_spark import layers as L2
        arcs = spark.createDataFrame(
            [(0, [0.0, 5.0, 10.0], [0.0, 0.2, 0.0], None, 3,
              {"xmin": 0.0, "ymin": 0.0, "xmax": 10.0, "ymax": 0.2})],
            L2.ARCS_SCHEMA)
        with_z = SI.compute_thresholds(arcs, method="dp")
        repaired = SI.post_simplify_repair(with_z, 10.0)
        assert repaired.collect()[0].zs == with_z.collect()[0].zs


class TestSimplifyStats:
    def test_pct_interval_roundtrip(self, spark):
        from mapshaper_spark import layers as L2
        df = spark.range(0, 20).select(
            F.col("id").alias("arc_id"),
            F.transform(F.sequence(F.lit(0), F.lit(32)),
                        lambda v: v.cast("double")).alias("xs"),
            F.transform(F.sequence(F.lit(0), F.lit(32)),
                        lambda v: ((F.col("id") * 37 + v * v * 13) % 97).cast("double")
                        / (F.lit(7.0) + F.col("id").cast("double"))).alias("ys")) \
            .withColumn("zs", F.lit(None).cast("array<double>"))
        with_z = SI.compute_thresholds(df, method="visvalingam").cache()
        zlim = SI.threshold_for_pct(with_z, 0.4)
        # interval -> pct must invert (within rank granularity; exact only
        # for distinct thresholds — ties inflate the >= count)
        pct = SI.pct_for_interval(with_z, zlim)
        assert abs(pct - 0.4) < 0.05
        stats = SI.simplify_stats(with_z, zlim)
        assert stats["arcs"] == 20
        assert stats["vertices"] == 20 * 33
        assert stats["removable"] == 20 * 31
        assert 0.25 in stats["z_quantiles"]


class TestDupClusters:
    def test_components_and_canonicals(self, spark):
        import mapshaper_spark.operators.dedup as DD
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (10, 11)],
            "id_a int, id_b int")
        ids = spark.createDataFrame([(i,) for i in range(1, 13)], "doc_id int")
        out = {r.doc_id: (r.cluster, r.is_canonical)
               for r in DD.dup_clusters(pairs, ids, "doc_id").collect()}
        assert out[1] == (1, True) and out[3] == (1, False)
        assert out[5] == (5, True) and out[6] == (5, False)
        assert out[11] == (8, False) and out[8] == (8, True)
        assert out[4] == (4, True) and out[12] == (12, True)  # singletons

    def test_long_chain_converges(self, spark):
        import mapshaper_spark.operators.dedup as DD
        n = 80  # diameter >> naive round count: pointer doubling required
        pairs = spark.createDataFrame([(i, i + 1) for i in range(n)],
                                      "id_a int, id_b int")
        ids = spark.createDataFrame([(i,) for i in range(n + 1)], "doc_id int")
        out = DD.dup_clusters(pairs, ids, "doc_id")
        assert out.select("cluster").distinct().count() == 1


class TestKeepShapesSerialSharedArcs:
    def test_shared_arc_locks_are_serial(self, spark):
        """The reference's protectShape mutates a GLOBAL zz in shape order
        (keep-shapes.js:45-62), so a later shape sharing a collapsed arc
        sees the earlier shape's locks and may lock FEWER vertices. Fixture:
        shape 0 = [0, 1], shape 1 = [~1, 2]; both rings collapse at
        interval=inf. Shape 0 locks P (arc 1, z=5). Serially, shape 1 then
        starts already inflated by P and locks NOTHING; the old per-shape
        pristine approximation would also lock Q (arc 2, z=9)."""
        import math

        inf = float("inf")
        arcs = spark.createDataFrame(
            [(0, [0.0, 0.5, 1.0], [0.0, 0.000001, 0.0], [inf, 0.1, inf], 3,
              {"xmin": 0.0, "ymin": 0.0, "xmax": 1.0, "ymax": 1.0}),
             (1, [1.0, 0.5, 0.0], [0.0, 1.0, 0.0], [inf, 5.0, inf], 3,
              {"xmin": 0.0, "ymin": 0.0, "xmax": 1.0, "ymax": 1.0}),
             (2, [1.0, 0.5, 0.0], [0.0, -1.0, 0.0], [inf, 9.0, inf], 3,
              {"xmin": 0.0, "ymin": -1.0, "xmax": 1.0, "ymax": 0.0})],
            L.ARCS_SCHEMA)
        feats = spark.createDataFrame(
            [(0, [[0, 1]]), (1, [[-2, 2]])],
            "rid int, parts array<array<int>>")
        out = {r.arc_id: list(r.zs)
               for r in SI.keep_shapes(feats, arcs, "rid").collect()}
        # serial reference: P locked by shape 0; shape 1 locks nothing
        assert out[0] == [inf, 0.1, inf]
        assert out[1] == [inf, inf, inf]
        assert out[2] == [inf, 9.0, inf]        # Q NOT locked (z unchanged)

    def test_oversized_component_falls_back_to_pristine(self, spark):
        """Same fixture with max_component_shapes=1: the component is
        oversized, so each shape locks against pristine thresholds — the
        documented superset fallback locks Q too."""
        inf = float("inf")
        arcs = spark.createDataFrame(
            [(0, [0.0, 0.5, 1.0], [0.0, 0.000001, 0.0], [inf, 0.1, inf], 3,
              {"xmin": 0.0, "ymin": 0.0, "xmax": 1.0, "ymax": 1.0}),
             (1, [1.0, 0.5, 0.0], [0.0, 1.0, 0.0], [inf, 5.0, inf], 3,
              {"xmin": 0.0, "ymin": 0.0, "xmax": 1.0, "ymax": 1.0}),
             (2, [1.0, 0.5, 0.0], [0.0, -1.0, 0.0], [inf, 9.0, inf], 3,
              {"xmin": 0.0, "ymin": -1.0, "xmax": 1.0, "ymax": 0.0})],
            L.ARCS_SCHEMA)
        feats = spark.createDataFrame(
            [(0, [[0, 1]]), (1, [[-2, 2]])],
            "rid int, parts array<array<int>>")
        out = {r.arc_id: list(r.zs)
               for r in SI.keep_shapes(feats, arcs, "rid",
                                       max_component_shapes=1).collect()}
        assert out[1] == [inf, inf, inf]
        assert out[2] == [inf, inf, inf]        # Q locked by the fallback
