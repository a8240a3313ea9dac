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


# ---------------------------------------------------------------------------
# Reference-exact polygon agglomeration (-cluster on polygon layers)
# ---------------------------------------------------------------------------
#
# The reference (/root/reference/src/commands/mapshaper-cluster.js:15-42)
# greedily merges the NEIGHBOR pair with the smallest centroid distance,
# `count = Math.round(n * pct)` times, under max-width/height/area caps.
# Merge candidates only ever connect topological neighbors, so the greedy
# sequence inside one connected component of the neighbor graph is
# independent of every other component (a merge elsewhere never changes the
# scores here). That turns the serial global loop into a distributed plan:
#
#   1. per-shape stats (area / bounds / largest-ring centroid) — mapInPandas;
#   2. neighbor pairs = undirected-segment equi-join (sharing an arc <=>
#      sharing a segment, since topology dedups identical vertex runs), with
#      the reference's candidate enumeration order reproduced as
#      (min shape id, first shared segment position in that shape) and
#      ranked into a global `slot` by plans.scale.ranked_ids;
#   3. connected components over the kept pairs (dedup.dup_clusters);
#   4. one applyInPandas kernel per component replays the reference loop to
#      exhaustion (heap keyed (score, slot) = "lowest score, first index"),
#      emitting its merge sequence plus the running prefix-max of
#      (score, slot);
#   5. the reference's GLOBAL merge order is the k-way interleave of the
#      per-component sequences by next-merge key, which equals sorting all
#      events by (prefix-max score, prefix-max slot, seq) — so "first
#      `count` merges" is a plain orderBy().limit(count);
#   6. a second per-component kernel replays only the chosen prefix to get
#      each shape's surviving item, and cluster ids are assigned exactly
#      like the reference's shapeItems scan: never-merged originals in
#      input order, then surviving aggregates in global creation order.
from pyspark.sql import types as T


def _shape_stats_df(df: DataFrame, shp_col: str, grp_col: str | None):
    """Per-shape (area, centroid-of-largest-ring, bounds) like the working
    set built at mapshaper-cluster.js:30-40: getShapeArea = signed ring-area
    sum, getShapeCentroid = centroid of the ring with the largest BBOX area
    (shape-geom.js:28-38 getMaxPath), bounds over every ring."""
    import pandas as pd
    from mapshaper_spark.geom import kernels as K

    fields = [T.StructField(shp_col, T.LongType()),
              T.StructField("__area", T.DoubleType()),
              T.StructField("__cx", T.DoubleType()),
              T.StructField("__cy", T.DoubleType()),
              T.StructField("__xmin", T.DoubleType()),
              T.StructField("__ymin", T.DoubleType()),
              T.StructField("__xmax", T.DoubleType()),
              T.StructField("__ymax", T.DoubleType()),
              T.StructField("__grp", T.StringType())]
    out_schema = T.StructType(fields)
    has_grp = grp_col is not None

    def gen(it):
        for pdf in it:
            rows = []
            for i in range(len(pdf)):
                rxs, rys = pdf["rings_x"].iloc[i], pdf["rings_y"].iloc[i]
                area = 0.0
                best = None
                best_bb = 0.0
                xmin = ymin = xmax = ymax = None
                if rxs is not None:
                    for rx, ry in zip(rxs, rys):
                        rx = np.asarray(rx, dtype=np.float64)
                        ry = np.asarray(ry, dtype=np.float64)
                        if len(rx) == 0:
                            continue
                        area += K.planar_path_area(rx, ry)
                        x0, x1 = float(rx.min()), float(rx.max())
                        y0, y1 = float(ry.min()), float(ry.max())
                        bb = (x1 - x0) * (y1 - y0)
                        if bb > best_bb:      # strict >, first ring wins ties
                            best_bb = bb
                            best = (rx, ry)
                        xmin = x0 if xmin is None else min(xmin, x0)
                        ymin = y0 if ymin is None else min(ymin, y0)
                        xmax = x1 if xmax is None else max(xmax, x1)
                        ymax = y1 if ymax is None else max(ymax, y1)
                cxy = K.path_centroid(*best) if best is not None else None
                rows.append((int(pdf[shp_col].iloc[i]), float(area),
                             None if cxy is None else float(cxy[0]),
                             None if cxy is None else float(cxy[1]),
                             xmin, ymin, xmax, ymax,
                             pdf["__grp"].iloc[i] if has_grp else None))
            yield pd.DataFrame(rows, columns=[f.name for f in fields])

    cols = [shp_col, "rings_x", "rings_y"] + (["__grp"] if has_grp else [])
    return df.select(*cols).mapInPandas(gen, schema=out_schema)


def _calc_cluster_score(a: dict, b: dict, max_width: float,
                        max_height: float, max_area: float) -> float:
    """getPolygonClusterCalculator (mapshaper-cluster.js:186-201): centroid
    distance2D, or -1 when the merged bounds/area break a cap."""
    import math
    area = a["area"] + b["area"]
    dx = a["cx"] - b["cx"]
    dy = a["cy"] - b["cy"]
    score = math.sqrt(dx * dx + dy * dy)
    xmin = min(a["xmin"], b["xmin"]); ymin = min(a["ymin"], b["ymin"])
    xmax = max(a["xmax"], b["xmax"]); ymax = max(a["ymax"], b["ymax"])
    if area > max_area or (xmax - xmin) > max_width or \
            (ymax - ymin) > max_height:
        return -1.0
    return score


def _simulate_component(pairs_rows: list[dict], max_width: float,
                        max_height: float, max_area: float) -> list[tuple]:
    """Replay the reference merge loop for ONE component, to exhaustion.

    ``pairs_rows``: this component's kept candidates sorted by global slot,
    each carrying both endpoints' stats. Returns merge events
    [(seq, score, slot, left_item, right_item, new_item, pmax_score,
    pmax_slot)] where item ids are "s<shp>" for originals and "g<seq>" for
    aggregates. The heap keyed (score, slot) with lazy invalidation equals
    the reference's nextItem() scan (lowest score, first index on ties,
    mapshaper-cluster.js:88-104); NaN scores (null centroids) keep their
    slot but are never pickable, exactly like `NaN < min` never passing."""
    import heapq
    import math

    items: dict = {}
    merge_items: dict = {}
    heap: list = []
    events: list = []
    merge_index: set = set()

    def stat(prefix, row):
        return {"area": row[prefix + "area"], "cx": row[prefix + "cx"],
                "cy": row[prefix + "cy"], "xmin": row[prefix + "xmin"],
                "ymin": row[prefix + "ymin"], "xmax": row[prefix + "xmax"],
                "ymax": row[prefix + "ymax"], "friends": []}

    def score_of(ia, ib):
        a, b = items[ia], items[ib]
        if a["cx"] is None or b["cx"] is None:
            return float("nan")
        return _calc_cluster_score(a, b, max_width, max_height, max_area)

    for row in pairs_rows:
        sa, sb = "s%d" % row["a"], "s%d" % row["b"]
        if sa not in items:
            items[sa] = stat("a_", row)
        if sb not in items:
            items[sb] = stat("b_", row)
        slot = row["slot"]
        it = {"ids": [sa, sb], "score": row["score"]}
        merge_items[slot] = it
        items[sa]["friends"].append(slot)
        items[sb]["friends"].append(slot)
        if not math.isnan(it["score"]):
            heapq.heappush(heap, (it["score"], slot))

    pmax = (-1.0, -1)
    seq = 0
    while heap:
        sc, sl = heapq.heappop(heap)
        it = merge_items.get(sl)
        if it is None or it["score"] != sc:
            continue          # stale heap entry (updated or consumed)
        merge_items[sl] = None
        a_id, b_id = it["ids"]
        dest, src = items[a_id], items[b_id]
        # mergeShapes + mergeCentroids (mapshaper-cluster.js:107-127)
        tot = dest["area"] + src["area"]
        k = dest["area"] / tot if tot != 0 else 0.0
        new_id = "g%d" % seq
        merged = {
            "area": tot,
            "cx": None if dest["cx"] is None or src["cx"] is None
            else dest["cx"] * k + src["cx"] * (1 - k),
            "cy": None if dest["cy"] is None or src["cy"] is None
            else dest["cy"] * k + src["cy"] * (1 - k),
            "xmin": min(dest["xmin"], src["xmin"]),
            "ymin": min(dest["ymin"], src["ymin"]),
            "xmax": max(dest["xmax"], src["xmax"]),
            "ymax": max(dest["ymax"], src["ymax"]),
        }
        items[a_id] = None
        items[b_id] = None
        # filterFriends: dedup slots, drop consumed candidates
        seen = set()
        friends = []
        for fs in dest["friends"] + src["friends"]:
            if fs not in seen and merge_items.get(fs) is not None:
                friends.append(fs)
                seen.add(fs)
        merged["friends"] = friends
        items[new_id] = merged
        # updateList / updateItem (mapshaper-cluster.js:141-172)
        for fs in friends:
            fit = merge_items[fs]
            fa, fb = fit["ids"]
            if fa not in (a_id, b_id) and fb not in (a_id, b_id):
                continue
            if fa in (a_id, b_id):
                fa = new_id
            if fb in (a_id, b_id):
                fb = new_id
            if fa == fb:
                merge_items[fs] = None
                continue
            fit["ids"] = [fa, fb]
            key = (fa, fb) if fa < fb else (fb, fa)
            if key in merge_index:
                merge_items[fs] = None
                continue
            merge_index.add(key)
            new_score = score_of(fa, fb)
            if new_score < 0:
                merge_items[fs] = None
                continue
            fit["score"] = new_score
            if not math.isnan(new_score):
                heapq.heappush(heap, (new_score, fs))
        pmax = max(pmax, (sc, sl))
        events.append((seq, sc, sl, a_id, b_id, new_id, pmax[0], pmax[1]))
        seq += 1
    return events


def agglomerative_cluster(df: DataFrame, order_col: str,
                          pct: float | None = None,
                          id_field: str = "cluster",
                          max_width: float | None = None,
                          max_height: float | None = None,
                          max_area: float | None = None,
                          group_by: str | None = None) -> DataFrame:
    """Reference-exact ``-cluster`` for polygon layers
    (/root/reference/src/commands/mapshaper-cluster.js): every feature gets
    the integer cluster id the serial reference loop would assign, computed
    with per-component kernels + a global interleave sort (see the header
    comment above). ``df`` is a ring-geometry layer; ``order_col`` is the
    unique original record order."""
    import math
    import pandas as pd
    from mapshaper_spark.operators.dedup import dup_clusters
    from mapshaper_spark.plans.scale import ranked_ids

    mw = float("inf") if max_width is None else float(max_width)
    mh = float("inf") if max_height is None else float(max_height)
    ma = float("inf") if max_area is None else float(max_area)

    work = ranked_ids(df, [order_col], "__shp").localCheckpoint()
    n = work.count()
    count = int(math.floor(n * (pct or 1.0) + 0.5))   # JS Math.round

    # group-by normalization: JS `record[field] || null` (falsy -> null),
    # strict-equality compare -> tag with the column dtype so 1 != "1"
    if group_by is not None:
        dt = dict(work.dtypes).get(group_by)
        if dt is None:
            raise ValueError(f"-cluster group-by: missing field {group_by}")
        c = F.col(group_by)
        if dt in ("string",):
            norm = F.when(c.isNull() | (c == ""), None).otherwise(c)
        elif dt in ("boolean",):
            norm = F.when(c.isNull() | (~c), None).otherwise(c.cast("string"))
        else:
            norm = F.when(c.isNull() | (c == 0) | F.isnan(c.cast("double")),
                          None).otherwise(c.cast("string"))
        work = work.withColumn("__grp", F.concat(F.lit(dt + ":"),
                                                 norm.cast("string")))
    stats = _shape_stats_df(work, "__shp",
                            "__grp" if group_by is not None else None) \
        .localCheckpoint()

    # neighbor pairs: undirected segment equi-join; candidate order =
    # (smaller shape id, first shared segment position inside that shape)
    # = forEachArcId traversal order (polygon-neighbors.js findNeighbors)
    ring = work.select(
        "__shp",
        F.posexplode(F.arrays_zip(F.col("rings_x").alias("xs"),
                                  F.col("rings_y").alias("ys")))
        .alias("ring_idx", "r"))
    segs = ring.select(
        "__shp", "ring_idx",
        F.posexplode(F.expr(
            "transform(sequence(1, size(r.xs) - 1), i -> struct("
            "r.xs[i-1] as x0, r.ys[i-1] as y0, "
            "r.xs[i] as x1, r.ys[i] as y1))")).alias("seg_idx", "s"))
    fwd = (F.col("s.x0") < F.col("s.x1")) | \
        ((F.col("s.x0") == F.col("s.x1")) & (F.col("s.y0") < F.col("s.y1")))
    segs = segs.select(
        "__shp", "ring_idx", "seg_idx",
        F.when(fwd, F.col("s.x0")).otherwise(F.col("s.x1")).alias("kx0"),
        F.when(fwd, F.col("s.y0")).otherwise(F.col("s.y1")).alias("ky0"),
        F.when(fwd, F.col("s.x1")).otherwise(F.col("s.x0")).alias("kx1"),
        F.when(fwd, F.col("s.y1")).otherwise(F.col("s.y0")).alias("ky1"),
    ).filter((F.col("kx0") != F.col("kx1")) | (F.col("ky0") != F.col("ky1")))
    L, R = segs.alias("L"), segs.alias("R")
    pairs = (L.join(R, on=[F.col("L.kx0") == F.col("R.kx0"),
                           F.col("L.ky0") == F.col("R.ky0"),
                           F.col("L.kx1") == F.col("R.kx1"),
                           F.col("L.ky1") == F.col("R.ky1"),
                           F.col("L.__shp") < F.col("R.__shp")])
             .groupBy(F.col("L.__shp").alias("a"),
                      F.col("R.__shp").alias("b"))
             .agg(F.min(F.struct(F.col("L.ring_idx"),
                                 F.col("L.seg_idx"))).alias("pos")))

    sa = stats.select(*[F.col(c).alias("a_" + c.lstrip("_")) if c != "__shp"
                        else F.col(c).alias("a") for c in stats.columns])
    sb = stats.select(*[F.col(c).alias("b_" + c.lstrip("_")) if c != "__shp"
                        else F.col(c).alias("b") for c in stats.columns])
    cand = pairs.join(sa, "a").join(sb, "b")
    if group_by is not None:
        cand = cand.filter(F.col("a_grp").eqNullSafe(F.col("b_grp")))
    dx = F.col("a_cx") - F.col("b_cx")
    dy = F.col("a_cy") - F.col("b_cy")
    score = F.sqrt(dx * dx + dy * dy)
    mxmin = F.least("a_xmin", "b_xmin")
    mymin = F.least("a_ymin", "b_ymin")
    mxmax = F.greatest("a_xmax", "b_xmax")
    mymax = F.greatest("a_ymax", "b_ymax")
    marea = F.col("a_area") + F.col("b_area")
    bad = (marea > F.lit(ma)) | ((mxmax - mxmin) > F.lit(mw)) | \
        ((mymax - mymin) > F.lit(mh))
    cand = (cand.withColumn("score", F.when(bad, F.lit(-1.0)).otherwise(score))
            .filter(~(F.col("score") < 0)))          # NaN stays (unpickable)
    cand = ranked_ids(cand, ["a", "pos"], "slot").drop("pos").localCheckpoint()

    comp = dup_clusters(
        cand.select(F.col("a").alias("id_a"), F.col("b").alias("id_b")),
        cand.select(F.col("a").alias("id")).unionByName(
            cand.select(F.col("b").alias("id"))).distinct(), "id") \
        .select(F.col("id").alias("__shp"), F.col("cluster").alias("__comp"))

    cand_c = cand.join(comp.withColumnRenamed("__shp", "a"), "a")

    ev_schema = T.StructType([
        T.StructField("__comp", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("slot", T.LongType()),
        T.StructField("left", T.StringType()),
        T.StructField("right", T.StringType()),
        T.StructField("new_id", T.StringType()),
        T.StructField("pmax_score", T.DoubleType()),
        T.StructField("pmax_slot", T.LongType()),
    ])

    def run_comp(pdf: pd.DataFrame) -> pd.DataFrame:
        comp_id = int(pdf["__comp"].iloc[0])
        rows = pdf.sort_values("slot").to_dict("records")
        events = _simulate_component(rows, mw, mh, ma)
        return pd.DataFrame(
            [(comp_id, s, sc, sl, le, ri, ne, ps, pl)
             for (s, sc, sl, le, ri, ne, ps, pl) in events],
            columns=[f.name for f in ev_schema.fields])

    events = cand_c.groupBy("__comp").applyInPandas(run_comp, schema=ev_schema)

    # global greedy order = interleave of per-component sequences by
    # next-merge key, i.e. sort by (prefix-max score, prefix-max slot, seq);
    # first `count` merges happen, ranked for aggregate creation order
    chosen = (events.orderBy("pmax_score", "pmax_slot", "seq").limit(count))
    chosen = ranked_ids(chosen, ["pmax_score", "pmax_slot", "seq"], "__erank")

    members = comp  # (__shp, __comp): shapes that appear in any candidate

    out_schema = T.StructType([
        T.StructField("__shp", T.LongType()),
        T.StructField("sort0", T.IntegerType()),
        T.StructField("sort1", T.LongType()),
    ])

    def replay(key, ev_pdf: pd.DataFrame, mem_pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}
        created: dict = {}
        for r in ev_pdf.sort_values("seq").to_dict("records"):
            parent[r["left"]] = r["new_id"]
            parent[r["right"]] = r["new_id"]
            created[r["new_id"]] = int(r["__erank"])
        rows = []
        for shp in mem_pdf["__shp"]:
            node = "s%d" % shp
            while node in parent:
                node = parent[node]
            if node.startswith("s"):
                rows.append((int(shp), 0, int(shp)))
            else:
                rows.append((int(shp), 1, created[node]))
        return pd.DataFrame(rows, columns=["__shp", "sort0", "sort1"])

    assigned = (chosen.groupBy("__comp")
                .cogroup(members.groupBy("__comp"))
                .applyInPandas(replay, schema=out_schema))
    loners = (work.select("__shp").join(members, "__shp", "left_anti")
              .select("__shp", F.lit(0).alias("sort0"),
                      F.col("__shp").alias("sort1")))
    all_assigned = assigned.unionByName(loners)

    entities = all_assigned.select("sort0", "sort1").distinct()
    entities = ranked_ids(entities, ["sort0", "sort1"], "__cid")
    ids = (all_assigned.join(entities, ["sort0", "sort1"])
           .select("__shp", F.col("__cid").cast("int").alias(id_field)))

    drop = ["__shp"] + (["__grp"] if group_by is not None else [])
    # insertFieldValues overwrites an existing field of the same name
    out = work.drop(id_field).join(ids, "__shp")
    return out.drop(*drop)
