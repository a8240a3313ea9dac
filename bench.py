"""Headline benchmark. Prints ONE JSON line.

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS     (default 32)
       MS_BENCH_IMAGES      (default 20_000_000) size of the synthetic images
                            table for the flagship spatial-join + tiling query
       MS_BENCH_QUIET_LOAD  (default 8.0) loadavg_1m gate: a timed shot waits
                            for the host to drop below this before running
       MS_BENCH_QUIET_WAIT  (default 300) max seconds to wait for quiet
       MS_BENCH_REPEATS     (default 5) timed flagship repeats (after warm-up)

The flagship query is BASELINE.json's metric: spatial-join + tile-assignment
throughput (images/sec) — synthetic image footprints -> Morton-cell PIP join
against the region mosaic (broadcast) -> 16x16 tile assignment -> per-
(region, tile) counts. Every other entry is a representative operator family
from SURVEY.md §2 run end-to-end (forced through the noop sink so the full
plan executes).

Contention methodology (VERDICT r03 #4: the recorded artifact must not let a
contended cold shot stand for the code): this host carries intermittent
external tenant load, so every timed measurement (a) runs after an untimed
warm-up, (b) gates on loadavg_1m < MS_BENCH_QUIET_LOAD with a bounded
wait-for-quiet loop BEFORE the shot (pre-registered, not post-hoc exclusion),
(c) records os.getloadavg() per run, (d) records DIRECT external-cores
accounting per flagship shot ((/proc/stat busy CPU minus this process
tree's own CPU) / wall — immune to both self-inflation and mid-run tenant
spikes the 1-min EWMA misses), and (e) sets "contended": true when even the
best shot shared the machine with >2 external cores (or started over the
load gate) so a reviewer can discount the round rather than be misled by it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_IMAGES = int(os.environ.get("MS_BENCH_IMAGES", 20_000_000))
QUIET_LOAD = float(os.environ.get("MS_BENCH_QUIET_LOAD", "8.0"))
QUIET_WAIT_S = float(os.environ.get("MS_BENCH_QUIET_WAIT", "300"))
REPEATS = int(os.environ.get("MS_BENCH_REPEATS", "5"))


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def _system_busy_seconds() -> float:
    """System-wide non-idle CPU seconds since boot (/proc/stat jiffies)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(v) for v in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    return (sum(vals) - idle) / os.sysconf("SC_CLK_TCK")


def _steal_seconds() -> float:
    """Hypervisor steal CPU-seconds since boot (/proc/stat cpu field 8) —
    the only visible trace of the HOST running other tenants' VMs while
    this one had runnable work (invisible to loadavg and rusage)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    return (int(parts[7]) if len(parts) > 7 else 0) / os.sysconf("SC_CLK_TCK")


def _tree_cpu_seconds() -> float:
    """CPU-seconds of this process and its whole live tree (the py4j JVM is
    a live child; RUSAGE alone would miss it until reaped)."""
    import resource
    rs = resource.getrusage(resource.RUSAGE_SELF)
    rc = resource.getrusage(resource.RUSAGE_CHILDREN)
    total = rs.ru_utime + rs.ru_stime + rc.ru_utime + rc.ru_stime
    hz = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    procs = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                rest = f.read().rsplit(") ", 1)[1].split()
            procs[int(pid)] = (int(rest[1]),
                               (int(rest[11]) + int(rest[12])) / hz)
        except (OSError, IndexError, ValueError):
            continue
    desc, changed = set(), True
    while changed:
        changed = False
        for pid, (ppid, _) in procs.items():
            if pid not in desc and pid != me and (ppid == me or ppid in desc):
                desc.add(pid)
                changed = True
    return total + sum(procs[p][1] for p in desc)


def wait_for_quiet(budget_left: float) -> float:
    """Block (up to budget_left seconds) until loadavg_1m < QUIET_LOAD;
    return the seconds consumed. Gating happens BEFORE the shot so the
    inclusion rule is fixed in advance."""
    t0 = time.time()
    while time.time() - t0 < budget_left:
        if os.getloadavg()[0] < QUIET_LOAD:
            break
        time.sleep(5.0)
    return time.time() - t0


def main():
    import __spark_entry__ as E
    from mapshaper_spark.session import get_spark

    spark = get_spark("mapshaper-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    bench_queries = [
        "pip_first_match",       # point->polygon spatial join, first-match copy
        "region_point_stats",    # polygon<-points aggregate join
        "knn_nearest",           # buffered nearest-point join
        "knn_k3",                # k-NN ring-disk search
        "split_on_grid",         # tile assignment
        "slice_grid",            # -slice: exact clipped tile geometry
        "clip_diamond",          # general polygon overlay
        "dissolve2",             # overlap-safe mosaic dissolve
        "topology_build",        # distributed shared-arc topology
        "polygons_from_lines",   # planar face extraction
        "dissolve_customers_by_nation",
        "join_first_match",
        "each_derive",
        "calc_aggs",
        "sort_top100",
        "simplify_vis",
        "text_metrics",
        "minhash_dups",
        "ngram_jaccard",
        "ann_topk",
        "events_rollup",
        "image_decode_stats",
        # round-2 operators
        "dissolve2_gaps",        # gap-filled mosaic dissolve
        "proj_lcc",              # full -proj surface (LCC/AEA/TM)
        "phash_dups",            # image near-dup (banded hamming, JVM)
        "each_assign",           # assignment-string -each over lineitem
        # round-3 operators
        "cluster",               # sample-seeded Lloyd, map-only assignment
        "fast_simplify",         # interval-thinning keep-walk
        "proj_albersusa",        # mixed projection (AEA + LCC inset frames)
        "clean",                 # overlap removal, identity-preserving
        "mosaic_faces",          # arrangement faces (clustered kernels)
        "slice_layer",           # general -slice (cell-pair clip kernels)
    ]

    timings: dict[str, float] = {}
    quiet_budget = QUIET_WAIT_S

    # warm the JVM + parquet footers with a trivial action, and spin up the
    # Python worker pool (first Arrow stage otherwise pays ~3 s of worker
    # spawn inside whichever query happens to run first)
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, schema="id long").count()

    load_start = os.getloadavg()[0]
    # per-query: the first run warms plan compilation + caches and is NOT
    # recorded; recorded value = min of the two following warm shots, so a
    # single contended window can't stand as a query's number
    for name in bench_queries:
        df = qs[name](spark, SF_DIR)
        best = 1e18
        for rep in range(3):
            t0 = time.time()
            materialize(df)
            dt = time.time() - t0
            if rep > 0:
                best = min(best, dt)
        timings[name] = round(best, 3)

    # flagship: spatial-join + tile-assignment over N_IMAGES synthetic
    # images — one untimed warm-up, then REPEATS gated+recorded shots
    flagship = E.q_flagship_image_tiles(spark, SF_DIR, n_images=N_IMAGES)
    materialize(flagship)  # warm-up, never recorded
    runs = []
    for _ in range(max(1, REPEATS)):
        quiet_budget -= wait_for_quiet(quiet_budget)
        la0 = os.getloadavg()[0]
        busy0, tree0 = _system_busy_seconds(), _tree_cpu_seconds()
        steal0 = _steal_seconds()
        t0 = time.time()
        materialize(flagship)
        wall = time.time() - t0
        # direct contention accounting (same rules as tools/scaling_bench.py
        # gate v4): external busy cores averaged over the shot = (system
        # busy CPU minus our own process tree's CPU) / wall, plus the
        # hypervisor steal rate — cycles the host gave other tenants' VMs
        # mid-shot, which no in-VM accounting can see.
        ext = max(0.0, (_system_busy_seconds() - busy0)
                  - (_tree_cpu_seconds() - tree0)) / wall
        steal = (_steal_seconds() - steal0) / wall
        runs.append({"sec": round(wall, 3),
                     "loadavg_1m": round(la0, 2),
                     "external_cores_avg": round(ext, 2),
                     "steal_cores_avg": round(steal, 3)})
    best_run = min(runs, key=lambda r: r["sec"])
    flagship_s = best_run["sec"]
    # contended when even the best shot shared the machine with >2 external
    # cores or >0.5 stolen cores (direct accounting), or — fallback —
    # started over the load gate
    contended = (best_run["external_cores_avg"] > 2.0
                 or best_run["steal_cores_avg"] > 0.5
                 or best_run["loadavg_1m"] >= QUIET_LOAD)
    timings["flagship_image_tiles"] = flagship_s

    # --- skew stress (VERDICT r04 #7): perf evidence for the salted
    # shuffle fallback under a pathologically hot cell. Two shots over the
    # same N points on the FORCED shuffle path (broadcast_polys=False):
    # uniform, and 50% of points collapsed onto ONE location (one Morton
    # cell). Without salting, the hot shot would pin one reducer with
    # N/2 rows (~cells/2 x slower); with salting it must stay within ~2x
    # of uniform. Also asserts the salt actually reached the plan.
    from pyspark.sql import functions as F

    from mapshaper_spark import layers as LYR
    from mapshaper_spark.operators import spatial as SP
    n_skew = int(os.environ.get("MS_BENCH_SKEW_POINTS", 5_000_000))
    bbox = E.BBOX
    base = LYR.footprint_cols(LYR.synth_images(spark, n_skew)) \
        .select("id", "lon", "lat")
    hot_x = (bbox[0] + bbox[2]) / 2 + 0.001
    hot_y = (bbox[1] + bbox[3]) / 2 + 0.001
    skewed = (base
              .withColumn("lon", F.when(F.col("id") % 2 == 0,
                                        F.lit(hot_x)).otherwise(F.col("lon")))
              .withColumn("lat", F.when(F.col("id") % 2 == 0,
                                        F.lit(hot_y)).otherwise(F.col("lat"))))
    _, _, skew_polys = E._mosaic_polys(spark)
    skew_shots = {}
    salted_in_plan = False
    for tag, pts in (("uniform", base), ("hot50", skewed)):
        q = SP.pip_join(pts, "lon", "lat", skew_polys, "rid", bbox=bbox,
                        res=9, broadcast_polys=False)
        agg = q.groupBy("rid").agg(F.count(F.lit(1)).alias("n"))
        materialize(agg)  # warm-up, never recorded
        best = 1e18
        for _ in range(2):
            quiet_budget -= wait_for_quiet(quiet_budget)
            t0 = time.time()
            materialize(agg)
            best = min(best, time.time() - t0)
        skew_shots[tag] = round(best, 3)
        if tag == "hot50":
            salted_in_plan = "pmod" in \
                q._jdf.queryExecution().executedPlan().toString()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "spatial-join + tile-assignment throughput",
        "value": round(N_IMAGES / flagship_s, 1),
        "unit": "images/sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_images": N_IMAGES,
        "flagship_sec": flagship_s,
        "flagship_runs": runs,
        "contended": contended,
        "skew_stress": {
            "points": n_skew,
            "uniform_sec": skew_shots["uniform"],
            "hot50_sec": skew_shots["hot50"],
            "hot_over_uniform": round(
                skew_shots["hot50"] / max(skew_shots["uniform"], 1e-9), 3),
            "salted_in_plan": salted_in_plan,
        },
        "loadavg_start": round(load_start, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "quiet_gate": QUIET_LOAD,
        "total_sec": round(sum(timings.values()), 3),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
