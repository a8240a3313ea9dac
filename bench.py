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
(c) records os.getloadavg() per run, and (d) sets "contended": true in the
output when the best shot still ran over the gate so a reviewer can discount
the round rather than be misled by it.
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
        t0 = time.time()
        materialize(flagship)
        runs.append({"sec": round(time.time() - t0, 3),
                     "loadavg_1m": round(la0, 2)})
    best_run = min(runs, key=lambda r: r["sec"])
    flagship_s = best_run["sec"]
    contended = best_run["loadavg_1m"] >= QUIET_LOAD
    timings["flagship_image_tiles"] = flagship_s

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
        "loadavg_start": round(load_start, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "quiet_gate": QUIET_LOAD,
        "total_sec": round(sum(timings.values()), 3),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
