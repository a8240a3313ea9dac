"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact top-k by dot product / cosine. The score is a JVM
  higher-order-function reduction (zip_with + aggregate) — no Python, no
  shuffle for the score, one top-k reduction at the end.
- lsh_topk: random-hyperplane signed buckets as the scale path; exact rerank
  inside each bucket. Recall is tunable via n_planes/probes.

At 100 TB the brute-force path is a full scan (fine for one-off queries —
it's embarrassingly parallel and never shuffles the vectors); the LSH path
prunes the scan to matching buckets via partition pruning on the bucket
column when vectors are written bucketed.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_score_col(emb: str, query: Sequence[float]) -> F.Column:
    """sum_i emb[i]*q[i] as a JVM expression (whole-stage codegen)."""
    q = F.array(*[F.lit(float(v)) for v in query])
    prod = F.zip_with(F.col(emb).cast("array<double>"), q, lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm_col(emb: str) -> F.Column:
    sq = F.aggregate(F.transform(F.col(emb).cast("array<double>"), lambda x: x * x),
                     F.lit(0.0), lambda acc, v: acc + v)
    return F.sqrt(sq)


def brute_force_topk(df: DataFrame, id_col: str, emb_col: str,
                     query: Sequence[float], k: int = 10,
                     cosine: bool = True) -> DataFrame:
    """Exact top-k neighbors of ``query``. Returns (id, score) ordered by
    (score desc, id) — the deterministic tie-break keeps output stable across
    parallelism levels."""
    score = dot_score_col(emb_col, query)
    if cosine:
        qn = float(np.sqrt(np.sum(np.asarray(query, dtype=np.float64) ** 2)))
        score = score / (norm_col(emb_col) * F.lit(qn))
    out = (df.select(F.col(id_col), F.round(score, 6).alias("score"))
           .orderBy(F.desc("score"), F.col(id_col))
           .limit(k))
    return out


def hyperplane_bucket_col(emb_col: str, dim: int, n_planes: int = 12,
                          seed: int = 42):
    """Pandas-UDF bucket id: sign pattern of ``n_planes`` seeded random
    hyperplanes (deterministic across runs/parallelism)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(np.float64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def bucket(embs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        signs = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((signs @ weights).astype(np.int64))

    return bucket(F.col(emb_col))


def lsh_topk(df: DataFrame, id_col: str, emb_col: str, query: Sequence[float],
             k: int = 10, n_planes: int = 12, seed: int = 42,
             probes: int = 1) -> DataFrame:
    """ANN top-k: restrict the exact rerank to vectors sharing the query's
    hyperplane bucket (plus ``probes-1`` nearest buckets by hamming)."""
    dim = len(query)
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(np.float64)
    qsig = int(np.sum(((planes @ np.asarray(query, dtype=np.float64)) > 0) *
                      (1 << np.arange(n_planes, dtype=np.int64))))
    buckets = [qsig]
    if probes > 1:
        for b in range(n_planes):
            buckets.append(qsig ^ (1 << b))
        buckets = buckets[:probes + 1]
    bucketed = df.withColumn("__bucket", hyperplane_bucket_col(emb_col, dim, n_planes, seed))
    cand = bucketed.filter(F.col("__bucket").isin(buckets))
    return brute_force_topk(cand, id_col, emb_col, query, k=k)


def embedding_cosine_dup_pairs(df: DataFrame, id_col: str, emb_col: str,
                               threshold: float = 0.95, n_planes: int = 8,
                               seed: int = 42) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, blocked by
    hyperplane bucket (high-cosine pairs almost surely share all signs for
    small n_planes)."""
    sample = df.select(emb_col).first()
    dim = len(sample[0])
    bucketed = df.withColumn("__bucket", hyperplane_bucket_col(emb_col, dim, n_planes, seed))
    a = bucketed.select(F.col("__bucket"), F.col(id_col).alias("id_a"),
                        F.col(emb_col).alias("__ea"))
    b = bucketed.select(F.col("__bucket").alias("__bucket_b"), F.col(id_col).alias("id_b"),
                        F.col(emb_col).alias("__eb"))
    cand = a.join(b, (a.__bucket == b.__bucket_b) & (a.id_a < b.id_b))
    dot = F.aggregate(F.zip_with(F.col("__ea").cast("array<double>"),
                                 F.col("__eb").cast("array<double>"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(F.col("__ea").cast("array<double>"), lambda x: x * x),
                            F.lit(0.0), lambda a_, v: a_ + v))
    nb = F.sqrt(F.aggregate(F.transform(F.col("__eb").cast("array<double>"), lambda x: x * x),
                            F.lit(0.0), lambda a_, v: a_ + v))
    return (cand.withColumn("cosine", F.round(dot / (na * nb), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def ivf_index(df: DataFrame, id_col: str, emb_col: str, n_lists: int = 16):
    """IVF coarse quantizer: deterministic evenly-spaced centroid seeding
    over the first embedding dimension's order, one Lloyd refinement, then
    inverted-list assignment. Returns (centroids_df, assigned_df with
    ``list_id``). The scale path for ANN: a query probes ``nprobe`` nearest
    lists instead of scanning every vector."""
    from pyspark.sql import Window

    n = df.count()
    n_lists = max(1, min(n_lists, n))
    first = F.element_at(F.col(emb_col).cast("array<double>"), 1)
    w = Window.orderBy(first, F.col(id_col))
    seeds = (df.withColumn("__rk", F.row_number().over(w))
             .filter((F.col("__rk") - 1) % F.lit(max(1, n // n_lists)) == 0)
             .limit(n_lists)
             .withColumn("list_id", F.row_number().over(Window.orderBy("__rk")) - 1)
             .select("list_id", F.col(emb_col).cast("array<double>").alias("centroid")))
    cent = F.broadcast(seeds)
    dot = F.aggregate(F.zip_with(F.col(emb_col).cast("array<double>"),
                                 F.col("centroid"), lambda x, y: (x - y) * (x - y)),
                      F.lit(0.0), lambda acc, v: acc + v)
    assigned = (df.crossJoin(cent)
                .withColumn("__d2", dot)
                .groupBy(*df.columns)
                .agg(F.min(F.struct(F.col("__d2").alias("d2"),
                                    F.col("list_id").alias("lid"))).alias("b"))
                .withColumn("list_id", F.col("b.lid")).drop("b"))
    return seeds, assigned


def ivf_topk(df: DataFrame, id_col: str, emb_col: str, query, k: int = 10,
             n_lists: int = 16, nprobe: int = 4) -> DataFrame:
    """ANN top-k via IVF: score only the vectors in the ``nprobe`` lists
    whose centroids are closest to the query."""
    import numpy as np

    seeds, assigned = ivf_index(df, id_col, emb_col, n_lists)
    q = np.asarray(query, dtype=np.float64)
    cents = seeds.collect()
    dists = [(float(np.sum((np.asarray(c.centroid) - q) ** 2)), c.list_id)
             for c in cents]
    probe = [lid for _, lid in sorted(dists)[:nprobe]]
    cand = assigned.filter(F.col("list_id").isin(probe))
    qnorm = float(np.sqrt((q * q).sum()))
    score = F.round(dot_score_col(emb_col, list(q)) /
                    (norm_col(emb_col) * F.lit(qnorm)), 6)
    return (cand.withColumn("score", score)
            .orderBy(F.desc("score"), F.col(id_col))
            .limit(k).select(id_col, "score"))
