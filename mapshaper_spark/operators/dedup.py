"""Deduplication operators for large-scale document pipelines.

Not present in the reference (mapshaper's closest analog is -uniq,
/root/reference/src/commands/mapshaper-uniq.js); these are the standard
web-scale text-dedup family re-expressed Spark-first:

- exact_dedup:        hash groupBy, first occurrence wins (like -uniq).
- word_jaccard_pairs: exact token-set Jaccard via explode + pair join —
                      oracle-expressible in ANSI SQL.
- minhash_lsh_pairs:  shingle -> minhash signature -> band buckets ->
                      bucket equi-join -> exact-Jaccard verify. The classic
                      MinHash+LSH plan; all Python work is Arrow-batched.
- simhash_pairs:      64-bit simhash, banded hamming blocking.

Scale notes: every stage is a narrow map or a key-shuffle; candidate
generation never materializes the n^2 pair space (bands/buckets bound it).
Hot buckets (boilerplate shingles) are capped with a per-bucket limit, the
standard guard against quadratic blowup in LSH joins.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapshaper_spark.operators.attributes import ROW_IDX

MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, cols: Sequence[str], order_col: str = ROW_IDX) -> DataFrame:
    """Keep the first row (by order_col) per exact key tuple."""
    w = Window.partitionBy(*cols).orderBy(F.col(order_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def word_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                       block_col: str | None = None,
                       threshold: float = 0.5,
                       max_df: int | None = 10_000) -> DataFrame:
    """Exact token-set Jaccard similarity between document pairs.

    Pure DataFrame plan: explode distinct words -> self-join on word
    (within an optional blocking column) -> |A ∩ B| per pair -> Jaccard from
    per-doc set sizes. Only pairs sharing >=1 word are ever materialized.
    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.

    ``max_df`` (ON by default — the web-scale guard): tokens appearing in
    more than ``max_df`` documents are dropped from the token UNIVERSE
    (both intersections and set sizes), so one stopword shared by 10^6
    docs can never become an O(df^2) join key. Jaccard is then computed
    over the df-filtered vocabulary — the standard stopword-pruned
    semantics; set None for the unbounded exact form.
    """
    words = (df.select(id_col, *( [block_col] if block_col else [] ),
                       F.explode(F.array_distinct(
                           F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0))).alias("w")))
    if max_df is not None:
        rare = (words.groupBy("w").agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") <= max_df).select("w"))
        words = words.join(rare, "w")
    sizes = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = words.select(*([block_col] if block_col else []),
                     F.col(id_col).alias("id_a"), F.col("w"))
    b = words.select(*([F.col(block_col).alias("__blk_b")] if block_col else []),
                     F.col(id_col).alias("id_b"), F.col("w").alias("w_b"))
    cond = (a.w == b.w_b) & (a.id_a < b.id_b)
    if block_col:
        cond = cond & (F.col(block_col) == F.col("__blk_b"))
    inter = (a.join(b, cond)
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter")))
    out = (inter
           .join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
           .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
           .withColumn("jaccard",
                       F.col("n_inter").cast("double") /
                       (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))
    return out


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Deterministic 61-bit polynomial hash per token (pure python ints to
    avoid uint64 overflow semantics; tokens are short). Runs over UNICODE
    CODEPOINTS so the DuckDB oracle can replay it exactly with
    list_reduce + unicode() over HUGEINT arithmetic (the driver's
    minhash_sigs/simhash_sigs exact gates)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = 0
        for ch in t:
            h = (h * 131 + ord(ch)) % MERSENNE
        out[i] = h
    return out


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    th = _hash_tokens(toks)
    n = max(1, len(th) - k + 1)
    acc = np.zeros(n, dtype=np.object_)
    for j in range(k):
        acc = (acc * 1000003 + th[j:j + n].astype(object)) % MERSENNE
    return np.array([int(v) for v in acc], dtype=np.uint64)


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 64, shingle: int = 3,
                       seed: int = 42) -> DataFrame:
    """(id, signature array<long>) — minhash over word-``shingle`` shingles
    with ``num_perm`` affine permutations mod 2^61-1."""
    rng = np.random.RandomState(seed)
    A = rng.randint(1, MERSENNE, size=num_perm, dtype=np.uint64)
    B = rng.randint(0, MERSENNE, size=num_perm, dtype=np.uint64)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs = []
            for text in pdf[text_col]:
                sh = _shingle_hashes(text or "", shingle).astype(object)  # python ints: no overflow
                vals = (A.astype(object)[:, None] * sh[None, :] + B.astype(object)[:, None]) % MERSENNE
                sigs.append(np.min(np.asarray(vals, dtype=np.uint64), axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "signature": sigs})

    schema = T.StructType([df.schema[id_col],
                           T.StructField("signature", T.ArrayType(T.LongType()))])
    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_perm: int = 64, bands: int = 16, shingle: int = 3,
                      threshold: float = 0.5, seed: int = 42,
                      max_bucket: int = 1000) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact-Jaccard verify.

    Candidate pairs = docs sharing any (band, band-hash) bucket; buckets
    larger than ``max_bucket`` are dropped (logged-at-scale skew guard).
    Verification computes exact shingle-set Jaccard inside a pandas UDF over
    the candidate pair's texts. Returns (id_a, id_b, jaccard >= threshold).
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle, seed)
    banded = sigs.select(
        id_col,
        F.posexplode(F.array(*[
            F.xxhash64(*[F.element_at("signature", i * rows_per_band + j + 1)
                         for j in range(rows_per_band)])
            for i in range(bands)])).alias("band", "bucket"))
    sized = banded.withColumn("bsz", F.count(F.lit(1)).over(
        Window.partitionBy("band", "bucket")))
    banded = sized.filter(F.col("bsz") <= max_bucket).drop("bsz")
    pa = banded.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("id_a"))
    pb = banded.select(F.col("band").alias("band_b"), F.col("bucket").alias("bucket_b"),
                       F.col(id_col).alias("id_b"))
    cand = (pa.join(pb, (pa.band == pb.band_b) & (pa.bucket == pb.bucket_b) &
                    (pa.id_a < pb.id_b))
            .select("id_a", "id_b").distinct())

    texts = df.select(F.col(id_col), F.col(text_col))
    cand = (cand.join(texts.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta")), "id_a")
                .join(texts.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb")), "id_b"))

    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            jac = np.empty(len(pdf))
            for i, (ta, tb) in enumerate(zip(pdf["__ta"], pdf["__tb"])):
                sa = set(_shingle_hashes(ta or "", shingle).tolist())
                sb = set(_shingle_hashes(tb or "", shingle).tolist())
                u = len(sa | sb)
                jac[i] = (len(sa & sb) / u) if u else 1.0
            out = pdf[["id_a", "id_b"]].copy()
            out["jaccard"] = np.round(jac, 6)
            yield out[out["jaccard"] >= threshold]

    schema = T.StructType([cand.schema["id_a"], cand.schema["id_b"],
                           T.StructField("jaccard", T.DoubleType())])
    return cand.mapInPandas(verify, schema=schema)


def simhash_col(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash of the token multiset (sign of per-bit weighted sums
    of token hashes)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = np.empty(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                toks = (text or "").split()
                if not toks:
                    out[i] = 0
                    continue
                th = _hash_tokens(toks)
                bits = ((th[:, None] >> np.arange(61, dtype=np.uint64)[None, :]) &
                        np.uint64(1)).astype(np.int64)
                v = (2 * bits - 1).sum(axis=0)
                out[i] = int(((v > 0).astype(np.uint64) <<
                              np.arange(61, dtype=np.uint64)).sum().astype(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    schema = T.StructType([df.schema[id_col], T.StructField("simhash", T.LongType())])
    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= max_hamming.
    Blocking: split the 64-bit hash into ``bands`` chunks; by pigeonhole any
    pair within distance < bands shares at least one exact chunk."""
    sh = simhash_col(df, id_col, text_col)
    width = 64 // bands
    banded = sh.select(
        id_col, "simhash",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit((1 << width) - 1))
            for i in range(bands)])).alias("band", "chunk"))
    a = banded.select(F.col("band"), F.col("chunk"),
                      F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = banded.select(F.col("band").alias("band_b"), F.col("chunk").alias("chunk_b"),
                      F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    cand = (a.join(b, (a.band == b.band_b) & (a.chunk == b.chunk_b) & (a.id_a < b.id_b))
            .select("id_a", "id_b", "sh_a", "sh_b").distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def _ngram_set_col(text_col: str, k: int) -> F.Column:
    """Distinct character k-grams of a string — pure JVM (sequence +
    Column.substr + array_distinct)."""
    n = F.length(F.col(text_col))
    idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)) \
           .otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.col(text_col).substr(i, F.lit(k))))


def char_ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                             k: int = 5, threshold: float = 0.5,
                             max_df: int | None = 10_000) -> DataFrame:
    """Exact character-k-gram (shingle) Jaccard between document pairs —
    the exact counterpart of minhash_lsh_pairs' estimate; same explode +
    pair-join plan (and the same ``max_df`` join-key blowup guard) as
    word_jaccard_pairs."""
    grams = df.select(id_col, F.explode(_ngram_set_col(text_col, k)).alias("g"))
    if max_df is not None:
        rare = (grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") <= max_df).select("g"))
        grams = grams.join(rare, "g")
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = grams.select(F.col(id_col).alias("id_a"), "g")
    b = grams.select(F.col(id_col).alias("id_b"), F.col("g").alias("g_b"))
    inter = (a.join(b, (a.g == b.g_b) & (a.id_a < b.id_b))
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter")))
    return (inter
            .join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
            .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
            .withColumn("jaccard",
                        F.col("n_inter").cast("double") /
                        (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def phash_hamming_pairs(df: DataFrame, id_col: str, phash_col: str,
                        max_hamming: int = 6, bands: int = 4,
                        bits: int = 40) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash hamming distance —
    the image-payload counterpart of simhash_pairs: split the ``bits``-wide
    phash into ``bands`` chunks (pigeonhole: any pair within distance <
    bands shares a chunk), equi-join per (band, chunk), verify with JVM
    bit_count. Pure column expressions end to end — no Python."""
    width = bits // bands
    banded = df.select(
        id_col, phash_col,
        F.posexplode(F.array(*[
            F.shiftright(F.col(phash_col), i * width)
             .bitwiseAND(F.lit((1 << width) - 1))
            for i in range(bands)])).alias("band", "chunk"))
    a = banded.select(F.col("band"), F.col("chunk"),
                      F.col(id_col).alias("id_a"),
                      F.col(phash_col).alias("ph_a"))
    b = banded.select(F.col("band").alias("band_b"),
                      F.col("chunk").alias("chunk_b"),
                      F.col(id_col).alias("id_b"),
                      F.col(phash_col).alias("ph_b"))
    cand = (a.join(b, (a.band == b.band_b) & (a.chunk == b.chunk_b) &
                   (a.id_a < b.id_b))
            .select("id_a", "id_b", "ph_a", "ph_b").distinct())
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def dup_clusters(pairs: DataFrame, ids: DataFrame, id_col: str,
                 max_iter: int = 25) -> DataFrame:
    """Near-duplicate CLUSTERING — the pipeline step after pair detection:
    connected components over the (id_a, id_b) pair graph; every document
    gets a ``cluster`` label (the minimum reachable id) and the canonical
    member is the cluster minimum. Iterative min-label propagation with a
    pointer-doubling shortcut (O(log diameter) rounds) — the same
    distributed-connectivity plan as topology.label_components, over dup
    edges instead of arc endpoints. Returns (id, cluster, is_canonical)."""
    edges = (pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
             .unionByName(pairs.select(F.col("id_b").alias("a"),
                                       F.col("id_a").alias("b")))
             .distinct().localCheckpoint())
    labels = ids.select(F.col(id_col).alias("id")) \
        .withColumn("comp", F.col("id")).localCheckpoint()
    changed = -1
    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges.b == labels.id)
                   .groupBy("a").agg(F.min("comp").alias("nbr_comp")))
        new_labels = (labels.join(nbr_min, labels.id == nbr_min.a, "left")
                      .select("id", F.least(
                          "comp", F.coalesce("nbr_comp", "comp")).alias("comp")))
        parent = new_labels.select(F.col("id").alias("comp"),
                                   F.col("comp").alias("comp2"))
        new_labels = (new_labels.join(parent, "comp", "left")
                      .select("id", F.coalesce("comp2", "comp").alias("comp"))
                      .localCheckpoint())
        changed = (new_labels.alias("n").join(labels.alias("o"), "id")
                   .filter(F.col("n.comp") != F.col("o.comp")).count())
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(f"dup_clusters did not converge in {max_iter} rounds")
    return labels.select(F.col("id").alias(id_col),
                         F.col("comp").alias("cluster"),
                         (F.col("id") == F.col("comp")).alias("is_canonical"))
