"""Similarity search over embedding columns (SURVEY §2.10 Q7 analog).

The reference stores 384-dim cosine dense vectors in Solr
(``default-chunk-config.zip -> managed-schema.xml:13``; field validation
``solr/client/VectorFieldValidator.java:38-82``) and delegates KNN to
Lucene HNSW. Spark-first equivalents:

* brute_force_cosine_topk — exact baseline: JVM-side zip_with/aggregate
  dot products, TakeOrderedAndProject top-k. O(n) per query but fully
  distributed and shuffle-free (scan + local heap + driver merge of k).
* rp_lsh_buckets / rp_lsh_cosine_topk — random-hyperplane LSH: sign-bit
  sketch per vector (deterministic seeded planes, Arrow UDF), candidates =
  vectors whose sketch hamming-matches the query within a probe radius;
  exact cosine re-rank of the candidates only. ``rp_lsh_cosine_topk`` is
  the index-free one-shot form (one full sketch pass per call — fine for
  ad-hoc use, wrong as a serving path).
* write_rp_lsh_index / rp_lsh_index_topk — the serving path: the sketch
  table is WRITTEN partitioned by the sketch's top-``prefix_bits``, and a
  query enumerates the <=radius-reachable prefixes as a pushed ``IN``
  filter, so partition pruning bounds the scan to sum(C(p, i), i<=radius)
  of 2^p partitions (93/256 at p=8, r=3) instead of every sketch.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _cosine_expr(vec_col: str, q: Sequence[float]):
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nq = float(np.sqrt(np.sum(np.asarray(q, dtype=np.float64) ** 2)))
    # zero-norm guard: 0/0 is NaN, and Spark orders NaN ABOVE every real
    # double, so unguarded zero vectors would crowd out true top-k rows;
    # define cosine(0-vector, q) = 0 instead
    denom = na * F.lit(nq)
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def brute_force_cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: whole-stage-codegen score + TakeOrderedAndProject."""
    score = _cosine_expr(vec_col, query_vec)
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        df.select(F.col(id_col), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _planes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, bits))


def rp_lsh_buckets(
    df: DataFrame,
    dim: int,
    bits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, sketch): sign-bit random-projection sketch, Arrow-vectorized.
    The id column keeps the CALLER'S name and dtype (string ids work the
    same as longs — the schema is derived, not hardcoded)."""
    planes = _planes(dim, bits, seed)
    id_type = df.schema[id_col].dataType.simpleString()

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bitsmat = (mat @ planes) > 0
            vals = bitsmat @ (1 << np.arange(bits, dtype=np.int64))
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "sketch": vals})

    return df.select(id_col, vec_col).mapInPandas(
        sketch, schema=f"`{id_col}` {id_type}, sketch long"
    )


def ivf_train_centroids(
    df: DataFrame,
    dim: int,
    n_clusters: int = 16,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train an IVF coarse quantizer: k-means on a driver-side sample
    (seeded, deterministic). At 100 TB the sample is still a few thousand
    vectors — k-means training is never a distributed problem; only
    ASSIGNMENT is, and that stays on executors."""
    # seeded pseudo-random sample via hash order (TakeOrderedAndProject —
    # no full sort shuffle): limit() alone takes the FIRST rows, which on
    # source/date-ordered input trains every centroid on one region and
    # silently collapses nprobe recall
    rows = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)))
        .limit(sample)
        .collect()
    )
    mat = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
    for _ in range(iters):
        sims = mat @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(cent.shape[0]):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Add ``cluster_id`` = nearest centroid (cosine). The IVF index is
    this table written partitioned by ``cluster_id`` so a query scans only
    the probed partitions (partition pruning on the parquet/Iceberg
    scan)."""
    cent = centroids

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            out = pdf.copy()
            out["cluster_id"] = (mat @ cent.T).argmax(axis=1).astype(np.int32)
            yield out

    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("cluster_id", T.IntegerType())]
    )
    return df.mapInPandas(assign, schema=schema)


def ivf_cosine_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF query: rank centroids against the query driver-side, scan only
    the ``nprobe`` nearest clusters (pushed filter -> partition pruning),
    exact cosine re-rank inside them."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ qn))[:nprobe].tolist()
    cand = assigned.filter(F.col("cluster_id").isin([int(c) for c in probe]))
    return brute_force_cosine_topk(cand, query_vec, k, vec_col, id_col)


def _radius_prefixes(qprefix: int, prefix_bits: int, radius: int) -> "list[int]":
    """All prefixes whose hamming distance from ``qprefix`` is <= radius.
    A sketch within ``radius`` bits of the query sketch can flip at most
    ``radius`` bits anywhere, hence at most ``radius`` inside the prefix —
    so this enumeration is exact (no candidate lost to pruning)."""
    from itertools import combinations

    out = set()
    for d in range(min(radius, prefix_bits) + 1):
        for pos in combinations(range(prefix_bits), d):
            m = 0
            for b in pos:
                m |= 1 << b
            out.add(qprefix ^ m)
    return sorted(out)


def write_rp_lsh_index(
    df: DataFrame,
    path: str,
    dim: int,
    bits: int = 16,
    prefix_bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Build the serving-path LSH index: (id, vector, sketch) written
    partitioned by the sketch's top-``prefix_bits`` so queries prune to
    the <=radius-reachable prefix partitions (a pushed IN filter on the
    partition column). The vector is stored alongside the sketch —
    Lucene's HNSW stores vectors in the index the same way — so the exact
    cosine re-rank reads only the probed partitions, never the corpus."""
    planes = _planes(dim, bits, seed)
    shift = bits - prefix_bits
    vec_type = df.schema[vec_col].dataType.simpleString()
    id_type = df.schema[id_col].dataType.simpleString()

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vals = ((mat @ planes) > 0) @ (1 << np.arange(bits, dtype=np.int64))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col],
                    "sketch": vals,
                    "prefix": (vals >> shift).astype(np.int32),
                }
            )

    (
        df.select(id_col, vec_col)
        .mapInPandas(
            sketch,
            schema=f"`{id_col}` {id_type}, {vec_col} {vec_type}, "
            "sketch long, prefix int",
        )
        .write.mode("overwrite")
        .partitionBy("prefix")
        .parquet(path)
    )


def rp_lsh_index_topk(
    spark,
    path: str,
    query_vec: Sequence[float],
    dim: int,
    k: int = 10,
    bits: int = 16,
    prefix_bits: int = 8,
    radius: int = 3,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the partitioned LSH index: enumerate the prefixes reachable
    within ``radius`` (exact — see :func:`_radius_prefixes`), push them as
    a partition filter, hamming-filter the surviving sketches JVM-side
    (``bit_count(xor)``), exact-cosine re-rank the candidates. Identical
    results to :func:`rp_lsh_cosine_topk` with the same (bits, radius,
    seed), but the scan is bounded by partition pruning."""
    planes = _planes(dim, bits, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qsketch = int(((q @ planes) > 0) @ (1 << np.arange(bits, dtype=np.int64)))
    qprefix = qsketch >> (bits - prefix_bits)
    probe = _radius_prefixes(qprefix, prefix_bits, radius)
    tbl = spark.read.parquet(path).filter(
        F.col("prefix").isin([int(p) for p in probe])
    )
    cand = tbl.filter(
        F.bit_count(F.col("sketch").bitwiseXOR(F.lit(qsketch))) <= radius
    )
    return brute_force_cosine_topk(cand, query_vec, k, vec_col, id_col)


def rp_lsh_cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    dim: int,
    k: int = 10,
    bits: int = 16,
    radius: int = 3,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN: candidates whose sketch is within ``radius`` hamming bits of the
    query sketch, re-ranked by exact cosine. Returns (id, cosine)."""
    planes = _planes(dim, bits, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qsketch = int(((q @ planes) > 0) @ (1 << np.arange(bits, dtype=np.int64)))
    sk = rp_lsh_buckets(df, dim, bits, seed, vec_col, id_col)
    cand_ids = sk.filter(
        F.bit_count(F.col("sketch").bitwiseXOR(F.lit(qsketch))) <= radius
    ).select(id_col)
    cand = df.join(cand_ids, id_col, "left_semi")
    return brute_force_cosine_topk(cand, query_vec, k, vec_col, id_col)
