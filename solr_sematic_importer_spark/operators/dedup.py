"""Deduplication operators for large-scale training-data pipelines.

The reference's only dedup-shaped op is the orphan delete anti-join
(``SolrAdminActions.java:268``); a 100 TB corpus pipeline needs real
near-dup machinery. All operators below are DataFrame-first:

* exact_duplicates        — hash-groupBy on raw text (one shuffle)
* normalized_duplicates   — same, on analyzer-normalized text
* minhash_signatures      — k permutations of murmur3 shingle hashes,
                            all JVM-side expressions (no Python)
* lsh_candidate_pairs     — band/bucket self-join producing candidate
                            near-dup pairs (the scale path: no O(n^2))
* ngram_jaccard_pairs     — exact Jaccard over token shingle sets via a
                            shingle equi-join (for verification / small n)
* simhash                 — 64-bit simhash from the tf table (Arrow UDF,
                            numpy bit ops; hamming-band grouping)
* connected_components    — candidate PAIRS -> duplicate CLUSTERS via
                            iterative min-label propagation (joins only)
* near_dup_canonical      — every doc -> the min doc id of its cluster
                            ("keep one per dup cluster" in one filter)

Scale notes: every op shuffles on a content-derived key (hash, shingle,
band bucket), so skew comes only from pathological repeated content —
exactly what dedup is meant to find; bucket-size caps guard the joins.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# deterministic 32-bit affine permutation constants (seeded)
_MERSENNE = (1 << 61) - 1


def _perm_constants(k: int, seed: int = 42) -> list[tuple[int, int]]:
    # a,b < 2^29 and h masked to 31 bits keeps a*h+b < 2^61 — no long
    # overflow under Spark's ANSI arithmetic
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 29, size=k, dtype=np.int64)
    b = rng.integers(0, 1 << 29, size=k, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, dup_count, min_doc_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def normalized_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Dup groups after lowercase + non-alnum collapse (simple profile
    normalization, SQL-expressible for the oracle)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    return (
        df.select(F.md5(F.trim(norm)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) rows: n-token shingles of the simple-profile tokens —
    built-in expressions only (split/sequence/transform/explode)."""
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(sh)).alias("shingle"),
    ).filter(F.length("shingle") > 0)


def minhash_signatures(
    sh: DataFrame, num_perm: int = 64, seed: int = 42, hash_col=None
) -> DataFrame:
    """doc_id -> array<long> of num_perm minhash values. One hash agg; all
    expressions JVM-side (xxhash64 + affine permutation mod Mersenne).

    ``hash_col``: optional replacement Column for the default 31-bit
    masked xxhash64 of the shingle (must already be bounded to < 2^31 so
    the affine permutations stay overflow-free under ANSI arithmetic).
    Lets an external SQL oracle mirror the permutation/banding machinery
    exactly with a SQL-expressible hash; production callers keep the
    default."""
    h = (
        F.xxhash64("shingle").bitwiseAND(F.lit((1 << 31) - 1))
        if hash_col is None
        else hash_col
    )
    aggs = []
    for i, (a, b) in enumerate(_perm_constants(num_perm, seed)):
        aggs.append(F.min((h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE)).alias(f"mh{i}"))
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[f"mh{i}" for i in range(num_perm)]).alias("signature")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    max_bucket: int = 1000,
    with_dropped: bool = False,
):
    """Banded LSH: equal band-slices -> same bucket -> candidate pair.

    Self-equi-join on (band, bucket_hash); buckets larger than
    ``max_bucket`` are dropped — a mega-bucket is degenerate content and
    would quadratically blow up the join at scale. The drop is SURFACED,
    not silent: pass ``with_dropped=True`` to get ``(pairs,
    dropped_buckets)`` where the second DataFrame is one row per dropped
    (band, bucket, size) — route it to a quarantine table at scale so
    truncated coverage is auditable. Pairs are distinct (doc_a, doc_b)
    with doc_a < doc_b.
    """
    sig = signatures
    rows_per_band = F.floor(F.size("signature") / bands).cast("int")
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.xxhash64(
                    bnd, F.slice("signature", bnd * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bucket"),
    )
    # prune degenerate buckets before the self-join
    sizes = banded.groupBy("band", "bucket").count()
    ok = sizes.filter((F.col("count") > 1) & (F.col("count") <= max_bucket)).select("band", "bucket")
    dropped = sizes.filter(F.col("count") > max_bucket).select(
        "band", "bucket", F.col("count").alias("size")
    )
    pruned = banded.join(ok, ["band", "bucket"], "left_semi")
    a = pruned.alias("a")
    b = pruned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return (pairs, dropped) if with_dropped else pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    id_filter=None,
) -> DataFrame:
    """Exact shingle-set Jaccard via equi-join on shingles (distinct
    shingles -> pair intersection counts -> |A|+|B|-inter). SQL-parity
    shape used by the DuckDB oracle; restrict with ``id_filter`` at scale."""
    base = df if id_filter is None else df.filter(id_filter)
    sh = shingles(base, text_col, id_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def embedding_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 16,
    band_bits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicates: (doc_a, doc_b, cosine >= threshold).

    Scale path (default): random-hyperplane sign sketches
    (``similarity_search.rp_lsh_buckets``), banded like SimHash — pairs
    sharing ANY ``band_bits``-bit band of the sketch become candidates
    (pigeonhole: Hamming distance < bits/band_bits guarantees a shared
    band), then exact cosine re-ranks ONLY the candidates. No all-pairs
    join; bucket skew is degenerate content, exactly what dedup hunts.

    ``exact=True`` degenerates the blocking to all-pairs (doc_a < doc_b)
    for verification/oracle use at small n — same output columns, exact
    recall.
    """
    from .similarity_search import rp_lsh_buckets

    e = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    if exact:
        a, b = e.alias("a"), e.alias("b")
        cand = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
            F.col("a.vec_id").alias("doc_a"),
            F.col("b.vec_id").alias("doc_b"),
            F.col("a.embedding").alias("va"),
            F.col("b.embedding").alias("vb"),
        )
    else:
        sk = rp_lsh_buckets(e, dim, bits=bits, seed=seed)
        nbands = bits // band_bits
        mask = (1 << band_bits) - 1
        banded = sk.select(
            "vec_id",
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(F.col("sketch"), i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        for i in range(nbands)
                    ]
                )
            ).alias("band", "bucket"),
        )
        a, b = banded.alias("a"), banded.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b")
            )
            .distinct()
        )
        cand = (
            pairs.join(e.withColumnRenamed("vec_id", "doc_a"), "doc_a")
            .withColumnRenamed("embedding", "va")
            .join(e.withColumnRenamed("vec_id", "doc_b"), "doc_b")
            .withColumnRenamed("embedding", "vb")
        )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # zero-norm guard: 0/0 = NaN and NaN compares GREATER than any real
    # double in Spark, so an unguarded zero embedding (empty doc, failed
    # encode) would pass `cosine >= threshold` against every bucket-mate
    # and corrupt the dup clusters; define its similarity as 0 instead
    den = norm(F.col("va")) * norm(F.col("vb"))
    return (
        cand.withColumn(
            "cosine", F.round(F.when(den > 0, dot / den).otherwise(F.lit(0.0)), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )


def simhash(tf_df: DataFrame, bits: int = 64, hash_col=None) -> DataFrame:
    """64-bit SimHash per doc from the (doc_id, term, tf) table.

    Arrow-vectorized: per partition, numpy unpacks term-hash bits and
    accumulates +/- tf weights per bit; partials are then summed per doc
    (handles docs spanning Arrow batches) and signed into the fingerprint.

    ``hash_col``: optional replacement Column for the default
    ``xxhash64(term)`` (must produce a non-negative value < 2^bits).
    Same purpose as in :func:`minhash_signatures` — an external SQL
    oracle can mirror the bit-accumulation machinery exactly."""
    spark = tf_df.sparkSession
    with_h = tf_df.select(
        "doc_id",
        (F.xxhash64("term") if hash_col is None else hash_col).alias("h"),
        "tf",
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["h"].to_numpy().astype(np.uint64)
            w = pdf["tf"].to_numpy().astype(np.int64)
            bitmat = ((h[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            contrib = (2 * bitmat - 1) * w[:, None]
            out = pd.DataFrame(contrib, columns=[f"b{i}" for i in range(bits)])
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out.groupby("doc_id", as_index=False).sum()

    # id dtype follows the caller's frame (string doc ids work like
    # longs everywhere else in this module)
    id_type = tf_df.schema["doc_id"].dataType.simpleString()
    schema = f"doc_id {id_type}, " + ", ".join(f"b{i} long" for i in range(bits))
    partials = with_h.mapInPandas(partial, schema=schema)
    summed = partials.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(bits)]
    )
    # assemble the fingerprint with shiftleft/bitwiseOR: bit ops wrap
    # (well-defined two's complement) where `acc * 2 + x` overflows signed
    # long under ANSI mode as soon as bit 63 is set
    fp = F.aggregate(
        F.array(*[F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)) for i in range(bits)]),
        F.lit(0).cast("long"),
        lambda acc, x: F.shiftleft(acc, 1).bitwiseOR(x.cast("long")),
    )
    return summed.select("doc_id", fp.alias("simhash"))


def simhash_hamming_pairs(
    fps: DataFrame,
    band_bits: int = 8,
    max_distance: int = 7,
    approximate: bool = False,
) -> DataFrame:
    """Near-dup candidates from simhash fingerprints, scale-shaped: docs
    sharing any of the 64/band_bits fingerprint bands are candidate pairs
    (a pair within Hamming distance 64/band_bits - 1 of band count shares
    >=1 band by pigeonhole); exact Hamming distance is then computed
    JVM-side (bit_count of xor) and filtered. No all-pairs join.

    The pigeonhole guarantee only covers ``max_distance <= 64//band_bits
    - 1`` (defaults: 8 bands -> complete recall up to distance 7); a larger
    ``max_distance`` returns pairs beyond the guarantee only when they
    happen to share a band. That silent recall gap is an error unless the
    caller opts in with ``approximate=True``."""
    nbands = 64 // band_bits
    if max_distance > nbands - 1 and not approximate:
        raise ValueError(
            f"max_distance={max_distance} exceeds the pigeonhole guarantee "
            f"for band_bits={band_bits} ({nbands} bands -> complete only "
            f"<= {nbands - 1}); pass approximate=True to accept partial "
            "recall beyond that distance"
        )
    mask = (1 << band_bits) - 1
    banded = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * band_bits)
                    .bitwiseAND(F.lit(mask))
                    for i in range(nbands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 20,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """Turn near-dup candidate PAIRS into duplicate CLUSTERS:
    (node, component) where component is the MINIMUM node id reachable
    through the undirected pair graph — deterministic canonical labels.

    DataFrame-only min-label propagation: each iteration every node takes
    the min of its own label and its neighbors' labels (one equi-join on
    the symmetric edge list + one groupBy-min, both shuffling on node id),
    stopping when an iteration changes nothing. Iterations needed =
    graph diameter; near-dup clusters are near-cliques (every member
    pairs with most others), so real corpora converge in 2-3 rounds —
    max_iterations only bounds pathological chains, and non-convergence
    RAISES rather than returning partially-merged clusters (silently
    splitting a dup cluster means shipping duplicates). Each round
    materializes its label table and unpersists the previous one, so
    lineage stays one round deep at any scale.

    Storage contract: without ``checkpoint_dir`` the returned labels ride
    the loop's final ``persist()`` — the caller MUST ``.unpersist()`` the
    returned frame once the derived result is materialized (mirroring
    ``InvertedIndex.release()``), or every invocation pins a cached table
    for the session lifetime. Pass ``checkpoint_dir`` (any Hadoop-visible
    path) to detach instead: the converged labels are written there as
    parquet and read back, the cache is released INSIDE this function,
    and the returned frame is a plain scan with no storage footprint —
    the right shape for streaming / micro-batch callers (GraphFrames uses
    the same checkpoint pattern for its iterative algorithms)."""
    edges = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select("u").distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("comp"))
        .persist()
    )
    labels.count()
    try:
        for _ in range(max_iterations):
            neighbor = (
                edges.join(
                    labels.select(
                        F.col("node").alias("v"), F.col("comp").alias("nc")
                    ),
                    "v",
                )
                .select(F.col("u").alias("node"), F.col("nc").alias("comp"))
            )
            new_labels = (
                labels.unionByName(neighbor)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
                .persist()
            )
            changed = (
                new_labels.join(
                    labels.select("node", F.col("comp").alias("comp_old")),
                    "node",
                )
                .filter(F.col("comp") != F.col("comp_old"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                if checkpoint_dir is not None:
                    out_path = checkpoint_dir.rstrip("/") + "/cc_labels"
                    labels.write.mode("overwrite").parquet(out_path)
                    labels.unpersist()
                    return labels.sparkSession.read.parquet(out_path)
                return labels
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter exceeds the bound); raise "
            "max_iterations — a partial result would split dup clusters"
        )
    finally:
        edges.unpersist()


def near_dup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 20,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """(id, canonical): every row of ``df`` mapped to the min id of its
    near-dup cluster; rows in no pair map to themselves. The
    training-data dedup step is then ONE filter:
    ``keep = out.filter(col(id) == col("canonical"))`` — deterministic
    (min id survives), no per-cluster collect, one broadcast-sized join
    when the paired set is small relative to the corpus (it is: pairs
    come from an LSH/shingle candidate stage that already pruned).

    Storage contract (same as :func:`connected_components`): without
    ``checkpoint_dir`` the result's lineage keeps the converged label
    table persisted — one-shot batch callers can ignore it (the cache
    dies with the session); repeated / micro-batch callers must pass
    ``checkpoint_dir`` so the labels detach through a parquet round-trip
    and nothing stays pinned in storage memory."""
    comp = connected_components(
        pairs, src_col, dst_col, max_iterations, checkpoint_dir=checkpoint_dir
    )
    return (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col)).alias("canonical"),
        )
    )
