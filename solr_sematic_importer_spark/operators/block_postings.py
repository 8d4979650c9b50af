"""Compressed block postings + block-max WAND top-k (the scale path).

The reference gets posting storage and WAND pruning for free from Lucene
(delegated; ``semantic_base_config.zip -> solrconfig.xml:650-655`` serves
BM25 top-k). We re-build both Spark-first:

Construction — "salting by doc bucket" (SURVEY §4.1 skew handling):
    The doc-id space is cut into aligned buckets of ``2**bucket_bits`` docs
    and the encode group key is ``(term, bucket_id)``. This makes the
    bucket the salt: a hot term ("the" with billions of postings — the
    default stopword file is EMPTY) is spread over #buckets independent
    groups, each bounded by the bucket width, so no applyInPandas group can
    exceed ``2**bucket_bits`` rows no matter how skewed the term
    distribution is. Because buckets are disjoint, contiguous doc ranges,
    the two-phase merge is pure concatenation: the global posting list of a
    term is its bucket rows ordered by ``(bucket_id, block_id)`` — no
    stage-2 re-sort or re-encode (partials are already-sorted runs).

Query — block-max WAND at bucket granularity:
    Every block row carries ``max_impact`` (idf-independent BM25 bound).
    A bucket's score upper bound is ``sum_t idf_t * max_t(block
    max_impact)`` — computed entirely JVM-side from block metadata, no
    decode. Buckets are scored exactly (NumPy dense accumulation over
    decoded blocks) in descending upper-bound order, and the driver stops
    as soon as the next bucket's bound is below the current top-k
    threshold — the WAND skip, applied at the shuffle-friendly
    granularity. Scores accumulate per term in sorted-term order, the same
    float order as the exhaustive scorer, so results are bit-identical
    across parallelism levels AND across the two execution paths.
"""

from __future__ import annotations

import heapq
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.codec import decode_block
from ..functions.similarity import (
    B_DEFAULT,
    K1_DEFAULT,
    LENGTH_TABLE,
    encode_norms,
    idf,
)
from .build import InvertedIndex, term_dfs
from .score import analyze_query

DEFAULT_BUCKET_BITS = 14  # 16384-doc buckets: skew bound + pruning unit

BLOCKS_SCHEMA = (
    "term string, bucket_id long, block_id int, first_doc long, last_doc long, "
    "cnt int, max_tf int, sum_tf long, max_impact double, "
    "doc_bytes binary, tf_bytes binary, norm_bytes binary"
)


def encode_flat_to_blocks(
    flat: DataFrame,
    avgdl: float,
    bucket_bits: int = DEFAULT_BUCKET_BITS,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    num_partitions: int | None = None,
) -> DataFrame:
    """(term, doc_id, tf, dl) rows -> compressed block rows.

    ONE shuffle: repartition by (term, bucket) — the bucket doubles as the
    hot-term salt, so no partition receives more than a bucket's worth of
    any term — then a partition-local sort and ONE vectorized encode pass
    per partition (``encode_partition_blocks``): group detection, varint
    packing and block maxima are whole-array NumPy; there is no per-group
    pandas dispatch (the vocab long tail makes groups tiny and numerous —
    per-group overhead would dominate the encode).

    Always Lucene-quantized: the per-posting norm byte is the SmallFloat
    code; impacts (and therefore WAND bounds) use the decoded quantized
    dl, matching what Solr's BM25 actually scores with.
    """
    spark = flat.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    with_bucket = flat.withColumn(
        "bucket_id", F.shiftright(F.col("doc_id"), bucket_bits)
    ).select("term", "bucket_id", "doc_id", "tf", "dl")
    part = with_bucket.repartition(
        num_partitions, "term", "bucket_id"
    ).sortWithinPartitions("term", "bucket_id", "doc_id")
    # (a pure hash shuffle + NumPy lexsort in the kernel was tried and
    # measured 2.7x SLOWER end-to-end: without the sort requirement AQE
    # reshapes the exchange into fewer, larger partitions and the Python
    # kernels lose parallelism — the JVM sort keeps the plan shape)

    def enc(batches):
        # mapInArrow + dictionary-encoded terms: the kernel never creates a
        # Python object per posting (40M pandas str conversions measured as
        # the encode bottleneck). Group detection runs on int32 dictionary
        # indices; equal terms are contiguous (partition is sorted), so
        # index change points == term change points.
        import pyarrow as pa
        import pyarrow.compute  # noqa: F401 — pa.compute is NOT auto-imported;
        # workers that happened to import it transitively masked this until a
        # fresh worker pool at sf1 hit the bare AttributeError

        from ..functions.codec import encode_partition_blocks

        # Arrow batches can split a (term, bucket) group: assemble the
        # whole partition (bounded by num_partitions sizing) first.
        batches = [bt for bt in batches if bt.num_rows]
        if not batches:
            return
        tbl = pa.Table.from_batches(batches).combine_chunks()
        dict_arr = pa.compute.dictionary_encode(tbl.column("term").chunk(0))
        idx = dict_arr.indices.to_numpy()
        vocab = dict_arr.dictionary
        buckets = tbl.column("bucket_id").chunk(0).to_numpy()
        docs = tbl.column("doc_id").chunk(0).to_numpy()
        tfs = tbl.column("tf").chunk(0).to_numpy().astype(np.int64)
        dls = tbl.column("dl").chunk(0).to_numpy().astype(np.int64)
        norms = encode_norms(dls)
        dlq = LENGTH_TABLE[norms].astype(np.float64)
        impacts = tfs / (tfs + k1 * (1.0 - b + b * dlq / avgdl))
        cols = encode_partition_blocks(idx, buckets, docs, tfs, norms, impacts)
        yield pa.RecordBatch.from_arrays(
            [
                vocab.take(pa.array(cols["term"], type=pa.int32())),
                pa.array(np.asarray(cols["bucket_id"], dtype=np.int64)),
                pa.array(np.asarray(cols["block_id"], dtype=np.int32)),
                pa.array(np.asarray(cols["first_doc"], dtype=np.int64)),
                pa.array(np.asarray(cols["last_doc"], dtype=np.int64)),
                pa.array(np.asarray(cols["cnt"], dtype=np.int32)),
                pa.array(np.asarray(cols["max_tf"], dtype=np.int32)),
                pa.array(np.asarray(cols["sum_tf"], dtype=np.int64)),
                pa.array(np.asarray(cols["max_impact"], dtype=np.float64)),
                pa.array(cols["doc_bytes"], type=pa.binary()),
                pa.array(cols["tf_bytes"], type=pa.binary()),
                pa.array(cols["norm_bytes"], type=pa.binary()),
            ],
            names=[
                "term", "bucket_id", "block_id", "first_doc", "last_doc",
                "cnt", "max_tf", "sum_tf", "max_impact",
                "doc_bytes", "tf_bytes", "norm_bytes",
            ],
        )

    return part.mapInArrow(enc, BLOCKS_SCHEMA)


def build_block_postings(
    index: InvertedIndex,
    bucket_bits: int = DEFAULT_BUCKET_BITS,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Attach compressed block postings to a built index."""
    blocks = encode_flat_to_blocks(
        index.postings_flat, index.avgdl, bucket_bits, k1, b
    )
    index.postings_blocks = blocks
    index.bucket_bits = bucket_bits
    index.impacts_avgdl = index.avgdl
    index.impact_k1 = float(k1)
    index.impact_b = float(b)
    return blocks


def decode_blocks_to_flat(blocks: DataFrame) -> DataFrame:
    """Inverse view for blocks-only indexes: decode block rows back to
    (term, doc_id, tf, dl_quant) flat postings. The EXACT dl is not stored
    in blocks (only the SmallFloat norm byte) — callers needing exact dl
    join doc_stats on doc_id."""

    def dec(batches):
        from ..functions.codec import decode_block
        from ..functions.similarity import LENGTH_TABLE as LT

        for b in batches:
            if not len(b):
                continue
            terms, docs, tfs, dlq = [], [], [], []
            for r in b.itertuples():  # loop over blocks, not postings
                d, t, nb = decode_block(r.first_doc, r.doc_bytes, r.tf_bytes, r.norm_bytes)
                terms.append(np.repeat(r.term, d.size))
                docs.append(d)
                tfs.append(t)
                dlq.append(LT[nb])
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(docs),
                    "tf": np.concatenate(tfs),
                    "dl_quant": np.concatenate(dlq),
                }
            )

    return blocks.mapInPandas(
        dec, "term string, doc_id long, tf long, dl_quant long"
    )


def write_blocks(blocks: DataFrame, path: str) -> None:
    """Persist block postings partitioned for query-side pruning: sorted by
    (term, bucket_id) inside files so parquet min/max stats prune term
    lookups without reading pages.

    The shuffle key is (term, bucket_id) — the same salt the encode path
    groups by — NOT term alone: with the default empty stopword file a
    hot term ("the") holds postings in ~half of all docs, and hashing by
    term would funnel that term's entire multi-GB block set into one
    write task. Per-file (term, bucket) sorting preserves the min/max
    pruning either way."""
    (
        blocks.repartition("term", "bucket_id")
        .sortWithinPartitions("term", "bucket_id", "block_id")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Query: block-max WAND
# ---------------------------------------------------------------------------


def bm25_topk_wand(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    bucket_batch: int = 64,
    fast_path: bool = True,
) -> DataFrame:
    """Exact BM25 top-k over the compressed block index with bucket-level
    block-max pruning. Returns (doc_id, score) like ``bm25_topk``
    (quantized mode) — bit-identical scores, same tie-break."""
    spark = index.postings_flat.sparkSession
    blocks = index.postings_blocks
    if blocks is None:
        raise ValueError("call build_block_postings(index) first")
    if index.impact_k1 is not None and (
        float(k1) != index.impact_k1 or float(b) != index.impact_b
    ):
        # stored max_impact folds k1/b into the bound at encode time;
        # ub_scale only corrects avgdl drift, so a different similarity
        # would make the bounds invalid and silently drop true top-k docs
        raise ValueError(
            f"block impacts were encoded with k1={index.impact_k1}, "
            f"b={index.impact_b}; query with those values or re-encode "
            f"via build_block_postings(index, k1={k1}, b={b})"
        )
    out_schema = "doc_id long, score double"
    terms = analyze_query(query, index.profile)
    if not terms or index.n_docs == 0:
        return spark.createDataFrame([], out_schema)

    counts = Counter(terms)
    # index-level df memo (the analog of Lucene's cached term dictionary):
    # repeat queries skip the term_stats lookup job entirely
    looked = term_dfs(index, list(counts))
    dfs = {t: d for t, d in looked.items() if d > 0}
    weights = {
        t: float(mult) * idf(dfs[t], index.n_docs)
        for t, mult in counts.items()
        if t in dfs
    }
    if not weights:
        return spark.createDataFrame([], out_schema)
    avgdl = index.avgdl

    cand = blocks.filter(F.col("term").isin(list(weights)))

    sorted_terms = sorted(weights)

    # Deletion vector kept BUCKETED, never collected to the driver: group
    # deletes by bucket_id (same doc_id >> bucket_bits cut as the blocks)
    # into sorted per-bucket arrays and LEFT-join them onto the candidate
    # block rows, so each bucket scorer receives only its own slice — at
    # the 10^12-doc design point with 1% deletes the full vector is an
    # ~80 GB driver array, but a single bucket's slice is bounded by the
    # bucket width (2**bucket_bits docs). Deleted docs are zeroed INSIDE
    # the bucket scorer, BEFORE its per-bucket top-k cut: an anti-join
    # after the cut would silently drop live docs ranked just below
    # deleted ones. (Lucene analog: per-segment live-docs, not one global
    # bitset on the coordinator.)
    has_deletes = index.deletes is not None
    if has_deletes:
        # The bucket cut MUST use the width the blocks were built with:
        # guessing DEFAULT_BUCKET_BITS on an index whose metadata predates
        # the bucket_bits field but was built with a different width would
        # join delete slices onto the WRONG bucket_ids and silently
        # resurrect deleted docs in the results (ADVICE r3).
        if index.bucket_bits is None:
            raise ValueError(
                "index has pending deletes but no bucket_bits metadata; "
                "cannot bucket the deletion vector safely — rebuild the "
                "index (or re-write index_meta with the build-time "
                "bucket_bits) before querying with deletes"
            )
        bb = index.bucket_bits
        del_by_bucket = (
            index.deletes.select(
                F.shiftright("doc_id", bb).alias("bucket_id"), "doc_id"
            )
            .groupBy("bucket_id")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("_dels"))
        )
        cand = cand.join(del_by_bucket, "bucket_id", "left")

    def score_bucket(grp: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas: ONE complete bucket per call (a mapInPandas batch
        # could split a bucket and emit wrong partial sums).
        lo, hi = None, None
        per_term = {}
        for term, tg in grp.groupby("term"):
            tg = tg.sort_values("block_id")
            docs_l, tfs_l, norms_l = [], [], []
            for r in tg.itertuples():  # loop over BLOCKS, not postings
                d, t, nb = decode_block(
                    r.first_doc, r.doc_bytes, r.tf_bytes, r.norm_bytes
                )
                docs_l.append(d)
                tfs_l.append(t)
                norms_l.append(nb)
            docs = np.concatenate(docs_l)
            tfs = np.concatenate(tfs_l).astype(np.float64)
            dlq = LENGTH_TABLE[np.concatenate(norms_l)].astype(np.float64)
            per_term[term] = (docs, tfs, dlq)
            lo = docs.min() if lo is None else min(lo, docs.min())
            hi = docs.max() if hi is None else max(hi, docs.max())
        scores = np.zeros(int(hi - lo + 1))
        # dense accumulation in sorted-term order == the exhaustive
        # scorer's fold order -> bit-identical floats.
        for t in sorted_terms:
            if t not in per_term:
                continue
            docs, tfs, dlq = per_term[t]
            scores[docs - lo] += weights[t] * tfs / (
                tfs + k1 * (1.0 - b + b * dlq / avgdl)
            )
        if has_deletes:
            dels = grp["_dels"].iloc[0]
            # null array (bucket with no deletes) arrives as None or NaN
            if isinstance(dels, (list, tuple, np.ndarray)) and len(dels):
                da = np.asarray(dels, dtype=np.int64)
                hit = da[np.searchsorted(da, lo): np.searchsorted(da, hi, side="right")]
                if hit.size:
                    scores[hit - lo] = 0.0
        nz = np.flatnonzero(scores)
        if nz.size > k:
            # deterministic per-bucket cut: (score desc, doc_id asc).
            # argpartition alone is arbitrary among EXACT score ties
            # (identical docs tie bit-for-bit), and the survivor set then
            # diverges from the exhaustive scorer's doc_id tie-break.
            # nz is ascending, so a stable sort on -score preserves the
            # doc_id order within each tied score group.
            nz = nz[np.argsort(-scores[nz], kind="stable")[:k]]
        return pd.DataFrame({"doc_id": nz + lo, "score": scores[nz]})

    # Fast path: when the candidate posting count (known exactly from df)
    # is small, the UB-ordering pass costs more than it saves — score every
    # candidate bucket in ONE job. Rare-term queries are 1 Spark job warm.
    if fast_path and sum(dfs[t] for t in weights) <= 64 * k * max(1, len(weights)) * 32:
        scored_df = cand.groupBy("bucket_id").applyInPandas(
            lambda _key, g: score_bucket(g), "doc_id long, score double"
        )
        rows = sorted(
            ((float(r["score"]), int(r["doc_id"])) for r in scored_df.collect()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        return spark.createDataFrame(
            [(d, s) for s, d in rows], out_schema
        )

    cand = cand.persist()
    wdf = spark.createDataFrame(list(weights.items()), "term string, w double")
    # JVM-side bucket upper bounds from block metadata only (no decode).
    # Kept DISTRIBUTED: at the 10^12-doc design point this table is ~6e7
    # rows per query — collecting it whole would be a driver scale-killer.
    # Each round fetches only the next `bucket_batch` bounds via
    # orderBy(ub desc).limit(batch) (TakeOrderedAndProject: per-partition
    # heap + driver merge of <= batch rows) with the WAND threshold pushed
    # into the scan as a `ub > theta` filter, and a (ub, bucket_id) cursor
    # excluding already-scored buckets.
    # Stored max_impact was encoded with impacts_avgdl; if the query-time
    # avgdl has risen above it (deletes removed mostly-short docs, stats
    # recomputed at compaction), true impacts exceed the stored bound.
    # impact = tf/(tf + k1(1-b) + k1·b·dl/avgdl) grows by at most the
    # factor avgdl_q/avgdl_enc when avgdl rises, so scaling the bucket
    # bound by max(1, avgdl_q/avgdl_enc) keeps it a valid upper bound and
    # the WAND prune exact (ADVICE r2: the unscaled bound could drop true
    # top-k buckets).
    enc_avgdl = index.impacts_avgdl if index.impacts_avgdl else avgdl
    ub_scale = max(1.0, avgdl / enc_avgdl) if enc_avgdl else 1.0
    ub_df = (
        cand.join(F.broadcast(wdf), "term")
        .groupBy("bucket_id", "term")
        .agg(F.max(F.col("w") * F.col("max_impact")).alias("tub"))
        .groupBy("bucket_id")
        .agg((F.sum("tub") * F.lit(ub_scale)).alias("ub"))
        .persist()
    )

    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    cursor: tuple[float, int] | None = None  # (ub, bucket_id) of last taken
    while True:
        nxt = ub_df
        if cursor is not None:
            last_ub, last_bid = cursor
            nxt = nxt.filter(
                (F.col("ub") < last_ub)
                | ((F.col("ub") == last_ub) & (F.col("bucket_id") > last_bid))
            )
        th = theta()
        if th > float("-inf"):
            # prune with >=, not >: a bucket whose bound is EXACTLY theta
            # can still hold a doc at score theta with a smaller doc_id,
            # which wins the (score desc, doc_id asc) tie-break — the same
            # comparison the heap itself uses. Strict > here would drop
            # that doc and diverge from the exhaustive scorer on ties.
            nxt = nxt.filter(F.col("ub") >= th)  # WAND prune, pushed down
        batch_rows = (
            nxt.orderBy(F.col("ub").desc(), F.col("bucket_id").asc())
            .limit(bucket_batch)
            .collect()
        )
        if not batch_rows:
            break  # WAND stop: no remaining bucket can reach the top-k
        batch = [int(r["bucket_id"]) for r in batch_rows]
        cursor = (float(batch_rows[-1]["ub"]), batch[-1])
        scored_df = (
            cand.filter(F.col("bucket_id").isin(batch))
            .groupBy("bucket_id")
            .applyInPandas(
                lambda _key, g: score_bucket(g), "doc_id long, score double"
            )
        )
        for r in scored_df.collect():
            item = (r["score"], -int(r["doc_id"]))
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    ub_df.unpersist()
    cand.unpersist()

    result = sorted(((s, -nd) for s, nd in heap), key=lambda x: (-x[0], x[1]))
    return spark.createDataFrame(
        [(int(d), float(s)) for s, d in result], out_schema
    )
