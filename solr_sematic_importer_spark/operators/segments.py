"""Log-structured segments, lineage manifest, resume, and compaction.

The reference's crawl lifecycle — tracker counters, completion barrier,
commit (``SolrSemanticIndexer.java:92-94,102-166``; ``tracker/
IndexingTracker.java:19-35,109-128``) and Lucene's internal segment merging
— maps to an explicit log-structured index here (SURVEY §4.1 "index
structure maintenance", north_rule "resumable from checkpoint with
per-partition lineage + metrics"):

* ``append_segment(key, df)`` builds one index segment for one input slice
  (a crawl page range / ingest batch). Doc ids continue from the previous
  segment's end, so the global id order is arrival order of segments, and
  (conv_id, turn_idx) order within a segment.
* A parquet ``manifest`` table records one row per completed segment:
  rows, doc-id offset, token counts, wall seconds, an order-independent
  xxhash64 content checksum, per-stage throughput — lineage + metrics.
  A segment is written BEFORE its manifest row (write-ahead order), so a
  crash leaves at worst an orphan directory, never a manifest entry
  pointing at missing data. Re-running ``append_segment`` with a key the
  manifest already contains SKIPS the build entirely — no re-tokenization
  of completed partitions (resume test in tests/test_segments.py). On
  Iceberg the manifest append becomes an atomic snapshot commit; on a
  plain filesystem it is a parquet append into its own directory.
* ``read_segmented_index`` exposes the union of live segments as one
  logical InvertedIndex (term_stats re-aggregated; block postings
  unioned — valid because segment doc-ranges are disjoint and ascending).
* ``compact`` is the LSM merge: segments' block postings become one
  segment. Only (term, bucket) groups that span MULTIPLE segments (the
  bucket cut by a segment boundary, or undersized tail blocks) are
  decoded and re-encoded; single-segment groups are copied through
  without touching the binary payload — the merge job's shuffle is
  proportional to the overlap, not the index size.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.similarity import B_DEFAULT, K1_DEFAULT
from .block_postings import (
    BLOCKS_SCHEMA,
    DEFAULT_BUCKET_BITS,
    build_block_postings,
)
from .build import InvertedIndex, build_index

MANIFEST_SCHEMA = (
    "segment_key string, segment_dir string, n_docs long, doc_id_offset long, "
    "sum_dl long, n_terms long, wall_s double, docs_per_sec double, "
    "checksum long, profile string, bucket_bits int, created_ts double"
)


def _manifest_path(path: str) -> str:
    return f"{path}/manifest"


def read_manifest(spark: SparkSession, path: str) -> pd.DataFrame:
    try:
        return (
            spark.read.parquet(_manifest_path(path))
            .orderBy("doc_id_offset")
            .toPandas()
        )
    except Exception:
        import pandas as pd  # noqa: F811

        return pd.DataFrame(
            columns=[f.split()[0] for f in MANIFEST_SCHEMA.split(", ")]
        )


def _content_checksum(df: DataFrame, key_cols, text_col) -> int:
    """Order-independent lineage checksum: XOR of xxhash64 over rows
    (sum would overflow int64 under ANSI mode; keys are unique so XOR
    cancellation is not a concern)."""
    h = df.select(
        F.xxhash64(*[F.col(c) for c in key_cols], F.col(text_col)).alias("h")
    ).agg(F.expr("bit_xor(h)")).first()[0]
    return int(h if h is not None else 0)


@dataclass
class AppendResult:
    segment_key: str
    skipped: bool
    n_docs: int
    doc_id_offset: int


def append_segment(
    spark: SparkSession,
    path: str,
    segment_key: str,
    df: DataFrame,
    text_col: str = "text",
    key_cols=("conv_id", "turn_idx"),
    profile: str = "text_en",
    bucket_bits: int = DEFAULT_BUCKET_BITS,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> AppendResult:
    """Build + commit one segment; no-op if ``segment_key`` is already in
    the manifest (checkpoint resume)."""
    man = read_manifest(spark, path)
    if len(man) and (man["segment_key"] == segment_key).any():
        row = man[man["segment_key"] == segment_key].iloc[0]
        return AppendResult(segment_key, True, int(row["n_docs"]), int(row["doc_id_offset"]))

    offset = int((man["n_docs"].sum()) if len(man) else 0)
    seg_dir = f"{path}/segments/{segment_key}"
    t0 = time.perf_counter()

    idx = build_index(
        df, text_col=text_col, key_cols=key_cols,
        profile=profile, doc_id_offset=offset,
    )
    build_block_postings(idx, bucket_bits=bucket_bits, k1=k1, b=b)

    # segment data first (write-ahead), manifest row second
    from .build import write_index

    write_index(idx, seg_dir)
    wall = time.perf_counter() - t0
    checksum = _content_checksum(df, list(key_cols), text_col)
    n_terms = idx.term_stats.count()
    row = [
        (
            segment_key, seg_dir, idx.n_docs, offset, idx.sum_dl,
            int(n_terms), float(wall),
            float(idx.n_docs / wall if wall else 0.0),
            checksum, profile, int(bucket_bits), time.time(),
        )
    ]
    spark.createDataFrame(row, MANIFEST_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(_manifest_path(path))
    return AppendResult(segment_key, False, idx.n_docs, offset)


def read_segmented_index(spark: SparkSession, path: str) -> InvertedIndex:
    """Union of all committed segments as one logical index."""
    man = read_manifest(spark, path)
    if not len(man):
        raise ValueError(f"no committed segments under {path}")
    dirs = list(man["segment_dir"])
    doc_stats = spark.read.parquet(*[f"{d}/doc_stats" for d in dirs])
    postings_flat = spark.read.parquet(*[f"{d}/postings_flat" for d in dirs])
    blocks = None
    try:
        blocks = spark.read.parquet(*[f"{d}/postings_blocks" for d in dirs])
    except Exception:
        pass
    term_stats = (
        spark.read.parquet(*[f"{d}/term_stats" for d in dirs])
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
    )
    term_stats.persist()
    profile = str(man["profile"].iloc[0])
    key_cols_df = [c for c in doc_stats.columns if c not in ("doc_id", "dl", "dl_quant")]
    return InvertedIndex(
        doc_stats=doc_stats,
        postings_flat=postings_flat,
        term_stats=term_stats,
        n_docs=int(man["n_docs"].sum()),
        sum_dl=int(man["sum_dl"].sum()),
        profile=profile,
        key_cols=tuple(["doc_id", *key_cols_df]),
        postings_blocks=blocks,
    )


def compact(
    spark: SparkSession,
    path: str,
    out_key: str = "compacted",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> str:
    """LSM merge of all committed segments into one. Returns the new
    segment dir. Only (term, bucket) groups present in >1 segment are
    re-encoded; the rest of the block table is copied through unchanged."""
    import numpy as np

    from ..functions.codec import decode_block, encode_blocks
    from ..functions.similarity import LENGTH_TABLE

    man = read_manifest(spark, path)
    if len(man) < 2:
        raise ValueError("need >=2 segments to compact")
    dirs = list(man["segment_dir"])
    avgdl = float(man["sum_dl"].sum()) / float(man["n_docs"].sum())

    blocks = spark.read.parquet(*[f"{d}/postings_blocks" for d in dirs]).withColumn(
        "_seg", F.regexp_extract(F.input_file_name(), r"segments/([^/]+)/", 1)
    )
    overlap = (
        blocks.groupBy("term", "bucket_id")
        .agg(F.countDistinct("_seg").alias("nseg"))
        .filter(F.col("nseg") > 1)
        .select("term", "bucket_id")
    )
    overlap.persist()

    passthrough = blocks.join(overlap, ["term", "bucket_id"], "left_anti").drop("_seg")

    def reencode(grp: pd.DataFrame) -> pd.DataFrame:
        term = grp["term"].iloc[0]
        bucket = int(grp["bucket_id"].iloc[0])
        docs_l, tfs_l, norms_l = [], [], []
        for r in grp.sort_values(["first_doc"]).itertuples():
            d, t, nb = decode_block(r.first_doc, r.doc_bytes, r.tf_bytes, r.norm_bytes)
            docs_l.append(d)
            tfs_l.append(t)
            norms_l.append(nb)
        docs = np.concatenate(docs_l)
        order = np.argsort(docs, kind="stable")
        docs = docs[order]
        tfs = np.concatenate(tfs_l)[order]
        norms = np.concatenate(norms_l)[order]
        dlq = LENGTH_TABLE[norms].astype(np.float64)
        impacts = tfs / (tfs + k1 * (1.0 - b + b * dlq / avgdl))
        rows = [(term, bucket, *blk) for blk in encode_blocks(docs, tfs, norms, impacts)]
        return pd.DataFrame(rows, columns=[c.split()[0] for c in BLOCKS_SCHEMA.split(", ")])

    merged = (
        blocks.join(F.broadcast(overlap), ["term", "bucket_id"], "left_semi")
        .groupBy("term", "bucket_id")
        .applyInPandas(lambda _k, g: reencode(g), BLOCKS_SCHEMA)
    )

    out_dir = f"{path}/segments/{out_key}"
    passthrough.unionByName(merged).repartition("term").sortWithinPartitions(
        "term", "bucket_id", "block_id"
    ).write.mode("overwrite").parquet(f"{out_dir}/postings_blocks")

    # relational tables: plain unions / re-aggregation
    spark.read.parquet(*[f"{d}/doc_stats" for d in dirs]).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/doc_stats")
    spark.read.parquet(*[f"{d}/postings_flat" for d in dirs]).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/postings_flat")
    (
        spark.read.parquet(*[f"{d}/term_stats" for d in dirs])
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
        .write.mode("overwrite")
        .parquet(f"{out_dir}/term_stats")
    )
    meta = spark.createDataFrame(
        [
            ("n_docs", str(int(man["n_docs"].sum()))),
            ("sum_dl", str(int(man["sum_dl"].sum()))),
            ("profile", str(man["profile"].iloc[0])),
            ("key_cols", ""),
        ],
        "key string, value string",
    )
    meta.write.mode("overwrite").parquet(f"{out_dir}/index_meta")

    # new manifest: single compacted row (write to a fresh dir then swap)
    row = [
        (
            out_key, out_dir, int(man["n_docs"].sum()), 0,
            int(man["sum_dl"].sum()), -1,
            0.0, 0.0, int(np.bitwise_xor.reduce(man["checksum"].to_numpy(dtype=np.int64))),
            str(man["profile"].iloc[0]), int(man["bucket_bits"].iloc[0]),
            time.time(),
        )
    ]
    spark.createDataFrame(row, MANIFEST_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(_manifest_path(path))
    overlap.unpersist()
    return out_dir


def gc_segments(spark: SparkSession, path: str) -> list[str]:
    """Remove segment directories no longer referenced by the manifest
    (compact leaves the source segments on disk as orphans — the
    reference's disabled orphan delete, ``SolrSemanticIndexer.java:113``,
    made explicit). Returns the removed paths. On Iceberg this is snapshot
    expiration; here it is a local-filesystem sweep."""
    import os
    import shutil

    man = read_manifest(spark, path)
    live = {os.path.basename(d.rstrip("/")) for d in man["segment_dir"]}
    seg_root = os.path.join(path, "segments")
    removed = []
    if os.path.isdir(seg_root):
        for name in sorted(os.listdir(seg_root)):
            if name not in live:
                shutil.rmtree(os.path.join(seg_root, name), ignore_errors=True)
                removed.append(os.path.join(seg_root, name))
    return removed
