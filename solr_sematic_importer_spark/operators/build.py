"""Inverted-index build (SURVEY §3.1 "Our Spark equivalent").

Replaces the reference's scan -> enrich -> publish -> Solr-add pipeline
(``SolrSemanticIndexer.java:97-99,217-224`` page loop; destination Lucene
index implied by ``SolrSemanticIndexer.java:103``) with declarative
DataFrame stages Catalyst can optimize end-to-end:

    input table
      -> assign_doc_ids            (two-pass zip-with-index, docid.py)
      -> analyze (Arrow pandas_udf, one batch per call)
      -> explode tokens            (JVM-side posexplode)
      -> tf  = groupBy(doc, term)  (partial+final hash agg, map-side combine)
      -> df  = groupBy(term)       (exact docfreq — rank-identity needs exact)
      -> doc_stats / index_meta    (N, avgdl from exact long sums)

The "flat postings" table produced here — one row per (term, doc_id, tf,
dl, dl_quant) — is the logical index; ``codec.py`` packs it into sorted
delta+varint block postings for the scale path, and ``score.py`` runs BM25
over either representation with identical results.

dl is denormalized into the postings rows at build time (SURVEY §2.3 J4)
so query-time scoring needs no doc_stats join. Both the exact dl and the
Lucene-quantized dl (SmallFloat byte norm, similarity.py) are carried;
quantized is what Solr's BM25 actually scores with.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..functions.analyzer import make_analyze_udf
from ..functions.similarity import LENGTH_TABLE
from .docid import assign_doc_ids


def quantize_dl_col(dl: Column) -> Column:
    """Lucene SmallFloat norm quantization dl -> decode(encode(dl)) as a pure
    JVM expression: the largest LENGTH_TABLE entry <= dl, found by scanning
    the 256-entry literal table inside whole-stage codegen. Keeps the build's
    hot path free of a second Python round-trip (the analyzer UDF is the only
    Python stage)."""
    table = F.lit([int(v) for v in LENGTH_TABLE])
    return F.array_max(F.filter(table, lambda x: x <= dl)).cast("long")


@dataclass
class InvertedIndex:
    """Logical inverted index: a handle of DataFrames plus scalar stats."""

    doc_stats: DataFrame       # doc_id, <key cols...>, dl, dl_quant
    postings_flat: DataFrame   # term, doc_id, tf, dl, dl_quant
    term_stats: DataFrame      # term, df, ttf
    n_docs: int
    sum_dl: int
    profile: str
    key_cols: Sequence[str] = field(default_factory=tuple)
    postings_blocks: DataFrame | None = None   # codec.py output (scale path)

    @property
    def avgdl(self) -> float:
        # Lucene: sumTotalTermFreq / docCount as double division of exact longs
        return self.sum_dl / self.n_docs if self.n_docs else 0.0


def build_index(
    df: DataFrame,
    text_col: str = "text",
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    profile: str = "text_en",
    doc_id_col: str | None = None,
) -> InvertedIndex:
    """Build the logical index. If ``doc_id_col`` is given it is used as the
    (already dense/stable) document id; otherwise ids are assigned by global
    ``(key_cols)`` rank via the two-pass zip-with-index."""
    key_cols = list(key_cols)
    analyze = make_analyze_udf(profile)

    if doc_id_col is None:
        with_ids = assign_doc_ids(df, key_cols=key_cols)
        id_col = "doc_id"
    else:
        with_ids = df
        id_col = doc_id_col

    # The analyzer UDF is the expensive Python stage: run it exactly ONCE,
    # persist its output, and derive doc_stats / postings / corpus stats from
    # the cache (previously doc_stats and postings each re-ran the UDF).
    analyzed = with_ids.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *[F.col(c) for c in key_cols if c != id_col],
        analyze(F.col(text_col)).alias("_toks"),
    ).withColumn("dl", F.size("_toks").cast("long"))
    analyzed = analyzed.withColumn("dl_quant", quantize_dl_col(F.col("dl")))
    analyzed.persist()

    doc_stats = analyzed.drop("_toks")

    # dl/dl_quant are functionally dependent on doc_id -> grouping by them is
    # free and saves the doc_stats join at scoring time (SURVEY §2.3 J4).
    # Map-side partial agg means the shuffle carries only DISTINCT
    # (doc, term) pairs, not every token occurrence.
    postings_flat = (
        analyzed.select("doc_id", "dl", "dl_quant", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "dl", "dl_quant", "term")
        .agg(F.count("*").alias("tf"))
        .select("term", "doc_id", "tf", "dl", "dl_quant")
    )
    postings_flat.persist()

    # term_stats is the query-time idf dictionary: vocab-sized (small), hit
    # by every query — keep it hot so a query never re-aggregates postings.
    term_stats = postings_flat.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("ttf")
    )
    term_stats.persist()

    stats = analyzed.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
    ).first()

    return InvertedIndex(
        doc_stats=doc_stats,
        postings_flat=postings_flat,
        term_stats=term_stats,
        n_docs=int(stats["n"]),
        sum_dl=int(stats["s"]),
        profile=profile,
        key_cols=tuple(key_cols),
    )


def write_index(index: InvertedIndex, path: str) -> None:
    """Persist the index tables as parquet dirs (Iceberg tables when a
    catalog is configured — same writer API via ``writeTo``)."""
    index.doc_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")
    index.postings_flat.write.mode("overwrite").parquet(f"{path}/postings_flat")
    index.term_stats.write.mode("overwrite").parquet(f"{path}/term_stats")
    if index.postings_blocks is not None:
        from .block_postings import write_blocks

        write_blocks(index.postings_blocks, f"{path}/postings_blocks")
    meta = index.doc_stats.sparkSession.createDataFrame(
        [
            ("n_docs", str(index.n_docs)),
            ("sum_dl", str(index.sum_dl)),
            ("profile", index.profile),
            ("key_cols", ",".join(index.key_cols)),
        ],
        "key string, value string",
    )
    meta.write.mode("overwrite").parquet(f"{path}/index_meta")


def read_index(spark: SparkSession, path: str) -> InvertedIndex:
    meta = {r["key"]: r["value"] for r in spark.read.parquet(f"{path}/index_meta").collect()}
    try:  # optional component; works on any Hadoop-compatible filesystem
        blocks = spark.read.parquet(f"{path}/postings_blocks")
    except Exception:
        blocks = None
    return InvertedIndex(
        postings_blocks=blocks,
        doc_stats=spark.read.parquet(f"{path}/doc_stats"),
        postings_flat=spark.read.parquet(f"{path}/postings_flat"),
        term_stats=spark.read.parquet(f"{path}/term_stats"),
        n_docs=int(meta["n_docs"]),
        sum_dl=int(meta["sum_dl"]),
        profile=meta["profile"],
        key_cols=tuple(meta["key_cols"].split(",")) if meta["key_cols"] else (),
    )
