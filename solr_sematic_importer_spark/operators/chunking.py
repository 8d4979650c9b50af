"""Chunking operators (SURVEY §2.9): the reference's gRPC chunker
(``ChunkDocumentListener.java:131-134``, size=300/overlap=30 per
``application.yml:86-88``) and chunk-doc constructor
(``ChunkDocumentListener.java:141-156``: ``id = parent#%07d`` child rows)
re-expressed as declarative column ops + posexplode."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def char_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 300,
    overlap: int = 30,
) -> DataFrame:
    """Child rows: (id, parent_id, chunk, chunk_number).

    Sliding character windows with overlap; id = parent + '#' + %07d
    (``ChunkDocumentListener.java:142`` lpad semantics). posexplode of a
    sequence keeps it one narrow stage — no shuffle, no UDF.
    """
    step = size - overlap
    n = F.greatest(
        F.lit(1), F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(step)).cast("int")
    )
    return df.select(
        F.col(id_col).alias("parent_id"),
        F.col(text_col),
        F.posexplode(F.sequence(F.lit(0), n - 1)).alias("chunk_number", "_i"),
    ).select(
        F.concat_ws(
            "#",
            F.col("parent_id").cast("string"),
            F.lpad(F.col("chunk_number").cast("string"), 7, "0"),
        ).alias("id"),
        "parent_id",
        F.substring(F.col(text_col), F.col("chunk_number") * step + 1, size).alias("chunk"),
        F.col("chunk_number").cast("int").alias("chunk_number"),
    )


def token_window_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 300,
    overlap: int = 30,
) -> DataFrame:
    """Token-window variant (whitespace tokens), same child-row contract —
    mirrors the mock chunker semantics (``grpc/ChunkServiceMock.java:58-69``:
    fixed-size word windows with overlap carry)."""
    step = size - overlap
    toks = F.split(F.col(text_col), "\\s+")
    n = F.greatest(F.lit(1), F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(step)).cast("int"))
    return df.select(
        F.col(id_col).alias("parent_id"),
        toks.alias("_toks"),
        F.posexplode(F.sequence(F.lit(0), n - 1)).alias("chunk_number", "_i"),
    ).select(
        F.concat_ws(
            "#",
            F.col("parent_id").cast("string"),
            F.lpad(F.col("chunk_number").cast("string"), 7, "0"),
        ).alias("id"),
        "parent_id",
        F.concat_ws(" ", F.slice(F.col("_toks"), F.col("chunk_number") * step + 1, size)).alias("chunk"),
        F.col("chunk_number").cast("int").alias("chunk_number"),
    )


def join_chunks_to_parents(
    chunks: DataFrame, parents: DataFrame, parent_id_col: str = "doc_id", broadcast_parents: bool = False
) -> DataFrame:
    """J1 parent<->chunk re-association (``ChunkDocumentListener.java:147``).

    Broadcast when the parent side is a small dim; sort-merge otherwise —
    leave the choice to AQE unless forced."""
    p = F.broadcast(parents) if broadcast_parents else parents
    return chunks.join(p, chunks["parent_id"] == p[parent_id_col], "inner")
