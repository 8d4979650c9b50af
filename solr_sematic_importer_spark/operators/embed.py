"""Embedding operators (SURVEY §2.9 C2/C3): text -> dense vector.

The reference's entire semantic pipeline is text -> chunk -> embedding ->
vector collection: single-doc embed calls in
``InlineDocumentListener.java:101-104`` and BATCHED calls of
``vector-batch-size`` texts (default 3, yml sets 4) in
``ChunkDocumentListener.java:97-102,136-139`` + ``application.yml:38``,
with the embedding service behind gRPC. Spark-first mapping:

* the gRPC client boundary becomes an EMBEDDER REGISTRY — any callable
  ``(list[str]) -> np.ndarray[(n, dim), float32]``. The Arrow record
  batch is the transport batch (the vectorization the reference never
  had); within a batch the kernel still sub-batches to ``batch_size`` to
  honor the service-side contract (a real model server has a max batch).
* the default embedder is a DETERMINISTIC STUB (no model runtimes in
  this container): feature-hashing of analyzer tokens into ``dim``
  signed buckets, L2-normalized — the published hashing-trick
  construction. It exercises the real dataflow (schema, batching,
  Arrow shapes, ANN integration) and is swappable for a real model
  client in one registry entry; nothing in the plan changes.
* dimension probing/validation mirrors
  ``SolrDestinationCollectionValidationService.java:78-92`` (probe with
  "Dummy") and ``VectorFieldValidator.java:38-82`` (declared dim /
  similarity checks) as ``probe_dim`` / ``validate_vector_field``.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

DEFAULT_DIM = 384          # default-chunk-config.zip -> managed-schema.xml:13
DEFAULT_BATCH_SIZE = 4     # application.yml:38 vector-batch-size
SUPPORTED_SIMILARITIES = ("cosine", "dot_product", "euclidean")

Embedder = Callable[[list[str]], np.ndarray]


def _token_hash(tok: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little"
    )


def make_hash_embedder(dim: int = DEFAULT_DIM, seed: int = 42) -> Embedder:
    """Deterministic stub embedder: signed feature hashing of simple-profile
    tokens, L2-normalized. Near-identical texts get near-identical vectors
    (cosine tracks token overlap), so ANN behavior over these vectors is
    meaningful, not noise."""
    from ..functions.analyzer import PROFILES

    analyze = PROFILES["simple"]
    memo: dict[str, int] = {}

    def embed(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            for tok in analyze(t or ""):
                h = memo.get(tok)
                if h is None:
                    h = memo[tok] = _token_hash(tok) ^ seed
                out[i, h % dim] += 1.0 if (h >> 32) & 1 else -1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out

    return embed


EMBEDDERS: dict[str, Callable[..., Embedder]] = {
    # registry: swap in a real model client here; signature unchanged
    "hash": make_hash_embedder,
}


def probe_dim(embedder: Embedder) -> int:
    """Discover the embedder's output dimension by probing with "Dummy" —
    exactly the reference's dim discovery
    (``SolrDestinationCollectionValidationService.java:78-92``)."""
    v = embedder(["Dummy"])
    if v.ndim != 2 or v.shape[0] != 1:
        raise ValueError(f"embedder returned shape {v.shape}, want (1, dim)")
    return int(v.shape[1])


def validate_vector_field(
    df: DataFrame, col: str, dim: int, similarity: str = "cosine",
    sample: int = 100,
) -> None:
    """``VectorFieldValidator.java:38-82,172-199`` analog: the vector
    column must exist, be array<float|double>, and every sampled row must
    carry exactly ``dim`` non-null components; similarity must be one of
    the supported functions. Raises ValueError otherwise."""
    if similarity not in SUPPORTED_SIMILARITIES:
        raise ValueError(
            f"similarity '{similarity}' not in {SUPPORTED_SIMILARITIES}"
        )
    if col not in df.columns:
        raise ValueError(f"vector field '{col}' missing from {df.columns}")
    dt = dict(df.dtypes)[col]
    if dt not in ("array<float>", "array<double>"):
        raise ValueError(f"vector field '{col}' has type {dt}, want array<float>")
    # NULL-safe: size(NULL) is NULL and `NULL != dim` drops the row from
    # the filter, so a NULL vector (or a null component) would count as
    # VALID without the explicit isNull arms
    has_null_comp = F.exists(F.col(col), lambda x: x.isNull())
    bad = (
        df.filter(
            F.col(col).isNull()
            | (F.size(col) != dim)
            | has_null_comp
        )
        .limit(sample)
        .count()
    )
    if bad:
        raise ValueError(
            f"vector field '{col}': {bad}+ sampled rows violate dim={dim}"
        )


def embed_texts(
    df: DataFrame,
    text_col: str = "chunk",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    batch_size: int = DEFAULT_BATCH_SIZE,
    embedder: Embedder | str = "hash",
    drop_null: bool = True,
) -> DataFrame:
    """C3 batched embedding over ``mapInPandas``: one Python stage, Arrow
    transport, sub-batched to ``batch_size`` texts per embedder call (the
    reference's ``vector-batch-size`` service contract,
    ``ChunkDocumentListener.java:97-102``). Null/empty texts are skipped
    (not embedded) per the null-field skip P7
    (``ChunkDocumentListener.java:76-80``) when ``drop_null``.

    Scale shape: narrow stage (no shuffle), compute-bound, parallel per
    input partition; the output column is ``array<float>`` ready for the
    ANN operators (similarity_search.py) or an Iceberg vector table.
    """
    emb = EMBEDDERS[embedder](dim=dim) if isinstance(embedder, str) else embedder
    if drop_null:
        df = df.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            # fillna first: astype(str) stringifies missing values to the
            # literal 'None'/'nan', which would give every null doc the
            # same non-zero hash vector (mutual false nearest neighbors)
            texts = b[text_col].fillna("").astype(str).tolist()
            vecs = np.concatenate(
                [
                    emb(texts[i : i + batch_size])
                    for i in range(0, len(texts), batch_size)
                ]
            )
            out = b.copy()
            out[out_col] = [v for v in vecs.astype(np.float32)]
            yield out

    return df.mapInPandas(kernel, schema)


def chunk_and_embed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 120,
    overlap: int = 20,
    dim: int = DEFAULT_DIM,
    batch_size: int = DEFAULT_BATCH_SIZE,
    embedder: Embedder | str = "hash",
) -> DataFrame:
    """The reference's chunk branch end-to-end
    (``ChunkDocumentListener.java:89-156``): parent docs -> char chunks
    (C1) -> child chunk-docs with ids ``parent#0000000`` (C4/F4/F5) ->
    batched embeddings (C3). Returns the chunk-doc table with the vector
    column, the shape of the per-field vector collection."""
    from .chunking import char_chunks

    ch = char_chunks(docs, text_col=text_col, id_col=id_col, size=size, overlap=overlap)
    out = embed_texts(
        ch, text_col="chunk", dim=dim, batch_size=batch_size, embedder=embedder
    )
    validate_vector_field(out.limit(0), "embedding", dim)  # schema-level check
    return out
