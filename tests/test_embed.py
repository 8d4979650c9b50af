"""Embedding surface (C2/C3): batched embed UDF with the deterministic
stub, vector-field validation (VectorFieldValidator.java:38-82 analog),
and the chunk -> embed -> ANN pipeline agreeing with brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.operators.embed import (
    DEFAULT_BATCH_SIZE,
    chunk_and_embed,
    embed_texts,
    make_hash_embedder,
    probe_dim,
    validate_vector_field,
)

TEXTS = [
    "merge sort runs over sorted windows of postings",
    "the quick brown fox jumps over the lazy dog",
    "merge sort runs over sorted windows of postings",  # dup of 0
    "distributed shuffle partitions by term and bucket",
    "",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_probe_dim_matches_contract():
    emb = make_hash_embedder(dim=96)
    assert probe_dim(emb) == 96


def test_embed_deterministic_normalized_and_null_skipped(spark, docs):
    out = embed_texts(docs, text_col="text", dim=64).collect()
    # P7 null/empty skip: the empty text is not embedded
    assert len(out) == len(TEXTS) - 1
    vecs = {r["doc_id"]: np.asarray(r["embedding"]) for r in out}
    assert all(v.shape == (64,) for v in vecs.values())
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-5 for v in vecs.values())
    # identical text -> identical vector; different text -> different
    assert np.array_equal(vecs[0], vecs[2])
    assert not np.array_equal(vecs[0], vecs[1])
    # deterministic across runs
    out2 = {
        r["doc_id"]: np.asarray(r["embedding"])
        for r in embed_texts(docs, text_col="text", dim=64).collect()
    }
    for k, v in vecs.items():
        assert np.array_equal(v, out2[k])


def test_embedder_called_in_vector_batch_size_chunks(spark):
    """C3 contract (application.yml:38 vector-batch-size): the embedder
    service never receives more than batch_size texts per call. An
    over-size call raises executor-side and fails the job."""
    base = make_hash_embedder(dim=16)

    def strict(texts):
        assert len(texts) <= DEFAULT_BATCH_SIZE, f"batch of {len(texts)}"
        return base(texts)

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text number "), F.col("id")).alias("text"),
    ).coalesce(1)
    got = embed_texts(df, text_col="text", dim=16, embedder=strict).count()
    assert got == 50


def test_validate_vector_field(spark, docs):
    good = embed_texts(docs, text_col="text", dim=32)
    validate_vector_field(good, "embedding", 32)
    with pytest.raises(ValueError, match="dim"):
        validate_vector_field(good, "embedding", 384)
    with pytest.raises(ValueError, match="missing"):
        validate_vector_field(good, "nope", 32)
    with pytest.raises(ValueError, match="type"):
        validate_vector_field(good.withColumn("embedding", F.lit("x")), "embedding", 32)
    with pytest.raises(ValueError, match="similarity"):
        validate_vector_field(good, "embedding", 32, similarity="manhattan")


def test_chunk_embed_ann_agrees_with_brute_force(spark, docs):
    """Full reference pipeline shape (ChunkDocumentListener.java:89-156):
    chunk -> batched embed -> vector search. IVF probing ALL clusters must
    reproduce the brute-force ranking exactly on the stub embeddings."""
    from solr_sematic_importer_spark.operators.similarity_search import (
        brute_force_cosine_topk,
        ivf_assign,
        ivf_cosine_topk,
        ivf_train_centroids,
    )

    chunks = chunk_and_embed(docs, size=30, overlap=5, dim=48)
    rows = chunks.collect()
    assert rows and all(r["id"].count("#") == 1 for r in rows)
    assert all(len(r["embedding"]) == 48 for r in rows)

    qv = make_hash_embedder(dim=48)(["sorted windows of postings"])[0].tolist()
    brute = brute_force_cosine_topk(
        chunks, qv, k=5, id_col="id"
    ).collect()
    cent = ivf_train_centroids(chunks, 48, n_clusters=4, iters=5)
    assigned = ivf_assign(chunks, cent)
    ivf_all = ivf_cosine_topk(
        assigned, cent, qv, k=5, nprobe=len(cent), id_col="id"
    ).collect()
    assert [(r["id"], round(r["cosine"], 9)) for r in ivf_all] == [
        (r["id"], round(r["cosine"], 9)) for r in brute
    ]
    # sanity: the top chunk comes from a doc containing the query words
    top_parent = int(brute[0]["id"].split("#")[0])
    assert top_parent in (0, 2)
