"""HNSW graph ANN (Q7): per-partition graphs (Lucene's graph-per-segment
shape), fan-out search + merge; recall vs brute force and determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.operators.hnsw import (
    HnswGraph,
    hnsw_build,
    hnsw_query,
)
from solr_sematic_importer_spark.operators.similarity_search import (
    brute_force_cosine_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf001):
    df = spark.read.parquet(f"{sf001}/embeddings.parquet").persist()
    df.count()
    return df


def test_single_graph_exactish(spark):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((500, 16)).astype(np.float32)
    g = HnswGraph(16, m=16, ef_construction=100)
    g.add_batch(np.arange(500), vecs)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    hits = 0
    for qi in range(20):
        got = {i for i, _ in g.search(vecs[qi], 10, ef=64)}
        true = set(np.argsort(-(vn @ vn[qi]))[:10].tolist())
        hits += len(got & true)
    assert hits / 200 >= 0.95
    # self-query: the vector itself is always rank 1 with cosine ~1
    top_id, top_sim = g.search(vecs[3], 1, ef=32)[0]
    assert top_id == 3 and top_sim == pytest.approx(1.0, abs=1e-5)


def test_distributed_recall_vs_brute_force(spark, emb):
    dim = len(emb.first()["embedding"])
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    true = [r["vec_id"] for r in brute_force_cosine_topk(emb, qv, k=10).collect()]

    graphs = hnsw_build(emb, dim, m=16, ef_construction=100, num_partitions=4)
    graphs = graphs.persist()
    n_graphs = graphs.count()
    assert n_graphs == graphs.select("part_id").distinct().count()  # 1 row/partition
    assert graphs.agg(F.sum("n")).first()[0] == emb.count()         # every vector indexed

    got = [r["vec_id"] for r in hnsw_query(graphs, qv, k=10, ef_search=128).collect()]
    assert len(set(got) & set(true)) >= 9  # recall@10 >= 0.9
    assert got[0] == true[0] == 0          # the query vector itself

    # deterministic: same build -> identical results
    graphs2 = hnsw_build(emb, dim, m=16, ef_construction=100, num_partitions=4)
    got2 = [r["vec_id"] for r in hnsw_query(graphs2, qv, k=10, ef_search=128).collect()]
    assert got == got2


def test_graph_segments_roundtrip_parquet(spark, emb, tmp_path):
    """The graph table is a durable index: write/read parquet, query after
    reload — Lucene's .hnsw segment files made explicit."""
    dim = len(emb.first()["embedding"])
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    graphs = hnsw_build(emb, dim, num_partitions=3)
    p = str(tmp_path / "hnsw")
    graphs.write.parquet(p)
    re = spark.read.parquet(p)
    a = [(r["vec_id"], round(r["cosine"], 6)) for r in hnsw_query(graphs, qv, k=5).collect()]
    b = [(r["vec_id"], round(r["cosine"], 6)) for r in hnsw_query(re, qv, k=5).collect()]
    assert a == b and a[0][0] == 7
