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


def test_routed_build_probe_recall(spark):
    """VERDICT r4 #7: content-routed graphs (one per coarse k-means
    cluster) + probe=m query the m nearest graphs only — recall@10 >= 0.9
    while searching under half the graphs. Clustered vectors (the regime
    routing exists for: real embedding corpora cluster; on uniform noise
    routing degenerates, which the docstring documents)."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 32)) * 3.0
    rows = []
    for i in range(480):
        c = i % 8
        v = centers[c] + rng.standard_normal(32) * 0.4
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").persist()
    emb.count()

    graphs = hnsw_build(emb, 32, route_clusters=8, m=16, ef_construction=100)
    graphs = graphs.persist()
    n_graphs = graphs.count()
    assert n_graphs <= 8
    assert graphs.agg(F.sum("n")).first()[0] == 480  # every vector indexed
    assert len(graphs.first()["centroid"]) == 32

    probe = 3
    assert probe < n_graphs
    hits = tot = 0
    for qid in (0, 5, 11, 22, 37):
        qv = rows[qid][1]
        true = {r["vec_id"] for r in brute_force_cosine_topk(emb, qv, k=10).collect()}
        got_rows = hnsw_query(graphs, qv, k=10, ef_search=128, probe=probe).collect()
        got = {r["vec_id"] for r in got_rows}
        assert got_rows[0]["vec_id"] == qid  # self is rank 1
        hits += len(true & got)
        tot += 10
    assert hits / tot >= 0.9

    # determinism: same routed build twice -> identical probed results
    graphs2 = hnsw_build(emb, 32, route_clusters=8, m=16, ef_construction=100)
    qv = rows[11][1]
    a = [(r["vec_id"], round(r["cosine"], 9))
         for r in hnsw_query(graphs, qv, k=10, probe=probe).collect()]
    b = [(r["vec_id"], round(r["cosine"], 9))
         for r in hnsw_query(graphs2, qv, k=10, probe=probe).collect()]
    assert a == b
    emb.unpersist()


def test_routed_build_ships_centroid_metadata(spark):
    """Zero-job probe routing: the routed build stashes its driver-known
    k-means centroids as column metadata, so hnsw_query(probe=m) never
    has to collect centroids from the (possibly unpersisted) graph table
    — which would build every graph once for routing and again for the
    probed search."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)) * 3.0
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.standard_normal(16) * 0.3])
        for i in range(160)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    graphs = hnsw_build(emb, 16, route_clusters=4, m=8, ef_construction=50)
    meta = graphs.schema["part_id"].metadata
    assert meta["route_dim"] == 16
    flat = meta["route_centroids_flat"]
    assert len(flat) == 4 * 16
    cents = [flat[i * 16:(i + 1) * 16] for i in range(4)]
    for c in cents:  # unit-normalized for the dot-product ranking
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9
    # probing over the UNPERSISTED lazy build works and finds self
    got = hnsw_query(graphs, rows[3][1], k=5, probe=2).collect()
    assert got and got[0]["vec_id"] == 3
