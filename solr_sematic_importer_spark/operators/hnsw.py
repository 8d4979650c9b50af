"""HNSW graph ANN (SURVEY §2.10 Q7): the reference's chunk collection
declares ``solr.DenseVectorField`` with hnsw/cosine/384-dim
(``default-chunk-config.zip -> managed-schema.xml:13``) and delegates KNN
to Lucene's HNSW codec. Lucene builds ONE GRAPH PER SEGMENT and answers a
query by searching every segment's graph and merging the top-k — which is
exactly the shape that distributes: here each Spark partition builds its
own in-memory HNSW graph (clean-room implementation of the published
Malkov & Yashunin algorithm), serialized as one row of a persistable
"graph segment" table; a query fans out over graph rows (mapInPandas, one
deserialize+search per row) and merges candidates with
TakeOrderedAndProject.

Scale shape: graph build is embarrassingly parallel (no shuffle beyond
the initial repartition); graph size per partition is bounded by
partition sizing, so search latency per segment is O(ef * log n_part);
the fan-out result is k rows per partition — driver merge is tiny.
Determinism: node levels derive from blake2b of the vector id, not an
RNG, so the graph (and results) are identical across parallelism levels.
"""

from __future__ import annotations

import hashlib
import math
import pickle
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

GRAPH_SCHEMA = "part_id int, n int, centroid array<double>, payload binary"


def _unit_mean(vecs: np.ndarray) -> "list[float]":
    """Routing centroid of a graph: normalized mean of its unit vectors."""
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    mean = (vecs / np.maximum(norms, 1e-12)).mean(axis=0)
    return (mean / max(float(np.linalg.norm(mean)), 1e-12)).astype(
        np.float64
    ).tolist()


def _level_for(vid: int, m_l: float) -> int:
    h = int.from_bytes(
        hashlib.blake2b(int(vid).to_bytes(8, "little"), digest_size=8).digest(),
        "little",
    )
    u = (h + 1) / (1 << 64)  # (0, 1]
    return int(-math.log(u) * m_l)


class HnswGraph:
    """Single in-memory HNSW index over unit-normalized vectors (cosine).
    Pure NumPy distances; adjacency as per-layer dict[int, list[int]]."""

    def __init__(self, dim: int, m: int = 16, ef_construction: int = 100):
        self.dim = dim
        self.m = m
        self.m0 = 2 * m
        self.efc = ef_construction
        self.m_l = 1.0 / math.log(m)
        self.vecs = np.zeros((0, dim), dtype=np.float32)
        self.ids: list[int] = []
        self.layers: list[dict[int, list[int]]] = []  # node -> neighbors
        self.entry: int | None = None

    # -- internals ---------------------------------------------------------

    def _dist(self, q: np.ndarray, nodes) -> np.ndarray:
        return 1.0 - self.vecs[nodes] @ q  # cosine distance on unit vectors

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, layer: int):
        """Greedy beam search; returns [(dist, node)] sorted ascending."""
        import heapq

        d0 = float(self._dist(q, [entry])[0])
        visited = {entry}
        cand = [(d0, entry)]                 # min-heap by distance
        best = [(-d0, entry)]                # max-heap (neg) of current ef
        adj = self.layers[layer]
        while cand:
            d, node = heapq.heappop(cand)
            if d > -best[0][0]:
                break
            neigh = [x for x in adj.get(node, ()) if x not in visited]
            if not neigh:
                continue
            visited.update(neigh)
            for nd, x in zip(self._dist(q, neigh), neigh):
                nd = float(nd)
                if len(best) < ef or nd < -best[0][0]:
                    heapq.heappush(cand, (nd, x))
                    heapq.heappush(best, (-nd, x))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted((-nd, x) for nd, x in best)

    def _select(self, cands, m):
        return [x for _, x in cands[:m]]

    def _link(self, layer: int, a: int, bs: list[int]):
        adj = self.layers[layer]
        adj[a] = bs
        cap = self.m0 if layer == 0 else self.m
        for b in bs:
            lst = adj.setdefault(b, [])
            lst.append(a)
            if len(lst) > cap:  # prune: keep the closest
                d = self._dist(self.vecs[b], lst)
                order = np.argsort(d, kind="stable")[:cap]
                adj[b] = [lst[i] for i in order]

    # -- public ------------------------------------------------------------

    def add_batch(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        base = len(self.ids)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = (vecs / np.maximum(norms, 1e-12)).astype(np.float32)
        self.vecs = np.vstack([self.vecs, vecs])
        self.ids.extend(int(i) for i in ids)
        for j in range(len(ids)):
            self._insert(base + j)

    def _insert(self, node: int) -> None:
        level = _level_for(self.ids[node], self.m_l)
        old_top = len(self.layers) - 1  # before extension; -1 when empty
        while len(self.layers) <= level:
            self.layers.append({})
        q = self.vecs[node]
        if self.entry is None:
            self.entry = node
            for l in range(level + 1):
                self.layers[l][node] = []
            return
        ep = self.entry
        # greedy descent through layers above the node's level
        for l in range(old_top, level, -1):
            if self.layers[l]:
                ep = self._search_layer(q, ep, 1, l)[0][1]
        for l in range(min(level, old_top), -1, -1):
            if not self.layers[l]:
                self.layers[l][node] = []
                continue
            cands = self._search_layer(q, ep, self.efc, l)
            m = self.m0 if l == 0 else self.m
            self._link(l, node, self._select(cands, m))
            ep = cands[0][1]
        for l in range(old_top + 1, level + 1):
            self.layers[l].setdefault(node, [])
        if level > old_top:
            self.entry = node

    def search(self, q: Sequence[float], k: int, ef: int = 64):
        """[(vec_id, cosine_similarity)] best-first."""
        if self.entry is None:
            return []
        qv = np.asarray(q, dtype=np.float32)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        ep = self.entry
        for l in range(len(self.layers) - 1, 0, -1):
            if self.layers[l]:
                ep = self._search_layer(qv, ep, 1, l)[0][1]
        found = self._search_layer(qv, ep, max(ef, k), 0)[:k]
        return [(self.ids[x], 1.0 - d) for d, x in found]

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "dim": self.dim, "m": self.m, "efc": self.efc,
                "vecs": self.vecs, "ids": self.ids,
                "layers": self.layers, "entry": self.entry,
            },
            protocol=4,
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "HnswGraph":
        d = pickle.loads(b)
        g = cls(d["dim"], d["m"], d["efc"])
        g.vecs, g.ids, g.layers, g.entry = d["vecs"], d["ids"], d["layers"], d["entry"]
        return g


def hnsw_build(
    df: DataFrame,
    dim: int,
    m: int = 16,
    ef_construction: int = 100,
    num_partitions: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    route_clusters: "int | None" = None,
    seed: int = 42,
) -> DataFrame:
    """Vectors -> graph-segment table (one HNSW graph per partition,
    Lucene's graph-per-segment layout). Persist the result with
    ``.write.parquet`` to make the index durable; rebuild is embarrassingly
    parallel. Every graph row carries a routing ``centroid`` (normalized
    mean of its unit vectors).

    ``route_clusters=C``: instead of id-hash placement, vectors are
    assigned to C coarse k-means clusters (the IVF quantizer) and ONE
    graph is built per CLUSTER — content-based placement, so a query can
    probe only the few graphs whose centroid is near it
    (``hnsw_query(probe=m)``), bounding query cost by m/C of the corpus
    the way Lucene bounds it per segment. With the default id-hash
    placement each graph is a uniform sample and routing cannot help;
    probe only makes sense over a routed build."""
    spark = df.sparkSession
    if route_clusters is not None:
        from .similarity_search import ivf_assign, ivf_train_centroids

        cent = ivf_train_centroids(
            df, dim, n_clusters=route_clusters, seed=seed, vec_col=vec_col
        )
        assigned = ivf_assign(df, cent, vec_col=vec_col, id_col=id_col)

        def build_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
            # sort by id: insertion order (hence the graph) is
            # deterministic regardless of shuffle arrival order
            pdf = pdf.sort_values(id_col)
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            g = HnswGraph(dim, m, ef_construction)
            g.add_batch(pdf[id_col].to_numpy(), vecs)
            return pd.DataFrame(
                {
                    "part_id": [int(pdf["cluster_id"].iloc[0])],
                    "n": [len(g.ids)],
                    "centroid": [_unit_mean(vecs)],
                    "payload": [g.to_bytes()],
                }
            )

        routed = (
            assigned.select(id_col, vec_col, "cluster_id")
            .groupBy("cluster_id")
            .applyInPandas(build_cluster, GRAPH_SCHEMA)
        )
        # The k-means routing centroids are already known DRIVER-side
        # (ivf_train_centroids runs on a bounded sample on the driver).
        # Stash them as column metadata, indexed by part_id==cluster_id,
        # so hnsw_query(probe=m) can rank routes with ZERO Spark jobs —
        # collecting them from the lazy applyInPandas result would build
        # every graph once for routing and again for the probed search.
        cent_unit = cent.astype(np.float64)
        norms = np.maximum(np.linalg.norm(cent_unit, axis=1, keepdims=True), 1e-12)
        cent_unit = cent_unit / norms
        # flat layout: Spark column Metadata supports arrays of doubles
        # but not arrays of arrays
        return routed.withMetadata(
            "part_id",
            {
                "route_dim": int(cent_unit.shape[1]),
                "route_centroids_flat": [float(x) for x in cent_unit.ravel()],
            },
        )

    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism // 2)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = HnswGraph(dim, m, ef_construction)
        all_vecs = []
        for b in batches:
            if not len(b):
                continue
            vecs = np.stack(b[vec_col].to_numpy()).astype(np.float32)
            all_vecs.append(vecs)
            g.add_batch(b[id_col].to_numpy(), vecs)
        if not all_vecs:
            return
        yield pd.DataFrame(
            {
                "part_id": [0],
                "n": [len(g.ids)],
                "centroid": [_unit_mean(np.vstack(all_vecs))],
                "payload": [g.to_bytes()],
            }
        )

    # repartition by id hash: uniform graph sizes, deterministic placement
    out = (
        df.select(id_col, vec_col)
        .repartition(num_partitions, id_col)
        .mapInPandas(build, GRAPH_SCHEMA)
        .withColumn("part_id", F.spark_partition_id().cast("int"))
    )
    return out


def hnsw_query(
    graphs: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    ef_search: int = 64,
    probe: "int | None" = None,
) -> DataFrame:
    """Fan-out search: every graph segment row answers with its local
    top-k; TakeOrderedAndProject merges to the global k (score desc,
    vec_id asc tie-break, matching the BM25 paths).

    ``probe=m``: rank the graphs' routing centroids against the query
    DRIVER-side (one tiny row per graph) and search only the m nearest
    graphs — IVF's nprobe applied at graph granularity. Meaningful over a
    content-routed build (``hnsw_build(route_clusters=...)``); over
    id-hash graphs every centroid is near the corpus mean and probing
    just truncates recall."""
    q = [float(x) for x in query_vec]
    if probe is not None:
        qn = np.asarray(q, dtype=np.float64)
        qn = qn / max(float(np.linalg.norm(qn)), 1e-12)
        try:
            meta = graphs.schema["part_id"].metadata or {}
        except (KeyError, TypeError):
            meta = {}
        flat = meta.get("route_centroids_flat")
        rdim = int(meta.get("route_dim", 0) or 0)
        if flat is not None and rdim:
            # zero-job routing: centroids came along as column metadata
            # from the routed build (part_id == centroid index)
            route = np.asarray(flat, dtype=np.float64).reshape(-1, rdim)
            sims = route @ qn
            ranked = sorted(range(len(route)), key=lambda i: (-float(sims[i]), i))
            keep = ranked[:probe]
        else:
            # fallback (e.g. metadata stripped by a foreign writer): one
            # tiny row per graph — but over a non-persisted routed build
            # this materializes every graph just to read its centroid, so
            # persist `graphs` first in that case.
            cents = graphs.select("part_id", "centroid").collect()
            ranked = sorted(
                cents,
                key=lambda r: (
                    -float(np.dot(np.asarray(r["centroid"], dtype=np.float64), qn)),
                    r["part_id"],
                ),
            )
            keep = [int(r["part_id"]) for r in ranked[:probe]]
        graphs = graphs.filter(F.col("part_id").isin(keep))

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for payload in b["payload"]:
                g = HnswGraph.from_bytes(bytes(payload))
                hits = g.search(q, k, ef_search)
                if hits:
                    yield pd.DataFrame(
                        {
                            "vec_id": [h[0] for h in hits],
                            "cosine": [h[1] for h in hits],
                        }
                    )

    cand = graphs.select("payload").mapInPandas(search, "vec_id long, cosine double")
    return cand.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)
