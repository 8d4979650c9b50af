"""Dedup operators: exact/normalized groups, simhash (overflow regression
+ Hamming separation), minhash/LSH candidate recall, dropped-bucket
surfacing. The reference's only dedup-shaped op is the orphan anti-join
(SolrAdminActions.java:268); these are the training-pipeline extensions."""

import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.operators.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    normalized_duplicates,
    shingles,
    simhash,
    simhash_hamming_pairs,
)

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "spark builds distributed inverted index postings with bucket salting",
    "completely unrelated text about cooking pasta with garlic and olive oil",
    "streaming watermark semantics for late arriving events in event time",
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i, t in enumerate(BASE):
        rows.append((i, t))
        # near-dup: one word changed
        rows.append((100 + i, t.replace(t.split()[2], "xyzzy", 1)))
        # exact dup of doc 0
    rows.append((200, BASE[0]))
    rows.append((201, BASE[0].upper()))  # normalized dup only
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_and_normalized_duplicates(docs):
    ex = exact_duplicates(docs).collect()
    assert any(r["dup_count"] == 2 and r["keep_id"] == 0 for r in ex)
    nd = normalized_duplicates(docs).collect()
    # normalization folds case: {0, 200, 201} group
    assert any(r["dup_count"] == 3 and r["keep_id"] == 0 for r in nd)


def test_simhash_no_overflow_and_hamming_separation(spark, docs):
    """Regression for the ANSI long-overflow at the fingerprint fold
    (round-1 CORRECTNESS err): fingerprints with bit 63 set must build.
    Semantics: near-dup pairs have smaller Hamming distance than
    unrelated pairs."""
    from solr_sematic_importer_spark.operators.build import build_index

    idx = build_index(
        docs, text_col="text", key_cols=("doc_id",),
        profile="simple", doc_id_col="doc_id",
    )
    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash(idx.postings_flat.select("doc_id", "term", "tf")).collect()
    }
    assert len(fps) == docs.count()
    # identical docs -> identical fingerprints
    assert fps[0] == fps[200]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    near = [ham(fps[i], fps[100 + i]) for i in range(len(BASE))]
    far = [
        ham(fps[i], fps[j])
        for i in range(len(BASE))
        for j in range(len(BASE))
        if i < j
    ]
    assert max(near) < min(far)


def test_simhash_hamming_pairs_finds_near_dups(spark, docs):
    from solr_sematic_importer_spark.operators.build import build_index

    idx = build_index(
        docs, text_col="text", key_cols=("doc_id",),
        profile="simple", doc_id_col="doc_id",
    )
    fps_df = simhash(idx.postings_flat.select("doc_id", "term", "tf"))
    fps = {r["doc_id"]: r["simhash"] for r in fps_df.collect()}
    # band_bits=4 -> 16 bands: any pair within Hamming distance 15 leaves
    # >=1 band untouched (pigeonhole), so recall is GUARANTEED there
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_hamming_pairs(fps_df, band_bits=4, max_distance=15).collect()
    }
    assert (0, 200) in pairs and pairs[(0, 200)] == 0

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    expected = {
        (a, b): ham(fps[a], fps[b])
        for a in fps
        for b in fps
        if a < b and ham(fps[a], fps[b]) <= 15
    }
    assert pairs == expected


def test_minhash_lsh_finds_near_dups_and_jaccard_confirms(docs):
    sh = shingles(docs, n=3)
    sig = minhash_signatures(sh, num_perm=64)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sig, bands=16).collect()
    }
    assert (0, 200) in pairs
    # exact Jaccard verification pass agrees on the exact dup
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert jac[(0, 200)] == 1.0


def test_embedding_near_dup_bucketed_vs_exact(spark):
    """The RP-LSH-bucketed near-dup path finds the seeded near-identical
    vectors without an all-pairs join, and its output is a subset of the
    exact variant (blocking only ever loses pairs, never invents them)."""
    import numpy as np

    from solr_sematic_importer_spark.operators.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(7)
    dim = 32
    base = rng.standard_normal((40, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # seeded near-dups: tiny perturbations of vectors 0..4 under ids 100+
    for i in range(5):
        pert = base[i] + rng.standard_normal(dim) * 0.01
        rows.append((100 + i, [float(x) for x in pert]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, dim, threshold=0.98, exact=True).collect()
    }
    assert set(exact) >= {(i, 100 + i) for i in range(5)}

    bucketed = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(
            emb, dim, threshold=0.98, bits=16, band_bits=4
        ).collect()
    }
    assert set(bucketed) <= set(exact)
    # near-identical vectors share sketch bands with overwhelming
    # probability; all seeded pairs must be recalled
    assert set(bucketed) >= {(i, 100 + i) for i in range(5)}
    for k, v in bucketed.items():
        assert v == exact[k]


def test_lsh_dropped_buckets_are_surfaced(spark):
    """A degenerate mega-bucket (many identical signatures) above
    max_bucket is dropped from the join AND reported — silent truncation
    would read as full coverage."""
    sig_rows = [(i, list(range(64))) for i in range(30)]
    sig = spark.createDataFrame(sig_rows, "doc_id long, signature array<long>")
    pairs, dropped = lsh_candidate_pairs(
        sig, bands=16, max_bucket=10, with_dropped=True
    )
    d = dropped.collect()
    assert len(d) == 16  # every band bucket holds all 30 docs
    assert all(r["size"] == 30 for r in d)
    assert pairs.count() == 0  # everything was in dropped buckets
    # and with a permissive cap the pairs come back
    pairs2 = lsh_candidate_pairs(sig, bands=16, max_bucket=1000)
    assert pairs2.count() == 30 * 29 // 2


def test_connected_components_merges_chains(spark):
    """A chain (1-2, 2-3) and a separate pair (10-11): min-label
    propagation must close the chain into one cluster labeled by its
    min id, and leave the other cluster untouched."""
    from solr_sematic_importer_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_nonconvergence_raises(spark):
    from solr_sematic_importer_spark.operators.dedup import connected_components

    # a 6-chain has diameter 5: one iteration cannot close it
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=1)
    got = {r["node"]: r["comp"] for r in connected_components(chain).collect()}
    assert set(got.values()) == {0}


def test_near_dup_canonical_keep_one_per_cluster(spark, docs):
    """End-to-end 'keep one per dup cluster': pairs from exact Jaccard,
    clusters via components, canonical = min id; unpaired docs keep
    themselves; filtering on doc_id == canonical drops exactly the
    non-minimal members."""
    from solr_sematic_importer_spark.operators.dedup import (
        near_dup_canonical,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(docs, threshold=0.4)
    out = near_dup_canonical(docs, pairs)
    rows = {r["doc_id"]: r["canonical"] for r in out.collect()}
    assert set(rows) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    pair_rows = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert pair_rows, "fixture must contain near-dups"
    for a, b in pair_rows:
        assert rows[a] == rows[b] and rows[a] <= min(a, b)
    paired = {d for p in pair_rows for d in p}
    for d, c in rows.items():
        if d not in paired:
            assert c == d
    kept = {r["doc_id"] for r in out.filter(F.col("doc_id") == F.col("canonical")).collect()}
    assert kept == {c for c in rows.values()}


def test_zero_embedding_is_not_a_near_dup(spark):
    """A zero vector's cosine is 0, not NaN (which passes >= threshold
    under Spark's NaN-greatest ordering and corrupts the dup clusters —
    round-5 review). Both the exact and LSH-banded paths."""
    from solr_sematic_importer_spark.operators.dedup import embedding_near_dup_pairs

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),   # true near-dup of 0
        (2, [0.0, 0.0, 0.0, 0.0]),     # zero vector
        (3, [0.0, 0.0, 0.0, 0.0]),     # another zero vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for exact in (True, False):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in embedding_near_dup_pairs(
                df, dim=4, threshold=0.99, exact=exact, bits=16, band_bits=4
            ).collect()
        }
        assert (0, 1) in got
        assert all(2 not in p and 3 not in p for p in got), (exact, got)


def test_simhash_string_doc_ids(spark):
    """simhash derives the id dtype from the input frame — string doc
    ids flow through the Arrow stage like longs (round-5 review)."""
    from solr_sematic_importer_spark.operators.dedup import simhash

    tf = spark.createDataFrame(
        [("d-1", "alpha", 2), ("d-1", "beta", 1), ("d-2", "alpha", 2), ("d-2", "beta", 1)],
        "doc_id string, term string, tf int",
    )
    fps = simhash(tf).collect()
    got = {r["doc_id"]: r["simhash"] for r in fps}
    assert set(got) == {"d-1", "d-2"}
    assert got["d-1"] == got["d-2"]  # identical content -> identical prints
