"""Positional postings + PhraseQuery semantics (Solr q="exact phrase",
delegated to Lucene in the reference): adjacency, stopword position gaps,
and BM25 phrase scoring against hand computation."""

import math

import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.functions.analyzer import analyze_with_positions
from solr_sematic_importer_spark.operators.build import build_index
from solr_sematic_importer_spark.operators.phrase import (
    bm25_phrase_topk,
    build_positions,
    phrase_match_counts,
)

TEXTS = [
    (0, "merge sort beats bubble sort on merge sort workloads"),  # 2x "merge sort"
    (1, "sort merge join is not a merge sort"),                   # 1x
    (2, "merge and sort separately"),                             # 0x adjacent
    (3, "the state of the union address"),
    (4, "state union speech transcripts"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_analyze_with_positions_gaps():
    # text_en drops stopwords but keeps position increments
    terms, poss = analyze_with_positions("the state of the union address", "text_en")
    assert terms == ["state", "union", "address"]
    assert poss == [1, 4, 5]
    # simple profile: dense positions
    t2, p2 = analyze_with_positions("Merge-Sort beats", "simple")
    assert t2 == ["merge", "sort", "beats"] and p2 == [0, 1, 2]


def test_phrase_match_counts_exact_adjacency(spark, docs):
    pos = build_positions(docs, profile="simple")
    got = {
        r["doc_id"]: r["tfp"]
        for r in phrase_match_counts(pos, ["merge", "sort"], [0, 1]).collect()
    }
    assert got == {0: 2, 1: 1}


def test_phrase_respects_stopword_gap(spark, docs):
    """Lucene position increments: "state union" must NOT match doc 3
    ("state OF THE union" has a 3-gap), while the full phrase must."""
    idx = build_index(
        docs, text_col="text", key_cols=(), profile="text_en", doc_id_col="doc_id"
    )
    pos = build_positions(docs, profile="text_en")
    tight = [r["doc_id"] for r in bm25_phrase_topk(idx, pos, "state union", k=10).collect()]
    assert tight == [4]
    full = [
        r["doc_id"]
        for r in bm25_phrase_topk(idx, pos, "state of the union", k=10).collect()
    ]
    assert full == [3]


def test_phrase_scores_match_hand_computation(spark, docs):
    idx = build_index(
        docs, text_col="text", key_cols=(), profile="simple", doc_id_col="doc_id"
    )
    pos = build_positions(docs, profile="simple")
    got = bm25_phrase_topk(idx, pos, "merge sort", k=10, quantize=False).collect()
    assert [r["doc_id"] for r in got] == [0, 1]

    dfs = {
        r["term"]: r["df"]
        for r in idx.term_stats.filter(F.col("term").isin(["merge", "sort"])).collect()
    }
    n = idx.n_docs
    w = sum(
        math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in ["merge", "sort"]
    )
    dls = {r["doc_id"]: r["dl"] for r in idx.doc_stats.collect()}
    for r, (did, tfp) in zip(got, [(0, 2), (1, 1)]):
        want = w * tfp / (tfp + 1.2 * (0.25 + 0.75 * dls[did] / idx.avgdl))
        assert r["doc_id"] == did
        assert r["score"] == pytest.approx(want, abs=1e-9)


def test_phrase_absent_term_and_empty(spark, docs):
    idx = build_index(
        docs, text_col="text", key_cols=(), profile="simple", doc_id_col="doc_id"
    )
    pos = build_positions(docs, profile="simple")
    assert bm25_phrase_topk(idx, pos, "zzz missing", k=10).count() == 0
    assert bm25_phrase_topk(idx, pos, "", k=10).count() == 0


def test_phrase_plan_pushes_term_filter(spark, docs, tmp_path):
    """The per-term position fetch must push the term predicate into the
    parquet scan (the J2 semi-join shape, like the BM25 path)."""
    p = str(tmp_path / "pos")
    build_positions(docs, profile="simple").write.parquet(p)
    pos = spark.read.parquet(p)
    plan = phrase_match_counts(pos, ["merge", "sort"], [0, 1])._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "merge" in plan

def test_default_positions_profile_matches_default_index(spark):
    """build_positions' default profile equals build_index's default
    (text_en): the default-argument pairing must not silently hold
    unstemmed terms a stemmed phrase query joins to nothing against
    (round-5 review)."""
    from solr_sematic_importer_spark.operators.build import build_index
    from solr_sematic_importer_spark.operators.phrase import (
        bm25_phrase_topk,
        build_positions,
    )

    docs = spark.createDataFrame(
        [(0, "running runs quickly"), (1, "walking walks slowly")],
        "doc_id long, text string",
    )
    idx = build_index(docs, text_col="text", key_cols=(), doc_id_col="doc_id")
    pos = build_positions(docs)  # both defaults -> must agree
    got = bm25_phrase_topk(idx, pos, "running runs", k=5).collect()
    assert [r["doc_id"] for r in got] == [0]
