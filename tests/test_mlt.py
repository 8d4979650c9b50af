"""MoreLikeThis (Solr /mlt, delegated to Lucene MLT in the reference):
interesting-term selection gates, tie-breaks, and similarity ranking."""

import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.operators.build import build_index
from solr_sematic_importer_spark.operators.mlt import (
    interesting_terms,
    more_like_this,
)

TEXTS = [
    (0, "spark spark shuffle shuffle partition partition merge merge sort"),
    (1, "spark spark shuffle shuffle partition partition merge merge sorted"),  # near-dup of 0
    (2, "spark shuffle partition appears here too with merge"),
    (3, "cooking pasta with garlic and olive oil tonight"),
    (4, "spark spark spark alone"),
    (5, "shuffle shuffle partition merge spark things"),
    (6, "partition merge spark shuffle other words"),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    return build_index(
        docs, text_col="text", key_cols=(), profile="simple", doc_id_col="doc_id"
    )


def test_interesting_terms_gates_and_order(idx):
    # min_term_freq=2 keeps only doubled terms of doc 0; min_doc_freq=5
    # requires corpus-wide presence (spark/shuffle/partition/merge all
    # appear in >= 5 docs? spark: docs 0,1,2,4,5,6 -> df=6; shuffle: 5;
    # partition: 5; merge: 5; sort: df=1 and tf=1 anyway)
    terms = interesting_terms(idx, 0, max_query_terms=25, min_term_freq=2, min_doc_freq=5)
    names = [t for t, _ in terms]
    assert set(names) == {"spark", "shuffle", "partition", "merge"}
    # equal tf and equal df -> equal score -> term-asc tie-break
    scores = dict(terms)
    equal = [t for t in names if scores[t] == scores[names[0]]]
    assert equal == sorted(equal)
    # truncation respects the (score desc, term asc) order
    top2 = [t for t, _ in interesting_terms(idx, 0, max_query_terms=2,
                                            min_term_freq=2, min_doc_freq=5)]
    assert top2 == names[:2]


def test_more_like_this_ranks_near_dup_first(idx):
    got = more_like_this(
        idx, 0, k=5, max_query_terms=25, min_term_freq=2, min_doc_freq=5,
        quantize=False,
    ).collect()
    ids = [r["doc_id"] for r in got]
    assert 0 not in ids           # source excluded
    assert ids[0] == 1            # the near-dup wins
    assert 3 not in ids           # unrelated doc does not match


def test_more_like_this_no_interesting_terms(idx):
    # doc 3 shares no gated term (its terms are unique -> df < 5)
    assert more_like_this(idx, 3, k=5, min_term_freq=1, min_doc_freq=5).count() == 0


def test_term_vectors_exclude_deleted_docs(spark):
    """/tv never serves a deleted document — the same deletion-vector
    mask every scorer applies (round-5 review)."""
    from pyspark.sql import functions as F

    from solr_sematic_importer_spark.operators.build import build_index, delete_by_query
    from solr_sematic_importer_spark.operators.mlt import term_vectors

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma")], "doc_id long, text string"
    )
    idx = build_index(docs, text_col="text", key_cols=(), profile="simple",
                      doc_id_col="doc_id")
    assert {r["doc_id"] for r in term_vectors(idx, [0, 1]).collect()} == {0, 1}
    delete_by_query(idx, F.col("doc_id") == 0)
    assert {r["doc_id"] for r in term_vectors(idx, [0, 1]).collect()} == {1}
