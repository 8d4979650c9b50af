"""Pagination (T3), prohibited terms, and delete-by-query (Q6)."""

import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.operators.block_postings import (
    bm25_topk_wand,
    build_block_postings,
)
from solr_sematic_importer_spark.operators.build import build_index, delete_by_query
from solr_sematic_importer_spark.operators.score import bm25_topk
from solr_sematic_importer_spark.sources.transcripts import synthetic_transcripts


@pytest.fixture(scope="module")
def idx(spark):
    df = synthetic_transcripts(spark, 80)
    index = build_index(df, profile="text_en")
    build_block_postings(index, bucket_bits=8)
    index.postings_blocks.persist().count()
    return index


def _ids(rows):
    return [r["doc_id"] for r in rows]


def test_offset_pagination(idx):
    full = bm25_topk(idx, "you one word", k=30).select("doc_id", "score").collect()
    page2 = bm25_topk(idx, "you one word", k=10, offset=10).select(
        "doc_id", "score"
    ).collect()
    assert _ids(page2) == _ids(full)[10:20]
    page_beyond = bm25_topk(idx, "zeppelin", k=10, offset=10_000).collect()
    assert page_beyond == []


def test_exclude_terms(idx):
    got = bm25_topk(idx, "you one", k=50, exclude="word").collect()
    banned = {
        r["doc_id"]
        for r in idx.postings_flat.filter(F.col("term") == "word")
        .select("doc_id")
        .collect()
    }
    assert got and all(r["doc_id"] not in banned for r in got)


def test_cursor_paging_reconstructs_full_ranking(idx):
    """Walking cursorMark pages concatenates to exactly the one-shot
    top-N ranking — no gaps, no repeats, across tied scores."""
    from solr_sematic_importer_spark.operators.score import bm25_topk_cursor

    full = bm25_topk(idx, "you one word", k=30).select("doc_id", "score").collect()
    pages, cur = [], None
    for _ in range(3):
        page = bm25_topk_cursor(idx, "you one word", k=10, cursor=cur).collect()
        if not page:
            break
        pages.extend(page)
        cur = (float(page[-1]["score"]), int(page[-1]["doc_id"]))
    assert [(r["doc_id"], r["score"]) for r in pages] == [
        (r["doc_id"], r["score"]) for r in full
    ]


def test_grouped_topk_heads(spark, idx):
    """Solr result grouping: one head per group, ordered by head score,
    identical to a manual window over the full scored set."""
    from solr_sematic_importer_spark.operators.score import (
        bm25_grouped_topk,
        score_or_docs,
    )

    # group = conv bucket parity derived from doc_id
    groups = idx.doc_stats.select(
        "doc_id", (F.col("doc_id") % 3).cast("string").alias("grp")
    )
    got = bm25_grouped_topk(idx, "you one word", groups, k=10).collect()
    assert 1 <= len(got) <= 3  # at most one row per group

    scored = {
        r["doc_id"]: r["score"]
        for r in score_or_docs(idx, "you one word").collect()
    }
    want_heads = {}
    for did, s in scored.items():
        g = str(did % 3)
        if g not in want_heads or (s, -did) > (want_heads[g][1], -want_heads[g][0]):
            want_heads[g] = (did, s)
    want = sorted(want_heads.items(), key=lambda kv: (-kv[1][1], kv[1][0]))
    assert [(r["grp"], r["doc_id"]) for r in got] == [(g, d) for g, (d, _) in want]


def test_delete_by_query_masks_docs(idx):
    before = bm25_topk(idx, "zeppelin", k=10).select("doc_id", "score").collect()
    assert before
    victim = before[0]["doc_id"]
    delete_by_query(idx, F.col("doc_id") == victim)
    try:
        after = bm25_topk(idx, "zeppelin", k=10).select("doc_id", "score").collect()
        assert victim not in _ids(after)
        assert _ids(after) == [d for d in _ids(before) if d != victim][: len(after)]
        # WAND path honors the deletion vector too
        wand = bm25_topk_wand(idx, "zeppelin", k=10).collect()
        assert victim not in _ids(wand)
        assert _ids(wand)[: len(after)] == _ids(after)
    finally:
        idx.deletes = None
