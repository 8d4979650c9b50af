"""Hit highlighting (Solr hl=true): snippet extraction goldens + the
top-k -> join-back -> highlight page shape."""

import pytest

from solr_sematic_importer_spark.operators.highlight import (
    highlight,
    make_snippet,
)

TEXT = (
    "The merge procedure begins by sorting each run. After sorting, the "
    "merger combines runs pairwise until a single sorted run remains."
)


def test_make_snippet_wraps_all_matches_in_fragment():
    s = make_snippet(TEXT, {"merge"}, "text_general", frag_size=60)
    assert s is not None and "<em>merge</em>" in s
    assert s.endswith("...")  # truncated tail marker


def test_make_snippet_stemmed_matching():
    # text_en: query "merging" stems to "merg", matching "merge" in the
    # original text — wrapped at its ORIGINAL character span ("merger"
    # stems to itself under Porter, so it stays unwrapped)
    s = make_snippet(TEXT, {"merg"}, "text_en", frag_size=400)
    assert "<em>merge</em>" in s and "<em>merger</em>" not in s
    # "sorting"/"sorted" both stem to "sort": all occurrences wrapped
    s2 = make_snippet(TEXT, {"sort"}, "text_en", frag_size=400)
    assert s2.count("<em>sort") >= 3


def test_make_snippet_no_match_returns_none():
    assert make_snippet(TEXT, {"zeppelin"}, "text_general") is None
    assert make_snippet("", {"merge"}, "text_general") is None


def test_highlight_page_shape(spark):
    """Top-k ids joined back to stored text -> snippets, the per-page
    flow; non-matching docs are dropped like Solr's highlighting map."""
    docs = spark.createDataFrame(
        [(0, TEXT), (1, "unrelated content entirely"), (2, "merge me too")],
        "doc_id long, text string",
    )
    out = highlight(docs, "merging runs", profile="text_en", frag_size=80)
    rows = {r["doc_id"]: r["snippet"] for r in out.collect()}
    assert set(rows) == {0, 2}
    assert "<em>" in rows[0] and "<em>merge</em>" in rows[2]


def test_overlong_token_split_matches_index_terms():
    """tokenize() splits runs at MAX_TOKEN_LENGTH=255, so a doc with an
    over-long token is INDEXED as 255-char terms; highlighting must
    produce the same terms or a matching doc vanishes from the highlight
    section (round-5 review)."""
    from solr_sematic_importer_spark.functions.analyzer import analyze_text_en
    from solr_sematic_importer_spark.operators.highlight import make_snippet

    text = "short " + "x" * 300 + " tail"
    terms = set(analyze_text_en(text))
    assert any(len(t) == 255 for t in terms)
    snip = make_snippet(text, terms, "text_en")
    assert snip is not None and "<em>" in snip
