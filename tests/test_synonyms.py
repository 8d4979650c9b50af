"""Synonym parsing + SynonymQuery scoring semantics."""

import math

import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.functions.synonyms import (
    expand_terms,
    parse_synonyms,
)
from solr_sematic_importer_spark.operators.build import build_index
from solr_sematic_importer_spark.operators.score import (
    bm25_topk,
    bm25_topk_synonyms,
)
from solr_sematic_importer_spark.sources.transcripts import synthetic_transcripts

REFERENCE_SYNONYMS = """
# comment
aaafoo => aaabar
bbbfoo => bbbfoo bbbbar
cccfoo => cccbar cccbaz
fooaaa,baraaa,bazaaa
GB,gib,gigabyte,gigabytes
Television, Televisions, TV, TVs
pixima => pixma
"""


def test_parse_reference_file():
    r = parse_synonyms(REFERENCE_SYNONYMS)
    assert r["aaafoo"] == ["aaabar"]                      # mapping, no self
    assert r["bbbfoo"] == ["bbbfoo", "bbbbar"]            # self listed on RHS
    assert r["cccfoo"] == ["cccbar", "cccbaz"]
    assert set(r["fooaaa"]) == {"fooaaa", "baraaa", "bazaaa"}  # expand group
    assert set(r["gb"]) == {"gb", "gib", "gigabyte", "gigabytes"}
    assert r["tv"] == ["television", "televisions", "tv", "tvs"]
    assert r["pixima"] == ["pixma"]


def test_expand_terms():
    r = parse_synonyms(REFERENCE_SYNONYMS)
    assert expand_terms(["gb", "unknown"], r) == [
        ["gb", "gib", "gigabyte", "gigabytes"],
        ["unknown"],
    ]


def test_expand_multi_token_lhs():
    """synonymGraph multi-word rules: the LHS span collapses to one group
    (greedy longest-match); multi-word RHS flattens to token members."""
    r = parse_synonyms(
        """
        sea biscuit => seabiscuit
        big apple, new york city => nyc
        usa,united states
        """
    )
    assert expand_terms(["sea", "biscuit", "racing"], r) == [
        ["seabiscuit"],
        ["racing"],
    ]
    assert expand_terms(["the", "big", "apple", "tour"], r) == [
        ["the"],
        ["nyc"],
        ["tour"],
    ]
    assert expand_terms(["new", "york", "city"], r) == [["nyc"]]
    # longest match wins over a shorter prefix rule
    r2 = parse_synonyms("new => novel\nnew york city => nyc")
    assert expand_terms(["new", "york", "city"], r2) == [["nyc"]]
    assert expand_terms(["new", "car"], r2) == [["novel"], ["car"]]
    # equivalence group with a multi-word member: flattened bag of members
    assert expand_terms(["usa"], r) == [["usa", "united", "states"]]


def test_multi_token_synonyms_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (0, "seabiscuit won the race"),
            (1, "a sea biscuit is a hardtack cracker"),
            (2, "unrelated filler text entirely"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(
        docs, text_col="text", key_cols=(), profile="text_general",
        doc_id_col="doc_id",
    )
    rules = parse_synonyms("sea biscuit => seabiscuit, sea biscuit")
    # query "sea biscuit" -> one group {seabiscuit, sea, biscuit}: both
    # docs 0 and 1 match through the group
    got = {r["doc_id"] for r in bm25_topk_synonyms(idx, "sea biscuit", rules, k=10).collect()}
    assert got == {0, 1}


@pytest.fixture(scope="module")
def idx(spark):
    return build_index(synthetic_transcripts(spark, 60), profile="text_general")


def test_no_rules_equals_plain(idx):
    plain = bm25_topk(idx, "zeppelin quartz", k=10).select("doc_id", "score").collect()
    syn = bm25_topk_synonyms(idx, "zeppelin quartz", {}, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in plain] == [
        (r["doc_id"], r["score"]) for r in syn
    ]


def test_config_zip_rules_end_to_end(spark):
    """The SHIPPED configset rules (semantic_base_config.zip ->
    synonyms.txt, wired as the default of bm25_topk_synonyms per
    managed-schema.xml:311 synonymGraph ignoreCase expand) applied to a
    corpus exercising the Television/GB groups; scores checked against a
    pure-Python SynonymQuery computation (df=max members, tf=sum)."""
    from solr_sematic_importer_spark.functions.synonyms import default_synonyms

    texts = [
        "the television in the corner",          # television
        "two new TVs and a television stand",    # tvs + television
        "a tv with a gigabyte of memory",        # tv + gigabyte
        "gigabytes of footage and 4 GB cards",   # gigabytes + gb
        "nothing relevant here at all",
        "pixima printer on the desk",            # pixima -> pixma (no self)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    idx = build_index(
        docs, text_col="text", key_cols=(), profile="text_general",
        doc_id_col="doc_id",
    )
    # query "TV": analyzer lowercases, ignoreCase rules match -> the full
    # Television group
    got = bm25_topk_synonyms(idx, "TV", k=10, quantize=False).collect()
    assert {r["doc_id"] for r in got} == {0, 1, 2}

    rules = default_synonyms()
    members = rules["tv"]
    assert members == ["television", "televisions", "tv", "tvs"]
    stats = {
        r["term"]: r["df"]
        for r in idx.term_stats.filter(F.col("term").isin(members)).collect()
    }
    dfmax = max(stats.values())
    w = math.log(1 + (idx.n_docs - dfmax + 0.5) / (dfmax + 0.5))
    per_doc = {
        r["doc_id"]: (r["tfs"], r["dl"])
        for r in idx.postings_flat.filter(F.col("term").isin(members))
        .groupBy("doc_id", "dl")
        .agg(F.sum("tf").alias("tfs"))
        .collect()
    }
    for r in got:
        tfs, dl = per_doc[r["doc_id"]]
        want = w * tfs / (tfs + 1.2 * (0.25 + 0.75 * dl / idx.avgdl))
        assert r["score"] == pytest.approx(want, abs=1e-9)

    # "pixima => pixma" replaces the token (LHS not on RHS): the corpus
    # doc says "pixima", the index term is "pixima", the QUERY "pixima"
    # maps to pixma only -> no hits (exactly Solr's behavior with this
    # index-time-unexpanded toy file)
    assert bm25_topk_synonyms(idx, "pixima", k=10).count() == 0
    # GB equivalence group spans gb/gigabyte/gigabytes
    got_gb = bm25_topk_synonyms(idx, "GB", k=10, quantize=False).collect()
    assert {r["doc_id"] for r in got_gb} == {2, 3}


def test_synonym_query_semantics(idx):
    """df = max over members, tf summed: verified against a hand
    computation on a single-group query."""
    rules = {"zeppelin": ["zeppelin", "quartz"], "quartz": ["zeppelin", "quartz"]}
    got = bm25_topk_synonyms(idx, "zeppelin", rules, k=20, quantize=False).collect()

    stats = {
        r["term"]: r["df"]
        for r in idx.term_stats.filter(F.col("term").isin(["zeppelin", "quartz"])).collect()
    }
    dfmax = max(stats.values())
    w = math.log(1 + (idx.n_docs - dfmax + 0.5) / (dfmax + 0.5))
    rows = (
        idx.postings_flat.filter(F.col("term").isin(["zeppelin", "quartz"]))
        .groupBy("doc_id", "dl")
        .agg(F.sum("tf").alias("tfs"))
        .collect()
    )
    want = sorted(
        (
            (
                r["doc_id"],
                w * r["tfs"] / (r["tfs"] + 1.2 * (0.25 + 0.75 * r["dl"] / idx.avgdl)),
            )
            for r in rows
        ),
        key=lambda x: (-x[1], x[0]),
    )[:20]
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)


def test_synonyms_fire_under_text_en_stemming(spark):
    """Solr applies synonymGraph BEFORE stemming and stems the outputs:
    rules keyed on surface forms must fire for stemmed indexes, and the
    members must be looked up by their STEMMED form (round-5 review —
    previously expansion was silently dead under text_en)."""
    from solr_sematic_importer_spark.operators.build import build_index
    from solr_sematic_importer_spark.operators.score import (
        bm25_topk,
        bm25_topk_synonyms,
    )

    docs = spark.createDataFrame(
        [
            (0, "old televisions hum quietly"),
            (1, "a tv in every room"),
            (2, "nothing relevant in this sentence"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, text_col="text", key_cols=(), profile="text_en",
                      doc_id_col="doc_id")
    rules = {"tv": ["tv", "television", "televisions"],
             "television": ["tv", "television", "televisions"],
             "televisions": ["tv", "television", "televisions"]}
    got = {r["doc_id"]
           for r in bm25_topk_synonyms(idx, "TV", synonyms=rules, k=10).collect()}
    assert got == {0, 1}  # the stemmed 'televis' doc matches via the rule
    # baseline sanity: without synonyms only the literal match returns
    plain = {r["doc_id"] for r in bm25_topk(idx, "TV", k=10).collect()}
    assert plain == {1}
