"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2 (or a
training-data-pipeline extension), run by the driver at sf=0.01 and compared
against ``oracle_sql()`` in DuckDB (row-count + schema + order-insensitive
value-hash). Column names/aliases match the oracle exactly; float outputs
are rounded identically on both sides; top-k boundaries order by unrounded
score with doc-id tie-breaks so the row SETS are deterministic.

Engine queries use the ``simple`` analyzer profile (lowercase split on
[^a-z0-9]+) and exact-dl BM25 — both exactly expressible in ANSI SQL — so
the oracle verifies the distributed tf/df/dl/scoring machinery
value-for-value. The Lucene-exact profiles (text_general/text_en,
SmallFloat-quantized norms) are verified by tests/ against an independent
pure-Python oracle and exposed here as rows-only entries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

BM25_K1 = 1.2
BM25_B = 0.75

# fixed query strings (vocab of the documents table)
Q_OR = "merge sort window"
Q_RARE = "dup"
Q_AND = "dup merge"


def _prepare(spark: SparkSession) -> None:
    from solr_sematic_importer_spark.session import _ship_package

    try:
        _ship_package(spark)
    except Exception:
        pass  # same file already registered on this context


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_INDEX_CACHE: dict = {}


def _poly_hash_col(col, mult: int):
    """31-bit polynomial char hash ((acc*mult + ascii) % (2^31-1)) —
    SQL-expressible, mirrored verbatim by the DuckDB oracles via
    list_reduce over codepoints. Used as the pluggable ``hash_col`` of
    the minhash/simhash entries so the driver hash-checks the full
    permutation/banding machinery; production defaults stay xxhash64."""
    chars = F.filter(F.split(col, ""), lambda x: x != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(mult) + F.ascii(ch)) % F.lit(2147483647),
    )


def _doc_index(spark: SparkSession, sf_dir: str):
    from solr_sematic_importer_spark.operators.build import build_index

    key = ("docs", sf_dir)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    _prepare(spark)
    idx = build_index(
        _docs(spark, sf_dir),
        text_col="text",
        key_cols=("doc_id",),
        profile="simple",
        doc_id_col="doc_id",
    )
    _INDEX_CACHE[key] = idx
    return idx


# --------------------------------------------------------------------------
# entry: flagship query (smoke check at sf0.001)
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Build the inverted index over sf0.001 documents and answer a BM25
    top-10 disjunction — the engine's core path end-to-end."""
    from solr_sematic_importer_spark.operators.score import bm25_topk

    idx = _doc_index(spark, "/root/testdata/sf0.001")
    top = bm25_topk(idx, Q_OR, k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_tf(spark, sf_dir):
    idx = _doc_index(spark, sf_dir)
    return idx.postings_flat.select("doc_id", "term", "tf")


def q_docfreq(spark, sf_dir):
    idx = _doc_index(spark, sf_dir)
    return idx.term_stats.select("term", "df", "ttf")


def q_doc_stats(spark, sf_dir):
    idx = _doc_index(spark, sf_dir)
    return idx.doc_stats.select("doc_id", "dl")


def q_corpus_stats(spark, sf_dir):
    idx = _doc_index(spark, sf_dir)
    # rounding stays in Spark SQL (HALF_UP, matching DuckDB) — python
    # round() is banker's rounding and can disagree at .xxxx5 boundaries
    return idx.doc_stats.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        F.round(F.sum("dl") / F.count("*"), 4).alias("avgdl"),
    )


def q_bm25_or(spark, sf_dir):
    from solr_sematic_importer_spark.operators.score import bm25_topk

    idx = _doc_index(spark, sf_dir)
    top = bm25_topk(idx, Q_OR, k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_rare(spark, sf_dir):
    from solr_sematic_importer_spark.operators.score import bm25_topk

    idx = _doc_index(spark, sf_dir)
    top = bm25_topk(idx, Q_RARE, k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_and(spark, sf_dir):
    from solr_sematic_importer_spark.operators.score import bm25_conjunction_topk

    idx = _doc_index(spark, sf_dir)
    top = bm25_conjunction_topk(idx, Q_AND, k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_page2(spark, sf_dir):
    # T3 pagination: start=5, rows=10 (HttpSolrSelectClientImpl.java:111)
    from solr_sematic_importer_spark.operators.score import bm25_topk

    idx = _doc_index(spark, sf_dir)
    top = bm25_topk(idx, Q_OR, k=10, offset=5, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_exclude(spark, sf_dir):
    # Lucene MUST_NOT (-term) prohibited-term semantics
    from solr_sematic_importer_spark.operators.score import bm25_topk

    idx = _doc_index(spark, sf_dir)
    top = bm25_topk(idx, Q_OR, k=10, exclude=Q_RARE, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_synonyms(spark, sf_dir):
    """Query-time synonymGraph (managed-schema.xml:311) with Lucene
    SynonymQuery scoring: df = max over group members, tf summed."""
    from solr_sematic_importer_spark.operators.score import bm25_topk_synonyms

    idx = _doc_index(spark, sf_dir)
    rules = {"merge": ["merge", "sort"], "sort": ["merge", "sort"]}
    top = bm25_topk_synonyms(idx, "merge", rules, k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_filtered(spark, sf_dir):
    """Q4/P3 filter query (fq) composed with scoring
    (HttpSolrSelectClientImpl.java:113-115): the filter restricts the
    ranked set pre-top-k without changing corpus statistics — exactly
    Solr's fq semantics (cached filter ANDed with the main query)."""
    from solr_sematic_importer_spark.operators.score import bm25_topk

    idx = _doc_index(spark, sf_dir)
    top = bm25_topk(
        idx, Q_OR, k=10, quantize=False, extra_filter=F.col("doc_id") % 2 == 0
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_phrase(spark, sf_dir):
    """Exact phrase query (Solr q="..." -> Lucene PhraseQuery over
    positional postings, delegated in the reference): adjacency matched
    with JVM higher-order array ops over the positions table; scored as
    one pseudo-term with idf = sum of member idfs, tf = phrase freq."""
    from solr_sematic_importer_spark.operators.phrase import (
        bm25_phrase_topk,
        build_positions,
    )

    idx = _doc_index(spark, sf_dir)
    pos = build_positions(_docs(spark, sf_dir), profile="simple")
    top = bm25_phrase_topk(idx, pos, "merge group", k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_grouped(spark, sf_dir):
    """Solr result grouping (group=true&group.field=lang): top-scoring doc
    per group, groups ordered by head score."""
    from solr_sematic_importer_spark.operators.score import bm25_grouped_topk

    idx = _doc_index(spark, sf_dir)
    groups = _docs(spark, sf_dir).select("doc_id", F.col("lang").alias("grp"))
    top = bm25_grouped_topk(idx, Q_OR, groups, k=10, quantize=False)
    return top.select("grp", "doc_id", F.round("score", 4).alias("score"))


def q_cursor_page(spark, sf_dir):
    """Solr cursorMark deep paging: page 2 fetched via the keyset cursor
    (last row of page 1), NOT offset — page N costs page-1 work at scale.
    Must equal the offset-10 slice value-for-value."""
    from solr_sematic_importer_spark.operators.score import (
        bm25_topk,
        bm25_topk_cursor,
    )

    idx = _doc_index(spark, sf_dir)
    page1 = bm25_topk(idx, Q_OR, k=10, quantize=False).select("doc_id", "score").collect()
    cur = (float(page1[-1]["score"]), int(page1[-1]["doc_id"]))
    page2 = bm25_topk_cursor(idx, Q_OR, k=10, cursor=cur, quantize=False)
    return page2.select("doc_id", F.round("score", 4).alias("score"))


def q_spellcheck(spark, sf_dir):
    """Solr spellcheck component: nearest vocabulary terms to a typo by
    Levenshtein distance, frequency-ranked."""
    from solr_sematic_importer_spark.operators.score import spellcheck_terms

    idx = _doc_index(spark, sf_dir)
    return spellcheck_terms(idx, "mergr", max_distance=2, limit=5)


def q_sort_by_field(spark, sf_dir):
    """Solr sort=field asc: the match set is the query's, the order is a
    stored field's."""
    from solr_sematic_importer_spark.operators.score import bm25_sorted_by_field

    idx = _doc_index(spark, sf_dir)
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    top = bm25_sorted_by_field(
        idx, Q_OR, docs, "source", ascending=True, k=10, quantize=False
    )
    return top.select("doc_id", "source", F.round("score", 4).alias("score"))


def q_lucene_syntax_query(spark, sf_dir):
    """Lucene classic parser syntax end-to-end (the /select q= grammar,
    solrconfig.xml:667-670 lucene defType): '+merge sort -window' ->
    MUST(merge) + SHOULD(sort) + MUST_NOT(window) under BooleanQuery
    scoring (sum of matching clause scores)."""
    from solr_sematic_importer_spark.operators.boolean_query import (
        boolean_query_topk,
    )

    idx = _doc_index(spark, sf_dir)
    top = boolean_query_topk(idx, "+merge sort -window", k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_fuzzy_query(spark, sf_dir):
    """Lucene FuzzyQuery through the classic parser ('mergr~2'): vocab
    terms within 2 Levenshtein edits, capped at maxExpansions=50 by
    (similarity boost desc, df desc), scored under the blended-freq
    rewrite — df blended to the max over members, each member a SHOULD
    clause boosted by 1 - d/min(len) (Lucene FuzzyTermsEnum)."""
    from solr_sematic_importer_spark.operators.boolean_query import (
        boolean_query_topk,
    )

    idx = _doc_index(spark, sf_dir)
    top = boolean_query_topk(idx, "mergr~2", k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_wildcard_query(spark, sf_dir):
    """Lucene WildcardQuery through the classic parser ('s?r*'): regex-
    on-vocab expansion under the constant-score rewrite."""
    from solr_sematic_importer_spark.operators.boolean_query import (
        boolean_query_topk,
    )

    idx = _doc_index(spark, sf_dir)
    top = boolean_query_topk(idx, "s?r*", k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_phrase_slop(spark, sf_dir):
    """Sloppy phrase ('"merge window"~2') through the classic parser:
    in-order window match over positional postings (documented divergence
    from Lucene's reorder + 1/(1+slop) weighting, operators/phrase.py),
    scored as one pseudo-term like the exact phrase."""
    from solr_sematic_importer_spark.operators.boolean_query import (
        boolean_query_topk,
    )
    from solr_sematic_importer_spark.operators.phrase import build_positions

    idx = _doc_index(spark, sf_dir)
    pos = build_positions(_docs(spark, sf_dir), profile="simple")
    top = boolean_query_topk(
        idx, '"merge window"~2', k=10, positions=pos, quantize=False
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_terms_component(spark, sf_dir):
    """Solr /terms: prefix-matched vocabulary by descending df (the
    autocomplete primitive)."""
    from solr_sematic_importer_spark.operators.score import terms_component

    idx = _doc_index(spark, sf_dir)
    return terms_component(idx, prefix="s", limit=10)


def q_prefix_query(spark, sf_dir):
    """Lucene PrefixQuery (q=me*) under the constant-score rewrite."""
    from solr_sematic_importer_spark.operators.score import prefix_query_topk

    idx = _doc_index(spark, sf_dir)
    return prefix_query_topk(idx, "me", k=10)


def q_more_like_this(spark, sf_dir):
    """Solr MoreLikeThis (/mlt): interesting terms of doc 0 by tf*idf
    (mintf=2, mindf=5; maxqt high enough that the gate, not float
    truncation order, decides the set) -> OR query excluding the doc."""
    from solr_sematic_importer_spark.operators.mlt import more_like_this

    idx = _doc_index(spark, sf_dir)
    top = more_like_this(
        idx, 0, k=10, max_query_terms=100, min_term_freq=2, min_doc_freq=5,
        quantize=False,
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_field_stats(spark, sf_dir):
    """Solr stats component (stats.field=c_acctbal): count/missing/min/
    max/sum/mean/stddev in one partial+final agg pass."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return cust.agg(
        F.count("c_acctbal").alias("cnt"),
        F.sum(F.when(F.col("c_acctbal").isNull(), 1).otherwise(0)).alias("missing"),
        F.round(F.min("c_acctbal"), 2).alias("min_v"),
        F.round(F.max("c_acctbal"), 2).alias("max_v"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_v"),
        F.round(F.avg("c_acctbal"), 4).alias("mean_v"),
        F.round(F.stddev_samp("c_acctbal"), 4).alias("stddev_v"),
    )


def q_facet_lang(spark, sf_dir):
    # A2/Q5 facet count (reference: SolrAdminActions.java:252-265)
    return _docs(spark, sf_dir).groupBy("lang").agg(F.count("*").alias("cnt"))


def q_facet_on_query(spark, sf_dir):
    """Solr facet semantics proper (q=...&facet.field=lang): counts over
    the QUERY'S match set, not the corpus."""
    from solr_sematic_importer_spark.operators.score import facet_on_query

    idx = _doc_index(spark, sf_dir)
    return facet_on_query(
        idx, Q_OR, _docs(spark, sf_dir).select("doc_id", "lang"), "lang",
        quantize=False,
    )


def q_facet_pivot(spark, sf_dir):
    """Solr pivot facets (facet.pivot=lang,source): nested two-level
    counts — one hash agg on the composite key."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count("*").alias("cnt"))
    )


def q_facet_range_day(spark, sf_dir):
    """Solr facet.range over a date field: day-bucketed counts (the range
    variant of A2/Q5; same partial+final hash agg, bucketing is a pure
    projection so the agg shuffles pre-reduced rows)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("cnt"))


def q_facet_source(spark, sf_dir):
    return _docs(spark, sf_dir).groupBy("source").agg(F.count("*").alias("cnt"))


def q_chunks(spark, sf_dir):
    from solr_sematic_importer_spark.operators.chunking import char_chunks

    return char_chunks(_docs(spark, sf_dir), size=120, overlap=20)


def q_chunk_parent_join(spark, sf_dir):
    from solr_sematic_importer_spark.operators.chunking import char_chunks, join_chunks_to_parents

    docs = _docs(spark, sf_dir)
    ch = char_chunks(docs, size=120, overlap=20)
    joined = join_chunks_to_parents(
        ch, docs.select("doc_id", "lang"), broadcast_parents=True
    )
    return joined.select("id", "parent_id", "chunk_number", "lang")


def q_chunk_stats(spark, sf_dir):
    # A7 chunks-per-document stats (dto/IndexingStatus.java:44-47,69)
    from solr_sematic_importer_spark.operators.chunking import char_chunks

    ch = char_chunks(_docs(spark, sf_dir), size=120, overlap=20)
    per_doc = ch.groupBy("parent_id").agg(F.count("*").alias("n_chunks"))
    return per_doc.agg(
        F.count("*").alias("docs_chunked"),
        F.sum("n_chunks").alias("chunks_total"),
        F.round(F.avg("n_chunks"), 4).alias("chunks_per_doc"),
        F.max("n_chunks").alias("max_chunks"),
    )


def q_block_join_parent(spark, sf_dir):
    """Solr block join ({!parent} / ToParentBlockJoinQuery, score mode
    max): BM25 over CHILD chunk docs, parents ranked by best child —
    the retrieval pattern over the reference's chunk collections
    (child ids parent#%07d, ChunkDocumentListener.java:141-156)."""
    from solr_sematic_importer_spark.operators.build import build_index
    from solr_sematic_importer_spark.operators.chunking import (
        block_join_parent_topk,
        char_chunks,
    )

    _prepare(spark)
    chunks = char_chunks(_docs(spark, sf_dir), size=120, overlap=20)
    cidx = build_index(
        chunks, text_col="chunk", key_cols=("id",), profile="simple"
    )
    top = block_join_parent_topk(cidx, Q_OR, k=10, score_mode="max", quantize=False)
    return top.select(
        "parent_id", F.round("score", 4).alias("score"), "best_chunk"
    )


def q_orphan_anti_join(spark, sf_dir):
    # J3 orphan-delete anti-join shape (SolrAdminActions.java:268)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


def q_window_first_event(spark, sf_dir):
    # W2 row_number window shape over the events table
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q_top_terms(spark, sf_dir):
    idx = _doc_index(spark, sf_dir)
    return (
        idx.term_stats.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(15)
        .select("term", "df")
    )


def _docs_with_dups(spark, sf_dir) -> DataFrame:
    """documents plus a re-ingested copy of doc_id < 20 under remapped ids —
    the reference's re-index-twice idempotency shape
    (SolrIndexerIntegrationTest.java:61-82). Guarantees the dedup operators
    compare NON-empty result sets at sf0.01 (the raw table has no dups)."""
    docs = _docs(spark, sf_dir)
    dup = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    return docs.unionByName(dup)


def q_content_hash_groups(spark, sf_dir):
    from solr_sematic_importer_spark.operators.dedup import normalized_duplicates

    d = normalized_duplicates(_docs_with_dups(spark, sf_dir))
    return d.select("text_hash", "dup_count", "keep_id")


def q_fingerprint(spark, sf_dir):
    from solr_sematic_importer_spark.operators.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir))


def q_token_stats(spark, sf_dir):
    from solr_sematic_importer_spark.operators.textstats import token_stats

    return token_stats(_docs(spark, sf_dir))


def q_stopword_ratio(spark, sf_dir):
    from solr_sematic_importer_spark.operators.textstats import stopword_ratio

    return stopword_ratio(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    from solr_sematic_importer_spark.operators.textstats import lang_id_heuristic

    return lang_id_heuristic(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    from solr_sematic_importer_spark.operators.textstats import quality_score

    return quality_score(_docs(spark, sf_dir))


def q_ngram_jaccard(spark, sf_dir):
    from solr_sematic_importer_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs_with_dups(spark, sf_dir),
        n=3,
        threshold=0.05,
        id_filter=(F.col("doc_id") < 40) | (F.col("doc_id") >= 1_000_000),
    )


def q_near_dup_components(spark, sf_dir):
    """Pairs -> clusters -> canonical doc per cluster: the 'keep one per
    dup cluster' step over the ngram-Jaccard candidate pairs. Oracle:
    the same pair SQL + a recursive min-reachable-id CTE."""
    from solr_sematic_importer_spark.operators.dedup import (
        near_dup_canonical,
        ngram_jaccard_pairs,
    )

    docs = _docs_with_dups(spark, sf_dir)
    filt = (F.col("doc_id") < 40) | (F.col("doc_id") >= 1_000_000)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.05, id_filter=filt)
    return near_dup_canonical(docs.filter(filt), pairs)


def q_truncate(spark, sf_dir):
    # P6 truncate (InlineDocumentListener.java:93-99)
    from solr_sematic_importer_spark.operators.enrich import truncate_field

    return truncate_field(
        _docs(spark, sf_dir).select("doc_id", "text"), "text", 50, "text_trunc"
    ).select("doc_id", "text_trunc")


def q_solr_dates(spark, sf_dir):
    # F1/F2 Solr canonical date string (SolrSemanticIndexer.java:230-262)
    from solr_sematic_importer_spark.operators.enrich import solr_date_string

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select("event_id", solr_date_string(F.col("ts")).alias("solr_date"))


def q_flatten_nested(spark, sf_dir):
    """S4 protobuf-style nested-record flatten (ProtobufToSolrDocument
    semantics): nested structs -> '_'-joined flat fields, repeated ->
    multiValued. Nested input synthesized from the customer table so the
    oracle can verify the projection value-for-value."""
    from solr_sematic_importer_spark.operators.flatten import flatten_records

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nested = cust.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.struct(F.col("c_acctbal").alias("bal")).alias("inner"),
        ).alias("msg"),
    )
    return flatten_records(nested)


def q_protobuf_wire(spark, sf_dir):
    """S4 protobuf WIRE path (ProtobufSolrIndexer.java:33-47): customer
    rows are serialized to real proto3 wire bytes (varint/length-delimited
    per the published encoding spec) in one Arrow stage, then decoded +
    flattened by the schema-driven pure-Python decoder
    (sources/protowire.py). Oracle: the identity projection — encode
    followed by decode must be lossless."""
    from solr_sematic_importer_spark.sources.protowire import (
        decode_protobuf_records,
        encode_message,
    )

    _prepare(spark)
    schema = {1: ("custkey", "int64"), 2: ("name", "string"), 3: ("acctbal_cents", "sint64")}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", F.round(F.col("c_acctbal") * 100).cast("long").alias("cents")
    )

    def enc(batches):
        import pandas as pd

        for b in batches:
            if not len(b):
                continue
            yield pd.DataFrame(
                {
                    "payload": [
                        encode_message(
                            {"custkey": int(k), "name": n, "acctbal_cents": int(c)},
                            schema,
                        )
                        for k, n, c in zip(b["c_custkey"], b["c_name"], b["cents"])
                    ]
                }
            )

    wire = cust.mapInPandas(enc, "payload binary")
    return decode_protobuf_records(wire, schema).select(
        "custkey", "name", "acctbal_cents"
    )


def q_bpe_token_count(spark, sf_dir):
    """LLM token budgeting: whitespace tokens + GPT-2-regex-style piece
    count (lookahead-free pattern shared verbatim with the oracle)."""
    from solr_sematic_importer_spark.operators.textstats import bpe_ish_token_count

    return bpe_ish_token_count(_docs(spark, sf_dir))


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs over seeded duplicates (vec_id<20
    re-ingested under remapped ids -> cosine 1.0 pairs guaranteed
    non-vacuous). Exact blocking-free variant so DuckDB verifies
    value-for-value; the LSH-bucketed scale path is test-verified to
    find the same seeded pairs without the all-pairs join."""
    from solr_sematic_importer_spark.operators.dedup import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dup = emb.filter(F.col("vec_id") < 20).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    both = emb.unionByName(dup)
    dim = len(emb.first()["embedding"])
    return embedding_near_dup_pairs(both, dim, threshold=0.99, exact=True)


def q_ann_cosine(spark, sf_dir):
    from solr_sematic_importer_spark.operators.similarity_search import brute_force_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = brute_force_cosine_topk(emb, qv, k=10)
    return top.select("vec_id", F.round("cosine", 4).alias("cosine"))


# ---- rows-only entries (non-SQL-expressible: Lucene analyzer chain,
# SmallFloat norms, LSH randomness) ----------------------------------------

def q_bm25_lucene(spark, sf_dir):
    """Full Lucene-semantics path: transcripts derivation -> text_en chain
    (stop/possessive/keywordMarker/Porter) -> quantized-norm BM25 top-10.
    Verified against the pure-Python oracle in tests/."""
    from solr_sematic_importer_spark.operators.build import build_index
    from solr_sematic_importer_spark.operators.score import bm25_topk
    from solr_sematic_importer_spark.sources.transcripts import transcripts_from_documents

    _prepare(spark)
    t = transcripts_from_documents(spark, sf_dir)
    idx = build_index(t, profile="text_en")
    return bm25_topk(idx, "merging sorted windows", k=10)


def q_bm25_wand(spark, sf_dir):
    """Compressed block postings (delta+varint, 128-blocks, SmallFloat
    norms) + bucket-granular block-max WAND pruning. Oracle-gated since
    r5 (VERDICT r4 #2): SmallFloat dl quantization IS SQL-expressible —
    the oracle inlines the 256-entry Lucene length table and quantizes
    dl to the largest representable value <= dl, reproducing the WAND
    scores exactly (WAND == exhaustive-quantized bit-identity is also
    test-asserted in tests/test_block_postings.py)."""
    from solr_sematic_importer_spark.operators.block_postings import (
        bm25_topk_wand,
        build_block_postings,
    )

    idx = _doc_index(spark, sf_dir)
    if getattr(idx, "postings_blocks", None) is None:
        build_block_postings(idx, bucket_bits=10)
    top = bm25_topk_wand(idx, Q_OR, k=10)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_segmented_build(spark, sf_dir):
    """Log-structured segmented build + manifest resume (north_rule
    'resumable from checkpoint with per-partition lineage + metrics'):
    two segments appended over disjoint doc-id halves, a third append of
    an already-committed key proving the checkpoint no-op, then BM25
    through the merged read. Oracle-gated since r5: the merged segmented
    index must reproduce the single-shot BM25 oracle EXACTLY — same
    global df/N/avgdl after the manifest merge, same scores, same
    top-10 — so the whole append/manifest/merge/resume path rides the
    hard value-hash check (tests/test_segments.py
    test_segmented_equals_oneshot asserts the same equality in-process).
    Internal dense ids are mapped back to the documents table's doc_id
    via the stored key column, so the entry never relies on id-assignment
    luck."""
    import tempfile

    from solr_sematic_importer_spark.operators.score import bm25_topk
    from solr_sematic_importer_spark.operators.segments import (
        append_segment,
        read_segmented_index,
    )

    _prepare(spark)
    d = _docs(spark, sf_dir).withColumnRenamed("doc_id", "orig_id")
    lo, hi = d.filter(F.col("orig_id") < 250), d.filter(F.col("orig_id") >= 250)
    path = tempfile.mkdtemp(prefix="segidx_")
    kw = dict(key_cols=("orig_id",), profile="simple")
    append_segment(spark, path, "lo", lo, **kw)
    append_segment(spark, path, "hi", hi, **kw)
    # checkpoint resume: re-appending a committed segment key must be a
    # manifest no-op (no re-tokenize, no duplicate postings)
    res = append_segment(spark, path, "lo", lo, **kw)
    if not res.skipped:
        raise AssertionError("resume re-append was not a manifest no-op")
    idx = read_segmented_index(spark, path)
    top = bm25_topk(idx, Q_OR, k=10, quantize=False)
    # bm25_topk carries the stored key column for keyed profiles, so the
    # external id is already on the row — no extra join needed.
    return top.select(
        F.col("orig_id").alias("doc_id"), F.round("score", 4).alias("score")
    )


def q_minhash_lsh(spark, sf_dir):
    """MinHash (64 affine permutations mod Mersenne-61) + banded LSH
    (16 bands x 4 rows, bucket cap) candidate pairs. Oracle-gated since
    r5 (VERDICT r4 #2): the shingle hash is the SQL-expressible 31-bit
    polynomial (hash_col), so DuckDB mirrors the permutation/min-agg/
    banding/self-join arithmetic value-for-value. The production
    xxhash64 default rides the identical code path (tests/test_dedup.py)."""
    from solr_sematic_importer_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    _prepare(spark)
    sh = shingles(_docs(spark, sf_dir), n=3)
    sig = minhash_signatures(
        sh, num_perm=64, hash_col=_poly_hash_col(F.col("shingle"), 31)
    )
    return lsh_candidate_pairs(sig, bands=16)


def q_simhash(spark, sf_dir):
    """62-bit SimHash fingerprints over the (doc, term, tf) table.
    Oracle-gated since r5 (VERDICT r4 #2): term hash = (poly37 << 31) |
    poly31 — two independent SQL-expressible polynomial hashes — so
    DuckDB mirrors the per-bit +/-tf accumulation and sign assembly
    exactly. The production xxhash64 default rides the identical kernel
    (tests/test_dedup.py)."""
    from solr_sematic_importer_spark.operators.dedup import simhash

    idx = _doc_index(spark, sf_dir)
    h = F.shiftleft(_poly_hash_col(F.col("term"), 37), 31).bitwiseOR(
        _poly_hash_col(F.col("term"), 31)
    )
    return simhash(
        idx.postings_flat.select("doc_id", "term", "tf"), bits=62, hash_col=h
    )


def q_ann_ivf(spark, sf_dir):
    """IVF coarse-quantizer ANN (rows-only: k-means training on a seeded
    driver-side sample; assignment/probing distributed). Probing ALL
    clusters reproduces brute force exactly — tests assert it."""
    from solr_sematic_importer_spark.operators.similarity_search import (
        ivf_assign,
        ivf_cosine_topk,
        ivf_train_centroids,
    )

    _prepare(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = emb.filter(F.col("vec_id") == 0).first()
    qv = [float(x) for x in first["embedding"]]
    cent = ivf_train_centroids(emb, len(qv), n_clusters=8, iters=5)
    assigned = ivf_assign(emb, cent)
    return ivf_cosine_topk(assigned, cent, qv, k=10, nprobe=4).select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    )


def q_ann_hnsw(spark, sf_dir):
    """Q7 HNSW-class ANN (default-chunk-config.zip -> managed-schema.xml:13
    hnsw/cosine): per-partition graphs (Lucene's graph-per-segment layout),
    fan-out search + TakeOrdered merge. Rows-only (graph construction is
    not SQL-expressible); tests assert recall >= 0.9 vs brute force and
    determinism."""
    from solr_sematic_importer_spark.operators.hnsw import hnsw_build, hnsw_query

    _prepare(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = emb.filter(F.col("vec_id") == 0).first()
    qv = [float(x) for x in first["embedding"]]
    graphs = hnsw_build(emb, len(qv), m=16, ef_construction=100, num_partitions=4)
    return hnsw_query(graphs, qv, k=10, ef_search=128).select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    )


def q_chunk_embed_ann(spark, sf_dir):
    """C2/C3 embedding surface end-to-end (the reference's reason to
    exist: text -> chunk -> embedding -> vector search,
    InlineDocumentListener.java:101-104 / ChunkDocumentListener.java:
    89-156 with vector-batch-size batching, application.yml:38): char
    chunks -> batched deterministic-stub embeddings -> IVF ANN top-10.
    Rows-only (the stub embedder + seeded k-means are not
    SQL-expressible); tests assert IVF all-probe == brute force."""
    from solr_sematic_importer_spark.operators.embed import (
        chunk_and_embed,
        make_hash_embedder,
    )
    from solr_sematic_importer_spark.operators.similarity_search import (
        ivf_assign,
        ivf_cosine_topk,
        ivf_train_centroids,
    )

    _prepare(spark)
    chunks = chunk_and_embed(_docs(spark, sf_dir), size=240, overlap=40, dim=64)
    qv = make_hash_embedder(dim=64)([Q_OR])[0].tolist()
    cent = ivf_train_centroids(chunks, 64, n_clusters=8, iters=5)
    assigned = ivf_assign(chunks, cent)
    top = ivf_cosine_topk(assigned, cent, qv, k=10, nprobe=4, id_col="id")
    return top.select("id", F.round("cosine", 4).alias("cosine"))


def q_ann_lsh(spark, sf_dir):
    from solr_sematic_importer_spark.operators.similarity_search import rp_lsh_cosine_topk

    _prepare(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return rp_lsh_cosine_topk(emb, qv, dim=len(qv), k=10, bits=16, radius=4)


_MEDIA_PARQUET = "/tmp/ssi_media_oracle.parquet"
_MEDIA_READY = False


def _media(spark) -> DataFrame:
    """Materialized synthetic media table shared by the Spark queries AND
    the DuckDB oracle (read_parquet on the same path): the binary payload
    for the engine, a payload_bytes int array for the oracle's independent
    recomputation. Deterministic (seeded), size-independent of sf."""
    global _MEDIA_READY
    from solr_sematic_importer_spark.operators.multimodal import materialize_media

    _prepare(spark)
    if not _MEDIA_READY:
        materialize_media(spark, _MEDIA_PARQUET, n=120)
        _MEDIA_READY = True
    return spark.read.parquet(_MEDIA_PARQUET)


def q_media_features(spark, sf_dir):
    """Multimodal feature extraction, oracle-gated: binary payload ->
    Arrow-batched mapInPandas -> count-normalized byte histogram
    (payload_features). The vector is exploded to (media_id, dim, value)
    rows — scalar columns the driver's canonicalizer can hash. The DuckDB
    oracle recomputes the histogram from the parquet's payload_bytes
    array; the Spark side reads ONLY the binary column."""
    from solr_sematic_importer_spark.operators.multimodal import payload_features

    feats = payload_features(_media(spark))
    return feats.select(
        "media_id", F.posexplode("feature").alias("dim", "value")
    ).select("media_id", "dim", F.round("value", 6).alias("value"))


def q_delete_reload(spark, sf_dir):
    """Q6 durable delete-by-query (SolrAdminActions.java:268 + commit
    :235-246): delete the query's top-3 docs, WRITE the index, RELOAD it,
    re-query. Deleted docs must stay dead across the restart (the deletion
    vector is persisted like Lucene's .liv file). Full oracle: Lucene
    semantics keep N/avgdl/df counting deleted docs until a merge, so the
    oracle is the same BM25 ranking minus the victims."""
    import tempfile

    from solr_sematic_importer_spark.operators.build import (
        build_index,
        delete_by_query,
        read_index,
        write_index,
    )
    from solr_sematic_importer_spark.operators.score import bm25_topk

    _prepare(spark)
    # fresh build (NOT the shared _doc_index cache — we mutate deletes)
    idx = build_index(
        _docs(spark, sf_dir), text_col="text", key_cols=("doc_id",),
        profile="simple", doc_id_col="doc_id",
    )
    victims = [
        r["doc_id"]
        for r in bm25_topk(idx, Q_OR, k=3, quantize=False).select("doc_id").collect()
    ]
    delete_by_query(idx, F.col("doc_id").isin(victims))
    path = tempfile.mkdtemp(prefix="delidx_")
    write_index(idx, path)
    re = read_index(spark, path)
    top = bm25_topk(re, Q_OR, k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_highlight_topk(spark, sf_dir):
    """Solr hl=true page shape: BM25 top-10 -> broadcast join back to
    stored text -> snippet extraction with every matching token wrapped.
    Oracle-gated since r5 (VERDICT r4 #2): with frag_size covering the
    whole document the snippet is pure token/separator string assembly,
    which DuckDB mirrors via regexp_extract_all + interleave; the
    fragment-CUTTING path (windows, ellipses) stays test-verified against
    goldens in tests/test_highlight.py."""
    from solr_sematic_importer_spark.operators.highlight import highlight
    from solr_sematic_importer_spark.operators.score import bm25_topk

    _prepare(spark)
    idx = _doc_index(spark, sf_dir)
    top = bm25_topk(idx, Q_OR, k=10, quantize=False).select("doc_id")
    page = F.broadcast(top).join(_docs(spark, sf_dir), "doc_id")
    return highlight(page, Q_OR, profile="simple", frag_size=100000)


def q_streaming_dedup(spark, sf_dir):
    """Stateful streaming exact-dedup (applyInPandasWithState keyed by
    content hash): the duplicated documents slice arrives as TWO
    micro-batches; duplicates die within AND across batches. Rows-only
    (stateful streaming is not SQL-expressible)."""
    import tempfile
    import uuid

    from solr_sematic_importer_spark.streaming.windowed import dedup_stream

    _prepare(spark)
    src = tempfile.mkdtemp(prefix="streamdocs_")
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.mode("append").parquet(src)
    # second batch re-ingests an overlapping slice under remapped ids
    docs.filter(F.col("doc_id") < 100).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    ).coalesce(1).write.mode("append").parquet(src)

    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="streamckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    return spark.table(name).select("doc_id", "text_hash")


def q_media_frames(spark, sf_dir):
    """Video frame-sampling plan over the materialized media table:
    JVM-side posexplode of a duration-derived sequence (no payload read).
    Oracle: the same expansion via generate_series over meta.duration_ms."""
    from solr_sematic_importer_spark.operators.multimodal import sample_frames

    return sample_frames(_media(spark), every_ms=1000)


def q_media_stats(spark, sf_dir):
    """Metadata-only media aggregation (payload pages never read — column
    pruning): counts/bytes/durations per kind, oracle-gated."""
    from solr_sematic_importer_spark.operators.multimodal import media_stats

    stats = media_stats(_media(spark))
    return stats.select(
        "kind", "cnt", "total_bytes",
        F.round("avg_duration_ms", 4).alias("avg_duration_ms"),
    )


# --------------------------------------------------------------------------
# multi-field documents + weighted multi-field query (qf / edismax)
# --------------------------------------------------------------------------

MF_QF = {"title": 3.0, "body": 1.0}
MF_TIE = 0.3


def _mf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (title, body) split of the documents table — the MS
    MARCO-shaped two-field fixture (title = first 8 space-tokens, body =
    the rest; short docs get an empty body, exercising per-field
    docCount)."""
    w = F.split(F.col("text"), " ")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.array_join(F.slice(w, 1, 8), " ").alias("title"),
        F.array_join(
            F.expr("slice(split(text, ' '), 9, greatest(size(split(text, ' ')) - 8, 0))"),
            " ",
        ).alias("body"),
    )


def _mf_index(spark: SparkSession, sf_dir: str):
    from solr_sematic_importer_spark.operators.multifield import (
        build_multifield_index,
    )

    key = ("mf", sf_dir)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    _prepare(spark)
    mf = build_multifield_index(
        _mf_docs(spark, sf_dir),
        fields=("title", "body"),
        profile="simple",
        doc_id_col="doc_id",
    )
    _INDEX_CACHE[key] = mf
    return mf


def q_bm25_multifield(spark, sf_dir):
    """qf-weighted multi-field BM25 (sum combine): per-field postings +
    per-field statistics, score = sum_f boost_f * BM25_f(t, d)."""
    from solr_sematic_importer_spark.operators.multifield import (
        bm25_multifield_topk,
    )

    mf = _mf_index(spark, sf_dir)
    top = bm25_multifield_topk(mf, Q_OR, MF_QF, k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_dismax(spark, sf_dir):
    """edismax DisjunctionMax combine: per term max_f + tie * (sum - max)."""
    from solr_sematic_importer_spark.operators.multifield import (
        bm25_multifield_topk,
    )

    mf = _mf_index(spark, sf_dir)
    top = bm25_multifield_topk(
        mf, Q_OR, MF_QF, k=10, quantize=False, combine="dismax", tie=MF_TIE
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_schemaless_infer(spark, sf_dir):
    """Solr schemaless add-unknown-fields chain (semantic_base_config.zip
    -> solrconfig.xml:891-947): remove-blank, field-name mutation,
    parse-boolean/long/double/date fallback, text -> *_str copy field
    truncated at 256 chars. The fixture stringifies orders columns with
    one name needing sanitizing, one blank-bearing text column, and one
    mixed numeric column that must fall through long to double."""
    from solr_sematic_importer_spark.sources.schemaless import (
        infer_field_types,
    )

    _prepare(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fixture = o.select(
        F.col("o_orderkey").cast("string").alias("order key!"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("")).otherwise(
            F.col("o_orderstatus")
        ).alias("status"),
        F.format_string("%.2f", F.col("o_totalprice")).alias("price"),
        F.date_format(F.col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("odate"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("true")).otherwise(
            F.lit("False")
        ).alias("flag"),
        F.when(F.col("o_orderkey") == 0, F.lit("1.5")).otherwise(
            F.col("o_orderkey").cast("string")
        ).alias("mixed"),
        F.repeat(F.col("o_orderpriority"), 40).alias("longtext"),
    )
    typed, types = infer_field_types(fixture)
    assert types["order_key_"] == "long" and types["flag"] == "boolean"
    assert types["price"] == "double" and types["odate"] == "date"
    assert types["mixed"] == "double" and types["status"] == "text"
    return typed.select(
        "order_key_",
        "flag",
        F.round("price", 2).alias("price"),
        "odate",
        F.round("mixed", 2).alias("mixed"),
        "status",
        "status_str",
        F.length("longtext_str").alias("lt_len"),
    )


def q_fielded_query(spark, sf_dir):
    """Classic-parser query with concrete field qualifiers: per-field
    TermQueries + qf-disjunction for the bare term + MUST_NOT anti-join."""
    from solr_sematic_importer_spark.operators.multifield import (
        fielded_query_topk,
    )

    mf = _mf_index(spark, sf_dir)
    top = fielded_query_topk(mf, FIELDED_Q, MF_QF, k=10, quantize=False)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_min_should_match(spark, sf_dir):
    """edismax mm=2: a doc must match at least 2 of the 3 optional
    clauses (Lucene BooleanQuery.setMinimumNumberShouldMatch)."""
    from solr_sematic_importer_spark.operators.score import bm25_topk

    idx = _doc_index(spark, sf_dir)
    top = bm25_topk(idx, Q_OR, k=10, quantize=False, min_match=2)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_mm_conditional(spark, sf_dir):
    """edismax conditional mm spec '2<-25%' on a 4-term query: above 2
    optional clauses, all-but-25% are required -> 3 of 4 (the full
    SolrPluginUtils.calculateMinShouldMatch grammar, the destination
    handler's tuned-search form — solrconfig.xml:650-670)."""
    from solr_sematic_importer_spark.operators.score import bm25_topk

    idx = _doc_index(spark, sf_dir)
    top = bm25_topk(
        idx, "merge sort window dup", k=10, quantize=False, min_match="2<-25%"
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_select_combined(spark, sf_dir):
    """ONE /select request composing q + fq + boost + collapse — the
    handler's everyday combined form (solrconfig.xml:650-680) through the
    single-call front door (operators/select.py)."""
    from solr_sematic_importer_spark.operators.function_query import recip
    from solr_sematic_importer_spark.operators.select import select

    idx = _doc_index(spark, sf_dir)
    fields = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    r = select(
        idx, Q_OR,
        fq=F.col("doc_id") % 2 == 0,
        fields=fields,
        boost=recip(F.col("n_chars"), 0.001, 1.0, 1.0),
        collapse_field="source",
        rows=10, quantize=False,
    )
    return r.docs.select("doc_id", "source", F.round("score", 4).alias("score"))


def q_select_combined_facet(spark, sf_dir):
    """The SAME combined /select request's facet section: counts on lang
    over the post-fq, post-collapse match set (collapse is an fq, so
    facets see the collapsed set — CollapsingQParser semantics)."""
    from solr_sematic_importer_spark.operators.function_query import recip
    from solr_sematic_importer_spark.operators.select import select

    idx = _doc_index(spark, sf_dir)
    fields = _docs(spark, sf_dir).select("doc_id", "source", "lang", "n_chars")
    r = select(
        idx, Q_OR,
        fq=F.col("doc_id") % 2 == 0,
        fields=fields,
        boost=recip(F.col("n_chars"), 0.001, 1.0, 1.0),
        collapse_field="source",
        facet_fields=("lang",),
        rows=10, quantize=False,
    )
    out = r.facets["lang"].select(
        "lang", F.col("cnt").cast("long").alias("cnt")
    )
    # the gate consumes only this one section: release the shared match
    # set now (recompute-on-collect) rather than leak a cached frame per
    # invocation — the persist pays off only for multi-section consumers
    r.release()
    return out


def q_select_facet_range_pivot(spark, sf_dir):
    """ONE /select request carrying facet.range (n_chars bucketed by 100)
    AND facet.pivot (lang,source) alongside q + fq — the combined facet
    surface through the front door (VERDICT r4 #8). Both facet sections
    count the same post-fq match set; the entry folds them into one
    (facet, key, cnt) frame so the oracle checks both."""
    from solr_sematic_importer_spark.operators.select import select

    idx = _doc_index(spark, sf_dir)
    flds = _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars")
    r = select(
        idx, Q_OR,
        fq=F.col("doc_id") % 2 == 0,
        fields=flds,
        facet_ranges={
            "len_bucket": (F.floor(F.col("n_chars") / 100) * 100).cast("long")
        },
        facet_pivots=(("lang", "source"),),
        rows=10, quantize=False,
    )
    rng = r.facets["len_bucket"].select(
        F.lit("range").alias("facet"),
        F.col("len_bucket").cast("string").alias("key"),
        F.col("cnt").cast("long").alias("cnt"),
    )
    piv = r.facets["lang,source"].select(
        F.lit("pivot").alias("facet"),
        F.concat_ws("/", "lang", "source").alias("key"),
        F.col("cnt").cast("long").alias("cnt"),
    )
    out = rng.unionByName(piv)
    r.release()  # single returned frame: don't leak the per-request cache
    return out


def q_bm25_boost_function(spark, sf_dir):
    """edismax boost= multiplicative function query: final =
    bm25 * recip(n_chars, 0.001, 1, 1) — shorter docs float up."""
    from solr_sematic_importer_spark.operators.function_query import (
        bm25_boosted_topk,
        recip,
    )

    idx = _doc_index(spark, sf_dir)
    fields = _docs(spark, sf_dir).select("doc_id", "n_chars")
    top = bm25_boosted_topk(
        idx, Q_OR, fields, recip(F.col("n_chars"), 0.001, 1.0, 1.0),
        k=10, quantize=False,
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_rerank_query(spark, sf_dir):
    """rq={!rerank reRankQuery='dup' reRankDocs=30 reRankWeight=2}: only
    the main query's top-30 get the additive rerank-score adjustment."""
    from solr_sematic_importer_spark.operators.function_query import rerank_topk

    idx = _doc_index(spark, sf_dir)
    top = rerank_topk(
        idx, Q_OR, Q_RARE, rerank_docs=30, rerank_weight=2.0, k=10,
        quantize=False,
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_collapse_field(spark, sf_dir):
    """fq={!collapse field=source}: top-scoring doc per source value,
    survivors ranked — a flat list, unlike result grouping's groups."""
    from solr_sematic_importer_spark.operators.function_query import (
        bm25_collapse_topk,
    )

    idx = _doc_index(spark, sf_dir)
    fields = _docs(spark, sf_dir).select("doc_id", "source")
    top = bm25_collapse_topk(idx, Q_OR, fields, "source", k=10, quantize=False)
    return top.select(
        "doc_id", "source", F.round("score", 4).alias("score")
    )


def q_json_facet_stats(spark, sf_dir):
    """JSON Facet API terms facet with nested stats over the query match
    set: per-lang bucket count + avg(n_chars) + sum(dl)."""
    from solr_sematic_importer_spark.operators.score import json_facet_stats

    idx = _doc_index(spark, sf_dir)
    fields = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars").join(
        idx.doc_stats.select("doc_id", "dl"), "doc_id"
    )
    return json_facet_stats(
        idx,
        Q_OR,
        fields,
        "lang",
        aggs=[
            ("avg_len", lambda c: F.round(F.avg(c("n_chars")), 4)),
            ("sum_dl", lambda c: F.sum(c("dl"))),
        ],
        limit=10,
        quantize=False,
    )


TV_DOC_IDS = [3, 7, 11]
ELEVATE_IDS = [5, 42]


def q_term_vectors(spark, sf_dir):
    """/tv TermVectorComponent: per-doc term vectors (tf) + corpus df for
    the requested docs, served from the doc-major forward index."""
    from solr_sematic_importer_spark.operators.mlt import term_vectors

    idx = _doc_index(spark, sf_dir)
    return term_vectors(idx, TV_DOC_IDS, with_stats=True)


def q_debug_explain(spark, sf_dir):
    """debugQuery=true: per-term Explanation leaves (tf, df, idf,
    partial) for the query's top-5 docs; sum(partial) == score."""
    from solr_sematic_importer_spark.operators.score import explain_topk

    idx = _doc_index(spark, sf_dir)
    ex = explain_topk(idx, Q_OR, k=5, quantize=False)
    return ex.select(
        "doc_id", "term", "tf", "df",
        F.round("idf", 4).alias("idf"),
        F.round("partial", 4).alias("partial"),
    )


def q_elevated_query(spark, sf_dir):
    """QueryElevationComponent: editorial docs pinned first in configured
    order (forceElevation), organic ranking follows minus those docs."""
    from solr_sematic_importer_spark.operators.function_query import (
        elevated_topk,
    )

    idx = _doc_index(spark, sf_dir)
    top = elevated_topk(idx, Q_OR, ELEVATE_IDS, k=10, quantize=False)
    return top.select(
        "doc_id", F.round("score", 4).alias("score"), "elevated", "rank"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Entry ORDER is part of the contract: the driver's correctness
    window covers the FIRST 50 oracle-gated entries, so entries the
    driver has never (or least recently) confirmed rotate to the front
    each round (VERDICT r4 next-round #1). Round-5 front block: the 20
    oracle entries whose last driver pass was r1-r3 code, then the four
    entries newly CONVERTED from rows-only to full oracles plus the new
    combined-facet /select entry (VERDICT r4 #2/#8), then the operators
    whose semantics changed this round (select composition order,
    elevation rank density, dedup checkpointing). The r4-green media/
    source/textstats block takes its turn OUTSIDE the window — the local
    contract gate (tests/test_entry_contract.py, `make check-entries`)
    still verifies every entry at sf0.01 regardless of order."""
    return {
        # -- last driver-checked on r1-r3 code: recertify on r5 code ----
        "fingerprint": q_fingerprint,
        "tf_per_doc_term": q_tf,
        "docfreq": q_docfreq,
        "doc_stats_dl": q_doc_stats,
        "corpus_stats": q_corpus_stats,
        "bm25_topk_or": q_bm25_or,
        "bm25_topk_rare": q_bm25_rare,
        "bm25_conjunction": q_bm25_and,
        "bm25_offset_page": q_bm25_page2,
        "bm25_exclude_term": q_bm25_exclude,
        "bm25_filtered": q_bm25_filtered,
        "bm25_phrase": q_bm25_phrase,
        "bm25_synonym_query": q_bm25_synonyms,
        "bm25_grouped_topk": q_bm25_grouped,
        "cursor_page": q_cursor_page,
        "spellcheck": q_spellcheck,
        "sort_by_field": q_sort_by_field,
        "lucene_syntax_query": q_lucene_syntax_query,
        "facet_lang": q_facet_lang,
        "top_terms_by_df": q_top_terms,
        # -- NEW oracles this round (converted from rows-only + facets) --
        "bm25_wand_blocks": q_bm25_wand,
        "minhash_lsh_candidates": q_minhash_lsh,
        "simhash_fingerprints": q_simhash,
        "highlight_topk": q_highlight_topk,
        "select_facet_range_pivot": q_select_facet_range_pivot,
        # -- semantics touched this round (select/elevation/dedup) -------
        "select_combined": q_select_combined,
        "select_combined_facet": q_select_combined_facet,
        "rerank_query": q_rerank_query,
        "collapse_field": q_collapse_field,
        "elevated_query": q_elevated_query,
        "near_dup_components": q_near_dup_components,
        # -- NEWLY oracle-gated this round: segment append/merge/resume --
        "segmented_build_resume": q_segmented_build,
        # -- r4-green, keeping their window seat while room permits ------
        "mm_conditional": q_mm_conditional,
        "fuzzy_query": q_fuzzy_query,
        "bm25_boost_function": q_bm25_boost_function,
        "wildcard_query": q_wildcard_query,
        "bm25_phrase_slop": q_bm25_phrase_slop,
        "bm25_multifield": q_bm25_multifield,
        "bm25_dismax": q_bm25_dismax,
        "fielded_query": q_fielded_query,
        "bm25_min_should_match": q_bm25_min_should_match,
        "json_facet_stats": q_json_facet_stats,
        "term_vectors": q_term_vectors,
        "debug_explain": q_debug_explain,
        "facet_source": q_facet_source,
        "facet_range_day": q_facet_range_day,
        "facet_on_query": q_facet_on_query,
        "facet_pivot": q_facet_pivot,
        "ann_cosine_topk": q_ann_cosine,
        "embedding_near_dup": q_embedding_near_dup,
        # -------- window boundary (50 oracle entries above; ngram_jaccard
        # and content_hash_groups, both r4-green, take their turn outside
        # to make room for the newly gated segmented_build_resume) -------
        "ngram_jaccard": q_ngram_jaccard,
        "content_hash_groups": q_content_hash_groups,
        # -- r4-green, outside the window this round (local gate covers) -
        "media_features": q_media_features,
        "media_frame_sample": q_media_frames,
        "media_stats_by_kind": q_media_stats,
        "delete_reload_query": q_delete_reload,
        "protobuf_wire_roundtrip": q_protobuf_wire,
        "flatten_nested": q_flatten_nested,
        "bpe_token_count": q_bpe_token_count,
        "token_stats": q_token_stats,
        "stopword_ratio": q_stopword_ratio,
        "lang_id": q_lang_id,
        "quality_score": q_quality,
        "truncate_field": q_truncate,
        "solr_date_format": q_solr_dates,
        "schemaless_infer": q_schemaless_infer,
        "terms_component": q_terms_component,
        "prefix_query": q_prefix_query,
        "more_like_this": q_more_like_this,
        "field_stats": q_field_stats,
        "chunks_char": q_chunks,
        "chunk_parent_join": q_chunk_parent_join,
        "block_join_parent": q_block_join_parent,
        "chunk_stats": q_chunk_stats,
        "orphan_anti_join": q_orphan_anti_join,
        "window_first_event": q_window_first_event,
        # rows-only (no oracle entry):
        "bm25_lucene_text_en": q_bm25_lucene,
        "ann_lsh_topk": q_ann_lsh,
        "ann_ivf_topk": q_ann_ivf,
        "ann_hnsw_topk": q_ann_hnsw,
        "chunk_embed_ann_topk": q_chunk_embed_ann,
        "streaming_dedup": q_streaming_dedup,
    }


def rows_only() -> set[str]:
    """Entries intentionally WITHOUT an oracle_sql() row (non-SQL-
    expressible: Lucene text_en stemming, approximate ANN, seeded
    k-means/graph construction, streaming state). Every queries() key
    must appear in oracle_sql() OR here —
    tests/test_entry_contract.py enforces the lockstep so an entry can
    never silently ship unverified (VERDICT r2 next-round #8)."""
    return {
        "bm25_lucene_text_en",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_hnsw_topk",
        "chunk_embed_ann_topk",
        "streaming_dedup",
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB; views pre-registered per parquet table)
# --------------------------------------------------------------------------

_TOKS = """
toks AS (
    SELECT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        FROM documents
    ) WHERE term <> ''
)"""

_TF = _TOKS + """,
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf
    FROM toks GROUP BY doc_id, term
)"""

_DL = """,
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl)"""


def _bm25_oracle(
    terms: list[str],
    conjunction: bool = False,
    offset: int = 0,
    exclude: str | None = None,
    k: int = 10,
    delete_top: int = 0,
    fq: str | None = None,
    mm: int = 0,
) -> str:
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    having = f"HAVING count(*) = {len(set(terms))}" if conjunction else ""
    if mm:
        having = f"HAVING count(*) >= {mm}"
    not_in = (
        f"WHERE tf.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = '{exclude}')"
        if exclude
        else ""
    )
    # delete_top: durable delete-by-query of the query's own top-N — Lucene
    # keeps N/avgdl/df counting deleted docs until a merge, so scores are
    # unchanged and the victims are simply filtered out of the ranking.
    # fq: Solr filter query — restricts the ranked set, stats unchanged.
    conds = []
    if delete_top:
        conds.append(
            "doc_id NOT IN (SELECT doc_id FROM scores "
            f"ORDER BY raw_score DESC, doc_id ASC LIMIT {delete_top})"
        )
    if fq:
        conds.append(fq)
    del_where = ("WHERE " + " AND ".join(conds)) if conds else ""
    return f"""
WITH {_TF}{_DL},
qt AS (SELECT unnest([{terms_sql}]) AS term),
dft AS (
    SELECT term, count(*)::BIGINT AS df FROM tf
    WHERE term IN (SELECT term FROM qt) GROUP BY term
),
scores AS (
    SELECT tf.doc_id,
           sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
               * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
              ) AS raw_score
    FROM tf
    JOIN dft USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats s
    {not_in}
    GROUP BY tf.doc_id
    {having}
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores {del_where} ORDER BY raw_score DESC, doc_id ASC LIMIT {k} OFFSET {offset}
"""


def _bm25_quantized_oracle(terms: list[str], k: int = 10) -> str:
    """The WAND oracle: BM25 over SmallFloat-QUANTIZED dl. The 256-entry
    Lucene length table is inlined and dl maps to the largest
    representable value <= dl (functions/similarity.py quantize_dl);
    avgdl stays the raw corpus average, exactly as the block scorer
    computes (operators/block_postings.py:122-123)."""
    from solr_sematic_importer_spark.functions.similarity import LENGTH_TABLE

    lt_vals = ", ".join(str(int(v)) for v in LENGTH_TABLE)
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TF}{_DL},
lt AS (SELECT unnest([{lt_vals}]) AS v),
dlq AS (
    SELECT dl.doc_id, (SELECT max(v) FROM lt WHERE v <= dl.dl) AS dlq
    FROM dl
),
qt AS (SELECT unnest([{terms_sql}]) AS term),
dft AS (
    SELECT term, count(*)::BIGINT AS df FROM tf
    WHERE term IN (SELECT term FROM qt) GROUP BY term
),
scores AS (
    SELECT tf.doc_id,
           sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
               * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dlq.dlq / s.avgdl))
              ) AS raw_score
    FROM tf
    JOIN dft USING (term)
    JOIN dlq USING (doc_id)
    CROSS JOIN stats s
    GROUP BY tf.doc_id
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores ORDER BY raw_score DESC, doc_id ASC LIMIT {k}
"""


_POLY_H = (
    "list_reduce(list_prepend(0::BIGINT, list_transform("
    "range(1, length({col}) + 1), j -> ascii({col}[j:j])::BIGINT)), "
    "(a, c) -> (a * {mult} + c) % 2147483647)"
)


def _minhash_lsh_oracle() -> str:
    """Mirror of shingles(n=3) -> minhash_signatures(num_perm=64,
    hash_col=poly31) -> lsh_candidate_pairs(bands=16, max_bucket=1000):
    same tokenization, same distinct shingles, same affine permutation
    constants (embedded from dedup._perm_constants so they cannot
    drift), banding by the band SLICE VALUE (the engine buckets by
    xxhash64 of the slice — identical partition modulo hash collisions)."""
    from solr_sematic_importer_spark.operators.dedup import (
        _MERSENNE,
        _perm_constants,
    )

    perms = _perm_constants(64)
    min_cols = ", ".join(
        f"min((h * {a} + {b}) % {_MERSENNE}) AS m{i}"
        for i, (a, b) in enumerate(perms)
    )
    sig_list = ", ".join(f"m{i}" for i in range(64))
    poly = _POLY_H.format(col="shingle", mult=31)
    return f"""
WITH toksn AS (
    SELECT doc_id,
           list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                       x -> x <> '') AS ts
    FROM documents
),
shl AS (
    SELECT doc_id,
           unnest(list_transform(range(0, greatest(len(ts) - 3, 0) + 1),
                                 i -> array_to_string(ts[i+1:i+3], ' '))) AS shingle
    FROM toksn
),
sh AS (SELECT DISTINCT doc_id, shingle FROM shl WHERE length(shingle) > 0),
hs AS (SELECT doc_id, {poly} AS h FROM sh),
sigc AS (SELECT doc_id, {min_cols} FROM hs GROUP BY doc_id),
sig AS (SELECT doc_id, [{sig_list}] AS signature FROM sigc),
banded AS (
    SELECT doc_id, band,
           array_to_string(signature[band*4+1 : band*4+4], ',') AS key
    FROM (SELECT doc_id, signature, unnest(range(0, 16)) AS band FROM sig)
),
ok AS (
    SELECT band, key FROM banded GROUP BY band, key
    HAVING count(*) > 1 AND count(*) <= 1000
),
pruned AS (
    SELECT banded.doc_id, banded.band, banded.key
    FROM banded JOIN ok USING (band, key)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM pruned a
JOIN pruned b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
"""


def _simhash_oracle() -> str:
    """Mirror of simhash(bits=62, hash_col=(poly37 << 31) | poly31):
    per-(doc, bit) signed tf accumulation, sign -> bit, fingerprint bit i
    of the hash lands at weight 2^(61-i) (the engine folds the bit array
    MSB-first via shiftleft)."""
    p31 = _POLY_H.format(col="term", mult=31)
    p37 = _POLY_H.format(col="term", mult=37)
    return f"""
WITH {_TF},
tfh AS (
    SELECT doc_id, tf, ({p37} * 2147483648 + {p31}) AS h
    FROM tf
),
bitsum AS (
    SELECT doc_id, i,
           sum(CASE WHEN (h >> i) & 1 = 1 THEN tf ELSE -tf END) AS s
    FROM (SELECT doc_id, tf, h, unnest(range(0, 62)) AS i FROM tfh)
    GROUP BY doc_id, i
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << (61 - i)::INT) ELSE 0 END)::BIGINT AS simhash
FROM bitsum GROUP BY doc_id
"""


def _highlight_oracle(terms: list[str], k: int = 10) -> str:
    """Mirror of highlight(profile='simple', frag_size=whole-doc) over
    the BM25 top-k page: tokens = maximal [a-zA-Z0-9]+ runs, every token
    whose lowercase form is a query term wrapped in <em></em>, original
    separators reassembled in place; docs with no matching token are
    omitted (the engine returns None -> filtered)."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TF}{_DL},{_scores_cte('m', terms)},
page AS (SELECT doc_id FROM ms ORDER BY raw DESC, doc_id ASC LIMIT {k}),
hd AS (
    SELECT d.doc_id,
           regexp_extract_all(d.text, '[a-zA-Z0-9]+') AS toks,
           regexp_extract_all(d.text, '[^a-zA-Z0-9]+') AS seps,
           regexp_matches(d.text, '^[^a-zA-Z0-9]') AS starts_sep
    FROM documents d JOIN page USING (doc_id)
),
hw AS (
    SELECT doc_id,
           CASE WHEN starts_sep THEN seps ELSE list_prepend('', seps) END AS lead,
           list_transform(toks, t ->
               CASE WHEN lower(t) IN ({terms_sql})
                    THEN '<em>' || t || '</em>' ELSE t END) AS wrapped
    FROM hd
    WHERE len(list_filter(toks, t -> lower(t) IN ({terms_sql}))) > 0
)
SELECT doc_id,
       array_to_string(list_transform(range(1, len(wrapped) + 1),
                                      i -> coalesce(lead[i], '') || wrapped[i]), '')
       || coalesce(lead[len(wrapped) + 1], '') AS snippet
FROM hw
"""


def _select_facet_range_pivot_oracle(terms: list[str]) -> str:
    """facet.range + facet.pivot over the post-fq match set of one
    /select request, folded into one (facet, key, cnt) frame."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TF},
m AS (
    SELECT DISTINCT doc_id FROM tf
    WHERE term IN ({terms_sql}) AND doc_id % 2 = 0
),
mf AS (SELECT d.* FROM documents d JOIN m USING (doc_id))
SELECT 'range' AS facet, CAST((n_chars // 100) * 100 AS VARCHAR) AS key,
       count(*)::BIGINT AS cnt
FROM mf GROUP BY 2
UNION ALL
SELECT 'pivot' AS facet, lang || '/' || source AS key, count(*)::BIGINT AS cnt
FROM mf GROUP BY 2
"""


def _scores_cte(prefix: str, terms: list[str]) -> str:
    """One named BM25 scoring CTE chain (``{prefix}qt``, ``{prefix}dft``,
    ``{prefix}s`` with column ``raw``) over the shared tf/dl/stats CTEs —
    lets an oracle hold several independent queries (rerank) without CTE
    name collisions."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""
{prefix}qt AS (SELECT unnest([{terms_sql}]) AS term),
{prefix}dft AS (
    SELECT term, count(*)::BIGINT AS df FROM tf
    WHERE term IN (SELECT term FROM {prefix}qt) GROUP BY term
),
{prefix}s AS (
    SELECT tf.doc_id,
           sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
              ) AS raw
    FROM tf
    JOIN {prefix}dft d USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats s
    GROUP BY tf.doc_id
)"""


def _boost_oracle(terms: list[str], k: int = 10) -> str:
    """bm25 * recip(n_chars, 0.001, 1, 1) — expression order mirrors
    operators/function_query.py::recip so the doubles agree bit-for-bit."""
    return f"""
WITH {_TF}{_DL},{_scores_cte('m', terms)}
SELECT ms.doc_id,
       round(ms.raw * (1.0 / (0.001 * d.n_chars + 1.0)), 4) AS score
FROM ms JOIN documents d USING (doc_id)
ORDER BY ms.raw * (1.0 / (0.001 * d.n_chars + 1.0)) DESC, ms.doc_id ASC
LIMIT {k}
"""


def _rerank_oracle(
    main_terms: list[str],
    rr_terms: list[str],
    rerank_docs: int,
    weight: float,
    k: int = 10,
) -> str:
    return f"""
WITH {_TF}{_DL},{_scores_cte('m', main_terms)},{_scores_cte('r', rr_terms)},
head AS (
    SELECT doc_id, raw FROM ms ORDER BY raw DESC, doc_id ASC LIMIT {rerank_docs}
)
SELECT h.doc_id, round(h.raw + {weight} * coalesce(rs.raw, 0), 4) AS score
FROM head h LEFT JOIN rs USING (doc_id)
ORDER BY h.raw + {weight} * coalesce(rs.raw, 0) DESC, h.doc_id ASC
LIMIT {k}
"""


def _collapse_oracle(terms: list[str], field: str, k: int = 10) -> str:
    return f"""
WITH {_TF}{_DL},{_scores_cte('m', terms)},
j AS (
    SELECT ms.doc_id, d.{field}, ms.raw FROM ms
    JOIN documents d USING (doc_id)
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY {field} ORDER BY raw DESC, doc_id ASC) AS rn
    FROM j
)
SELECT doc_id, {field}, round(raw, 4) AS score
FROM r WHERE rn = 1 ORDER BY raw DESC, doc_id ASC LIMIT {k}
"""


def _elevated_oracle(terms: list[str], elevate_ids: list[int], k: int = 10) -> str:
    """Pinned editorial head (rank = configured position, score = organic
    score or 0) + organic tail at rank len(elev)+row_number — exactly the
    engine's rank contract."""
    n = len(elevate_ids)
    vals = ", ".join(f"({d}, {i})" for i, d in enumerate(elevate_ids))
    return f"""
WITH {_TF}{_DL},{_scores_cte('m', terms)},
elev AS (SELECT * FROM (VALUES {vals}) AS t(doc_id, pos)),
pinned AS (
    SELECT e.doc_id, round(coalesce(ms.raw, 0), 4) AS score,
           TRUE AS elevated, e.pos::BIGINT AS rank
    FROM elev e LEFT JOIN ms USING (doc_id)
),
organic AS (
    SELECT doc_id, round(raw, 4) AS score, FALSE AS elevated,
           ({n} + row_number() OVER (ORDER BY raw DESC, doc_id ASC) - 1)::BIGINT AS rank
    FROM ms WHERE doc_id NOT IN (SELECT doc_id FROM elev)
)
SELECT doc_id, score, elevated, rank
FROM (SELECT * FROM pinned UNION ALL SELECT * FROM organic)
ORDER BY rank LIMIT {k}
"""


def _json_facet_oracle(terms: list[str], field: str, k: int = 10) -> str:
    return f"""
WITH {_TF}{_DL},{_scores_cte('m', terms)}
SELECT d.{field},
       count(*)::BIGINT AS count,
       round(avg(d.n_chars), 4) AS avg_len,
       sum(dl.dl)::BIGINT AS sum_dl
FROM ms JOIN documents d USING (doc_id) JOIN dl USING (doc_id)
GROUP BY d.{field} ORDER BY count DESC, d.{field} ASC LIMIT {k}
"""


# shared CTEs for the multi-field oracles: the (title, body) split of the
# documents table plus per-field tf / dl / stats (docCount_f, avgdl_f)
_MF_CTES = """docs2 AS (
    SELECT doc_id,
           array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS title,
           array_to_string(
               list_slice(string_split(text, ' '), 9,
                          len(string_split(text, ' '))), ' ') AS body
    FROM documents
),
ftoks AS (
    SELECT * FROM (
        SELECT doc_id, 'title' AS field,
               unnest(string_split_regex(lower(title), '[^a-z0-9]+')) AS term
        FROM docs2
        UNION ALL
        SELECT doc_id, 'body',
               unnest(string_split_regex(lower(body), '[^a-z0-9]+'))
        FROM docs2
    ) WHERE term <> ''
),
ftf AS (
    SELECT field, doc_id, term, count(*)::BIGINT AS tf
    FROM ftoks GROUP BY field, doc_id, term
),
fdl AS (
    SELECT field, doc_id, count(*)::BIGINT AS dl
    FROM ftoks GROUP BY field, doc_id
),
fstats AS (
    SELECT field, count(*)::BIGINT AS n, sum(dl)::DOUBLE / count(*) AS avgdl
    FROM fdl GROUP BY field
)"""


def _mf_oracle(terms: list[str], combine: str = "sum", k: int = 10) -> str:
    """Multi-field qf-weighted BM25 oracle: (title, body) split of the
    documents table with per-field stats (docCount_f, avgdl_f, df_f) and
    either the weighted-sum or the DisMax(tie) per-term combine — the SQL
    mirror of operators/multifield.py."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    boosts_sql = " UNION ALL ".join(
        f"SELECT '{f}' AS field, {w} AS boost" for f, w in MF_QF.items()
    )
    if combine == "dismax":
        per_doc = f"""
perterm AS (
    SELECT doc_id, term,
           max(p) + {MF_TIE} * (sum(p) - max(p)) AS s
    FROM partials GROUP BY doc_id, term
),
scores AS (SELECT doc_id, sum(s) AS raw FROM perterm GROUP BY doc_id)"""
    else:
        per_doc = """
scores AS (SELECT doc_id, sum(p) AS raw FROM partials GROUP BY doc_id)"""
    return f"""
WITH {_MF_CTES},
qt AS (SELECT unnest([{terms_sql}]) AS term),
fdft AS (
    SELECT field, term, count(*)::BIGINT AS df FROM ftf
    WHERE term IN (SELECT term FROM qt) GROUP BY field, term
),
boosts AS ({boosts_sql}),
partials AS (
    SELECT ftf.doc_id, ftf.term,
           b.boost * ln(1 + (fs.n - fdft.df + 0.5) / (fdft.df + 0.5))
             * ftf.tf / (ftf.tf + {BM25_K1} * (1 - {BM25_B}
                         + {BM25_B} * fdl.dl / fs.avgdl)) AS p
    FROM ftf
    JOIN fdft USING (field, term)
    JOIN fdl USING (field, doc_id)
    JOIN fstats fs USING (field)
    JOIN boosts b USING (field)
),{per_doc}
SELECT doc_id, round(raw, 4) AS score
FROM scores ORDER BY raw DESC, doc_id ASC LIMIT {k}
"""


FIELDED_Q = "title:merge body:sort window -title:dup"


def _fielded_oracle(k: int = 10) -> str:
    """Oracle for FIELDED_Q over the multi-field index: per-field
    TermQueries for the qualified clauses, an edismax qf-sum for the
    unqualified term, and an anti-join for the prohibited clause."""
    cl_rows = [
        ("title", "merge", 1.0),
        ("body", "sort", 1.0),
    ] + [(f, "window", w) for f, w in MF_QF.items()]
    cl_sql = " UNION ALL ".join(
        f"SELECT '{f}' AS field, '{t}' AS term, {w} AS cboost"
        for f, t, w in cl_rows
    )
    return f"""
WITH {_MF_CTES},
cl AS ({cl_sql}),
fdft AS (
    SELECT field, term, count(*)::BIGINT AS df FROM ftf
    WHERE (field, term) IN (SELECT (field, term) FROM cl)
    GROUP BY field, term
),
partials AS (
    SELECT ftf.doc_id,
           cl.cboost * ln(1 + (fs.n - fdft.df + 0.5) / (fdft.df + 0.5))
             * ftf.tf / (ftf.tf + {BM25_K1} * (1 - {BM25_B}
                         + {BM25_B} * fdl.dl / fs.avgdl)) AS p
    FROM ftf
    JOIN cl USING (field, term)
    JOIN fdft USING (field, term)
    JOIN fdl USING (field, doc_id)
    JOIN fstats fs USING (field)
),
scores AS (SELECT doc_id, sum(p) AS raw FROM partials GROUP BY doc_id),
banned AS (
    SELECT DISTINCT doc_id FROM ftf WHERE field = 'title' AND term = 'dup'
)
SELECT doc_id, round(raw, 4) AS score
FROM scores WHERE doc_id NOT IN (SELECT doc_id FROM banned)
ORDER BY raw DESC, doc_id ASC LIMIT {k}
"""


_STOPWORDS_SQL = None


def _bpe_count_oracle() -> str:
    from solr_sematic_importer_spark.operators.textstats import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> ''))::INT AS n_ws_tokens,
               len(regexp_extract_all(text, '{pat}'))::INT AS n_bpe_ish
        FROM documents"""


def _stopword_list_sql() -> str:
    from solr_sematic_importer_spark.operators.textstats import STOPWORD_LIST

    return ", ".join(f"'{w}'" for w in STOPWORD_LIST)


def oracle_sql() -> dict[str, str]:
    sw = _stopword_list_sql()
    return {
        "tf_per_doc_term": f"WITH {_TF} SELECT doc_id, term, tf FROM tf",
        "docfreq": f"""
            WITH {_TF}
            SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
            FROM tf GROUP BY term""",
        "doc_stats_dl": f"""
            WITH {_TOKS}
            SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id""",
        "corpus_stats": f"""
            WITH {_TOKS},
            dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id)
            SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
                   round(sum(dl)::DOUBLE / count(*), 4) AS avgdl
            FROM dl""",
        "bm25_topk_or": _bm25_oracle(Q_OR.split()),
        # segmented append+resume+merge must reproduce the single-shot
        # BM25 oracle exactly (global df/N/avgdl merged across segments)
        "segmented_build_resume": _bm25_oracle(Q_OR.split()),
        "bm25_topk_rare": _bm25_oracle(Q_RARE.split()),
        "bm25_wand_blocks": _bm25_quantized_oracle(Q_OR.split()),
        "minhash_lsh_candidates": _minhash_lsh_oracle(),
        "simhash_fingerprints": _simhash_oracle(),
        "highlight_topk": _highlight_oracle(Q_OR.split()),
        "select_facet_range_pivot": _select_facet_range_pivot_oracle(Q_OR.split()),
        "bm25_offset_page": _bm25_oracle(Q_OR.split(), offset=5),
        "bm25_exclude_term": _bm25_oracle(Q_OR.split(), exclude=Q_RARE),
        "delete_reload_query": _bm25_oracle(Q_OR.split(), delete_top=3),
        "bm25_filtered": _bm25_oracle(Q_OR.split(), fq="doc_id % 2 = 0"),
        "bm25_phrase": f"""
WITH {_TF}{_DL},
toksa AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS ts
    FROM documents
),
dfa AS (SELECT count(*)::BIGINT AS df FROM (SELECT DISTINCT doc_id FROM tf WHERE term = 'merge')),
dfb AS (SELECT count(*)::BIGINT AS df FROM (SELECT DISTINCT doc_id FROM tf WHERE term = 'group')),
ph AS (
    SELECT doc_id,
           len(list_filter(generate_series(1, greatest(len(ts) - 1, 0)),
                           i -> ts[i] = 'merge' AND ts[i+1] = 'group'))::BIGINT AS tfp
    FROM toksa
),
scores AS (
    SELECT ph.doc_id,
           (ln(1 + (s.n - dfa.df + 0.5) / (dfa.df + 0.5))
            + ln(1 + (s.n - dfb.df + 0.5) / (dfb.df + 0.5)))
           * ph.tfp / (ph.tfp + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
             AS raw_score
    FROM ph
    JOIN dl USING (doc_id)
    CROSS JOIN stats s CROSS JOIN dfa CROSS JOIN dfb
    WHERE ph.tfp > 0
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores ORDER BY raw_score DESC, doc_id ASC LIMIT 10""",
        "bm25_synonym_query": f"""
WITH {_TF}{_DL},
grp AS (
    SELECT doc_id, sum(tf)::BIGINT AS tfs FROM tf
    WHERE term IN ('merge', 'sort') GROUP BY doc_id
),
dfmax AS (
    SELECT max(c) AS m FROM (
        SELECT count(*)::BIGINT AS c FROM tf
        WHERE term IN ('merge', 'sort') GROUP BY term
    )
),
scores AS (
    SELECT grp.doc_id,
           ln(1 + (s.n - dfmax.m + 0.5) / (dfmax.m + 0.5))
             * grp.tfs / (grp.tfs + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
             AS raw_score
    FROM grp JOIN dl USING (doc_id)
    CROSS JOIN stats s CROSS JOIN dfmax
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores ORDER BY raw_score DESC, doc_id ASC LIMIT 10""",
        "bm25_conjunction": _bm25_oracle(Q_AND.split(), conjunction=True),
        "bm25_grouped_topk": f"""
WITH {_TF}{_DL},
qt AS (SELECT unnest(['merge', 'sort', 'window']) AS term),
dft AS (
    SELECT term, count(*)::BIGINT AS df FROM tf
    WHERE term IN (SELECT term FROM qt) GROUP BY term
),
scores AS (
    SELECT tf.doc_id,
           sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
               * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
              ) AS raw_score
    FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
    GROUP BY tf.doc_id
),
g AS (
    SELECT d.lang AS grp, sc.doc_id, sc.raw_score,
           row_number() OVER (PARTITION BY d.lang
                              ORDER BY sc.raw_score DESC, sc.doc_id ASC) AS rn
    FROM scores sc JOIN documents d USING (doc_id)
)
SELECT grp, doc_id, round(raw_score, 4) AS score
FROM g WHERE rn = 1 ORDER BY raw_score DESC, doc_id ASC LIMIT 10""",
        "cursor_page": _bm25_oracle(Q_OR.split(), offset=10),
        "spellcheck": f"""
            WITH {_TF},
            v AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
            SELECT term, df, levenshtein(term, 'mergr')::INT AS distance
            FROM v WHERE levenshtein(term, 'mergr') <= 2
            ORDER BY distance ASC, df DESC, term ASC LIMIT 5""",
        "sort_by_field": f"""
WITH {_TF}{_DL},
qt AS (SELECT unnest(['merge', 'sort', 'window']) AS term),
dft AS (
    SELECT term, count(*)::BIGINT AS df FROM tf
    WHERE term IN (SELECT term FROM qt) GROUP BY term
),
scores AS (
    SELECT tf.doc_id,
           sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
               * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
              ) AS raw_score
    FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
    GROUP BY tf.doc_id
)
SELECT sc.doc_id, d.source, round(sc.raw_score, 4) AS score
FROM scores sc JOIN documents d USING (doc_id)
ORDER BY d.source ASC, sc.doc_id ASC LIMIT 10""",
        "lucene_syntax_query": f"""
WITH {_TF}{_DL},
qt AS (SELECT unnest(['merge', 'sort']) AS term),
dft AS (
    SELECT term, count(*)::BIGINT AS df FROM tf
    WHERE term IN (SELECT term FROM qt) GROUP BY term
),
scores AS (
    SELECT tf.doc_id,
           sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
               * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
              ) AS raw_score
    FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
    GROUP BY tf.doc_id
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores
WHERE doc_id IN (SELECT DISTINCT doc_id FROM tf WHERE term = 'merge')
  AND doc_id NOT IN (SELECT DISTINCT doc_id FROM tf WHERE term = 'window')
ORDER BY raw_score DESC, doc_id ASC LIMIT 10""",
        "fuzzy_query": f"""
WITH {_TF}{_DL},
mem AS (
    SELECT term, count(*)::BIGINT AS df,
           1.0 - levenshtein(term, 'mergr')::DOUBLE / least(length(term), 5)
               AS boost
    FROM tf WHERE levenshtein(term, 'mergr') <= 2
    GROUP BY term
    ORDER BY boost DESC, df DESC, term ASC
    LIMIT 50
),
dfmax AS (SELECT max(df) AS m FROM mem),
scores AS (
    SELECT tf.doc_id,
           sum(mem.boost
               * ln(1 + (s.n - dfmax.m + 0.5) / (dfmax.m + 0.5))
               * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
              ) AS raw_score
    FROM tf JOIN mem USING (term) JOIN dl USING (doc_id)
    CROSS JOIN stats s CROSS JOIN dfmax
    GROUP BY tf.doc_id
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores ORDER BY raw_score DESC, doc_id ASC LIMIT 10""",
        "wildcard_query": f"""
            WITH {_TOKS}
            SELECT DISTINCT doc_id, 1.0 AS score FROM toks
            WHERE term LIKE 's_r%' ORDER BY doc_id ASC LIMIT 10""",
        "bm25_phrase_slop": f"""
WITH {_TF}{_DL},
toksa AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS ts
    FROM documents
),
dfa AS (SELECT count(*)::BIGINT AS df FROM (SELECT DISTINCT doc_id FROM tf WHERE term = 'merge')),
dfb AS (SELECT count(*)::BIGINT AS df FROM (SELECT DISTINCT doc_id FROM tf WHERE term = 'window')),
ph AS (
    SELECT doc_id,
           len(list_filter(generate_series(1, len(ts)),
                           i -> ts[i] = 'merge'
                                AND len(list_filter(
                                        generate_series(i + 1, least(i + 3, len(ts))),
                                        j -> ts[j] = 'window')) > 0))::BIGINT AS tfp
    FROM toksa
),
scores AS (
    SELECT ph.doc_id,
           (ln(1 + (s.n - dfa.df + 0.5) / (dfa.df + 0.5))
            + ln(1 + (s.n - dfb.df + 0.5) / (dfb.df + 0.5)))
           * ph.tfp / (ph.tfp + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
             AS raw_score
    FROM ph
    JOIN dl USING (doc_id)
    CROSS JOIN stats s CROSS JOIN dfa CROSS JOIN dfb
    WHERE ph.tfp > 0
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores ORDER BY raw_score DESC, doc_id ASC LIMIT 10""",
        "bm25_multifield": _mf_oracle(Q_OR.split(), combine="sum"),
        "bm25_dismax": _mf_oracle(Q_OR.split(), combine="dismax"),
        "fielded_query": _fielded_oracle(),
        "bm25_min_should_match": _bm25_oracle(Q_OR.split(), mm=2),
        # conditional spec '2<-25%' on 4 optional clauses -> 3 required
        "mm_conditional": _bm25_oracle(
            ["merge", "sort", "window", "dup"], mm=3
        ),
        "bm25_boost_function": _boost_oracle(Q_OR.split()),
        "select_combined": f"""
WITH {_TF}{_DL},{_scores_cte('m', Q_OR.split())},
boosted AS (
    SELECT ms.doc_id, d.source,
           ms.raw * (1.0 / (0.001 * d.n_chars + 1.0)) AS raw
    FROM ms JOIN documents d USING (doc_id)
    WHERE ms.doc_id % 2 = 0
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY raw DESC, doc_id ASC) AS rn
    FROM boosted
)
SELECT doc_id, source, round(raw, 4) AS score
FROM r WHERE rn = 1 ORDER BY raw DESC, doc_id ASC LIMIT 10""",
        "select_combined_facet": f"""
WITH {_TF}{_DL},{_scores_cte('m', Q_OR.split())},
boosted AS (
    SELECT ms.doc_id, d.source,
           ms.raw * (1.0 / (0.001 * d.n_chars + 1.0)) AS raw
    FROM ms JOIN documents d USING (doc_id)
    WHERE ms.doc_id % 2 = 0
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY raw DESC, doc_id ASC) AS rn
    FROM boosted
)
SELECT d.lang, count(*)::BIGINT AS cnt
FROM r JOIN documents d USING (doc_id)
WHERE r.rn = 1 GROUP BY d.lang""",
        "rerank_query": _rerank_oracle(
            Q_OR.split(), Q_RARE.split(), rerank_docs=30, weight=2.0
        ),
        "collapse_field": _collapse_oracle(Q_OR.split(), "source"),
        "json_facet_stats": _json_facet_oracle(Q_OR.split(), "lang"),
        "term_vectors": f"""
WITH {_TF},
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
SELECT tf.doc_id, tf.term, tf.tf, dft.df
FROM tf JOIN dft USING (term)
WHERE tf.doc_id IN ({", ".join(str(d) for d in TV_DOC_IDS)})""",
        "elevated_query": _elevated_oracle(Q_OR.split(), ELEVATE_IDS),
        "debug_explain": f"""
WITH {_TF}{_DL},
qt AS (SELECT unnest([{", ".join(f"'{t}'" for t in Q_OR.split())}]) AS term),
dft AS (
    SELECT term, count(*)::BIGINT AS df FROM tf
    WHERE term IN (SELECT term FROM qt) GROUP BY term
),
partials AS (
    SELECT tf.doc_id, tf.term, tf.tf, dft.df,
           ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5)) AS idf,
           ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
             * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                        + {BM25_B} * dl.dl / s.avgdl)) AS partial
    FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
scores AS (SELECT doc_id, sum(partial) AS raw FROM partials GROUP BY doc_id),
top AS (SELECT doc_id FROM scores ORDER BY raw DESC, doc_id ASC LIMIT 5)
SELECT p.doc_id, p.term, p.tf, p.df,
       round(p.idf, 4) AS idf, round(p.partial, 4) AS partial
FROM partials p JOIN top USING (doc_id)""",
        "schemaless_infer": """
WITH fx AS (
    SELECT CAST(o_orderkey AS VARCHAR) AS okey,
           CASE WHEN o_orderkey % 3 = 0 THEN '' ELSE o_orderstatus END AS status,
           printf('%.2f', o_totalprice) AS price,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
           CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'False' END AS flag,
           CASE WHEN o_orderkey = 0 THEN '1.5'
                ELSE CAST(o_orderkey AS VARCHAR) END AS mixed,
           repeat(o_orderpriority, 40) AS longtext
    FROM orders
)
SELECT CAST(okey AS BIGINT) AS order_key_,
       (lower(flag) = 'true') AS flag,
       round(CAST(price AS DOUBLE), 2) AS price,
       strptime(odate, '%Y-%m-%d %H:%M:%S') AS odate,
       round(CAST(mixed AS DOUBLE), 2) AS mixed,
       nullif(status, '') AS status,
       substring(nullif(status, ''), 1, 256) AS status_str,
       length(substring(longtext, 1, 256))::INT AS lt_len
FROM fx""",
        "terms_component": f"""
            WITH {_TF}
            SELECT term, count(*)::BIGINT AS df FROM tf
            WHERE term LIKE 's%' GROUP BY term
            ORDER BY df DESC, term ASC LIMIT 10""",
        "prefix_query": f"""
            WITH {_TOKS}
            SELECT DISTINCT doc_id, 1.0 AS score FROM toks
            WHERE term LIKE 'me%' ORDER BY doc_id ASC LIMIT 10""",
        "more_like_this": f"""
WITH {_TF}{_DL},
alldf AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
it AS (
    SELECT tf.term
    FROM tf JOIN alldf USING (term) CROSS JOIN stats s
    WHERE tf.doc_id = 0 AND tf.tf >= 2 AND alldf.df >= 5
),
dft AS (SELECT term, df FROM alldf WHERE term IN (SELECT term FROM it)),
scores AS (
    SELECT tf.doc_id,
           sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
               * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
              ) AS raw_score
    FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
    GROUP BY tf.doc_id
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores WHERE doc_id <> 0
ORDER BY raw_score DESC, doc_id ASC LIMIT 10""",
        "field_stats": """
            SELECT count(c_acctbal)::BIGINT AS cnt,
                   sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)::BIGINT AS missing,
                   round(min(c_acctbal), 2) AS min_v,
                   round(max(c_acctbal), 2) AS max_v,
                   round(sum(c_acctbal), 2) AS sum_v,
                   round(avg(c_acctbal), 4) AS mean_v,
                   round(stddev_samp(c_acctbal), 4) AS stddev_v
            FROM customer""",
        "facet_lang": "SELECT lang, count(*)::BIGINT AS cnt FROM documents GROUP BY lang",
        "facet_range_day": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   count(*)::BIGINT AS cnt
            FROM events GROUP BY 1""",
        "facet_on_query": f"""
            WITH {_TF}
            SELECT d.lang, count(*)::BIGINT AS cnt
            FROM documents d
            WHERE d.doc_id IN (
                SELECT DISTINCT doc_id FROM tf
                WHERE term IN ('merge', 'sort', 'window'))
            GROUP BY d.lang""",
        "facet_pivot": """
            SELECT lang, source, count(*)::BIGINT AS cnt
            FROM documents GROUP BY lang, source""",
        "facet_source": "SELECT source, count(*)::BIGINT AS cnt FROM documents GROUP BY source",
        "chunks_char": """
            WITH n AS (
                SELECT doc_id, text,
                       greatest(1, ceil((length(text) - 20) / 100.0))::INT AS n_chunks
                FROM documents
            ), c AS (
                SELECT doc_id, text, unnest(generate_series(0, n_chunks - 1)) AS chunk_number
                FROM n
            )
            SELECT doc_id::VARCHAR || '#' || lpad(chunk_number::VARCHAR, 7, '0') AS id,
                   doc_id AS parent_id,
                   substr(text, chunk_number * 100 + 1, 120) AS chunk,
                   chunk_number::INT AS chunk_number
            FROM c""",
        "chunk_stats": """
            WITH n AS (
                SELECT doc_id,
                       greatest(1, ceil((length(text) - 20) / 100.0))::BIGINT AS n_chunks
                FROM documents
            )
            SELECT count(*)::BIGINT AS docs_chunked,
                   sum(n_chunks)::BIGINT AS chunks_total,
                   round(avg(n_chunks), 4) AS chunks_per_doc,
                   max(n_chunks) AS max_chunks
            FROM n""",
        "chunk_parent_join": """
            WITH n AS (
                SELECT doc_id, text,
                       greatest(1, ceil((length(text) - 20) / 100.0))::INT AS n_chunks
                FROM documents
            ), c AS (
                SELECT doc_id, unnest(generate_series(0, n_chunks - 1)) AS chunk_number
                FROM n
            )
            SELECT c.doc_id::VARCHAR || '#' || lpad(c.chunk_number::VARCHAR, 7, '0') AS id,
                   c.doc_id AS parent_id, c.chunk_number::INT AS chunk_number, d.lang
            FROM c JOIN documents d ON c.doc_id = d.doc_id""",
        "block_join_parent": f"""
WITH n AS (
    SELECT doc_id, text,
           greatest(1, ceil((length(text) - 20) / 100.0))::INT AS n_chunks
    FROM documents
), c AS (
    SELECT doc_id::VARCHAR || '#' || lpad(chunk_number::VARCHAR, 7, '0') AS id,
           doc_id AS parent_id,
           substr(text, chunk_number * 100 + 1, 120) AS chunk
    FROM (
        SELECT doc_id, text, unnest(generate_series(0, n_chunks - 1)) AS chunk_number
        FROM n
    )
),
toksc AS (
    SELECT id, parent_id, term FROM (
        SELECT id, parent_id,
               unnest(string_split_regex(lower(chunk), '[^a-z0-9]+')) AS term
        FROM c
    ) WHERE term <> ''
),
ctf AS (
    SELECT id, parent_id, term, count(*)::BIGINT AS tf
    FROM toksc GROUP BY id, parent_id, term
),
cdl AS (
    SELECT c.id, count(t.term)::BIGINT AS dl
    FROM c LEFT JOIN toksc t USING (id) GROUP BY c.id
),
cstats AS (SELECT count(*)::BIGINT AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM cdl),
cdft AS (
    SELECT term, count(*)::BIGINT AS df FROM ctf
    WHERE term IN ('merge', 'sort', 'window') GROUP BY term
),
cscores AS (
    SELECT ctf.id, ctf.parent_id,
           sum(ln(1 + (s.n - cdft.df + 0.5) / (cdft.df + 0.5))
               * ctf.tf / (ctf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * cdl.dl / s.avgdl))
              ) AS raw
    FROM ctf JOIN cdft USING (term) JOIN cdl USING (id) CROSS JOIN cstats s
    GROUP BY ctf.id, ctf.parent_id
),
ranked AS (
    SELECT parent_id, id, raw,
           row_number() OVER (PARTITION BY parent_id ORDER BY raw DESC, id ASC) AS rn,
           max(raw) OVER (PARTITION BY parent_id) AS m
    FROM cscores
)
SELECT parent_id, round(m, 4) AS score, id AS best_chunk
FROM ranked WHERE rn = 1 ORDER BY m DESC, parent_id ASC LIMIT 10""",
        "orphan_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
        "window_first_event": """
            SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
                FROM events
            ) WHERE rn = 1""",
        "top_terms_by_df": f"""
            WITH {_TF}
            SELECT term, count(*)::BIGINT AS df FROM tf
            GROUP BY term ORDER BY df DESC, term ASC LIMIT 15""",
        "content_hash_groups": """
            WITH docs2 AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 20
            ),
            h AS (
                SELECT doc_id,
                       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS text_hash
                FROM docs2
            )
            SELECT text_hash, count(*)::BIGINT AS dup_count, min(doc_id) AS keep_id
            FROM h GROUP BY text_hash HAVING count(*) > 1""",
        "fingerprint": f"""
            WITH {_TOKS}
            SELECT doc_id,
                   md5(array_to_string(list_sort(list(DISTINCT term)), ' ')) AS fingerprint
            FROM toks GROUP BY doc_id""",
        "token_stats": f"""
            WITH {_TOKS}
            SELECT doc_id,
                   count(*)::INT AS n_tokens,
                   count(DISTINCT term)::INT AS n_distinct_tokens,
                   round(sum(length(term))::DOUBLE / count(*), 4) AS avg_token_len
            FROM toks GROUP BY doc_id""",
        "stopword_ratio": f"""
            WITH {_TOKS}
            SELECT doc_id,
                   round(sum(CASE WHEN term IN ({sw}) THEN 1 ELSE 0 END)::DOUBLE
                         / count(*), 4) AS stopword_ratio
            FROM toks GROUP BY doc_id""",
        "lang_id": f"""
            WITH {_TOKS}
            SELECT doc_id,
                   CASE WHEN sum(CASE WHEN term IN ({sw}) THEN 1 ELSE 0 END)::DOUBLE
                             / count(*) >= 0.08
                        THEN 'en' ELSE 'other' END AS pred_lang
            FROM toks GROUP BY doc_id""",
        "quality_score": f"""
            WITH {_TOKS},
            t AS (
                SELECT doc_id, count(*)::BIGINT AS n, count(DISTINCT term)::BIGINT AS nd
                FROM toks GROUP BY doc_id
            )
            SELECT d.doc_id,
                   round(((CASE WHEN t.n BETWEEN 5 AND 500 THEN 1.0 ELSE 0.0 END)
                          + length(regexp_replace(d.text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE
                            / greatest(length(d.text), 1)
                          + t.nd::DOUBLE / greatest(t.n, 1)) / 3.0, 4) AS quality
            FROM documents d JOIN t ON d.doc_id = t.doc_id""",
        "ngram_jaccard": """
            WITH docs2 AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 20
            ),
            toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ts
                FROM docs2 WHERE doc_id < 40 OR doc_id >= 1000000
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       array_to_string(ts[i : i + 2], ' ') AS shingle
                FROM toks,
                     unnest(generate_series(1, greatest(len(ts) - 2, 1))) AS g(i)
            ),
            sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS i
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT doc_a, doc_b,
                   round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b
            WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.05""",
        # same pair derivation as ngram_jaccard, then clusters as the min
        # id reachable through the undirected pair graph (recursive CTE =
        # the SQL mirror of connected_components' min-label propagation);
        # unpaired docs map to themselves
        "near_dup_components": """
            WITH RECURSIVE docs2 AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 20
            ),
            toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ts
                FROM docs2 WHERE doc_id < 40 OR doc_id >= 1000000
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       array_to_string(ts[i : i + 2], ' ') AS shingle
                FROM toks,
                     unnest(generate_series(1, greatest(len(ts) - 2, 1))) AS g(i)
            ),
            sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS i
                FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            pairs AS (
                SELECT doc_a, doc_b FROM inter
                JOIN sz sa ON sa.doc_id = doc_a
                JOIN sz sb ON sb.doc_id = doc_b
                WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.05
            ),
            e AS (
                SELECT doc_a AS u, doc_b AS v FROM pairs
                UNION
                SELECT doc_b AS u, doc_a AS v FROM pairs
            ),
            reach(node, r) AS (
                SELECT doc_id, doc_id FROM toks
                UNION
                SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.node
            )
            SELECT node AS doc_id, min(r)::BIGINT AS canonical
            FROM reach GROUP BY node""",
        "bpe_token_count": _bpe_count_oracle(),
        "embedding_near_dup": """
            WITH eb AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, embedding
                FROM embeddings WHERE vec_id < 20
            )
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6) AS cosine
            FROM eb a JOIN eb b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 6) >= 0.99""",
        "ann_cosine_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            s AS (
                SELECT e.vec_id,
                       list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS c
                FROM embeddings e CROSS JOIN q
            )
            SELECT vec_id, round(c, 4) AS cosine
            FROM s ORDER BY c DESC, vec_id ASC LIMIT 10""",
        "truncate_field": """
            SELECT doc_id, substring(text, 1, 50) AS text_trunc FROM documents""",
        "solr_date_format": """
            SELECT event_id,
                   strftime(ts, '%Y-%m-%dT%H:%M:%S.%gZ') AS solr_date
            FROM events""",
        "flatten_nested": """
            SELECT c_custkey, c_name AS msg_name, c_acctbal AS msg_inner_bal
            FROM customer""",
        "protobuf_wire_roundtrip": """
            SELECT c_custkey AS custkey, c_name AS name,
                   round(c_acctbal * 100)::BIGINT AS acctbal_cents
            FROM customer""",
        "media_features": f"""
            WITH m AS (
                SELECT media_id, payload_bytes,
                       len(payload_bytes)::BIGINT AS n
                FROM read_parquet('{_MEDIA_PARQUET}/*.parquet')
            ),
            cb AS (
                SELECT media_id, b // 4 AS bin, count(*)::BIGINT AS cnt
                FROM (SELECT media_id, unnest(payload_bytes) AS b FROM m)
                GROUP BY media_id, bin
            ),
            dims AS (SELECT unnest(generate_series(0, 63)) AS dim)
            SELECT m.media_id, dims.dim::INT AS dim,
                   round(coalesce(cb.cnt, 0)::DOUBLE / m.n, 6) AS value
            FROM m CROSS JOIN dims
            LEFT JOIN cb ON cb.media_id = m.media_id AND cb.bin = dims.dim""",
        "media_frame_sample": f"""
            WITH v AS (
                SELECT media_id,
                       greatest(1, cast(floor((meta.duration_ms - 1) / 1000.0) AS INT) + 1) AS nf
                FROM read_parquet('{_MEDIA_PARQUET}/*.parquet')
                WHERE kind = 'video'
            )
            SELECT media_id, f::INT AS frame_idx, (f * 1000)::BIGINT AS ts_ms
            FROM (SELECT media_id, unnest(generate_series(0, nf - 1)) AS f FROM v)""",
        "media_stats_by_kind": f"""
            SELECT kind, count(*)::BIGINT AS cnt,
                   sum(meta.nbytes)::BIGINT AS total_bytes,
                   round(avg(meta.duration_ms), 4) AS avg_duration_ms
            FROM read_parquet('{_MEDIA_PARQUET}/*.parquet')
            GROUP BY kind""",
    }
