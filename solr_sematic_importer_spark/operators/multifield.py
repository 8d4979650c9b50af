"""Multi-field documents: per-field postings + weighted multi-field query.

The reference's chunk schema declares multiple concrete analyzed fields on
one document (``default-chunk-config.zip -> managed-schema.xml:449-463``)
and its MS MARCO source carries (title, body) pairs
(``MsMarcoDownloader.java:50-90``); queries weight fields Solr-edismax
style (``qf=title^3 body``). Lucene's model: every field is its own
inverted index with its OWN statistics — docCount_f (docs where the field
has >=1 term), avgdl_f, df_f(term) — and a multi-field query combines the
per-field BM25 scores, either as a weighted SUM (Boolean OR across fields)
or as DisMax (max + tie * sum-of-others, edismax ``tie=``).

Spark-first shape (mirrors build.py's single-field plan):

* ONE fused Python stage analyzes ALL fields per input row (docid stamp +
  per-field tokenize + per-field tf fold) — token occurrences never
  shuffle, and adding a field adds zero extra Python round-trips;
* per-field postings are a UNION of narrow explodes over the cached
  analyzed output, with ``field`` a literal column — the scan predicate
  ``field IN (...) AND term IN (...)`` pushes to parquet when persisted;
* query-time: the per-(field,term) weight table (boost_f * idf_f) is tiny
  and broadcast; per-posting partials are whole-stage-codegen expressions
  (avgdl_f folded into a broadcast per-field constant); the per-doc
  combine folds a SORTED (field,term) array so float order is fixed and
  results are bit-identical across parallelism levels;
* top-k is orderBy(score desc, doc_id asc).limit(k) ->
  TakeOrderedAndProject (per-partition heaps + driver k-way merge).

At 100 TB this is the same plan as the single-field engine — one shuffle
at build (if blocks are packed), broadcast-join scoring at query — with
the posting key widened by a low-cardinality ``field`` column that
partition-prunes when the postings are written partitioned by field.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field as dc_field
from typing import Iterator, Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.similarity import B_DEFAULT, K1_DEFAULT, idf
from .build import CACHE_LEVEL, quantize_dl_col


@dataclass
class MultiFieldIndex:
    """Per-field inverted indexes over one document set, one handle."""

    doc_stats: DataFrame     # doc_id, <key cols...>, dl_<f>, dl_quant_<f> per field
    postings: DataFrame      # field, term, doc_id, tf, dl, dl_quant
    term_stats: DataFrame    # field, term, df, ttf
    field_stats: dict        # field -> {"n_docs": int, "sum_dl": int}
    fields: tuple
    n_docs: int              # total documents (any field)
    profile: str
    key_cols: Sequence[str] = dc_field(default_factory=tuple)
    _caches: list = dc_field(default_factory=list, repr=False, compare=False)

    def avgdl(self, field: str) -> float:
        s = self.field_stats[field]
        return s["sum_dl"] / s["n_docs"] if s["n_docs"] else 0.0

    def release(self) -> None:
        for df in self._caches:
            try:
                df.unpersist()
            except Exception:
                pass
        self._caches.clear()


def field_term_dfs(
    index: MultiFieldIndex, fields: Sequence[str], terms: Sequence[str]
) -> dict:
    """Memoized per-(field, term) docfreq — the multi-field analog of
    ``build.term_dfs``. One term_stats job per handle fetches only unseen
    (field, term) pairs; a DisMax request whose clauses repeat tokens
    across fields (the common qf shape) pays the lookup once. Returns
    only pairs with df > 0 (matching the previous filter-collect shape)."""
    cache = getattr(index, "_df_cache", None)
    if cache is None:
        cache = index._df_cache = {}
    missing = [
        (f, t) for f in fields for t in terms if (f, t) not in cache
    ]
    if missing:
        found = {
            (r["field"], r["term"]): int(r["df"])
            for r in index.term_stats.filter(
                F.col("field").isin(sorted({f for f, _ in missing}))
                & F.col("term").isin(sorted({t for _, t in missing}))
            )
            .select("field", "term", "df")
            .collect()
        }
        for pair in missing:
            cache[pair] = found.get(pair, 0)
    return {
        (f, t): cache[(f, t)]
        for f in fields for t in terms
        if cache[(f, t)] > 0
    }


def build_multifield_index(
    df: DataFrame,
    fields: Sequence[str] = ("title", "body"),
    key_cols: Sequence[str] = (),
    profile: str = "simple",
    doc_id_col: str | None = None,
) -> MultiFieldIndex:
    """Analyze every field in one fused Python stage and derive per-field
    postings/stats from the single cached output."""
    import numpy as np
    import pandas as pd

    from ..functions.analyzer import tf_series

    fields = tuple(fields)
    key_cols = [c for c in key_cols if c != doc_id_col]
    key_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        ["doc_id long"]
        + [f"{c} {key_fields[c]}" for c in key_cols]
        + [
            f"terms_{f} array<string>, tfs_{f} array<int>, dl_{f} long"
            for f in fields
        ]
    )

    if doc_id_col is None:
        # dense stable ids by key order, fused like _stamp_and_analyze
        spark = df.sparkSession
        order_cols = key_cols if key_cols else list(fields)
        nparts = max(2 * spark.sparkContext.defaultParallelism, 2)
        ordered = (
            df.repartitionByRange(nparts, *order_cols)
            .sortWithinPartitions(*order_cols)
            .withColumn("_pid", F.spark_partition_id())
        )
        ordered.persist(CACHE_LEVEL)
        counts = dict(
            (r["_pid"], r["cnt"])
            for r in ordered.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
        )
        offsets, acc = {}, 0
        for pid in range(max(counts) + 1 if counts else 0):
            offsets[pid] = acc
            acc += counts.get(pid, 0)

        def stamp_analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            local = 0
            for b in batches:
                if not len(b):
                    continue
                off = offsets[int(b["_pid"].iloc[0])]
                out = {
                    "doc_id": np.arange(
                        off + local, off + local + len(b), dtype=np.int64
                    )
                }
                local += len(b)
                for c in key_cols:
                    out[c] = b[c]
                for f in fields:
                    out[f"terms_{f}"], out[f"tfs_{f}"], out[f"dl_{f}"] = tf_series(
                        b[f], profile
                    )
                yield pd.DataFrame(out)

        analyzed = ordered.mapInPandas(stamp_analyze, schema=out_schema)
        src = ordered
    else:

        def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                if not len(b):
                    continue
                out = {"doc_id": b[doc_id_col].astype("int64")}
                for c in key_cols:
                    out[c] = b[c]
                for f in fields:
                    out[f"terms_{f}"], out[f"tfs_{f}"], out[f"dl_{f}"] = tf_series(
                        b[f], profile
                    )
                yield pd.DataFrame(out)

        analyzed = df.select(
            *dict.fromkeys([doc_id_col, *key_cols, *fields])
        ).mapInPandas(analyze, schema=out_schema)
        src = None

    for f in fields:
        analyzed = analyzed.withColumn(
            f"dl_quant_{f}", quantize_dl_col(F.col(f"dl_{f}"))
        )
    analyzed.persist(CACHE_LEVEL)

    doc_stats = analyzed.drop(*[c for f in fields for c in (f"terms_{f}", f"tfs_{f}")])

    # per-field postings: a union of NARROW explodes over the cache (tf was
    # folded per doc per field inside the Python stage — no shuffle here)
    per_field = []
    for f in fields:
        per_field.append(
            analyzed.select(
                "doc_id",
                F.col(f"dl_{f}").alias("dl"),
                F.col(f"dl_quant_{f}").alias("dl_quant"),
                F.explode(F.arrays_zip(f"terms_{f}", f"tfs_{f}")).alias("p"),
            ).select(
                F.lit(f).alias("field"),
                F.col(f"p.terms_{f}").alias("term"),
                "doc_id",
                F.col(f"p.tfs_{f}").cast("long").alias("tf"),
                "dl",
                "dl_quant",
            )
        )
    postings = per_field[0]
    for other in per_field[1:]:
        postings = postings.unionByName(other)
    postings.persist(CACHE_LEVEL)

    term_stats = postings.groupBy("field", "term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("ttf")
    )
    term_stats.persist()

    # Lucene per-field stats: docCount_f counts docs with >=1 term IN THAT
    # FIELD; avgdl_f = sumTotalTermFreq_f / docCount_f
    agg_exprs = []
    for f in fields:
        agg_exprs.append(
            F.sum((F.col(f"dl_{f}") > 0).cast("long")).alias(f"n_{f}")
        )
        agg_exprs.append(F.coalesce(F.sum(f"dl_{f}"), F.lit(0)).alias(f"s_{f}"))
    stats = analyzed.agg(F.count("*").alias("n_total"), *agg_exprs).first()
    if src is not None:
        src.unpersist()

    return MultiFieldIndex(
        doc_stats=doc_stats,
        postings=postings,
        term_stats=term_stats,
        field_stats={
            f: {"n_docs": int(stats[f"n_{f}"]), "sum_dl": int(stats[f"s_{f}"])}
            for f in fields
        },
        fields=fields,
        n_docs=int(stats["n_total"]),
        profile=profile,
        key_cols=tuple(key_cols),
        _caches=[analyzed, postings, term_stats],
    )


def bm25_multifield_topk(
    index: MultiFieldIndex,
    query: str,
    qf: Mapping[str, float],
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
    combine: str = "sum",
    tie: float = 0.0,
) -> DataFrame:
    """Top-k docs for an OR query over weighted fields.

    ``combine="sum"``: score(d) = sum_t sum_f boost_f * BM25_f(t, d)
    (Boolean OR across the per-field term queries).
    ``combine="dismax"``: per term, max_f + tie * (sum_f - max_f) — Solr
    edismax's DisjunctionMaxQuery with tiebreaker (``tie=`` request
    param); tie=0 is pure max, tie=1 degenerates to the sum.
    idf_f uses the FIELD's docCount/df (per-field index statistics, as
    Lucene computes them).
    """
    from .score import analyze_query

    if combine not in ("sum", "dismax"):
        raise ValueError(f"combine must be 'sum' or 'dismax', got {combine!r}")
    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    terms = analyze_query(query, index.profile)
    boosts = {f: float(w) for f, w in qf.items() if f in index.fields}
    if not terms or not boosts or index.n_docs == 0:
        return empty

    counts = Counter(terms)
    dfs = field_term_dfs(index, list(boosts), list(counts))
    # (field, term) -> boost_f * mult * idf_f, plus the field's avgdl as a
    # broadcast constant so the norm is a pure JVM expression
    weights = [
        (f, t, boosts[f] * float(mult) * idf(dfs[(f, t)], index.field_stats[f]["n_docs"]),
         index.avgdl(f))
        for t, mult in counts.items()
        for f in boosts
        if (f, t) in dfs
    ]
    if not weights:
        return empty

    wdf = spark.createDataFrame(
        weights, "field string, term string, w double, avgdl double"
    )
    dl_col = "dl_quant" if quantize else "dl"
    cand = index.postings.filter(
        F.col("field").isin(list(boosts))
        & F.col("term").isin([t for _, t, _, _ in weights])
    )
    scored = cand.join(F.broadcast(wdf), ["field", "term"]).select(
        "doc_id",
        "field",
        "term",
        (
            F.col("w")
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col(dl_col) / F.col("avgdl"))
            )
        ).alias("s"),
    )

    if combine == "dismax":
        # per (doc, term): max over fields + tie * rest; fold order fixed
        # by the field-sorted array
        per_term = scored.groupBy("doc_id", "term").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("field", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("sum_s"),
            F.max("s").alias("max_s"),
        ).select(
            "doc_id",
            "term",
            (F.col("max_s") + F.lit(float(tie)) * (F.col("sum_s") - F.col("max_s"))).alias("s"),
        )
        per_doc = per_term.groupBy("doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("score")
        )
    else:
        # deterministic per-doc fold over the (field, term)-sorted partials
        per_doc = scored.groupBy("doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("field", "term", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("score")
        )

    return (
        per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


def fielded_query_topk(
    index: MultiFieldIndex,
    q: str,
    qf: Mapping[str, float] | None = None,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> DataFrame:
    """Lucene classic-parser queries with concrete field qualifiers over
    the multi-field index: ``title:merge body:sort window -title:draft``.

    Semantics (BooleanQuery over per-field TermQueries):

    * ``field:term`` scores BM25 against THAT field's postings/stats only;
    * an unqualified term is an edismax-style disjunction over ``qf``
      (weighted SUM across fields — pass ``qf={field: boost}``; defaults
      to every field at boost 1);
    * ``+``/``AND`` -> MUST (semi-join), ``-``/``NOT`` -> MUST_NOT
      (anti-join), bare/OR -> SHOULD;
    * ``field:prefix*`` / ``field:te?t`` rewrite constant-score over the
      field's term dictionary (MultiTermQuery constant-score rewrite);
    * score = deterministic clause-ordered fold of matching MUST+SHOULD
      clause scores (bit-stable across parallelism);
    * fielded phrase / fuzzy / range clauses are rejected with a clear
      error (the single-field engine covers them on the default field).

    Scale shape: every leaf pushes ``field = X AND term IN (...)`` into
    the postings scan; the combine is one union + hash agg on doc_id plus
    one anti-join per prohibited clause.
    """
    from ..functions.queryparser import (
        MUST, MUST_NOT, QueryParseError, parse_query,
    )
    from .boolean_query import DROPPED_CLAUSE
    from .score import analyze_query

    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    boosts = (
        {f: float(w) for f, w in qf.items() if f in index.fields}
        if qf is not None
        else {f: 1.0 for f in index.fields}
    )
    clauses = parse_query(q, fields=index.fields)
    if not clauses or index.n_docs == 0:
        return empty

    dl_col = "dl_quant" if quantize else "dl"

    def _bm25_partials(field_weights: Mapping[str, float], text: str, boost: float):
        """(doc_id, s) summed over the clause's analyzed tokens x fields."""
        terms = analyze_query(text, index.profile)
        if not terms:
            # analyzed away (stopword): the classic parser DROPS the
            # clause; distinct from df=0 which keeps it (matching nothing)
            return DROPPED_CLAUSE
        counts = Counter(terms)
        dfs = field_term_dfs(index, list(field_weights), list(counts))
        weights = [
            (
                f,
                t,
                boost
                * field_weights[f]
                * float(mult)
                * idf(dfs[(f, t)], index.field_stats[f]["n_docs"]),
                index.avgdl(f),
            )
            for t, mult in counts.items()
            for f in field_weights
            if (f, t) in dfs
        ]
        if not weights:
            return None
        wdf = index.postings.sparkSession.createDataFrame(
            weights, "field string, term string, w double, avgdl double"
        )
        cand = index.postings.filter(
            F.col("field").isin(list(field_weights))
            & F.col("term").isin([t for _, t, _, _ in weights])
        )
        scored = cand.join(F.broadcast(wdf), ["field", "term"]).select(
            "doc_id",
            "field",
            "term",
            (
                F.col("w")
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col(dl_col) / F.col("avgdl"))
                )
            ).alias("s"),
        )
        return scored.groupBy("doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("field", "term", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("s")
        )

    def _constant_docs(field: str, term_pred, boost: float):
        """Constant-score multiterm rewrite against one field's dictionary."""
        vocab = index.term_stats.filter(
            (F.col("field") == field) & term_pred
        ).select("field", "term")
        docs = (
            index.postings.join(F.broadcast(vocab), ["field", "term"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        return docs.withColumn("s", F.lit(float(boost)))

    def clause_df(c) -> DataFrame | None:
        fw = {c.field: 1.0} if c.field else dict(boosts)
        if c.kind == "term":
            return _bm25_partials(fw, c.text, c.boost)
        if c.field is None:
            raise QueryParseError(
                f"clause kind {c.kind!r} requires a field qualifier context "
                "the multi-field executor does not cover; use the "
                "single-field boolean engine for default-field queries"
            )
        if c.kind == "prefix":
            return _constant_docs(c.field, F.col("term").startswith(c.text), c.boost)
        if c.kind == "wildcard":
            from .score import wildcard_to_regex

            return _constant_docs(
                c.field, F.col("term").rlike(wildcard_to_regex(c.text)), c.boost
            )
        raise QueryParseError(
            f"fielded {c.kind!r} clauses are not supported on the "
            "multi-field index (supported: term, prefix, wildcard)"
        )

    pos_parts, must_docs, not_docs = [], [], []
    has_positive = False  # a positive clause survived analysis
    for cid, c in enumerate(clauses):
        sdf = clause_df(c)
        if c.occur == MUST_NOT:
            if sdf is not None and sdf is not DROPPED_CLAUSE:
                not_docs.append(sdf.select("doc_id"))
            continue
        if sdf is DROPPED_CLAUSE:
            continue  # the classic parser drops analyzed-empty clauses
        has_positive = True
        if sdf is None:
            if c.occur == MUST:
                return empty  # unmatched MUST term -> no results
            continue
        pos_parts.append(sdf.select("doc_id", F.lit(cid).alias("cid"), "s"))
        if c.occur == MUST:
            must_docs.append(sdf.select("doc_id"))

    if not pos_parts:
        if not_docs and not has_positive:
            # Solr's pure-negative rewrite (same semantics as the
            # single-field boolean engine): *:* minus the exclusions
            base = index.doc_stats.select("doc_id", F.lit(1.0).alias("score"))
            for p in not_docs:
                base = base.join(p, "doc_id", "left_anti")
            return (
                base.orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k)
                .select("doc_id", "score")
            )
        return empty
    unioned = pos_parts[0]
    for p in pos_parts[1:]:
        unioned = unioned.unionByName(p)
    # deterministic fold over clause-id order
    per_doc = unioned.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("cid", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )
    for m in must_docs:
        per_doc = per_doc.join(m, "doc_id", "left_semi")
    for n in not_docs:
        per_doc = per_doc.join(n, "doc_id", "left_anti")
    return (
        per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )
