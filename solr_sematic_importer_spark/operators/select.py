"""One-call ``/select`` request executor — the Solr front door.

The reference delegates every query to the destination collection's
``/select`` handler (``semantic_base_config.zip -> solrconfig.xml:650-680``:
``q`` with ``df=_text_`` OR semantics, ``fq``, ``sort``, ``start``/``rows``/
``cursorMark``, ``mm``, ``boost``, ``rq={!rerank}``, ``fq={!collapse}``,
``elevateIds``, ``facet.field``, ``debugQuery``). The round-3 engine
implemented each of those as a standalone operator; this module composes
them into ONE request-shaped call so a user of the reference can issue the
same combined requests they issue today.

Composition order follows Solr's own execution:

1. main-query scoring (OR semantics + ``mm``), ``fq`` predicate and
   prohibited terms applied pre-ranking;
2. ``boost=`` (edismax multiplicative) / ``bf=`` (additive) over stored
   fields — LEFT join, identity default for missing/null fields;
3. ``rq={!rerank}``: top-``reRankDocs`` get ``weight * score(rerankQuery)``
   added, the tail keeps its first-pass score, everything re-sorts;
4. ``fq={!collapse field=X}``: one window per collapse key, survivors only
   (the collapse is a filter, so facets see the collapsed set — Solr
   CollapsingQParser semantics);
5. facets: per-field counts over the FINAL match set (not the page);
6. elevation: pinned editorial head in configured order, organic tail;
7. sort (score desc/doc_id asc default, or a stored field) and paging
   (``start``/``rows`` offset or ``cursorMark`` keyset).

Spark shape (100 TB): every stage reuses the operator it composes — the
scoring agg's pushed ``In(term)`` scan filter and broadcast weight join,
boost/collapse joins on the already-reduced match set, a broadcastable
rerank head, and TakeOrderedAndProject for every top-k cut. Composing adds
no extra pass over postings.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.similarity import B_DEFAULT, K1_DEFAULT
from .build import InvertedIndex
from .highlight import highlight as _highlight
from .score import score_or_docs, score_partials


@dataclass
class SelectResponse:
    """The response sections of a ``/select`` request."""

    docs: DataFrame                 # the page: doc_id, score (+ extras)
    facets: dict = dc_field(default_factory=dict)   # field -> (value, cnt) DF
    num_found: "int | None" = None  # total match count (opt-in, extra job)
    highlighting: "DataFrame | None" = None  # hl section: doc_id, snippet
    explain: "DataFrame | None" = None       # debugQuery: per-term partials


def select(
    index: InvertedIndex,
    q: str,
    fq=None,
    exclude: "str | None" = None,
    mm: "int | str | None" = None,
    fields: "DataFrame | None" = None,
    boost: "Column | None" = None,
    boost_mode: str = "multiply",
    rerank_query: "str | None" = None,
    rerank_docs: int = 20,
    rerank_weight: float = 2.0,
    collapse_field: "str | None" = None,
    elevate_ids: "Sequence[int] | None" = None,
    facet_fields: Sequence[str] = (),
    sort_field: "str | None" = None,
    sort_ascending: bool = True,
    start: int = 0,
    rows: int = 10,
    cursor_mark: "tuple[float, int] | None" = None,
    with_num_found: bool = False,
    hl_source: "DataFrame | None" = None,
    hl_frag_size: int = 100,
    hl_pre: str = "<em>",
    hl_post: str = "</em>",
    debug: bool = False,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> SelectResponse:
    """Execute a combined ``/select`` request. Parameters mirror the
    handler's: ``q``/``mm``/``fq`` (a Column predicate over doc_stats)/
    ``exclude`` (prohibited terms) shape the match set; ``boost`` (a
    Column over ``fields``) reshapes scores; ``rerank_query`` re-scores
    the head; ``collapse_field``/``facet_fields`` read ``fields``;
    ``elevate_ids`` pins the editorial head; ``sort_field``/``start``/
    ``rows``/``cursor_mark`` shape the page.

    ``fields`` is the stored-field table (doc_id + whatever boost/
    collapse/facet/sort read). Returns :class:`SelectResponse` whose
    ``docs`` page is (doc_id[, collapse_field][, elevated, rank], score).

    ``hl_source`` (``hl=true&hl.fl=text``): a (doc_id, text) table — the
    response gains a ``highlighting`` section with one snippet per PAGE
    doc whose text matches an analyzed query term (the page's doc ids
    broadcast-semi-join the source, so highlighting reads ``rows`` docs,
    never the corpus). ``debug=True`` (``debugQuery``): the response
    gains an ``explain`` section — the per-(doc, term) BM25 breakdown
    for exactly the docs on the page (post-boost/rerank/collapse), not a
    re-derived plain-``q`` top-k.
    """
    spark = index.postings_flat.sparkSession
    if cursor_mark is not None and (start or elevate_ids):
        raise ValueError("cursorMark cannot combine with start or elevation (Solr 400)")
    needs_fields = boost is not None or collapse_field or facet_fields or sort_field
    if needs_fields and fields is None:
        raise ValueError("boost/collapse/facet/sort require the stored-field table")

    def _finish(page: DataFrame, facets: dict, num_found: "int | None") -> SelectResponse:
        """Attach the hl / debug sections to the final page — both are
        page-sized broadcast joins, never another pass over postings."""
        hl_df = None
        if hl_source is not None:
            page_docs = F.broadcast(page.select("doc_id"))
            hl_df = _highlight(
                hl_source.join(page_docs, "doc_id", "left_semi"),
                q, profile=index.profile,
                frag_size=hl_frag_size, pre=hl_pre, post=hl_post,
            )
        explain_df = None
        if debug:
            partials = score_partials(index, q, k1=k1, b=b, quantize=quantize)
            explain_df = (
                spark.createDataFrame(
                    [], "doc_id long, term string, tf long, df long, "
                        "idf double, partial double")
                if partials is None
                else partials.join(
                    F.broadcast(page.select("doc_id")), "doc_id", "left_semi")
            )
        return SelectResponse(docs=page, facets=facets, num_found=num_found,
                              highlighting=hl_df, explain=explain_df)

    per_doc = score_or_docs(
        index, q, k1=k1, b=b, quantize=quantize,
        extra_filter=fq, exclude=exclude, min_match=mm,
    )
    out_cols = ["doc_id"] + ([collapse_field] if collapse_field else []) + ["score"]
    if per_doc is None:
        empty_docs = spark.createDataFrame(
            [], "doc_id long, " + (
                f"{collapse_field} string, " if collapse_field else ""
            ) + "score double"
        )
        facets = {
            f: spark.createDataFrame([], f"{f} string, cnt long")
            for f in facet_fields
        }
        return _finish(empty_docs, facets, 0 if with_num_found else None)

    # 2. boost (same LEFT-join + identity-default shape as bm25_boosted_topk)
    if boost is not None:
        ident = 1.0 if boost_mode == "multiply" else 0.0
        stats = fields.withColumn("_boost", boost.cast("double"))
        per_doc = per_doc.join(
            stats.select("doc_id", "_boost"), "doc_id", "left"
        ).withColumn("_boost", F.coalesce(F.col("_boost"), F.lit(ident)))
        op = (
            F.col("score") * F.col("_boost")
            if boost_mode == "multiply"
            else F.col("score") + F.col("_boost")
        )
        per_doc = per_doc.select("doc_id", op.alias("score"))

    # 3. rerank: head adjusted, tail keeps first-pass score, all re-sort
    if rerank_query is not None:
        head = (
            per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(rerank_docs)
        )
        rr = score_or_docs(index, rerank_query, k1=k1, b=b, quantize=quantize)
        if rr is not None:
            adjusted = (
                F.broadcast(head)
                .join(rr.withColumnRenamed("score", "_rr"), "doc_id", "left")
                .select(
                    "doc_id",
                    (
                        F.col("score")
                        + F.lit(float(rerank_weight))
                        * F.coalesce(F.col("_rr"), F.lit(0.0))
                    ).alias("score"),
                )
            )
            tail = per_doc.join(
                F.broadcast(head.select("doc_id")), "doc_id", "left_anti"
            )
            per_doc = adjusted.unionByName(tail)

    # 4. collapse: one window on the collapse key over the match set
    if collapse_field:
        from pyspark.sql.window import Window

        joined = per_doc.join(fields.select("doc_id", collapse_field), "doc_id")
        w = Window.partitionBy(collapse_field).orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        per_doc = (
            joined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # 5. facets over the final (post-fq, post-collapse) match set
    facets = {}
    for f in facet_fields:
        facets[f] = (
            fields.select("doc_id", f)
            .join(per_doc.select("doc_id"), "doc_id", "left_semi")
            .groupBy(f)
            .agg(F.count("*").alias("cnt"))
        )

    num_found = int(per_doc.count()) if with_num_found else None

    # 6. elevation: pinned head (configured order, real scores) + organic
    if elevate_ids:
        elev = spark.createDataFrame(
            [(int(d), i) for i, d in enumerate(elevate_ids)], "doc_id long, pos int"
        )
        pinned = (
            F.broadcast(elev)
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                *( [collapse_field] if collapse_field else [] ),
                F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
                F.lit(True).alias("elevated"),
                F.col("pos").cast("long").alias("rank"),
            )
        )
        from pyspark.sql.window import Window

        organic = (
            per_doc.join(F.broadcast(elev.select("doc_id")), "doc_id", "left_anti")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(start + rows)
            .select(
                "doc_id",
                *( [collapse_field] if collapse_field else [] ),
                "score",
                F.lit(False).alias("elevated"),
                (
                    F.lit(len(elevate_ids))
                    + F.row_number().over(
                        Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
                    )
                ).cast("long").alias("rank"),
            )
        )
        page = pinned.unionByName(organic).orderBy("rank")
        if start:
            page = page.filter(F.col("rank") >= start).orderBy("rank")
        return _finish(page.limit(rows), facets, num_found)

    # 7. sort + paging
    if sort_field:
        per_doc = per_doc.join(fields.select("doc_id", sort_field), "doc_id")
        key = F.col(sort_field).asc() if sort_ascending else F.col(sort_field).desc()
        order = [key, F.col("doc_id").asc()]
        out_cols = ["doc_id", sort_field] + (
            [collapse_field] if collapse_field else []
        ) + ["score"]
    else:
        order = [F.col("score").desc(), F.col("doc_id").asc()]

    if cursor_mark is not None:
        last_score, last_doc = float(cursor_mark[0]), int(cursor_mark[1])
        per_doc = per_doc.filter(
            (F.col("score") < last_score)
            | ((F.col("score") == last_score) & (F.col("doc_id") > last_doc))
        )
        page = per_doc.orderBy(*order).limit(rows)
    elif start:
        top = per_doc.orderBy(*order).limit(start + rows)
        sliced = top.collect()[start : start + rows]
        page = (
            spark.createDataFrame(sliced, top.schema)
            if sliced else spark.createDataFrame([], top.schema)
        )
    else:
        page = per_doc.orderBy(*order).limit(rows)
    return _finish(page.select(*out_cols), facets, num_found)
