"""Boolean-query execution for the Lucene classic parser syntax
(``functions/queryparser.py``) — BooleanQuery semantics over the engine's
index:

* score = sum of matching MUST + SHOULD clause scores (deterministic
  fold ordered by clause id, so results are bit-stable across
  parallelism);
* a doc must match EVERY MUST clause; with no MUST clause, at least one
  SHOULD (implicit — only matching docs ever enter the union);
* MUST_NOT clauses anti-join their doc sets away;
* a top-level query with ONLY prohibited clauses matches everything
  except them at score 1.0 — Solr's pure-negative rewrite
  (MatchAllDocs + exclusions), which plain Lucene rejects;
* term clauses score BM25 (idf x saturated tf x boost); phrase clauses
  score PhraseQuery-style over the positions table; prefix clauses score
  constant 1.0 x boost (MultiTermQuery constant-score rewrite); groups
  recurse with their boost multiplying the combined score.

Scale shape: every leaf is the corresponding single-clause plan (pushed
term predicates, broadcast weight tables); the boolean combine is ONE
union + hash aggregate on doc_id plus one anti-join per prohibited
clause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.analyzer import analyze_with_positions
from ..functions.queryparser import MUST, MUST_NOT, SHOULD, Clause, parse_query
from ..functions.similarity import B_DEFAULT, K1_DEFAULT, idf
from .build import InvertedIndex, term_dfs
from .score import analyze_query

# Sentinel: the clause ANALYZED TO NOTHING (e.g. a lone stopword under
# text_en) and must vanish from the query — Lucene's classic parser drops
# such clauses at parse time, so "merge AND the" degrades to "merge".
# Distinct from None, which means the clause EXISTS but matches no docs
# (df=0): an unmatchable MUST correctly empties the result, and an
# unmatched SHOULD still counts as a positive clause, blocking the
# pure-negative rewrite.
DROPPED_CLAUSE = object()


def boolean_query_topk(
    index: InvertedIndex,
    q: str,
    k: int = 10,
    positions: DataFrame | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> DataFrame:
    """Parse and execute a Lucene-syntax query; top-k (doc_id, score)."""
    spark = index.postings_flat.sparkSession
    out_schema = "doc_id long, score double"
    clauses = parse_query(q)
    ev = _Evaluator(index, positions, k1, b, quantize)
    scored = ev.combine(clauses, top_level=True)
    if scored is None or scored is DROPPED_CLAUSE:
        return spark.createDataFrame([], out_schema)
    if index.deletes is not None:
        scored = scored.join(index.deletes.select("doc_id"), "doc_id", "left_anti")
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


class _Evaluator:
    def __init__(self, index, positions, k1, b, quantize):
        self.index = index
        self.positions = positions
        self.k1, self.b = k1, b
        self.dl_col = "dl_quant" if quantize else "dl"
        self._next_cid = 0

    def _cid(self) -> int:
        self._next_cid += 1
        return self._next_cid

    def _df_of(self, terms: list[str]) -> dict[str, int]:
        # index-level memo shared with every other scorer on this handle
        return term_dfs(self.index, terms)

    def _sat(self, tf_col, w: float):
        return (
            F.lit(w)
            * tf_col
            / (
                tf_col
                + F.lit(self.k1)
                * (
                    F.lit(1.0 - self.b)
                    + F.lit(self.b) * F.col(self.dl_col) / F.lit(self.index.avgdl)
                )
            )
        )

    # ---- leaf scorers: DataFrame (doc_id, s) or None when unmatchable ----

    def term_scores(self, text: str, boost: float):
        terms = analyze_query(text, self.index.profile)
        if not terms:
            return DROPPED_CLAUSE  # analyzed away (stopword) — not "df=0"
        dfs = {t: d for t, d in self._df_of(terms).items() if d > 0}
        if not dfs:
            return None
        # a single input word analyzing to several tokens behaves as a
        # SHOULD group of them (documented divergence from the classic
        # parser's generated phrase)
        weights = [(t, boost * idf(d, self.index.n_docs)) for t, d in sorted(dfs.items())]
        spark = self.index.postings_flat.sparkSession
        wdf = spark.createDataFrame(weights, "term string, w double")
        cand = self.index.flat_terms([t for t, _ in weights])
        scored = cand.join(F.broadcast(wdf), "term").select(
            "doc_id", "term", self._sat(F.col("tf"), 1.0).alias("part"),
            F.col("w"),
        ).select("doc_id", "term", (F.col("w") * F.col("part")).alias("s"))
        return scored.groupBy("doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("s")
        )

    def phrase_scores(self, text: str, boost: float, slop: int = 0):
        terms, poss = analyze_with_positions(text, self.index.profile)
        if not terms:
            # whole phrase analyzed away — drops before the positions
            # requirement (nothing left to position-match)
            return DROPPED_CLAUSE
        if self.positions is None:
            raise ValueError(
                "phrase clause requires a positions table "
                "(operators.phrase.build_positions)"
            )
        from .phrase import phrase_match_counts
        dfs = self._df_of(sorted(set(terms)))
        if any(dfs.get(t, 0) == 0 for t in terms):
            return None
        gaps = [p - poss[0] for p in poss]
        w = boost * sum(idf(dfs[t], self.index.n_docs) for t in terms)
        hits = phrase_match_counts(self.positions, terms, gaps, slop=slop)
        return hits.join(
            self.index.doc_stats.select("doc_id", self.dl_col), "doc_id"
        ).select("doc_id", self._sat(F.col("tfp"), w).alias("s"))

    def fuzzy_scores(self, word: str, distance: int, boost: float) -> DataFrame | None:
        """FuzzyQuery under Lucene's blended-freq top-terms rewrite (see
        ``score.bm25_fuzzy_topk``): capped expansion set, df blended to
        the max over members (one shared idf), each member a SHOULD
        TermQuery boosted by its edit-distance similarity."""
        from .score import fuzzy_expand_terms

        members = fuzzy_expand_terms(self.index, word, distance)
        if not members:
            return None
        w = boost * idf(max(df for _, df, _ in members), self.index.n_docs)
        spark = self.index.postings_flat.sparkSession
        bdf = spark.createDataFrame(
            [(t, bst) for t, _, bst in members], "term string, mboost double"
        )
        scored = (
            self.index.flat_terms([t for t, _, _ in members])
            .join(F.broadcast(bdf), "term")
            .select(
                "doc_id", "term",
                (F.col("mboost") * self._sat(F.col("tf"), w)).alias("s"),
            )
        )
        return scored.groupBy("doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("s")
        )

    def wildcard_scores(self, pattern: str, boost: float) -> DataFrame | None:
        from .score import wildcard_to_regex

        matching = self.index.term_stats.filter(
            F.col("term").rlike(wildcard_to_regex(pattern))
        ).select("term")
        return self._constant_docs(matching, boost)

    def prefix_scores(self, prefix: str, boost: float) -> DataFrame | None:
        matching = self.index.term_stats.filter(
            F.col("term").startswith(prefix)
        ).select("term")
        return self._constant_docs(matching, boost)

    def range_scores(self, c: Clause) -> DataFrame | None:
        """TermRangeQuery: vocab slice between the bounds (lexicographic,
        like Lucene's BytesRef order on the term dictionary),
        constant-score rewrite."""
        matching = self.index.term_stats
        if c.lo is not None:
            matching = matching.filter(
                F.col("term") >= c.lo if c.lo_inc else F.col("term") > c.lo
            )
        if c.hi is not None:
            matching = matching.filter(
                F.col("term") <= c.hi if c.hi_inc else F.col("term") < c.hi
            )
        return self._constant_docs(matching.select("term"), c.boost)

    def _constant_docs(self, matching_terms: DataFrame, boost: float) -> DataFrame:
        docs = (
            self.index.flat_terms_semi(matching_terms)
            .select("doc_id")
            .distinct()
        )
        return docs.withColumn("s", F.lit(float(boost)))

    def clause_scores(self, c: Clause) -> DataFrame | None:
        if c.kind == "term":
            return self.term_scores(c.text, c.boost)
        if c.kind == "phrase":
            return self.phrase_scores(c.text, c.boost, slop=c.slop)
        if c.kind == "prefix":
            return self.prefix_scores(c.text, c.boost)
        if c.kind == "fuzzy":
            return self.fuzzy_scores(c.text, c.distance, c.boost)
        if c.kind == "wildcard":
            return self.wildcard_scores(c.text, c.boost)
        if c.kind == "range":
            return self.range_scores(c)
        if c.kind == "group":
            sub = self.combine(c.children, top_level=False)
            if sub is None or sub is DROPPED_CLAUSE:
                return sub
            return sub.select(
                "doc_id", (F.col("score") * F.lit(float(c.boost))).alias("s")
            )
        raise ValueError(c.kind)

    # ---- boolean combine --------------------------------------------------

    def combine(self, clauses: list[Clause], top_level: bool):
        spark = self.index.postings_flat.sparkSession
        parts: list[tuple[int, str, DataFrame]] = []
        prohibited: list[DataFrame] = []
        must_ids: list[int] = []
        unmatchable_must = False
        has_positive = False  # a positive clause SURVIVED analysis
        for c in clauses:
            df = self.clause_scores(c)
            if c.occur == MUST_NOT:
                if df is not None and df is not DROPPED_CLAUSE:
                    prohibited.append(df.select("doc_id"))
                continue
            if df is DROPPED_CLAUSE:
                continue  # the classic parser drops analyzed-empty clauses
            has_positive = True
            if df is None:
                if c.occur == MUST:
                    unmatchable_must = True
                continue
            cid = self._cid()
            if c.occur == MUST:
                must_ids.append(cid)
            parts.append((cid, c.occur, df))

        if unmatchable_must:
            return None
        if not parts:
            # the rewrite only applies when the query is EFFECTIVELY pure
            # negative (no positive clause survived analysis); a positive
            # clause that merely matched nothing (df=0 SHOULD) keeps
            # BooleanQuery semantics: zero results, never the corpus
            if top_level and prohibited and not has_positive:
                # Solr's pure-negative rewrite: *:* minus the exclusions
                base = self.index.doc_stats.select(
                    "doc_id", F.lit(1.0).alias("score")
                )
                for p in prohibited:
                    base = base.join(p, "doc_id", "left_anti")
                return base
            if not has_positive and not prohibited:
                return DROPPED_CLAUSE  # every clause analyzed away
            return None

        unioned = None
        for cid, _occur, df in parts:
            piece = df.select("doc_id", F.lit(cid).alias("cid"), "s")
            unioned = piece if unioned is None else unioned.unionByName(piece)
        agg = unioned.groupBy("doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("cid", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("score"),
            F.collect_set("cid").alias("cids"),
        )
        if must_ids:
            need = F.array([F.lit(i) for i in must_ids])
            agg = agg.filter(F.size(F.array_intersect(F.col("cids"), need)) == len(must_ids))
        out = agg.select("doc_id", "score")
        for p in prohibited:
            out = out.join(p, "doc_id", "left_anti")
        return out
