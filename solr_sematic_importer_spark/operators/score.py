"""BM25 top-k query execution (SURVEY §3.3 lifecycle).

The reference delegates this entirely to Solr's ``/select`` handler
(``semantic_base_config.zip -> solrconfig.xml:650-655`` rows=10,
:667-670 df=_text_ OR semantics); we re-implement it Spark-first:

* query analysis runs the SAME analyzer chain as indexing (driver-local,
  pure function — no Spark job);
* per-term idf from exact docfreq; duplicate query terms keep their
  multiplicity (Lucene builds one SHOULD TermQuery per token, so a repeated
  token contributes twice);
* candidate fetch is a semi-join of the postings table against the tiny
  query-term set — expressed as ``isin`` so Catalyst pushes the predicate
  into the parquet/Iceberg scan (SURVEY §2.3 J2);
* per-posting score is computed with built-in JVM expressions (whole-stage
  codegen, no Python in the hot path);
* per-doc summation folds a SORTED array of (term, partial) pairs so the
  float accumulation order is fixed — scores are bit-identical across
  parallelism levels (SURVEY §7.3 risk 7);
* top-k = ``orderBy(score desc, doc_id asc).limit(k)`` which Spark plans as
  ``TakeOrderedAndProject``: per-partition heap + driver k-way merge —
  exactly the distributed top-k the reference gets from Lucene, with the
  docID-asc tie-break mandated for rank identity.
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.analyzer import PROFILES
from ..functions.similarity import B_DEFAULT, K1_DEFAULT, idf
from .build import InvertedIndex, term_dfs


def analyze_query(query: str, profile: str) -> list[str]:
    return PROFILES[profile](query)


def calculate_min_should_match(spec: "int | str", n_optional: int) -> int:
    """Solr's ``mm`` spec -> required optional-clause count — the FULL
    SolrPluginUtils.calculateMinShouldMatch grammar the edismax ``mm=``
    request param accepts:

    * positive int ``n``   -> n required
    * negative int ``-n``  -> all but n required
    * ``"P%"``             -> floor(n_optional * P / 100) required
    * ``"-P%"``            -> n_optional - floor(n_optional * P / 100)
    * conditional specs ``"N<spec"``, space-separated and evaluated in
      the given order (Solr documents them ascending-N): with C optional
      clauses, the FIRST pair whose N >= C stops the walk and yields the
      result accumulated so far (ALL clauses required when the first
      pair already stops it); each pair whose N < C re-evaluates its
      sub-spec. E.g. ``"2<-25% 9<-3"``: C<=2 -> all required; 3..9 ->
      all-but-25%; >9 -> all-but-3.

    Results are clamped to ``[0, n_optional]``; 0 means no constraint
    (plain OR)."""
    import re as _re

    spec_s = str(spec).strip()
    if "<" in spec_s:
        # normalize optional whitespace around '<' exactly like Solr's
        # spaceAroundLessThanPattern, then walk pairs in order
        spec_s = _re.sub(r"\s*<\s*", "<", spec_s)
        result = n_optional  # default: all optional clauses required
        for part in spec_s.split():
            upper_s, sep, sub = part.partition("<")
            if not sep or not sub:
                raise ValueError(f"invalid conditional mm spec segment {part!r}")
            if n_optional <= int(upper_s):
                break
            result = calculate_min_should_match(sub, n_optional)
        return max(0, min(result, n_optional))
    if spec_s.endswith("%"):
        pct = int(spec_s[:-1])
        calc = (abs(pct) * n_optional) // 100
        required = calc if pct >= 0 else n_optional - calc
    else:
        val = int(spec_s)
        required = val if val >= 0 else n_optional + val
    return max(0, min(required, n_optional))


def bm25_topk(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
    extra_filter=None,
    offset: int = 0,
    exclude: str | None = None,
    min_match: "int | str | None" = None,
) -> DataFrame:
    """Top-k (doc keys, score) for an OR-semantics BM25 query.

    ``extra_filter``: optional Column predicate over doc_stats columns —
    the reference's ``fq`` filter-query semantics
    (``HttpSolrSelectClientImpl.java:113-115``), applied pre-scoring.
    ``offset``: pagination ``start`` (SURVEY §2.6 T3,
    ``HttpSolrSelectClientImpl.java:111``) — computes top-(offset+k) and
    slices, exactly Solr's deep-paging cost model.
    ``exclude``: prohibited terms (Lucene ``-term`` MUST_NOT): documents
    containing ANY of them are dropped pre-ranking via an anti-join on
    their postings.
    """
    spark = index.postings_flat.sparkSession
    key_cols = [c for c in index.key_cols]
    empty = spark.createDataFrame(
        [],
        index.doc_stats.select("doc_id", *[c for c in key_cols if c != "doc_id"])
        .withColumn("score", F.lit(0.0))
        .schema,
    )
    per_doc = score_or_docs(
        index, query, k1=k1, b=b, quantize=quantize,
        extra_filter=extra_filter, exclude=exclude, min_match=min_match,
    )
    if per_doc is None:
        return empty

    top = (
        per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(offset + k)
    )
    if offset:
        rows = top.collect()[offset : offset + k]
        top = spark.createDataFrame(rows, top.schema) if rows else spark.createDataFrame([], top.schema)

    lookup_cols = [c for c in key_cols if c != "doc_id"]
    if lookup_cols:
        out = F.broadcast(top).join(
            index.doc_stats.select("doc_id", *lookup_cols), "doc_id"
        ).select("doc_id", *lookup_cols, "score")
        # re-assert ordering after the lookup join
        return out.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select("doc_id", "score")


def score_or_docs(
    index: InvertedIndex,
    query: str,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
    extra_filter=None,
    exclude: str | None = None,
    raw_terms: Sequence[str] | None = None,
    min_match: "int | str | None" = None,
) -> DataFrame | None:
    """The shared OR-semantics scoring stage: every matching doc with its
    full BM25 score (no top-k cut). None when the query matches nothing.
    ``bm25_topk`` adds TakeOrdered on top; ``bm25_grouped_topk`` adds the
    per-group window instead. ``raw_terms`` bypasses query analysis for
    callers whose terms are ALREADY analyzed (more-like-this feeds index
    terms back in; re-analysis would double-stem them).

    ``min_match``: Solr/edismax ``mm`` — a doc must satisfy at least
    N of the query's optional clauses (duplicate tokens are separate
    clauses, exactly Lucene BooleanQuery.setMinimumNumberShouldMatch
    over one SHOULD TermQuery per token). The clause count rides the
    same per-doc fold (sum of matched-term multiplicities), so mm adds
    zero extra shuffles."""
    spark = index.postings_flat.sparkSession
    terms = list(raw_terms) if raw_terms is not None else analyze_query(query, index.profile)
    if not terms or index.n_docs == 0:
        return None

    counts = Counter(terms)
    dfs = term_dfs(index, list(counts))
    weights = [
        (t, float(mult) * idf(dfs[t], index.n_docs), int(mult))
        for t, mult in counts.items()
        if dfs[t] > 0
    ]
    if not weights:
        return None
    required = (
        calculate_min_should_match(min_match, len(terms))
        if min_match is not None
        else 0
    )

    wdf = spark.createDataFrame(weights, "term string, w double, mult int")
    dl_col = "dl_quant" if quantize else "dl"
    avgdl = index.avgdl

    cand = index.flat_terms([w[0] for w in weights])
    scored = cand.join(F.broadcast(wdf), "term").select(
        "doc_id",
        "term",
        "mult",
        (
            F.col("w")
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col(dl_col) / F.lit(avgdl))
            )
        ).alias("s"),
    )

    # Deterministic per-doc sum: fold the term-sorted array of partials.
    per_doc = scored.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score"),
        F.sum("mult").alias("_nclauses"),
    )
    if required > 0:
        per_doc = per_doc.filter(F.col("_nclauses") >= required)
    per_doc = per_doc.drop("_nclauses")

    if extra_filter is not None:
        allowed = index.doc_stats.filter(extra_filter).select("doc_id")
        per_doc = per_doc.join(allowed, "doc_id", "left_semi")

    if exclude:
        neg_terms = analyze_query(exclude, index.profile)
        if neg_terms:
            banned = index.flat_terms(neg_terms).select("doc_id")
            per_doc = per_doc.join(banned, "doc_id", "left_anti")

    if index.deletes is not None:
        per_doc = per_doc.join(index.deletes.select("doc_id"), "doc_id", "left_anti")

    return per_doc


def bm25_topk_synonyms(
    index: InvertedIndex,
    query: str,
    synonyms: dict[str, list[str]] | None = None,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> DataFrame:
    """OR-semantics BM25 with query-time synonym groups, scored with
    Lucene ``SynonymQuery`` semantics: each original token position
    becomes one pseudo-term whose ``df = max(df of members)`` and per-doc
    ``tf = sum(tf of members)``. Returns (doc_id, score).

    ``synonyms=None`` loads the shipped configset's synonyms.txt rules
    (``semantic_base_config.zip -> synonyms.txt`` via
    ``functions.synonyms.default_synonyms``) — the default Solr query
    chain, ``managed-schema.xml:311``."""
    from ..functions.analyzer import analyze_text_general
    from ..functions.synonyms import default_synonyms, expand_terms

    if synonyms is None:
        synonyms = default_synonyms()
    spark = index.postings_flat.sparkSession
    out_schema = "doc_id long, score double"
    # Solr applies synonymGraph BEFORE stemming and the outputs continue
    # through the rest of the chain. Matching rules against STEMMED
    # tokens would never fire under text_en ('television' analyzes to
    # 'televis', which no surface-form rule key equals), and surface-form
    # members would look up df=0 in the stemmed dictionary — so: match on
    # tokenize+lowercase (pre-stem) tokens, then re-analyze every member
    # through the index profile.
    raw_terms = analyze_text_general(query)
    if not raw_terms or index.n_docs == 0:
        return spark.createDataFrame([], out_schema)

    groups = []
    for g in expand_terms(raw_terms, synonyms):
        flat: list[str] = []
        for m in g:
            for t in analyze_query(m, index.profile):
                if t not in flat:
                    flat.append(t)
        if flat:  # a group can analyze away entirely (lone stopword)
            groups.append(flat)
    if not groups:
        return spark.createDataFrame([], out_schema)
    members = sorted({m for g in groups for m in g})
    dfs = term_dfs(index, members)
    # one weight per original token position; duplicate positions keep
    # multiplicity (Lucene builds one SHOULD clause per position)
    group_rows = []  # (term, group_id)
    weights = []     # (group_id, w)
    gid = 0
    for g in groups:
        present = [m for m in g if dfs[m] > 0]
        if not present:
            continue
        weights.append((gid, idf(max(dfs[m] for m in present), index.n_docs)))
        for m in present:
            group_rows.append((m, gid))
        gid += 1
    if not weights:
        return spark.createDataFrame([], out_schema)

    gdf = spark.createDataFrame(group_rows, "term string, gid int")
    wdf = spark.createDataFrame(weights, "gid int, w double")
    dl_col = "dl_quant" if quantize else "dl"
    avgdl = index.avgdl

    cand = index.flat_terms(sorted({m for m, _ in group_rows}))
    # per (doc, group): tf summed across members, THEN the BM25 saturation
    per_group = (
        cand.join(F.broadcast(gdf), "term")
        .groupBy("doc_id", "gid", dl_col)
        .agg(F.sum("tf").alias("tf_sum"))
        .join(F.broadcast(wdf), "gid")
        .select(
            "doc_id",
            "gid",
            (
                F.col("w")
                * F.col("tf_sum")
                / (
                    F.col("tf_sum")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col(dl_col) / F.lit(avgdl))
                )
            ).alias("s"),
        )
    )
    per_doc = per_group.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("gid", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )
    if index.deletes is not None:  # same deletion-vector mask as bm25_topk
        per_doc = per_doc.join(index.deletes.select("doc_id"), "doc_id", "left_anti")
    return (
        per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


def bm25_topk_cursor(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    cursor: tuple[float, int] | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> DataFrame:
    """Solr cursorMark deep paging: keyset pagination on the total order
    (score desc, doc_id asc). ``cursor`` is the LAST row of the previous
    page; the next page filters strictly past it BEFORE the top-k, so
    page N costs the same as page 1 — unlike offset paging, which
    recomputes and discards N*k rows (Solr added cursorMark for exactly
    this reason). Returns (doc_id, score)."""
    spark = index.postings_flat.sparkSession
    per_doc = score_or_docs(index, query, k1=k1, b=b, quantize=quantize)
    if per_doc is None:
        return spark.createDataFrame([], "doc_id long, score double")
    if cursor is not None:
        last_score, last_doc = float(cursor[0]), int(cursor[1])
        per_doc = per_doc.filter(
            (F.col("score") < last_score)
            | ((F.col("score") == last_score) & (F.col("doc_id") > last_doc))
        )
    return (
        per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


def spellcheck_terms(
    index: InvertedIndex,
    word: str,
    max_distance: int = 2,
    limit: int = 5,
) -> DataFrame:
    """Solr spellcheck component ("did you mean"): vocabulary terms within
    ``max_distance`` Levenshtein edits of the (analyzed) input, most
    frequent first — JVM ``levenshtein`` over the vocab-sized term_stats
    table with a length-window pre-filter so the distance function runs on
    a sliver of the dictionary. Returns (term, df, distance)."""
    analyzed = analyze_query(word, index.profile)
    target = analyzed[0] if analyzed else word.lower()
    n = len(target)
    cand = index.term_stats.filter(
        (F.length("term") >= n - max_distance)
        & (F.length("term") <= n + max_distance)
    )
    return (
        cand.select(
            "term", "df", F.levenshtein(F.col("term"), F.lit(target)).alias("distance")
        )
        .filter(F.col("distance") <= max_distance)
        .orderBy(F.col("distance").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(limit)
    )


def fuzzy_expand_terms(
    index: InvertedIndex,
    word: str,
    distance: int = 2,
    max_expansions: int = 50,
) -> list[tuple[str, int, float]]:
    """Lucene FuzzyQuery term expansion: vocabulary terms within
    ``distance`` Levenshtein edits of the (lowercased) input — the same
    length-window pre-filter as ``spellcheck_terms`` so the JVM
    ``levenshtein`` runs on a sliver of the dictionary.

    Each member carries Lucene FuzzyTermsEnum's edit-distance similarity
    boost ``1 - d / min(len(member), len(target))`` (an exact match
    boosts 1.0; a maximally-edited short term can boost to 0), and the
    expansion set is capped at ``max_expansions`` (Lucene's default 50)
    keeping the best members by (boost desc, df desc, term asc) —
    Lucene's TopTermsBlendedFreqScoringRewrite queue ranks by boost; we
    break boost ties by docfreq (highest-df members are the ones a
    blended rewrite wants statistics from) rather than term order, a
    documented divergence. Classic Levenshtein, not Damerau (Lucene
    defaults transpositions=true) — documented divergence shared with
    the SQL oracle. Returns [(term, df, boost)]."""
    target = word.lower()
    n = len(target)
    cand = index.term_stats.filter(
        (F.length("term") >= n - distance) & (F.length("term") <= n + distance)
    )
    rows = (
        cand.select(
            "term", "df",
            F.levenshtein(F.col("term"), F.lit(target)).alias("d"),
        )
        .filter(F.col("d") <= distance)
        .collect()
    )
    members = [
        (
            r["term"],
            int(r["df"]),
            1.0 - int(r["d"]) / min(len(r["term"]), n),
        )
        for r in rows
    ]
    members.sort(key=lambda m: (-m[2], -m[1], m[0]))
    return members[:max_expansions]


def bm25_fuzzy_topk(
    index: InvertedIndex,
    word: str,
    distance: int = 2,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
    max_expansions: int = 50,
) -> DataFrame:
    """FuzzyQuery (``term~N``) under Lucene's blended-freq top-terms
    rewrite: the capped expansion set becomes SHOULD TermQueries whose
    docfreq is BLENDED to the max over members (one shared idf), each
    boosted by its edit-distance similarity —
    ``score(doc) = Σ_members boost_m * idf(df_max) * sat(tf_m)``.
    Returns (doc_id, score)."""
    spark = index.postings_flat.sparkSession
    out_schema = "doc_id long, score double"
    members = fuzzy_expand_terms(index, word, distance, max_expansions)
    if not members or index.n_docs == 0:
        return spark.createDataFrame([], out_schema)
    w = idf(max(df for _, df, _ in members), index.n_docs)
    bdf = spark.createDataFrame(
        [(t, bst) for t, _, bst in members], "term string, boost double"
    )
    dl_col = "dl_quant" if quantize else "dl"
    avgdl = index.avgdl
    scored = (
        index.flat_terms([t for t, _, _ in members])
        .join(F.broadcast(bdf), "term")
        .select(
            "doc_id",
            "term",
            (
                F.col("boost")
                * F.lit(w)
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col(dl_col) / F.lit(avgdl))
                )
            ).alias("s"),
        )
    )
    # deterministic per-doc sum: term-sorted fold (same as score_or_docs)
    per_doc = scored.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )
    if index.deletes is not None:
        per_doc = per_doc.join(index.deletes.select("doc_id"), "doc_id", "left_anti")
    return (
        per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


def wildcard_to_regex(pattern: str) -> str:
    """Lucene wildcard syntax -> anchored Java/RE2-safe regex:
    ``*`` = any run, ``?`` = one char, everything else literal."""
    import re as _re

    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "^" + "".join(out) + "$"


def wildcard_query_topk(
    index: InvertedIndex,
    pattern: str,
    k: int = 10,
) -> DataFrame:
    """Lucene WildcardQuery (``te?t``, ``t*st``) under Solr's default
    MultiTermQuery CONSTANT_SCORE rewrite: regex-on-vocab expansion
    (``rlike`` over the vocab-sized term_stats table), then the same
    semi-join/dedup shape as ``prefix_query_topk``. Every matching doc
    scores 1.0; docID-asc tie-break. Returns (doc_id, score)."""
    spark = index.postings_flat.sparkSession
    if not pattern:
        return spark.createDataFrame([], "doc_id long, score double")
    rx = wildcard_to_regex(pattern.lower())
    matching = index.term_stats.filter(F.col("term").rlike(rx)).select("term")
    docs = (
        index.flat_terms_semi(matching)
        .select("doc_id")
        .distinct()
    )
    if index.deletes is not None:
        docs = docs.join(index.deletes.select("doc_id"), "doc_id", "left_anti")
    return (
        docs.withColumn("score", F.lit(1.0))
        .orderBy(F.col("doc_id").asc())
        .limit(k)
    )


def bm25_sorted_by_field(
    index: InvertedIndex,
    query: str,
    sort_df: DataFrame,
    sort_col: str,
    ascending: bool = True,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> DataFrame:
    """Solr ``sort=field asc|desc``: the matching set is the query's, the
    ORDER is a stored field's (doc_id tie-break) — a join to the field
    table plus TakeOrderedAndProject; scores still returned."""
    spark = index.postings_flat.sparkSession
    per_doc = score_or_docs(index, query, k1=k1, b=b, quantize=quantize)
    if per_doc is None:
        return spark.createDataFrame(
            [], f"doc_id long, {sort_col} {dict(sort_df.dtypes)[sort_col]}, score double"
        )
    joined = per_doc.join(sort_df.select("doc_id", sort_col), "doc_id")
    key = F.col(sort_col).asc() if ascending else F.col(sort_col).desc()
    return (
        joined.orderBy(key, F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", sort_col, "score")
    )


def facet_on_query(
    index: InvertedIndex,
    query: str,
    facet_df: DataFrame,
    facet_col: str,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> DataFrame:
    """Solr facet semantics proper: facet counts are computed over the
    QUERY'S matching document set (``q=...&facet.field=X``), not the
    whole corpus — the match set semi-joins the facet table, then one
    partial+final hash agg. Returns (facet value, cnt)."""
    spark = index.postings_flat.sparkSession
    per_doc = score_or_docs(index, query, k1=k1, b=b, quantize=quantize)
    if per_doc is None:
        return spark.createDataFrame(
            [], f"{facet_col} {dict(facet_df.dtypes)[facet_col]}, cnt long"
        )
    matched = per_doc.select("doc_id")
    return (
        facet_df.select("doc_id", facet_col)
        .join(matched, "doc_id", "left_semi")
        .groupBy(facet_col)
        .agg(F.count("*").alias("cnt"))
    )


def terms_component(
    index: InvertedIndex,
    prefix: str = "",
    limit: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """Solr ``/terms`` handler (terms.prefix / terms.limit / terms.mincount):
    vocabulary terms matching a prefix, highest df first (term asc
    tie-break) — the autocomplete/suggest primitive. One pushed
    StartsWith filter over the vocab-sized term_stats table + TakeOrdered."""
    out = index.term_stats.select("term", "df")
    if prefix:
        out = out.filter(F.col("term").startswith(prefix))
    return (
        out.filter(F.col("df") >= min_df)
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(limit)
    )


def prefix_query_topk(
    index: InvertedIndex,
    prefix: str,
    k: int = 10,
) -> DataFrame:
    """Lucene PrefixQuery (``q=merg*``) under Solr's default
    MultiTermQuery CONSTANT_SCORE rewrite: every doc containing any term
    with the prefix scores 1.0; ordering is the docID-asc tie-break.
    Returns (doc_id, score). The expansion is a semi-join of postings
    against the prefix-matching vocab slice — StartsWith pushes to both
    scans."""
    spark = index.postings_flat.sparkSession
    if not prefix:
        return spark.createDataFrame([], "doc_id long, score double")
    matching = index.term_stats.filter(F.col("term").startswith(prefix)).select("term")
    docs = (
        index.flat_terms_semi(matching)
        .select("doc_id")
        .distinct()
    )
    if index.deletes is not None:
        docs = docs.join(index.deletes.select("doc_id"), "doc_id", "left_anti")
    return (
        docs.withColumn("score", F.lit(1.0))
        .orderBy(F.col("doc_id").asc())
        .limit(k)
    )


def bm25_grouped_topk(
    index: InvertedIndex,
    query: str,
    groups: DataFrame,
    k: int = 10,
    group_col: str = "grp",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> DataFrame:
    """Solr result grouping (``group=true&group.field=X``, served by the
    destination collection's ``/select``): the top-scoring document of
    each group, groups ordered by their head score. ``groups`` maps
    ``doc_id -> group_col``. Returns (grp, doc_id, score).

    Spark shape: score as usual, join the group map, one window
    ``row_number() over (partition by grp order by score desc, doc_id)``
    — the per-group shuffle is on the group key, and the final top-k of
    group heads is TakeOrderedAndProject."""
    from pyspark.sql.window import Window

    spark = index.postings_flat.sparkSession
    scored = score_or_docs(index, query, k1=k1, b=b, quantize=quantize)
    if scored is None:
        # dtype of the group column follows the caller's frame, so the
        # zero-hit schema matches the matching path exactly
        grp_type = dict(groups.dtypes)[group_col]
        return spark.createDataFrame(
            [], f"{group_col} {grp_type}, doc_id long, score double"
        )
    joined = scored.join(groups.select("doc_id", group_col), "doc_id")
    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    heads = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        heads.select(group_col, "doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def score_partials(
    index: InvertedIndex,
    query: str,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> "DataFrame | None":
    """Per-(doc, term) BM25 score components for every doc matching any
    query term — (doc_id, term, tf, df, idf, partial) with
    ``sum(partial) over doc = score``. The shared leaf table behind
    ``explain_topk`` and ``select(debug=True)``: callers semi-join their
    own (request-sized) doc set. None when no query term is indexed."""
    spark = index.postings_flat.sparkSession
    terms = analyze_query(query, index.profile)
    if not terms or index.n_docs == 0:
        return None
    counts = Counter(terms)
    dfs = term_dfs(index, list(counts))
    weights = [
        (t, float(dfs[t]), idf(dfs[t], index.n_docs),
         float(mult) * idf(dfs[t], index.n_docs))
        for t, mult in counts.items()
        if dfs[t] > 0
    ]
    if not weights:
        return None
    wdf = spark.createDataFrame(
        weights, "term string, df double, idf double, w double"
    )
    dl_col = "dl_quant" if quantize else "dl"
    return (
        index.flat_terms([w[0] for w in weights])
        .join(F.broadcast(wdf), "term")
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "idf",
            (
                F.col("w") * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col(dl_col) / F.lit(index.avgdl))
                )
            ).alias("partial"),
        )
    )


def explain_topk(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> DataFrame:
    """Solr ``debugQuery=true`` explain: the per-term score breakdown for
    the query's top-k docs — (doc_id, term, tf, df, idf, partial) where
    ``sum(partial) over doc = score``. Mirrors Lucene's Explanation tree
    flattened to one row per (doc, term) leaf.

    Plan: the usual scoring stage keeps its per-(doc,term) partials
    alive; the top-k doc set (TakeOrdered, request-sized) semi-joins the
    partials, so explain costs one extra broadcast join over the already-
    scored rows, not a rescore."""
    spark = index.postings_flat.sparkSession
    partials = score_partials(index, query, k1=k1, b=b, quantize=quantize)
    if partials is None:
        return spark.createDataFrame(
            [], "doc_id long, term string, tf long, df long, idf double, partial double"
        )
    # Derive the top-k FROM the partials (one scoring pass, not a second
    # bm25_topk rescore): the term-sorted fold below is the identical
    # accumulation score_or_docs performs — partial == its per-(doc,term)
    # s (w already carries the duplicate-token multiplicity) — so the
    # scores and tie-breaks are bit-identical to bm25_topk's.
    per_doc = partials.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "partial"))),
            F.lit(0.0),
            lambda acc, x: acc + x["partial"],
        ).alias("score")
    )
    if index.deletes is not None:  # the same mask bm25_topk applies
        per_doc = per_doc.join(index.deletes.select("doc_id"), "doc_id", "left_anti")
    top = (
        per_doc.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id")
    )
    return partials.join(F.broadcast(top), "doc_id", "left_semi")


def json_facet_stats(
    index: InvertedIndex,
    query: str,
    fields: DataFrame,
    field: str,
    aggs: "Sequence[tuple[str, object]]",
    limit: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> DataFrame:
    """Solr JSON Facet API terms facet with nested stats
    (``json.facet={langs:{type:terms, field:lang, facet:{avg_len:
    "avg(n_chars)"}}}``) over the QUERY's match set — buckets ordered by
    count desc (Solr's default sort), each carrying its nested aggregate
    values. ``fields`` is the stored-field table (doc_id + facet key +
    stat inputs); ``aggs`` is a list of (output_name, fn) where fn maps
    a column-name string to an aggregate Column (e.g.
    ``("avg_len", lambda c: F.round(F.avg(c("n_chars")), 4))``).

    Plan: match set (already reduced per-doc) -> doc_id join to stored
    fields -> ONE partial+final hash aggregation on the facet key; the
    nested stats ride the same agg, so nesting is free. Returns
    (field, count, *agg names)."""
    matched = score_or_docs(index, query, k1=k1, b=b, quantize=quantize)
    agg_cols = [fn(F.col).alias(name) for name, fn in aggs]
    if matched is None:
        joined = fields.limit(0)  # schema-stable empty result
    else:
        joined = matched.select("doc_id").join(fields, "doc_id")
    return (
        joined.groupBy(field)
        .agg(F.count("*").alias("count"), *agg_cols)
        .orderBy(F.col("count").desc(), F.col(field).asc())
        .limit(limit)
    )


def bm25_conjunction_topk(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> DataFrame:
    """AND semantics (SURVEY §2.7): docs matching ALL distinct query terms,
    scored the same way — union of postings + HAVING count = n_terms."""
    spark = index.postings_flat.sparkSession
    terms = sorted(set(analyze_query(query, index.profile)))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    dfs = term_dfs(index, terms)
    if any(dfs[t] == 0 for t in terms):  # a term with df=0 -> conjunction is empty
        return spark.createDataFrame([], "doc_id long, score double")
    wdf = spark.createDataFrame(
        [(t, idf(dfs[t], index.n_docs)) for t in terms], "term string, w double"
    )
    dl_col = "dl_quant" if quantize else "dl"
    scored = (
        index.flat_terms(terms)
        .join(F.broadcast(wdf), "term")
        .select(
            "doc_id",
            "term",
            (
                F.col("w") * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col(dl_col) / F.lit(index.avgdl))
                )
            ).alias("s"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("nt"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("score"),
    )
    hits = per_doc.filter(F.col("nt") == len(terms)).select("doc_id", "score")
    if index.deletes is not None:
        hits = hits.join(index.deletes.select("doc_id"), "doc_id", "left_anti")
    return hits.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
