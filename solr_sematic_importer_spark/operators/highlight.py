"""Hit highlighting (Solr ``hl=true`` on the ``/select`` handler — served
by Lucene's highlighter over stored fields in the destination collection;
``semantic_base_config.zip -> solrconfig.xml`` ships the standard
highlight search component). A reference user requests snippets with
every result page, so the engine provides the equivalent:

re-analyze the stored text WITH CHARACTER OFFSETS (the analyzer chain is
a pure function, so index-time and highlight-time tokenization agree by
construction — Lucene re-analyzes stored text the same way when no term
vectors are stored), find tokens whose analyzed form matches an analyzed
query term, cut a fragment window around the first match, and wrap every
matched token in the fragment with pre/post tags.

Runs as one Arrow-batched kernel over the (usually tiny) top-k result
set — highlighting is per-page work, never a corpus scan: join the top-k
doc ids back to the source table first (the J1 broadcast-join shape).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.analyzer import (
    MAX_TOKEN_LENGTH,
    PROFILES,
    _text_en_term,
    _TOKEN_RE,
)


def _tokens_with_offsets(text: str, profile: str):
    """[(analyzed_term, start, end)] — analyzed form + original char span.
    Tokens the chain drops (stopwords) are omitted."""
    out = []
    if not text:
        return out
    if profile == "simple":
        import re

        for m in re.finditer(r"[a-z0-9]+", text.lower()):
            out.append((m.group(0), m.start(), m.end()))
        return out
    for m in _TOKEN_RE.finditer(text):
        whole = m.group(0)
        # replicate tokenize()'s MAX_TOKEN_LENGTH split with offsets
        # intact: an over-long run is INDEXED as 255-char terms, so the
        # query matches them — highlighting must produce the same terms
        # or matching docs silently vanish from the highlight section
        for i in range(0, len(whole), MAX_TOKEN_LENGTH):
            raw = whole[i : i + MAX_TOKEN_LENGTH]
            s = m.start() + i
            e = s + len(raw)
            if profile == "text_general":
                out.append((raw.lower(), s, e))
                continue
            # text_en: the index chain's own per-token function — one
            # source of truth, no drift when the chain changes
            term = _text_en_term(raw)
            if term:
                out.append((term, s, e))
    return out


def make_snippet(
    text: str,
    query_terms: set[str],
    profile: str,
    frag_size: int = 100,
    pre: str = "<em>",
    post: str = "</em>",
) -> str | None:
    """One fragment around the first matching token, all matches inside
    the fragment wrapped. None when nothing matches (Solr omits the doc
    from the highlighting section)."""
    toks = _tokens_with_offsets(text, profile)
    hits = [(s, e) for term, s, e in toks if term in query_terms]
    if not hits:
        return None
    first_s, _ = hits[0]
    frag_start = max(0, first_s - frag_size // 4)
    frag_end = min(len(text), frag_start + frag_size)
    inside = [(s, e) for s, e in hits if s >= frag_start and e <= frag_end]
    parts = []
    cur = frag_start
    for s, e in inside:
        parts.append(text[cur:s])
        parts.append(pre + text[s:e] + post)
        cur = e
    parts.append(text[cur:frag_end])
    snippet = "".join(parts)
    if frag_start > 0:
        snippet = "..." + snippet
    if frag_end < len(text):
        snippet = snippet + "..."
    return snippet


def highlight(
    docs: DataFrame,
    query: str,
    profile: str = "text_general",
    text_col: str = "text",
    id_cols: tuple = ("doc_id",),
    frag_size: int = 100,
    pre: str = "<em>",
    post: str = "</em>",
) -> DataFrame:
    """(id cols..., snippet) for docs whose text matches any analyzed
    query term. Feed it the top-k rows joined to the source table — the
    per-page shape, not a corpus scan."""
    qterms = set(PROFILES[profile](query))
    id_cols = list(id_cols)
    in_fields = {f.name: f.dataType.simpleString() for f in docs.schema.fields}
    schema = ", ".join([f"{c} {in_fields[c]}" for c in id_cols] + ["snippet string"])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            snips = [
                make_snippet(t or "", qterms, profile, frag_size, pre, post)
                for t in b[text_col]
            ]
            out = pd.DataFrame({c: b[c] for c in id_cols})
            out["snippet"] = snips
            yield out[out["snippet"].notna()]

    return docs.select(*id_cols, text_col).mapInPandas(kernel, schema)
