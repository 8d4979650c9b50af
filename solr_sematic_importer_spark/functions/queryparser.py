"""Lucene classic query-parser syntax (the reference destination's
``/select`` default parser, ``defType=lucene`` with ``df=_text_``,
``semantic_base_config.zip -> solrconfig.xml:667-670``) — the subset a
collection user types daily:

* bare terms (analyzed, SHOULD by default — q.op=OR per the config)
* ``+term`` MUST, ``-term`` / ``NOT term`` MUST_NOT
* ``term1 AND term2`` both MUST, ``OR`` keeps SHOULD
* ``"quoted phrase"`` phrase clause (positions required to execute)
* ``(grouped clauses)`` nested boolean query
* ``prefix*`` PrefixQuery (constant-score rewrite inside the boolean)
* ``te?t`` / ``t*st`` WildcardQuery (constant-score rewrite; leading
  wildcards rejected, like Lucene's default allowLeadingWildcard=false)
* ``term~`` / ``term~1`` / ``term~2`` FuzzyQuery (max edit distance 2,
  Lucene's hard cap; executed as a SynonymQuery-style blend over the
  Levenshtein-expanded vocab slice)
* ``"a phrase"~N`` sloppy phrase (slop carried on the clause)
* ``[alpha TO beta]`` / ``{alpha TO beta}`` TermRangeQuery over the term
  dictionary (inclusive / exclusive bounds, ``*`` = open end;
  constant-score rewrite)
* ``term^2.5`` boost
* ``field:term`` — by default only the default search field is
  addressable (the single-field engine indexes one analyzed field, like
  the reference's ``_text_`` catch-all). ``parse_query(q, fields=...)``
  opts in named concrete fields (the multi-field index,
  ``operators/multifield.py``): a qualified clause carries its field on
  ``Clause.field`` and is scored against that field's postings only,
  exactly Lucene's per-field TermQuery. Unknown field names still raise.

``+``/``-`` are operators only at clause start (string start, after
whitespace, or after ``(``) — inside a word they are term characters, so
``wi-fi`` / ``covid-19`` / ``c++`` lex as ONE word and the analyzer
splits them into sub-terms, matching Lucene's classic parser. Wildcard /
fuzzy / prefix terms are lowercased (Solr multiterm analysis) since the
term dictionary is lowercase; plain terms go through the full analyzer.

Numeric/date ranges belong on fq metadata filters
(``bm25_topk(extra_filter=...)``). The parser produces a plain AST;
execution lives in ``operators/boolean_query.py``.

Occur resolution follows the classic parser's practical behavior: an
explicit +/- wins; otherwise ``AND`` promotes BOTH neighbors to MUST,
``OR`` leaves SHOULD.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

SHOULD, MUST, MUST_NOT = "SHOULD", "MUST", "MUST_NOT"

DEFAULT_FIELDS = {"_text_", "text"}

# +/- are operators ONLY at clause start: preceded by nothing/whitespace/'('
# (the (?<![^\s(]) lookbehind) and attached to the clause ((?=\S)). Anywhere
# else they are word characters ('wi-fi', 'c++').
_TOKEN = re.compile(
    r"""
    (?P<lpar>\() | (?P<rpar>\)) |
    (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b) |
    (?P<plus>(?<![^\s(])\+(?=\S)) | (?P<minus>(?<![^\s(])-(?=\S)) |
    (?P<phrase>"(?P<phrase_body>[^"]*)"(?:~(?P<pslop>\d+))?) |
    (?P<range>(?P<lb>[\[{])\s*(?P<lo>[^\s\]}]+)\s+TO\s+(?P<hi>[^\s\]}]+)\s*(?P<rb>[\]}])) |
    (?P<word>[^\s()"^\[\]{}]+) |
    (?P<boost>\^(?P<boost_val>\d+(?:\.\d+)?)) |
    (?P<ws>\s+)
    """,
    re.VERBOSE,
)


@dataclass
class Clause:
    occur: str            # SHOULD / MUST / MUST_NOT
    kind: str             # term / phrase / prefix / wildcard / fuzzy / range / group
    text: str = ""        # raw term / phrase body / prefix (no '*') / pattern
    boost: float = 1.0
    children: list = field(default_factory=list)  # for kind == "group"
    lo: str | None = None          # range bounds; None = open end
    hi: str | None = None
    lo_inc: bool = True
    hi_inc: bool = True
    distance: int = 2              # fuzzy max edit distance (Lucene cap: 2)
    slop: int = 0                  # phrase slop ("a b"~N)
    field: str | None = None       # concrete field (multi-field index); None = default


class QueryParseError(ValueError):
    pass


def parse_query(q: str, fields=None) -> list[Clause]:
    """Query string -> top-level clause list. ``fields``: optional
    collection of addressable concrete field names (multi-field index) —
    ``field:term`` with a name in it sets ``Clause.field``; names outside
    it (and outside the default-field aliases) raise."""
    tokens = []
    pos = 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m:
            raise QueryParseError(f"cannot tokenize at {q[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup in (None, "ws"):
            continue
        tokens.append(m)
    clauses, i = _parse_clauses(tokens, 0, q, frozenset(fields or ()))
    if i != len(tokens):
        raise QueryParseError("unbalanced ')'")
    return clauses


def _strip_field(word: str, fields: frozenset) -> tuple[str | None, str]:
    """-> (concrete field or None, remaining word)."""
    if ":" in word:
        fld, rest = word.split(":", 1)
        if not rest:
            raise QueryParseError(
                f"dangling field qualifier {word!r} (field-qualified "
                "phrases/ranges are not supported)"
            )
        if fld in fields:
            return fld, rest
        if fld not in DEFAULT_FIELDS:
            known = sorted(DEFAULT_FIELDS | fields)
            raise QueryParseError(
                f"field '{fld}' is not addressable (known: {known})"
            )
        return None, rest
    return None, word


def _parse_clauses(tokens, i, q, fields: frozenset = frozenset()) -> tuple[list[Clause], int]:
    out: list[Clause] = []
    pending: str | None = None   # explicit +/-/NOT for the next clause
    conj: str | None = None      # AND / OR linking prev and next

    def attach(clause: Clause):
        nonlocal pending, conj
        if pending is not None:
            # an explicit +/-/NOT wins for THIS clause, but AND still
            # promotes its LEFT neighbor: Lucene parses "a AND NOT b"
            # as +a -b, not a -b
            clause.occur = pending
        elif conj == "AND":
            clause.occur = MUST
        if conj == "AND" and out and out[-1].occur == SHOULD:
            out[-1].occur = MUST  # AND promotes the left side too
        out.append(clause)
        pending = None
        conj = None

    while i < len(tokens):
        m = tokens[i]
        g = m.lastgroup
        if g == "rpar":
            return out, i
        i += 1
        if g == "lpar":
            children, i = _parse_clauses(tokens, i, q, fields)
            if i >= len(tokens) or tokens[i].lastgroup != "rpar":
                raise QueryParseError("unbalanced '('")
            i += 1
            node = Clause(SHOULD, "group", children=children)
            node.boost, i = _maybe_boost(tokens, i)
            attach(node)
        elif g == "and":
            conj = "AND"
        elif g == "or":
            conj = "OR"
        elif g == "not":
            pending = MUST_NOT
        elif g == "plus":
            pending = MUST
        elif g == "minus":
            pending = MUST_NOT
        elif g == "phrase":
            node = Clause(
                SHOULD, "phrase",
                text=m.group("phrase_body"),
                slop=int(m.group("pslop") or 0),
            )
            node.boost, i = _maybe_boost(tokens, i)
            attach(node)
        elif g == "range":
            lo, hi = m.group("lo"), m.group("hi")
            node = Clause(
                SHOULD, "range",
                lo=None if lo == "*" else lo.lower(),
                hi=None if hi == "*" else hi.lower(),
                lo_inc=m.group("lb") == "[",
                hi_inc=m.group("rb") == "]",
            )
            node.boost, i = _maybe_boost(tokens, i)
            attach(node)
        elif g == "word":
            fld, word = _strip_field(m.group("word"), fields)
            node = _word_clause(word)
            node.field = fld
            node.boost, i = _maybe_boost(tokens, i)
            attach(node)
        elif g == "boost":
            raise QueryParseError("dangling boost '^'")
    return out, i


_FUZZY_SUFFIX = re.compile(r"^(?P<base>.+)~(?P<dist>\d*)$")


def _word_clause(word: str) -> Clause:
    """Classify a bare word: fuzzy / prefix / wildcard / term. Multiterm
    variants (fuzzy/prefix/wildcard) are LOWERCASED like Solr's multiterm
    analysis — the term dictionary is lowercase, so a capitalized 'Tele*'
    must still match."""
    fz = _FUZZY_SUFFIX.match(word)
    if fz:
        dist = int(fz.group("dist")) if fz.group("dist") else 2
        if dist > 2:
            raise QueryParseError(
                f"fuzzy edit distance {dist} > 2 (Lucene's maximum): {word!r}"
            )
        return Clause(SHOULD, "fuzzy", text=fz.group("base").lower(), distance=dist)
    if word.endswith("*") and len(word) > 1 and not _has_wildcard(word[:-1]):
        return Clause(SHOULD, "prefix", text=word[:-1].lower())
    if _has_wildcard(word):
        if word[0] in "*?":
            raise QueryParseError(
                f"leading wildcard not supported (Lucene default): {word!r}"
            )
        return Clause(SHOULD, "wildcard", text=word.lower())
    if "~" in word:
        raise QueryParseError(f"malformed fuzzy suffix: {word!r}")
    return Clause(SHOULD, "term", text=word)


def _has_wildcard(s: str) -> bool:
    return "*" in s or "?" in s


def _maybe_boost(tokens, i) -> tuple[float, int]:
    if i < len(tokens) and tokens[i].lastgroup == "boost":
        return float(tokens[i].group("boost_val")), i + 1
    return 1.0, i
