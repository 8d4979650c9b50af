"""Text analysis chains matching the reference's Solr field types.

The reference delegates tokenization/analysis to Solr/Lucene via its
configsets; the chains we reproduce (``semantic_base_config.zip ->
managed-schema.xml``):

* ``text_general`` (index chain, :297-306): ``solr.StandardTokenizer``
  (UAX#29 word breaks, maxTokenLength 255) -> stop filter over
  ``stopwords.txt`` (EMPTY in the default config -> no-op) -> lowercase.
* ``text_en`` (:344-364): standard tokenizer -> stop over
  ``lang/stopwords_en.txt`` (35 words, ignoreCase) -> lowercase ->
  englishPossessive -> keywordMarker (``protwords.txt``: dontstems,
  zwhacky) -> porterStem.

Query-time synonymGraph (:311) is intentionally NOT replicated — the
shipped ``synonyms.txt`` is toy data; divergence documented in SURVEY §7.

A third profile, ``simple``, is a lowercase non-alphanumeric split whose
semantics are exactly expressible in ANSI SQL
(``string_split_regex(lower(text), '[^a-z0-9]+')``); it exists so the
driver's DuckDB oracle can verify the relational stages (tf/df/dl/BM25)
value-for-value.

All profiles are deterministic pure functions applied via Arrow-vectorized
``pandas_udf`` — one Python call per record batch, no per-row round trips
(BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from typing import Callable, List

import pandas as pd

from .porter import porter_stem

# ---------------------------------------------------------------------------
# Tokenizer: UAX#29 word-break approximation of Lucene StandardTokenizer.
#
# Word chars = \w (Unicode letters/digits/underscore; '_' is ExtendNumLet and
# joins words per UAX#29). Medial joiners:
#   . ' ’  (MidNumLet)  — join when alnum on both sides
#   :            (MidLetter)  — joins letters only
#   ,            (MidNum)     — joins digits only
# Trailing/leading joiners never attach ("U.S.A." -> "U.S.A").
# ---------------------------------------------------------------------------
_TOKEN_RE = re.compile(
    r"\w+(?:(?:['.’]|(?<=[^\W\d_]):(?=[^\W\d_])|(?<=\d),(?=\d))\w+)*",
    re.UNICODE,
)

# Lucene StandardTokenizer default maxTokenLength: tokens longer than 255
# chars are split at the 255 mark (scanner buffer behavior), not dropped.
MAX_TOKEN_LENGTH = 255

# lang/stopwords_en.txt from semantic_base_config.zip (35 entries, verbatim,
# including the two test markers shipped with the config).
ENGLISH_STOPWORDS = frozenset(
    """stopworda stopwordb a an and are as at be but by for if in into is it
    no not of on or such that the their then there these they this to was
    will with""".split()
)

# protwords.txt from semantic_base_config.zip (keywordMarker protected set).
PROTECTED_WORDS = frozenset({"dontstems", "zwhacky"})

# stopwords.txt (text_general profile) is empty in the default config.
GENERAL_STOPWORDS: frozenset = frozenset()


def tokenize(text: str) -> List[str]:
    """Lucene-StandardTokenizer-style tokens, original case preserved."""
    if not text:
        return []
    out = _TOKEN_RE.findall(text)  # findall beats finditer+group ~20%
    # a text shorter than the cap cannot contain an over-long token, so the
    # per-token length scan (measured ~50% of analyzer time on short-turn
    # corpora) only runs for texts that could need it; max(map(len, ...))
    # stays in C either way
    if len(text) > MAX_TOKEN_LENGTH and out and max(map(len, out)) > MAX_TOKEN_LENGTH:
        fixed: List[str] = []
        for tok in out:
            if len(tok) <= MAX_TOKEN_LENGTH:
                fixed.append(tok)
            else:
                fixed.extend(
                    tok[i : i + MAX_TOKEN_LENGTH]
                    for i in range(0, len(tok), MAX_TOKEN_LENGTH)
                )
        return fixed
    return out


def _strip_possessive(tok: str) -> str:
    """Lucene EnglishPossessiveFilter: drop trailing 's / ’s."""
    if len(tok) >= 2 and tok[-1] in "sS" and tok[-2] in "'’":
        return tok[:-2]
    return tok


def analyze_text_general(text: str) -> List[str]:
    """tokenize -> stop(empty set: no-op) -> lowercase."""
    return [t.lower() for t in tokenize(text)]


# whole-chain memo keyed by the RAW token: one dict hit replaces
# stop-check + lower + possessive + porter per occurrence. "" marks a
# stopword. Bounded: cleared if the long tail ever exceeds the cap (the
# analyzed vocabulary of a batch worker is tiny next to executor memory).
_TEXT_EN_MEMO: dict[str, str] = {}
_MEMO_CAP = 1 << 20


def _text_en_term(t: str) -> str:
    if t.lower() in ENGLISH_STOPWORDS:  # ignoreCase="true"
        return ""
    s = _strip_possessive(t.lower())
    return s if s in PROTECTED_WORDS else porter_stem(s)


def analyze_text_en(text: str) -> List[str]:
    """tokenize -> stop(en, ignoreCase) -> lowercase -> possessive ->
    keywordMarker(protwords) -> porterStem.

    Hot-path shape: ONE pass, one output list — per token a memo dict hit
    and a truthiness check ("" marks stopwords). A three-list variant
    (comprehension of memo lookups, `None in` rescue scan, filter
    comprehension) was tried in round 3 and is REVERTED here: the extra
    intermediate lists made the 16-way distributed analyze stage ~1.3x
    slower (allocator/GC contention across Python workers), the opposite
    of its single-threaded promise — measured by the interleaved stage
    probe in BASELINE.md §8."""
    memo = _TEXT_EN_MEMO
    out: List[str] = []
    for t in tokenize(text):
        r = memo.get(t)
        if r is None:
            r = _text_en_term(t)
            if len(memo) >= _MEMO_CAP:
                memo.clear()
            memo[t] = r
        if r:
            out.append(r)
    return out


_SIMPLE_RE = re.compile(r"[^a-z0-9]+")


def analyze_simple(text: str) -> List[str]:
    """SQL-oracle profile: split lower(text) on [^a-z0-9]+, drop empties."""
    if not text:
        return []
    return [t for t in _SIMPLE_RE.split(text.lower()) if t]


def analyze_with_positions(text: str, profile: str) -> tuple[List[str], List[int]]:
    """(terms, positions) with Lucene position-increment semantics: a
    removed stopword leaves a GAP (enablePositionIncrements=true, the
    stop-filter default), so phrase matching across a dropped stopword
    requires the gap — "state union" does NOT phrase-match
    "state of the union" in text_en, but "state of the union" does,
    exactly as Lucene's PhraseQuery sees it."""
    if not text:
        return [], []
    if profile == "simple":
        toks = analyze_simple(text)
        return toks, list(range(len(toks)))
    raw = tokenize(text)
    if profile == "text_general":
        return [t.lower() for t in raw], list(range(len(raw)))
    if profile != "text_en":
        raise KeyError(profile)
    terms, poss = [], []
    for i, t in enumerate(raw):
        r = _text_en_term(t)
        if not r:
            continue  # stopword: position consumed -> gap
        terms.append(r)
        poss.append(i)
    return terms, poss


PROFILES: dict[str, Callable[[str], List[str]]] = {
    "text_general": analyze_text_general,
    "text_en": analyze_text_en,
    "simple": analyze_simple,
}


def analyze_series(texts: pd.Series, profile: str) -> pd.Series:
    """Vectorized batch entry point used by the pandas_udf wrappers."""
    fn = PROFILES[profile]
    return texts.map(lambda t: fn(t) if t is not None else [])


def tf_series(texts: pd.Series, profile: str):
    """Batch analyze + per-doc term-frequency fold.

    Returns (terms, tfs, dl) Series: per doc the SORTED unique terms, their
    counts, and the total token count. Computing tf here — while the doc is
    still in one Python batch — means the engine never shuffles raw token
    occurrences: the downstream explode emits one row per DISTINCT
    (doc, term) with tf attached, and the only index-build shuffle left is
    the docfreq aggregation.

    The per-token transform chain is memoized at the analyzer level
    (``_TEXT_EN_MEMO``), so per-occurrence cost is tokenizer + one dict
    hit. (A distinct-raw-token fold was tried and measured SLOWER — the
    Counter-merge overhead exceeds the saved memo hits.)"""
    from collections import Counter

    fn = PROFILES[profile]
    terms_out, tfs_out, dl_out = [], [], []
    for t in texts:
        toks = fn(t) if t is not None else []
        c = Counter(toks)
        ks = sorted(c)
        terms_out.append(ks)
        tfs_out.append([c[k] for k in ks])
        dl_out.append(len(toks))
    idx = texts.index
    return (
        pd.Series(terms_out, index=idx),
        pd.Series(tfs_out, index=idx),
        pd.Series(dl_out, index=idx),
    )


def make_analyze_udf(profile: str):
    """Arrow-vectorized pandas_udf: string -> array<string>.

    Created lazily so importing this module never requires a SparkSession
    (the pure functions above also back the pytest oracle).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def analyze_udf(texts: pd.Series) -> pd.Series:
        return analyze_series(texts, profile)

    return analyze_udf
