"""Porter stemmer (original 1980 algorithm, Martin Porter's reference
implementation semantics).

Clean-room Python implementation of the algorithm Lucene's
``PorterStemFilter`` applies (the reference delegates stemming to Solr's
``text_en`` chain: ``semantic_base_config.zip -> managed-schema.xml:363``
declares ``<filter name="porterStem"/>``).  Lucene's PorterStemmer is a
faithful port of Porter's reference C implementation, which departs from
the published paper in two documented ways that we replicate:

1. step 2 maps ``bli -> ble`` (paper says ``abli -> able``);
2. step 2 adds ``logi -> log``.

Words of length <= 2 are returned unchanged (reference implementation's
``if (k <= 1) return`` guard).  Non-ASCII-lowercase characters are treated
as consonants, matching the byte-oriented reference implementation.

This is pure Python so both index-time and query-time paths (and the pytest
oracle) share one deterministic implementation; a memo cache makes repeated
vocabulary cheap inside Arrow batches.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(w: str, j: int) -> int:
    """Number of VC sequences in w[0:j+1] (Porter's m())."""
    n = 0
    i = 0
    # skip initial consonants
    while True:
        if i > j:
            return n
        if not _is_cons(w, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _is_cons(w, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _is_cons(w, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(w: str, j: int) -> bool:
    return any(not _is_cons(w, i) for i in range(j + 1))


def _double_cons(w: str, j: int) -> bool:
    return j >= 1 and w[j] == w[j - 1] and _is_cons(w, j)


def _cvc(w: str, i: int) -> bool:
    """consonant-vowel-consonant ending at i, final cons not w/x/y."""
    if i < 2 or not _is_cons(w, i) or _is_cons(w, i - 1) or not _is_cons(w, i - 2):
        return False
    return w[i] not in "wxy"


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    flag_ed_ing = False
    if w.endswith("eed"):
        if _measure(w, len(w) - 4) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _vowel_in_stem(w, len(w) - 3):
            w = w[:-2]
            flag_ed_ing = True
    elif w.endswith("ing"):
        if _vowel_in_stem(w, len(w) - 4):
            w = w[:-3]
            flag_ed_ing = True
    if flag_ed_ing:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _double_cons(w, len(w) - 1):
            if w[-1] not in "lsz":
                w = w[:-1]
        elif _measure(w, len(w) - 1) == 1 and _cvc(w, len(w) - 1):
            w += "e"

    # ---- step 1c
    if w.endswith("y") and _vowel_in_stem(w, len(w) - 2):
        w = w[:-1] + "i"

    # ---- step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem_j = len(w) - len(suf) - 1
            if stem_j >= 0 and _measure(w, stem_j) > 0:
                w = w[: stem_j + 1] + rep
            break

    # ---- step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem_j = len(w) - len(suf) - 1
            if stem_j >= 0 and _measure(w, stem_j) > 0:
                w = w[: stem_j + 1] + rep
            break

    # ---- step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem_j = len(w) - len(suf) - 1
            if stem_j >= 0 and _measure(w, stem_j) > 1:
                if suf == "ion" and w[stem_j] not in "st":
                    break
                w = w[: stem_j + 1]
            break

    # ---- step 5a
    if w.endswith("e"):
        m = _measure(w, len(w) - 2)
        if m > 1 or (m == 1 and not _cvc(w, len(w) - 2)):
            w = w[:-1]

    # ---- step 5b
    if _double_cons(w, len(w) - 1) and w[-1] == "l" and _measure(w, len(w) - 1) > 1:
        w = w[:-1]

    return w


porter_stem = lru_cache(maxsize=1 << 18)(_stem)
