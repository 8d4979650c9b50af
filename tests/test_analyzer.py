"""Analyzer golden tests (FIXTURES.md §3): chain parity with the reference
Solr field types (semantic_base_config.zip -> managed-schema.xml:297-313
text_general, :344-364 text_en)."""

import pandas as pd

from solr_sematic_importer_spark.functions.analyzer import (
    ENGLISH_STOPWORDS,
    PROTECTED_WORDS,
    analyze_series,
    analyze_simple,
    analyze_text_en,
    analyze_text_general,
    tokenize,
)
from solr_sematic_importer_spark.functions.porter import porter_stem


def test_tokenizer_uax29_goldens():
    assert tokenize("state-of-the-art v2.0 costs $3.50") == [
        "state", "of", "the", "art", "v2.0", "costs", "3.50",
    ]
    assert tokenize("U.S.A. can't won't 1,000 items at 3.5% rate") == [
        "U.S.A", "can't", "won't", "1,000", "items", "at", "3.5", "rate",
    ]
    # ':' joins letters (MidLetter), ',' joins digits only (MidNum)
    assert tokenize("foo:bar a,b 1,2") == ["foo:bar", "a", "b", "1,2"]
    # '_' is ExtendNumLet -> joins
    assert tokenize("snake_case stays") == ["snake_case", "stays"]
    assert tokenize("naïve café résumé 東京") == ["naïve", "café", "résumé", "東京"]
    assert tokenize("") == []
    assert tokenize(None if False else "   \t\n ") == []


def test_tokenizer_max_token_length_splits():
    toks = tokenize("x" * 300)
    assert [len(t) for t in toks] == [255, 45]


def test_text_general_chain():
    # empty stopword list -> hot terms SURVIVE (stopwords.txt has 0 entries)
    assert analyze_text_general("The QUICK Brown AND the fox") == [
        "the", "quick", "brown", "and", "the", "fox",
    ]
    # possessives NOT stripped in text_general (no englishPossessive filter)
    assert analyze_text_general("the user's output") == ["the", "user's", "output"]


def test_text_en_chain():
    # stop (35 words incl stopworda/stopwordb, ignoreCase) -> lowercase ->
    # possessive -> keywordMarker -> porter
    assert analyze_text_en("a an and are as at be but by for") == []
    assert analyze_text_en("Stopworda STOPWORDB keeps") == ["keep"]
    assert analyze_text_en("the user's agent's output") == ["user", "agent", "output"]
    assert analyze_text_en("running runs ran runner") == ["run", "run", "ran", "runner"]
    assert analyze_text_en("indexing indexed indexes") == ["index", "index", "index"]
    # protected words bypass the stemmer
    assert analyze_text_en("dontstems zwhacky") == ["dontstems", "zwhacky"]
    assert porter_stem("dontstems") != "dontstems"  # protection is load-bearing


def test_wordlists_match_reference_config():
    assert len(ENGLISH_STOPWORDS) == 35
    assert {"stopworda", "stopwordb", "the", "their", "with"} <= ENGLISH_STOPWORDS
    assert PROTECTED_WORDS == {"dontstems", "zwhacky"}


def test_porter_goldens():
    goldens = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "valenci": "valenc",
        "hesitanci": "hesit", "digitizer": "digit", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
        "formalize": "formal", "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer", "airliner": "airlin",
        "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
        "running": "run", "runs": "run", "ran": "ran",
        # step-2 departures from the paper (match Martin's reference impl)
        "conformabli": "conform", "analogi": "analog",
    }
    bad = {w: (porter_stem(w), e) for w, e in goldens.items() if porter_stem(w) != e}
    assert not bad, bad


def test_simple_profile_is_sql_expressible_split():
    assert analyze_simple("The QUICK-brown fox_1!") == ["the", "quick", "brown", "fox", "1"]
    assert analyze_simple("") == []


def test_analyze_series_batch_and_nulls():
    s = pd.Series(["Running fast", None, ""])
    out = analyze_series(s, "text_en")
    assert list(out) == [["run", "fast"], [], []]
