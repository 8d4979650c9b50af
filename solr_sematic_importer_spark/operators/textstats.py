"""Text analysis operators for training-data pipelines.

All built from JVM-side expressions (whole-stage codegen; SQL-expressible
for the DuckDB oracle): language-ID heuristic, quality scoring, token
counting, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.analyzer import ENGLISH_STOPWORDS

# stable, sorted subset used by the lang-id / quality heuristics so the
# oracle SQL can embed the identical list
STOPWORD_LIST = sorted(ENGLISH_STOPWORDS - {"stopworda", "stopwordb"})


def _tokens(text_col: str):
    return F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")), " "
        ),
        lambda t: F.length(t) > 0,
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct_tokens, avg_token_len)."""
    toks = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            # guarded: ANSI mode (Spark 4 default) makes x/0 a job-killing
            # DIVIDE_BY_ZERO on the first empty/punctuation-only doc; an
            # empty doc has no average token length (NULL, matching what
            # a SQL GROUP BY over zero token rows would produce)
            F.when(
                F.size(toks) > 0,
                F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
                / F.size(toks),
            ),
            4,
        ).alias("avg_token_len"),
    )


def stopword_ratio(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = _tokens(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORD_LIST])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return df.select(
        F.col(id_col),
        F.round(n_sw / F.greatest(F.size(toks), F.lit(1)), 4).alias("stopword_ratio"),
    )


def lang_id_heuristic(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.08
) -> DataFrame:
    """Tiny lang-ID: English-stopword density above threshold -> 'en'.

    (A real pipeline would swap in an n-gram model UDF; the operator shape
    — per-doc scalar from token stats — is what matters at scale.)
    """
    r = stopword_ratio(df, text_col, id_col)
    return r.select(
        id_col,
        F.when(F.col("stopword_ratio") >= threshold, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("pred_lang"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite doc-quality score in [0,1]: length band + alnum ratio +
    distinct-token ratio. Deterministic closed form, SQL-parity."""
    toks = _tokens(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    alnum = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9]", ""))
    total = F.greatest(F.length(F.col(text_col)), F.lit(1))
    len_band = F.when((n >= 5) & (n <= 500), 1.0).otherwise(0.0)
    return df.select(
        F.col(id_col),
        F.round(
            (len_band + alnum / total + n_distinct / F.greatest(n, F.lit(1))) / 3.0, 4
        ).alias("quality"),
    )


# GPT-2-style pre-tokenizer pattern (published), simplified to the
# lookahead-free subset both Java regex (Spark) and RE2 (DuckDB) accept:
# contraction suffixes | space?letters | space?digits | space?punct-run
# (whitespace-only pieces dropped from the count). Approximates BPE token
# usage well enough for budget/quality gating without a tokenizer model.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_ish): whitespace token count plus the
    GPT-2-regex-style piece count — the standard cheap proxy for LLM
    token budgets over a 100 TB corpus (pure regexp_extract_all, no
    Python, no tokenizer download)."""
    ws = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    )
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
    return df.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_ish"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical content fingerprint: md5 over the sorted distinct token
    set — invariant to token order/duplication (near-dup blocking key)."""
    toks = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fingerprint"),
    )
