"""Lucene BM25Similarity math (k1=1.2, b=0.75 — Solr 9 default).

The reference declares no <similarity> override
(``semantic_base_config.zip -> managed-schema.xml:1022-1031`` is a
commented example only), so Lucene 9.10's default
``BM25Similarity(k1=1.2, b=0.75)`` applies to the destination collection.
North star (BASELINE.json:6) pins rank-identity to that output, which
requires reproducing two Lucene details:

1. ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` per term, summed over
   query terms (OR semantics). Lucene >= 8 dropped the historical (k1+1)
   numerator factor, so the per-term score is
   ``idf * tf / (tf + k1 * (1 - b + b * dl/avgdl))``.
2. Document length is stored lossily as a 1-byte norm
   (``SmallFloat.intToByte4``); scoring decodes it back, so ``dl`` in the
   formula is the quantized value. We implement the 4-bit-mantissa
   float-like encoding: values 0..23 exact, above that a 3-bit mantissa
   with implicit leading bit plus exponent, biased so the byte range
   covers ints up to 2^31-1.

Both exact-dl and quantized-dl modes are supported; quantized is the
default (rank/score identity with Solr), exact mode backs the
SQL-expressible DuckDB oracle queries.
"""

from __future__ import annotations

import math

import numpy as np

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


# --- SmallFloat 4-bit float encoding (Lucene norm byte) --------------------

def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("positive values only")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit leading 1 bit
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
_NUM_FREE_VALUES = 255 - _MAX_INT4  # = 24: ints 0..23 are encoded exactly


def int_to_byte4(i: int) -> int:
    """Lucene SmallFloat.intToByte4 (returned as unsigned 0..255)."""
    if i < 0:
        raise ValueError("positive values only")
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _long_to_int4(i - _NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Lucene SmallFloat.byte4ToInt (b unsigned 0..255)."""
    if b < _NUM_FREE_VALUES:
        return b
    return _NUM_FREE_VALUES + _int4_to_long(b - _NUM_FREE_VALUES)


# Precomputed 256-entry decode table (Lucene's LENGTH_TABLE).
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)

# Vectorized encode over arbitrary dl arrays: dl values repeat heavily, and
# the mapping is monotonic, so searchsorted against the decode table gives
# encode-by-binary-search exactly like Lucene's NormValueComparator trick.
def encode_norms(dl: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int array -> uint8 norm bytes."""
    dl = np.asarray(dl, dtype=np.int64)
    # smallest byte whose decoded value >= is not the rule; Lucene rounds
    # DOWN: intToByte4 truncates mantissa bits, so the encoded value is the
    # largest table entry <= dl.
    idx = np.searchsorted(LENGTH_TABLE, dl, side="right") - 1
    return idx.astype(np.uint8)


def quantize_dl(dl: np.ndarray) -> np.ndarray:
    """dl -> decode(encode(dl)): the dl value BM25 actually scores with."""
    return LENGTH_TABLE[encode_norms(dl)]


# --- BM25 -------------------------------------------------------------------

def idf(df: float, n_docs: float) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def idf_vec(df: np.ndarray, n_docs: float) -> np.ndarray:
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(
    tf: np.ndarray,
    dl: np.ndarray,
    term_idf: float | np.ndarray,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantize: bool = True,
) -> np.ndarray:
    """Per-posting BM25 contribution (vectorized)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.int64)
    if quantize:
        dl = quantize_dl(dl)
    norm = k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
    return term_idf * tf / (tf + norm)
