"""Posting-list binary codec: delta + LEB128 varint blocks with block maxima.

The reference delegates posting storage to Lucene (postings are implied by
the destination Solr 9 collection, ``SolrSemanticIndexer.java:103``); Lucene
encodes doc deltas in fixed-size blocks with skip data. We reproduce the
*design* (not the wire format) NumPy-vectorized, because the input_hint
forbids per-row Python:

* postings of one term are sorted by doc_id and cut into blocks of
  ``BLOCK_SIZE`` (128, Lucene's block length);
* doc ids are delta-encoded (gap from the previous doc, first gap relative
  to ``first_doc`` carried on the block row) and LEB128-varint packed;
* term freqs are varint packed;
* per-posting norms are the 1-byte Lucene SmallFloat codes (similarity.py),
  stored raw — 1 byte each, no varint needed;
* every block row carries ``first_doc``/``last_doc`` (skip pointers),
  ``cnt``, ``max_tf`` and ``max_impact`` = max over the block of
  ``tf / (tf + k1*(1-b+b*dl/avgdl))`` — the idf-independent BM25 factor —
  enabling block-max WAND-style pruning (multiply by idf at query time).

Encode and decode are pure NumPy over whole arrays (the Arrow batch IS the
batch); property tests in tests/test_codec.py assert round-trip identity.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

BLOCK_SIZE = 128

# ---------------------------------------------------------------------------
# LEB128 varint, vectorized
# ---------------------------------------------------------------------------


def varint_encode(vals: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array -> bytes (vectorized, no Python loop
    over values; the loop below is over the <=10 byte positions)."""
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (1..10)
    nb = np.ones(v.shape, dtype=np.int64)
    thresh = np.uint64(1 << 7)
    for _ in range(9):
        nb += v >= thresh
        if int(thresh) >= (1 << 63):
            break
        thresh = np.uint64(int(thresh) << 7)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for k in range(int(nb.max())):
        mask = nb > k
        byte = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > k).astype(np.uint8) << 7
        out[starts[mask] + k] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array (vectorized via reduceat)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 0x80)
    starts = np.concatenate(([0], ends[:-1] + 1))
    # position of each byte within its value group
    offsets = np.arange(b.size, dtype=np.int64) - np.repeat(starts, ends - starts + 1)
    contrib = (b & 0x7F).astype(np.uint64) << (7 * offsets).astype(np.uint64)
    # reduceat sums each group's contributions
    return np.add.reduceat(contrib, starts)


# ---------------------------------------------------------------------------
# Block encode / decode for one term's postings (within one doc bucket)
# ---------------------------------------------------------------------------


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    impacts: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> Iterator[Tuple[int, int, int, int, int, float, bytes, bytes, bytes]]:
    """Yield block tuples ``(block_id, first_doc, last_doc, cnt, max_tf,
    max_impact, doc_bytes, tf_bytes, norm_b)`` for postings sorted by
    doc_id. ``impacts`` is the precomputed idf-independent BM25 factor per
    posting (block_max of it is what WAND prunes on)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norm_bytes = np.asarray(norm_bytes, dtype=np.uint8)
    n = doc_ids.size
    for bid, off in enumerate(range(0, n, block_size)):
        d = doc_ids[off : off + block_size]
        t = tfs[off : off + block_size]
        nb = norm_bytes[off : off + block_size]
        im = impacts[off : off + block_size]
        gaps = np.empty(d.size, dtype=np.uint64)
        gaps[0] = 0  # first doc is carried absolute on the row
        gaps[1:] = np.diff(d).astype(np.uint64)
        yield (
            bid,
            int(d[0]),
            int(d[-1]),
            int(d.size),
            int(t.max()),
            float(im.max()),
            varint_encode(gaps),
            varint_encode(t.astype(np.uint64)),
            nb.tobytes(),
        )


def decode_block(
    first_doc: int, doc_bytes: bytes, tf_bytes: bytes, norm_b: bytes
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (doc_ids int64, tfs int64, norm_bytes uint8)."""
    gaps = varint_decode(doc_bytes).astype(np.int64)
    docs = first_doc + np.cumsum(gaps)
    tfs = varint_decode(tf_bytes).astype(np.int64)
    norms = np.frombuffer(norm_b, dtype=np.uint8)
    return docs, tfs, norms
