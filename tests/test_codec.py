"""Property tests for the posting-list codec (SURVEY §5.2 item 4)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from solr_sematic_importer_spark.functions.codec import (
    BLOCK_SIZE,
    decode_block,
    encode_blocks,
    varint_decode,
    varint_encode,
)
from solr_sematic_importer_spark.functions.similarity import (
    LENGTH_TABLE,
    encode_norms,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_boundaries():
    # every 7-bit group boundary, both sides
    vals = []
    for k in range(1, 10):
        vals += [(1 << (7 * k)) - 1, 1 << (7 * k)]
    vals += [0, 1, 2**63 - 1]
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


def test_varint_compactness():
    # small gaps must take 1 byte each — the point of delta encoding
    arr = np.arange(100, dtype=np.uint64)
    assert len(varint_encode(arr)) == 100


@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=0),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(n, base, seed):
    rng = np.random.default_rng(seed)
    docs = base + np.cumsum(rng.integers(1, 10_000, size=n))
    tfs = rng.integers(1, 1000, size=n)
    dls = rng.integers(1, 100_000, size=n)
    norms = encode_norms(dls)
    impacts = tfs / (tfs + 1.2)
    out_docs, out_tfs, out_norms = [], [], []
    prev_last = -1
    for blk in encode_blocks(docs, tfs, norms, impacts):
        bid, first, last, cnt, max_tf, max_imp, db, tb, nb = blk
        d, t, nrm = decode_block(first, db, tb, nb)
        assert d[0] == first and d[-1] == last and len(d) == cnt
        assert cnt <= BLOCK_SIZE
        assert max_tf == t.max()
        assert first > prev_last  # blocks strictly ordered
        prev_last = last
        out_docs.append(d)
        out_tfs.append(t)
        out_norms.append(nrm)
    assert np.array_equal(np.concatenate(out_docs), docs)
    assert np.array_equal(np.concatenate(out_tfs), tfs)
    assert np.array_equal(np.concatenate(out_norms), norms)
    # norms decode to the quantized dl
    assert np.array_equal(
        LENGTH_TABLE[np.concatenate(out_norms)],
        LENGTH_TABLE[encode_norms(dls)],
    )


def test_block_max_impact_is_upper_bound():
    rng = np.random.default_rng(7)
    n = 1000
    docs = np.cumsum(rng.integers(1, 5, size=n))
    tfs = rng.integers(1, 50, size=n)
    norms = encode_norms(rng.integers(1, 500, size=n))
    dlq = LENGTH_TABLE[norms].astype(float)
    impacts = tfs / (tfs + 1.2 * (0.25 + 0.75 * dlq / 100.0))
    off = 0
    for blk in encode_blocks(docs, tfs, norms, impacts):
        cnt, max_imp = blk[3], blk[5]
        assert max_imp >= impacts[off : off + cnt].max() - 1e-15
        off += cnt
