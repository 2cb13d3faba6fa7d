import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nixiesearch_spark.index import codec


def test_vbyte_roundtrip_basic():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**35, 2**62], dtype=np.int64)
    assert np.array_equal(codec.vbyte_decode(codec.vbyte_encode(v)), v)


def test_vbyte_empty():
    assert codec.vbyte_encode(np.array([], dtype=np.int64)) == b""
    assert len(codec.vbyte_decode(b"")) == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_vbyte_roundtrip_prop(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(codec.vbyte_decode(codec.vbyte_encode(v)), v)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**60), max_value=2**60), min_size=1, max_size=200, unique=True
    )
)
def test_posting_block_roundtrip(docids):
    docids = np.sort(np.array(docids, dtype=np.int64))
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 500, size=len(docids))
    norms = rng.integers(0, 256, size=len(docids))
    g, t, n = codec.encode_posting_block(docids, tfs, norms)
    d2, t2, n2 = codec.decode_posting_block(g, t, n)
    assert np.array_equal(docids, d2)
    assert np.array_equal(tfs, t2)
    assert np.array_equal(norms, n2)


def test_compression_ratio_dense_gaps():
    # dense ascending docids → 1-2 byte gaps; 8x+ smaller than raw int64
    docids = np.cumsum(np.random.default_rng(1).integers(1, 100, size=10000))
    tfs = np.ones(len(docids), dtype=np.int64)
    norms = np.zeros(len(docids), dtype=np.int64)
    g, t, n = codec.encode_posting_block(docids, tfs, norms)
    assert len(g) < len(docids) * 2
    assert len(t) == len(docids)


def test_posting_block_full_int64_range():
    # xxhash64 docids span the whole int64 range; zigzag of the head gap
    # exceeds 2^63 and must survive the uint64 VByte path
    docids = np.sort(
        np.array([-(2**63) + 1, -(2**62), -1, 0, 1, 2**62, 2**63 - 1], dtype=np.int64)
    )
    tfs = np.arange(1, len(docids) + 1)
    norms = np.arange(len(docids))
    g, t, n = codec.encode_posting_block(docids, tfs, norms)
    d2, t2, n2 = codec.decode_posting_block(g, t, n)
    assert np.array_equal(docids, d2)
    assert np.array_equal(tfs, t2)
    assert np.array_equal(norms, n2)


def test_decode_posting_blocks_matches_per_block():
    # the batch decoder (one VByte pass over many concatenated blocks,
    # segmented cumsum for absolute docids) must be value-identical to
    # decode_posting_block run block by block — incl. negative xxhash64
    # heads and single-posting blocks
    rng = np.random.default_rng(3)
    gaps_l, tfs_l, norms_l, expect = [], [], [], []
    for nblk in (1, 7, 128, 3):
        start = int(rng.integers(-(2**62), 2**62))
        docids = start + np.cumsum(rng.integers(1, 50, size=nblk))
        tfs = rng.integers(1, 9, size=nblk)
        norms = rng.integers(0, 255, size=nblk)
        g, t, n = codec.encode_posting_block(docids, tfs, norms)
        gaps_l.append(g), tfs_l.append(t), norms_l.append(n)
        expect.append(codec.decode_posting_block(g, t, n))
    counts = np.array([len(n) for n in norms_l], dtype=np.int64)
    dv, tv, nv = codec.decode_posting_blocks(gaps_l, tfs_l, norms_l, counts)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    for i, (d, t, n) in enumerate(expect):
        assert np.array_equal(d, dv[bounds[i] : bounds[i + 1]])
        assert np.array_equal(t, tv[bounds[i] : bounds[i + 1]])
        assert np.array_equal(n, nv[bounds[i] : bounds[i + 1]])
