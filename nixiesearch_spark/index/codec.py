"""Posting-list compression: delta gaps + variable-byte (VByte), block-max.

The reference relies on Lucene's default codec (FOR/PFOR delta blocks,
reference ``core/codec/compat/NixiesearchCodec.scala:24-72`` only overrides
suggest/HNSW formats). The north rule mandates delta-encoded docID gaps +
term frequencies, variable-byte compressed, with per-block max-impact
metadata for WAND — implemented here as vectorized numpy transforms used
inside Arrow-batched pandas UDFs (never per-row Python).

Layout per posting block (≤ BLOCK_SIZE postings of one (shard, term)):
- ``doc_gaps``: VByte(delta(docids)) — first value is docid - block_base(=prev last or 0)
- ``tfs``: VByte(tf - 1)  (tf ≥ 1 always, save a byte on tf=1 runs)
- ``norms``: raw uint8 norm bytes, one per posting
- ``max_impact``: float32 max over block of tf/(tf + k1*(1-b+b*dl/avgdl))
  (idf-free impact; query-time upper bound = weight * max_impact).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def _bit_length(arr: np.ndarray) -> np.ndarray:
    """bit_length over uint64 values. frexp's exponent is exact below 2^53;
    above, float64 rounding can only round UP across a power-of-two boundary,
    which merely overestimates by one (a wasted zero byte, still decodable).
    Input must be uint64 — int64 would go negative for zigzagged big ids."""
    v = np.asarray(arr, dtype=np.uint64)
    _, e = np.frexp(np.maximum(v, np.uint64(1)).astype(np.float64))
    return np.where(v > 0, e, 1).astype(np.int64)


def vbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """VByte-encode + per-value byte counts (for bulk slice-per-block packing)."""
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b"", np.array([], dtype=np.int64)
    nbytes = ((_bit_length(v) + 6) // 7).astype(np.int64)
    return _vbyte_core(v, nbytes), nbytes


def vbyte_encode(values: np.ndarray) -> bytes:
    """VByte-encode non-negative int64 values (vectorized).

    7 data bits per byte, little-endian groups, high bit set on all but the
    final byte of each value.
    """
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    nbytes = ((_bit_length(v) + 6) // 7).astype(np.int64)
    return _vbyte_core(v, nbytes)


def _vbyte_core(v: np.ndarray, nbytes: np.ndarray) -> bytes:
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    rem = v.copy()
    max_nb = int(nbytes.max())
    for b in range(max_nb):
        mask = nbytes > b
        pos = starts[mask] + b
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (b + 1 < nbytes[mask]).astype(np.uint8) << 7
        out[pos] = byte | cont
        rem[mask] >>= np.uint64(7)
    return out.tobytes()


def vbyte_decode(buf: bytes, n: int | None = None) -> np.ndarray:
    """Decode VByte buffer to int64 array (vectorized)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.array([], dtype=np.int64)
    is_last = (raw & 0x80) == 0
    # value index for each byte: cumulative count of completed values before it
    val_idx = np.concatenate([[0], np.cumsum(is_last)[:-1]]).astype(np.int64)
    # byte position within its value
    byte_pos = np.arange(len(raw), dtype=np.int64)
    value_start = np.zeros(len(raw), dtype=np.int64)
    starts = np.concatenate([[0], np.nonzero(is_last)[0][:-1] + 1])
    value_start = starts[val_idx]
    shift = ((byte_pos - value_start) * 7).astype(np.uint64)
    parts = (raw & 0x7F).astype(np.uint64) << shift
    nvals = int(is_last.sum())
    out = np.zeros(nvals, dtype=np.uint64)
    np.add.at(out, val_idx, parts)
    res = out.astype(np.int64)
    if n is not None and len(res) != n:
        raise ValueError(f"decoded {len(res)} values, expected {n}")
    return res


def delta_encode(sorted_docids: np.ndarray) -> np.ndarray:
    """Gaps: first value kept absolute (shifted into non-negative space),
    rest are strictly-positive deltas. Caller guarantees ascending order."""
    d = np.asarray(sorted_docids, dtype=np.int64)
    out = np.empty_like(d)
    out[0] = d[0]
    out[1:] = np.diff(d)
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """Map int64 → non-negative (docids may be negative xxhash64 values)."""
    v = np.asarray(v, dtype=np.int64)
    return ((v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64)).astype(
        np.int64
    )


def zigzag_decode(v: np.ndarray) -> np.ndarray:
    u = np.asarray(v, dtype=np.int64).astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))).astype(np.int64)


def encode_posting_block(docids: np.ndarray, tfs: np.ndarray, norms: np.ndarray):
    """docids ascending. Returns (doc_gaps bytes, tfs bytes, norms bytes)."""
    gaps = delta_encode(docids)
    # first gap can be negative (absolute docid) → zigzag just the head
    head = zigzag_encode(gaps[:1])
    gaps_nn = np.concatenate([head, gaps[1:]])
    return (
        vbyte_encode(gaps_nn),
        vbyte_encode(np.asarray(tfs, dtype=np.int64) - 1),
        np.asarray(norms, dtype=np.uint8).tobytes(),
    )


def decode_posting_block(doc_gaps: bytes, tfs: bytes, norms: bytes):
    gaps = vbyte_decode(doc_gaps)
    if len(gaps):
        gaps = np.concatenate([zigzag_decode(gaps[:1]), gaps[1:]])
    docids = delta_decode(gaps)
    tf = vbyte_decode(tfs) + 1
    nm = np.frombuffer(norms, dtype=np.uint8).astype(np.int64)
    return docids, tf, nm


def decode_posting_blocks(
    doc_gaps: list, tfs: list, norms: list, counts: np.ndarray
):
    """Batch form of :func:`decode_posting_block`: decode MANY blocks with
    ONE VByte pass each for gaps and tfs (VByte is self-delimiting, so
    concatenated buffers decode to concatenated values), then rebuild the
    per-block absolute docids with a segmented cumsum. ``counts[i]`` is
    block i's posting count (== len(norms[i])). Returns flat
    (docids, tf, norm) int64 arrays — slice with cumsum(counts) bounds.
    Identity with the per-block decode is unit-tested (test_codec)."""
    total = int(counts.sum())
    vals = vbyte_decode(b"".join(doc_gaps), total)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    if total:
        vals = vals.copy()
        vals[starts] = zigzag_decode(vals[starts])
        c = np.cumsum(vals)
        # subtract each block's preceding running total so every block's
        # cumsum restarts at its own absolute first docid
        offs = np.repeat(
            np.concatenate([[np.int64(0)], c[starts[1:] - 1]]), counts
        )
        docids = c - offs
    else:
        docids = vals
    tf = vbyte_decode(b"".join(tfs), total) + 1
    nm = np.frombuffer(b"".join(norms), dtype=np.uint8).astype(np.int64)
    return docids, tf, nm
