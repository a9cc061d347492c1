"""Posting-list codecs: vectorized variable-byte (VByte) + delta coding.

Re-implements (from scratch) the compression layer mario delegates to
Lucene 8 (OpenSearch 1.2.4 — /root/reference/README.md:21-23): doc ids
are sorted ascending, delta-gapped, then variable-byte encoded; term
frequencies and doc lengths (norms) are VByte encoded as-is.

Layout convention (little-endian 7-bit groups):
  - each value is 1..10 bytes; all bytes except the LAST have the high
    bit (0x80) set; payload bits are the low 7 of each byte, least
    significant group first.

All encode/decode paths are numpy-vectorized (no per-value Python loop
over the data; the only loops are over *byte positions*, max 10
iterations) — this is the hot path inside applyInPandas workers, so it
must be Arrow/numpy speed, per the no-per-row-Python rule.
"""

from __future__ import annotations

import numpy as np

_MAX_VBYTE_LEN = 10  # 64 bits / 7 bits-per-byte, rounded up


def vbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Bytes needed per value: 1 + number of 7-bit shifts still non-zero."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = np.ones(v.size, dtype=np.int64)
    for shift in range(7, 64, 7):
        nb += (v >= (np.uint64(1) << np.uint64(shift))).astype(np.int64)
    return nb


def vbyte_encode_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode; also return per-value END byte offsets (cumsum of lengths).

    offsets[i] is the byte position just past value i, so the encoding of
    values[a:b] is buf[(offsets[a-1] if a else 0):offsets[b-1]] — this is
    what lets the posting builder encode a whole partition in one call
    and slice per 128-doc block."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nb = vbyte_lengths(v)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for i in range(int(nb.max())):
        m = nb > i
        byte = ((v[m] >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
        is_last = nb[m] == i + 1
        out[starts[m] + i] = byte | np.where(is_last, 0, 0x80).astype(np.uint8)
    return out.tobytes(), ends


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array to VByte bytes (vectorized)."""
    return vbyte_encode_with_offsets(values)[0]


def vbyte_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode VByte bytes back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero((b & 0x80) == 0)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for i in range(int(lengths.max())):
        m = lengths > i
        vals[m] |= (b[starts[m] + i] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * i)
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-ascending ids -> gaps (first value kept as-is)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a.astype(np.uint64)
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out.astype(np.uint64)


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Gaps -> absolute ascending ids."""
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64)).astype(np.int64)


def encode_doc_ids(sorted_ids: np.ndarray) -> bytes:
    return vbyte_encode(delta_encode(sorted_ids))


def decode_doc_ids(buf: bytes) -> np.ndarray:
    return delta_decode(vbyte_decode(buf))
