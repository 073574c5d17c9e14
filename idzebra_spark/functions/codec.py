"""Vectorized delta + varint posting-block codec (numpy, no per-row Python).

Zebra compresses posting streams with the ``iscz1`` codec: a control
byte + base-128 varints of the docid *delta* (first key level) and
absolute values for the rest, reset per term
(/root/reference/util/it_key.c:160-254).  Here the same idea is a pair
of pure numpy kernels: LEB128 varint over ``uint64`` arrays, applied to
``diff(sorted docids)`` so dense posting lists encode at ~1 byte/doc.
Both directions are vectorized across the whole array (the loop is over
the ≤10 byte positions of a varint, not over rows), so they are safe to
call inside Arrow-batched ``applyInPandas`` without per-row Python cost.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # ceil(64/7)


def varint_encode_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array; also return the byte offset of
    each value (length n+1) so callers can slice per-block payloads out
    of one encode call. Vectorized: loops over byte slots only."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    # bytes needed per value: max(1, ceil(bitlen/7))
    nbits = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= np.uint64(1) << np.uint64(shift)
        nbits[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    nbits += 1  # bitlen of the remaining 0/1
    nbytes = np.maximum((nbits + 6) // 7, 1)

    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    remaining = v.copy()
    pos = offsets[:-1].copy()
    active = np.ones(n, dtype=bool)
    for _ in range(_MAX_VARINT_BYTES):
        if not active.any():
            break
        idx = np.nonzero(active)[0]
        chunk = (remaining[idx] & np.uint64(0x7F)).astype(np.uint8)
        remaining[idx] >>= np.uint64(7)
        more = remaining[idx] != 0
        chunk[more] |= np.uint8(0x80)
        out[pos[idx]] = chunk
        pos[idx] += 1
        active[idx] = more
    return out.tobytes(), offsets


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (see varint_encode_offsets)."""
    return varint_encode_offsets(values)[0]


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array. Fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    # group id per byte = number of terminators strictly before it
    group = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_end[:-1], out=group[1:])
    starts = np.nonzero(np.diff(np.concatenate(([-1], group))) > 0)[0]
    offset_in_group = np.arange(b.size, dtype=np.int64) - starts[group]
    contrib = (b & 0x7F).astype(np.uint64) << (
        np.uint64(7) * offset_in_group.astype(np.uint64)
    )
    return np.add.reduceat(contrib, starts).astype(np.uint64)


def delta_varint_encode(sorted_values: np.ndarray) -> bytes:
    """Encode a strictly-increasing int array as varint(first, diffs).

    The docid-delta scheme of iscz1 (util/it_key.c:179-206): first value
    absolute, then gaps — dense lists become 1-byte-per-doc.
    """
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`delta_varint_encode`."""
    deltas = varint_decode(buf)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas, dtype=np.uint64)
