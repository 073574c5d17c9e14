"""Property-based codec tests (encode ∘ decode = id) — the round-trip
discipline of the reference's iscz1 debug check
(/root/reference/index/key_block.c:137-150)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from idzebra_spark.functions.codec import (
    delta_varint_decode,
    delta_varint_encode,
    varint_decode,
    varint_encode,
    varint_encode_offsets,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_roundtrip_any_u64(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_delta_roundtrip_sorted_unique(xs):
    arr = np.array(sorted(xs), dtype=np.uint64)
    assert np.array_equal(delta_varint_decode(delta_varint_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_offsets_slice_equals_per_value_encode(xs):
    """Any contiguous slice of the offset-encoded buffer decodes to the
    matching value slice — the invariant the block writer relies on."""
    arr = np.array(xs, dtype=np.uint64)
    buf, off = varint_encode_offsets(arr)
    n = arr.size
    if n == 0:
        assert buf == b""
        return
    mid = n // 2
    left = varint_decode(buf[off[0]:off[mid]])
    right = varint_decode(buf[off[mid]:off[n]])
    assert np.array_equal(left, arr[:mid])
    assert np.array_equal(right, arr[mid:])
