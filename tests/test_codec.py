import numpy as np
import pytest

from idzebra_spark.functions.codec import (
    delta_varint_decode,
    delta_varint_encode,
    varint_decode,
    varint_encode,
)


CASES = [
    np.array([], dtype=np.uint64),
    np.array([0], dtype=np.uint64),
    np.array([1], dtype=np.uint64),
    np.array([127, 128, 129], dtype=np.uint64),
    np.array([16383, 16384], dtype=np.uint64),
    np.arange(1000, dtype=np.uint64),
    np.array([2**63, 2**64 - 1, 0, 1], dtype=np.uint64),
    np.array([2**28 + 7, 2**35, 2**49 + 1], dtype=np.uint64),
]


@pytest.mark.parametrize("arr", CASES, ids=range(len(CASES)))
def test_varint_roundtrip(arr):
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


def test_varint_random_roundtrip():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 2**62, size=100_000, dtype=np.uint64)
    buf = varint_encode(arr)
    assert np.array_equal(varint_decode(buf), arr)


def test_delta_roundtrip_and_compression():
    rng = np.random.default_rng(7)
    docids = np.unique(rng.integers(0, 10_000_000, size=200_000, dtype=np.uint64))
    buf = delta_varint_encode(docids)
    assert np.array_equal(delta_varint_decode(buf), docids)
    # dense-ish sorted ids must beat 8 bytes/entry by a wide margin
    assert len(buf) < 4 * docids.size


def test_delta_dense_is_one_byte_per_doc():
    docids = np.arange(1_000_000, dtype=np.uint64)
    buf = delta_varint_encode(docids)
    assert len(buf) <= docids.size + 4
