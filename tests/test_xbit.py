"""XbitVector container family: behavior + byte-layout conformance."""

import numpy as np
import pytest

from kiss_tpu.ops import pack
from kiss_tpu.utils.xbit import (
    DibitVector,
    QuadbitVector,
    TypeVector,
    XbitVector,
)


@pytest.mark.parametrize("n_bits", [1, 2, 4, 8])
def test_roundtrip_random(n_bits):
    rng = np.random.default_rng(n_bits)
    vals = rng.integers(0, 1 << n_bits, 1000).astype(np.uint8)
    v = XbitVector(vals, n_bits=n_bits)
    assert len(v) == 1000
    np.testing.assert_array_equal(v.to_array(), vals)
    # scalar + fancy access
    assert v[17] == vals[17]
    assert v[-1] == vals[-1]
    idx = rng.integers(0, 1000, 50)
    np.testing.assert_array_equal(v[idx], vals[idx])
    # slice
    np.testing.assert_array_equal(v[10:20], vals[10:20])
    # mutation
    v[idx] = 0
    vals[idx] = 0
    np.testing.assert_array_equal(v.to_array(), vals)
    # bytes -> from_bytes roundtrip
    w = XbitVector.from_bytes(bytes(v), len(v), n_bits=n_bits)
    assert w == v


def test_dibit_layout_matches_device_words():
    """DibitVector bytes viewed little-endian == pack_dibits_u32 words:
    host container, device words, and the .fmi BWT section are all the
    same bits (reference layout: xbit_vector.hpp:11-66)."""
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 4, 160).astype(np.uint8)
    v = DibitVector(vals)
    words = pack.np_pack_dibits_u32(vals)
    assert bytes(v).ljust(words.nbytes, b"\0") == words.astype("<u4").tobytes()


def test_append_pop_flip():
    v = DibitVector()
    for x in (0, 1, 2, 3, 1):
        v.append(x)
    assert len(v) == 5 and v.num_blocks() == 2
    assert v.pop() == 1 and len(v) == 4
    v.flip()  # 2-bit complement: 0<->3, 1<->2
    np.testing.assert_array_equal(v.to_array(), [3, 2, 1, 0])
    # tail padding stays zero after flip (serialization invariant)
    assert bytes(v) == bytes(DibitVector([3, 2, 1, 0]))


def test_typevector_flags():
    flags = np.array([1, 0, 0, 1, 1, 0, 1, 0, 1], dtype=np.uint8)
    t = TypeVector(flags)
    np.testing.assert_array_equal(t.to_array(), flags)
    assert t.num_blocks() == 2
    assert bytes(t)[0] == int("10011001"[::-1][:8][::-1], 2) or True
    # explicit LSB-first check: bit i of byte 0 is flags[i]
    b0 = bytes(t)[0]
    for i in range(8):
        assert (b0 >> i) & 1 == flags[i]


def test_quadbit_and_errors():
    q = QuadbitVector([15, 0, 7])
    assert list(q) == [15, 0, 7]
    with pytest.raises(ValueError):
        q[0] = 16
    with pytest.raises(IndexError):
        q[3]
    with pytest.raises(ValueError):
        XbitVector(n_bits=3)  # 3 does not divide 8


def test_duplicate_index_writes_last_wins():
    v = DibitVector([0, 0, 0, 0])
    v[np.array([1, 1, 1])] = np.array([3, 2, 1])
    assert v[1] == 1  # last write wins, not the bitwise OR (3|2|1)
    v[np.array([2, 3, 2])] = np.array([1, 1, 2])
    np.testing.assert_array_equal(v.to_array(), [0, 1, 2, 1])
