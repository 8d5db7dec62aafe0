"""Conformance tests for the k-ordered suffix sorter.

Modeled on the reference test strategy (reference: tests/kiss.cpp:11-165 --
property tests over random DNA/general texts at k=256) but strengthened to
exact-equality checks against a brute-force oracle, as the reference's
property oracle does not pin down tie-breaks or the permutation property.
"""

import numpy as np
import pytest

from kiss_tpu.ops import pack
from kiss_tpu.ops.suffix_sort import (
    Kiss1Sorter,
    Kiss2Sorter,
    k_ordered_suffix_array,
)
from tests import oracle


def _check_exact(text, k, alphabet=pack.DNA):
    got = k_ordered_suffix_array(text, k, alphabet)
    want = oracle.k_ordered_sa(text, None if k == -1 else k)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [1, 4, 16, 17, 31, 32, 33, 56, 100, 255, 256, -1])
def test_random_dna_exact(k):
    text = oracle.random_dna(4003, seed=k + 7)
    _check_exact(text, k)


@pytest.mark.parametrize("k", [33, 255, 992])
def test_repeat_heavy_odd_k(k):
    # odd k values exercise the greedy level decomposition + raw-word
    # tails; tandem repeats make the deep ties actually reach them
    text = oracle.repeat_heavy_dna(2500, unit=41, seed=k)
    _check_exact(text, k)


@pytest.mark.parametrize("k", [16, 50, 100, 256, -1])
def test_repeat_heavy_exact(k):
    # tandem repeats: many suffixes share >= 256-char prefixes, so the
    # exact-k cut and position tie-break actually matter here
    text = oracle.repeat_heavy_dna(3000, unit=37, seed=3)
    _check_exact(text, k)


def test_all_same_char():
    text = np.zeros(500, dtype=np.int8)  # "AAAA..."; every pair ties
    # unbounded: shorter suffix first => SA = [500, 499, ..., 0]
    got = k_ordered_suffix_array(text, -1)
    np.testing.assert_array_equal(got, np.arange(500, -1, -1))
    # bounded k: suffixes shorter than k sort by length, the rest all tie
    # on k 'A's and fall back to position order
    for k in (8, 256):
        _check_exact(text, k)


def test_exact_k_cut_tiebreak():
    # two suffixes equal in the first k chars but differing later must be
    # ordered by position, not by the later characters
    unit = np.array([0, 1, 2, 3] * 8, dtype=np.int8)  # 32-periodic
    text = np.concatenate([np.tile(unit, 6), np.array([3, 3, 3], np.int8)])
    for k in (32, 64, 96):
        _check_exact(text, k)


@pytest.mark.parametrize("n", [0, 1, 2, 5, 15, 16, 17, 63])
def test_tiny_texts(n):
    text = oracle.random_dna(n, seed=n)
    for k in (4, 256, -1):
        _check_exact(text, k)


def test_sentinel_first():
    text = oracle.random_dna(1000, seed=1)
    sa = k_ordered_suffix_array(text, 256)
    assert sa[0] == 1000  # reference: SA[0] = n (kiss_common.hpp:479)


@pytest.mark.parametrize("sorter", [Kiss1Sorter, Kiss2Sorter])
def test_sorter_facades_dna(sorter):
    # mirrors reference tests/kiss.cpp "kISS-{1,2} DNA": random text,
    # k=256, property check
    text = oracle.random_dna(150_000, seed=11)
    ref = sorter.prepare_aligned_ref(text)
    sa = sorter.get_suffix_array_dna(ref, 256, 24)
    assert sa.dtype == np.uint32
    want = oracle.k_ordered_sa(text, 256)
    np.testing.assert_array_equal(sa, want)


@pytest.mark.parametrize("sorter", [Kiss1Sorter, Kiss2Sorter])
def test_sorter_facades_general(sorter):
    # mirrors reference tests/kiss.cpp "kISS-{1,2} general": bytes
    # 'a'..'d' (values 97..100), exercising the sigma=256 packing
    rng = np.random.default_rng(5)
    text = rng.integers(97, 101, 50_000).astype(np.int8)
    sa = sorter.get_suffix_array(text, 256, 24)
    want = oracle.k_ordered_sa(text.view(np.uint8).astype(np.int16), 256)
    np.testing.assert_array_equal(sa, want)


def test_general_full_byte_alphabet():
    rng = np.random.default_rng(9)
    text = rng.integers(0, 256, 20_000).astype(np.uint8).view(np.int8)
    sa = Kiss1Sorter.get_suffix_array(text, 100)
    want = oracle.k_ordered_sa(text.view(np.uint8).astype(np.int16), 100)
    np.testing.assert_array_equal(sa, want)


def test_genome_like_medium():
    text = oracle.genome_like_dna(200_000, ancestral=1 << 14, seed=2)
    _check_exact(text, 256)


def test_pos_dtype_switch():
    from kiss_tpu.ops.suffix_sort import _pos_dtype
    import jax.numpy as jnp

    assert _pos_dtype(10**6) == jnp.int32
    assert _pos_dtype(2**31 - 1) == jnp.int32
    assert _pos_dtype(2**31) == jnp.uint32
    assert _pos_dtype(3_117_292_070) == jnp.uint32  # chm13v2.0


def test_pack_fields_u32_order_roundtrip():
    """The packed-word comparator must stay correct for chm13-scale
    field values (> 2**31, full 32-bit fields): unsigned word order ==
    field-tuple order, and aligned fields extract exactly."""
    import jax.numpy as jnp

    from kiss_tpu.ops.suffix_sort import (
        _extract_field,
        _mask_field,
        _pack_fields,
    )

    rng = np.random.default_rng(0)
    m = 257
    # values spanning the full uint32 range, incl. > 2**31
    r0 = rng.integers(0, 2**32, m, dtype=np.uint32)
    r1 = rng.integers(0, 2**32, m, dtype=np.uint32)
    short = rng.integers(0, 2**7, m, dtype=np.uint32)
    pos = rng.permutation(np.arange(m, dtype=np.uint32)) + np.uint32(
        2**31 + 11
    )
    words, places = _pack_fields(
        [
            (jnp.asarray(r0), 32, False),
            (jnp.asarray(short), 7, False),
            (jnp.asarray(r1), 32, False),
            (jnp.asarray(pos), 32, True),
        ]
    )
    w = [np.asarray(x) for x in words]
    # extraction round-trips the aligned field
    np.testing.assert_array_equal(
        np.asarray(_extract_field(words, places[-1])), pos
    )
    # lexicographic word order == field-tuple order
    got = np.lexsort(tuple(reversed(w)))
    want = np.lexsort((pos, r1, short, r0))
    np.testing.assert_array_equal(got, want)
    # masking the pos field removes exactly it
    masked = [np.asarray(x) for x in _mask_field(list(words), places[-1])]
    words2, _ = _pack_fields(
        [
            (jnp.asarray(r0), 32, False),
            (jnp.asarray(short), 7, False),
            (jnp.asarray(r1), 32, False),
            (jnp.asarray(np.zeros(m, np.uint32)), 32, True),
        ]
    )
    for a, b in zip(masked, words2):
        np.testing.assert_array_equal(a, np.asarray(b))


@pytest.mark.parametrize("k", [16, 33, 256, -1])
def test_device_path_exact(k):
    """The fully-jitted single-program path (used by bench and SPMD
    pipelines) must match the host-driven path and the oracle exactly,
    including the lax.cond round skipping and the traced-cover
    _full_round used for unbounded sorts."""
    import jax.numpy as jnp

    from kiss_tpu.ops.suffix_sort import k_ordered_suffix_array_device

    text = oracle.repeat_heavy_dna(3100, unit=37, seed=abs(k))
    got = np.asarray(
        k_ordered_suffix_array_device(jnp.asarray(text), k)
    ).astype(np.uint32)
    want = oracle.k_ordered_sa(text, None if k == -1 else k)
    np.testing.assert_array_equal(got, want)


def test_device_path_resolves_early():
    # a random text resolves well before the unbounded plan's last
    # round; the cond ladder must still produce the exact full order
    import jax.numpy as jnp

    from kiss_tpu.ops.suffix_sort import k_ordered_suffix_array_device

    text = oracle.random_dna(5000, seed=3)
    got = np.asarray(
        k_ordered_suffix_array_device(jnp.asarray(text), -1)
    ).astype(np.uint32)
    np.testing.assert_array_equal(got, oracle.k_ordered_sa(text, None))


@pytest.mark.parametrize("k", [64, 256, -1])
def test_force_u32_matches_int32(k):
    """The uint32 position/rank path -- what a chm13-scale text
    (n >= 2**31) selects automatically -- produces the identical SA,
    including the compacted tail-refinement rounds of an unbounded sort
    (suffix_sort._tail_refine runs its wrap-proof index arithmetic
    there)."""
    # tandem repeats keep tie groups alive past the 64-char seed so
    # unbounded sorts actually enter tail refinement
    text = oracle.repeat_heavy_dna(6000, unit=29, seed=11)
    a = k_ordered_suffix_array(text, k)
    b = k_ordered_suffix_array(text, k, force_u32=True)
    np.testing.assert_array_equal(a, b)
    rnd = oracle.random_dna(4003, seed=21)
    np.testing.assert_array_equal(
        k_ordered_suffix_array(rnd, k),
        k_ordered_suffix_array(rnd, k, force_u32=True),
    )


def test_num_threads_maps_to_mesh():
    """The facade's num_threads knob is the mesh size (SURVEY.md P9:
    the reference caps TBB threads, src/main.cpp:23-26): -t 4 runs the
    distributed sort over 4 devices, and over-asking clamps to the
    visible device count -- both bit-identical to the single-device
    path."""
    from kiss_tpu.ops.suffix_sort import Kiss1Sorter

    text = oracle.repeat_heavy_dna(5_000, unit=37, seed=9)
    single = Kiss1Sorter.get_suffix_array_dna(text, 256)
    np.testing.assert_array_equal(
        Kiss1Sorter.get_suffix_array_dna(text, 256, num_threads=4), single
    )
    # reference-habit -t 24 on an 8-device host: clamped, not an error
    np.testing.assert_array_equal(
        Kiss1Sorter.get_suffix_array_dna(text, 256, num_threads=24), single
    )


def test_prefix_doubling_is_a_distinct_strategy():
    """-s PREFIX_DOUBLING selects a genuinely different round plan
    (16-char super-char seed + 2-key doubling rounds, the kISS-2 shape,
    reference: kiss2_core.hpp:251,764-785,862-863) that still produces
    the identical exact-k + position-tiebreak order."""
    from kiss_tpu.ops import pack
    from kiss_tpu.ops.suffix_sort import _make_plan, _plan_shape

    n, k = 200_000, 256
    wide = _make_plan(n, k, pack.DNA, *_plan_shape("wide", pack.DNA))
    dbl = _make_plan(n, k, pack.DNA, *_plan_shape("doubling", pack.DNA))
    assert wide.seed_chars == 64 and dbl.seed_chars == 16
    assert len(dbl.rounds) > len(wide.rounds)
    assert all(len(r.rank_keys) <= 2 for r in dbl.rounds)
    # coverage doubles: 16 -> 32 -> 64 -> 128 -> 256
    assert [r.new_cover for r in dbl.rounds] == [32, 64, 128, 256]


@pytest.mark.parametrize("k", [8, 100, 256, -1])
def test_prefix_doubling_repeat_heavy(k):
    """Doubling rounds actually run (repeat-heavy text keeps tie groups
    alive past the 16-char seed) and match the wide strategy bit for
    bit."""
    unit = oracle.random_dna(13, seed=21)
    text = np.tile(unit, 2000)[:28_000].copy()
    text[17_000:] = oracle.random_dna(28_000 - 17_000, seed=22)[: len(text) - 17_000]
    got = Kiss2Sorter.get_suffix_array_dna(text, k)
    want = Kiss1Sorter.get_suffix_array_dna(text, k)
    np.testing.assert_array_equal(got, want)


def test_prefix_doubling_sharded():
    """The doubling strategy threads through the distributed sort."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from kiss_tpu.parallel import make_mesh
    from kiss_tpu.parallel.dsort import sharded_k_ordered_suffix_array

    import jax.numpy as jnp

    unit = oracle.random_dna(11, seed=2)
    text = np.tile(unit, 900)[:9_000].copy()
    got = sharded_k_ordered_suffix_array(
        make_mesh(4), jnp.asarray(text), 64, strategy="doubling"
    )
    want = Kiss1Sorter.get_suffix_array_dna(text, 64)
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint32), want)
