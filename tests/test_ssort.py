"""Sample sort: partition logic units + mesh integration, incl. the
poison-on-overflow contract and the full sharded suffix pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kiss_tpu.parallel import make_mesh
from kiss_tpu.parallel.dsort import make_sharded_sort_impl
from kiss_tpu.parallel.ssort import _lex_less_count, _sizes

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _rand_ops(n, w, seed, dtype=np.uint32):
    rng = np.random.default_rng(seed)
    ops = [
        rng.integers(0, 50, n).astype(dtype) for _ in range(w - 1)
    ]  # narrow range -> many ties
    ops.append(np.arange(n, dtype=dtype))  # unique tail: total order
    return ops


def test_lex_less_count_unit():
    rng = np.random.default_rng(0)
    B, W, T = 500, 3, 7
    ops = [rng.integers(0, 8, B).astype(np.uint32) for _ in range(W)]
    spl = [rng.integers(0, 8, T).astype(np.uint32) for _ in range(W)]
    rows = np.stack(ops, axis=1)
    srows = np.stack(spl, axis=1)
    for t in range(T):
        want = sum(
            1 for r in rows if tuple(r) < tuple(srows[t])
        )
        got = int(_lex_less_count(
            [jnp.asarray(x) for x in ops],
            [jnp.asarray(x) for x in spl], t,
        ))
        assert got == want


def test_sizes_invariants():
    for B, D in [(1000, 8), (4096, 4), (64, 2), (30, 8)]:
        C, M, S = _sizes(B, D, 1.5)
        assert M == C * D and S == M - B and 0 < S <= B


@needs8
@pytest.mark.parametrize("n", [4096, 5000, 100_000])
@pytest.mark.parametrize("w", [2, 5])
def test_matches_lax_sort(n, w):
    mesh = make_mesh(8)
    impl = make_sharded_sort_impl(mesh, "seq", algorithm="sample")
    ops = [jnp.asarray(x) for x in _rand_ops(n, w, seed=n + w)]
    got = impl(tuple(ops), num_keys=w)
    want = jax.lax.sort(tuple(ops), num_keys=w, is_stable=False)
    for g, x in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(x))


@needs8
def test_mixed_dtype_operands():
    # the pipeline's rank-rebuild sorts (int32 sa, int32 rank) pairs
    mesh = make_mesh(8)
    impl = make_sharded_sort_impl(mesh, "seq", algorithm="sample")
    n = 9000
    rng = np.random.default_rng(3)
    sa = rng.permutation(n).astype(np.int32)
    rank = rng.integers(0, n, n).astype(np.int32)
    got = impl((jnp.asarray(sa), jnp.asarray(rank)), num_keys=1)
    want = jax.lax.sort(
        (jnp.asarray(sa), jnp.asarray(rank)), num_keys=1, is_stable=False
    )
    for g, x in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(x))


@needs8
def test_overflow_poisons():
    """Adversarial keys aligned with the deal's residue classes: after
    the decorrelating deal, device c holds ONLY key value c, so its
    whole block lands in one bucket (>> capacity) -> every output must
    be poisoned, never a silently wrong permutation."""
    mesh = make_mesh(8)
    impl = make_sharded_sort_impl(mesh, "seq", algorithm="sample")
    n = 8192  # multiple of D^2 so position % D survives the deal
    i = np.arange(n, dtype=np.uint32)
    ops = (jnp.asarray(i % 8), jnp.asarray(i))
    got = impl(ops, num_keys=2)
    assert bool((np.asarray(got[0]) == 0xFFFFFFFF).all())


@needs8
def test_sorted_input_now_balanced():
    """Globally pre-sorted input overflowed the pre-deal design (device
    0's block -> bucket 0); the decorrelating deal must handle it."""
    mesh = make_mesh(8)
    impl = make_sharded_sort_impl(mesh, "seq", algorithm="sample")
    n = 8192
    ops = (
        jnp.asarray(np.arange(n, dtype=np.uint32)),
        jnp.asarray(np.arange(n, dtype=np.uint32)),
    )
    got = impl(ops, num_keys=2)
    np.testing.assert_array_equal(
        np.asarray(got[0]), np.arange(n, dtype=np.uint32)
    )


@needs8
def test_sharded_pipeline_with_sample_sort():
    """Full k-ordered suffix sort over the mesh with every global sort
    routed through the sample sort: bit-identical to the single-device
    pipeline."""
    from kiss_tpu.ops import suffix_sort
    from kiss_tpu.parallel.dsort import sharded_k_ordered_suffix_array
    from tests import oracle

    unit = oracle.random_dna(13, seed=3)
    text = np.tile(unit, 800)[:10_000].copy()
    text[6_000:] = oracle.random_dna(4_000, seed=5)
    mesh = make_mesh(8)
    got = sharded_k_ordered_suffix_array(
        mesh, jnp.asarray(text), 256, algorithm="sample"
    )
    want = suffix_sort.k_ordered_suffix_array(text, 256)
    np.testing.assert_array_equal(
        np.asarray(got).astype(np.uint32), want
    )
