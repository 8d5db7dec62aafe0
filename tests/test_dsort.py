"""Unit tests for the block-bitonic distributed sort."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kiss_tpu.parallel.dsort import make_sharded_sort_impl
from kiss_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def impl():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_sharded_sort_impl(make_mesh(8), "seq")


@pytest.mark.parametrize("n", [8, 4096, 4097, 12345])
def test_matches_lax_sort(impl, n):
    rng = np.random.default_rng(n)
    # few distinct keys force heavy ties; pos payload makes order total
    key = jnp.asarray(rng.integers(0, 7, n).astype(np.uint32))
    pos = jnp.arange(n, dtype=jnp.int32)
    got = impl((key, pos), num_keys=1, is_stable=True)
    want = jax.lax.sort((key, pos), num_keys=1, is_stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_multikey(impl):
    rng = np.random.default_rng(0)
    n = 5000
    a = jnp.asarray(rng.integers(0, 5, n).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 2**20, n).astype(np.uint32))
    pos = jnp.arange(n, dtype=jnp.int32)
    got = impl((a, b, pos), num_keys=2, is_stable=True)
    want = jax.lax.sort((a, b, pos), num_keys=2, is_stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
