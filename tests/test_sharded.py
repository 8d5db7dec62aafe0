"""Multi-device (8 virtual CPU) sharding tests: the N-shard logic the
reference cannot express (it is single-node shared memory, SURVEY.md
section 2.5) must produce bit-identical results to single-device runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kiss_tpu.models import fm_index as fm
from kiss_tpu.ops.suffix_sort import k_ordered_suffix_array
from kiss_tpu.parallel import (
    make_mesh,
    sharded_batch_query,
    sharded_pipeline_step,
    sharded_suffix_sort,
)
from tests import oracle


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


def test_sharded_sort_bit_identical(mesh):
    text = oracle.genome_like_dna(8192, ancestral=1 << 11, seed=4)
    sa_sharded = np.asarray(sharded_suffix_sort(mesh, jnp.asarray(text), 64))
    sa_single = k_ordered_suffix_array(text, 64)
    np.testing.assert_array_equal(sa_sharded, sa_single)


def test_sharded_query_matches(mesh):
    text = oracle.random_dna(4096, seed=5)
    fmi = fm.FMIndex(sa_intv=4, lookup_len=0).build(text)
    rng = np.random.default_rng(0)
    queries = rng.integers(0, 4, (16, 9)).astype(np.int8)
    beg_s, end_s, _ = sharded_batch_query(
        mesh, fmi.arrays, jnp.asarray(queries)
    )
    beg, end, _ = fmi.get_ranges(queries)
    np.testing.assert_array_equal(np.asarray(beg_s), beg)
    np.testing.assert_array_equal(np.asarray(end_s), end)


def test_pipeline_step(mesh):
    text = oracle.random_dna(1024, seed=6)
    rng = np.random.default_rng(1)
    queries = rng.integers(0, 4, (16, 8)).astype(np.int8)
    sa, beg, cnt = sharded_pipeline_step(
        mesh, jnp.asarray(text), jnp.asarray(queries)
    )
    sa = np.asarray(sa)
    assert sa[0] == 1024
    np.testing.assert_array_equal(np.sort(sa), np.arange(1025))
    # counts agree with brute force
    for qi in range(len(queries)):
        assert int(cnt[qi]) == len(oracle.search_all(text, queries[qi]))
