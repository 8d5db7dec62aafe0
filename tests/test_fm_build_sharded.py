"""Sharded FM-index build conformance: bit-identical to the
single-device build on the canonical table slices, at mesh sizes and
paddings that exercise every alignment edge, plus end-to-end queries
against the sharded-built index.

The reference has no distributed build at all (single shared-memory
node, SURVEY.md section 2.5); the conformance target is our own
single-device build, which is itself golden-tested against the compiled
reference binary (tests/test_golden.py)."""

import os

import numpy as np
import pytest

from kiss_tpu.models import fm_index as fm
from kiss_tpu.ops.suffix_sort import k_ordered_suffix_array
from kiss_tpu.parallel import fm_build
from kiss_tpu.parallel.mesh import make_mesh
from tests import oracle


def _build_both(text, sa_intv, n_devices, force_u32=False):
    import jax.numpy as jnp

    idt = fm._index_dtype(len(text) + 1, force_u32)
    sa = k_ordered_suffix_array(text, -1, force_u32=force_u32,
                                as_numpy=False).astype(idt)
    single = fm.build_index_device(
        jnp.asarray(text), sa, sa_intv, force_u32
    )
    mesh = make_mesh(n_devices)
    sharded = fm_build.build_index_sharded(
        mesh, jnp.asarray(text), sa, sa_intv, force_u32
    )
    return single, sharded, mesh


def _assert_canonical_equal(single, sharded, N, sa_intv):
    trimmed = fm_build.trim_canonical(sharded, N, sa_intv)
    for name in single._fields:
        x = np.asarray(getattr(trimmed, name))
        y = np.asarray(getattr(single, name))
        np.testing.assert_array_equal(x, y, err_msg=name)


@pytest.mark.parametrize("n_devices", [1, 3, 8])
@pytest.mark.parametrize("n", [20_000, 16_384 - 1])
def test_sharded_build_bit_identical(n, n_devices):
    text = oracle.random_dna(n, seed=n_devices * 7 + n)
    single, sharded, _ = _build_both(text, 4, n_devices)
    _assert_canonical_equal(single, sharded, n + 1, 4)


def test_sharded_build_sa_intv1():
    text = oracle.random_dna(6_000, seed=5)
    single, sharded, _ = _build_both(text, 1, 4)
    _assert_canonical_equal(single, sharded, len(text) + 1, 1)


def test_sharded_build_force_u32():
    """The uint32 index-dtype path (what chm13-scale N selects) through
    the sharded build, including the repeat-heavy tie structure."""
    text = oracle.repeat_heavy_dna(30_000, unit=29, seed=2)
    single, sharded, _ = _build_both(text, 4, 8, force_u32=True)
    _assert_canonical_equal(single, sharded, len(text) + 1, 4)


def test_sharded_build_queries_end_to_end():
    """Queries run directly against the (padded) sharded-built tables:
    counts, early-stop offsets, and located positions all match the
    replicated index and the brute-force oracle."""
    import jax.numpy as jnp

    text = oracle.random_dna(30_000, seed=17)
    single, sharded, mesh = _build_both(text, 4, 8)

    rng = np.random.default_rng(3)
    qlen = 13
    qs = [
        text[int(p) : int(p) + qlen]
        for p in rng.integers(0, len(text) - qlen, 30)
    ] + [rng.integers(0, 4, qlen).astype(np.int8) for _ in range(10)]
    queries = np.stack(qs).astype(np.int8)

    b1, e1, o1 = fm.get_range_device(single, jnp.asarray(queries), 0)
    b2, e2, o2 = fm.get_range_device(sharded, jnp.asarray(queries), 0)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    rows = np.arange(int(b1[0]), int(e1[0]), dtype=np.int32)
    p1 = np.asarray(fm.locate_rows_device(single, jnp.asarray(rows), 4))
    p2 = np.asarray(fm.locate_rows_device(sharded, jnp.asarray(rows), 4))
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(
        np.sort(p2), np.sort(oracle.search_all(text, queries[0]))
    )

    # and through the row-sharded query path (index split over the mesh)
    from kiss_tpu.ops import pack
    from kiss_tpu.parallel import fm_sharded

    sh = fm_sharded.shard_fm_arrays(mesh, sharded)
    qwords = jnp.asarray(pack.np_pack_queries_2bit(queries))
    b3, e3, _ = fm_sharded.sharded_get_ranges(mesh, sh, qwords, qlen)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b3))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e3))


def test_sharded_build_1e7():
    """CI-viable scale point (VERDICT r3 #4): an 8-device sharded build
    at 10^7 chars with force_u32, bit-identical to single-device.
    Together with the 10^7 full-pipeline dryrun (__graft_entry__.
    dryrun_multichip) this keeps the big-N sharded path exercised every
    run; the 10^8 variant below stays env-gated for cost."""
    n = 10_000_000
    text = oracle.random_dna(n, seed=0)
    single, sharded, _ = _build_both(text, 4, 8, force_u32=True)
    _assert_canonical_equal(single, sharded, n + 1, 4)


@pytest.mark.skipif(
    not os.environ.get("KISS_BIG_TESTS"),
    reason="1e8-char chm13-readiness run; set KISS_BIG_TESTS=1 (minutes)",
)
def test_sharded_build_1e8_chm13_readiness():
    """VERDICT round-2 'done' criterion: an 8-device run at >= 10^8
    chars with force_u32, bit-identical to single-device, with per-chip
    byte accounting (the committed results live in
    experiments/results_chm13_readiness.md)."""
    n = 100_000_000
    text = oracle.random_dna(n, seed=0)
    single, sharded, mesh = _build_both(text, 4, 8, force_u32=True)
    _assert_canonical_equal(single, sharded, n + 1, 4)


def test_sharded_build_row_tables_actually_sharded():
    """Every row-indexed table of the sharded build must be evenly
    split over the mesh -- device 0 holds ~1/D of the bytes, never the
    whole table (regression: the sampled-SA slice used to collapse its
    sharding onto one device)."""
    import jax

    text = oracle.random_dna(40_000, seed=23)
    _single, sharded, mesh = _build_both(text, 4, 8)
    dev0 = mesh.devices.flat[0]
    d = mesh.devices.size
    for name in ("bwt_words", "occ1", "occ2", "sa_samp", "b_words",
                 "b_occ", "lf_tab", "b_tab"):
        x = getattr(sharded, name)
        mine = sum(
            s.data.nbytes for s in x.addressable_shards if s.device == dev0
        )
        assert mine <= x.nbytes // d + 1024, (
            f"{name}: device-0 holds {mine} of {x.nbytes} bytes"
        )
