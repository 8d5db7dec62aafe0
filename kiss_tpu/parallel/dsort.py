"""Distributed multi-key sort over a device mesh.

The reference's only sort parallelism is TBB ``par_unseq`` inside one
address space (reference: kiss1_core.hpp:216-224, src/main.cpp:23-26).
Scaling a genome-scale sort across chips needs an explicit algorithm
over the interconnect; this module implements a **block-bitonic sort**:

  - every shard locally sorts its block with ``lax.sort``;
  - a bitonic network over the D blocks runs compare-exchange as
    *merge-split*: partners exchange whole blocks over ICI
    (``lax.ppermute``), each sorts the 2B concatenation and keeps the
    low or high half. log2(D)*(log2(D)+1)/2 rounds.

All operands are treated as sort keys (callers append a unique
tiebreaker -- the text position -- as the last operand, which makes the
sort total and position-stable by construction, the same ``i < j`` rule
as the reference comparator kiss1_core.hpp:131-133).

This is the explicit TPU-native counterpart of SURVEY.md section-2.5
P2/P4: histogram+scatter bucket shuffles and shared-memory merges
become deterministic block exchanges on the ICI ring. It composes with
the rank-block sorter: :func:`make_sharded_sort_impl` returns a drop-in
replacement for ``lax.sort`` that the pipeline threads through, so the
single-chip and multi-chip paths share one implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MAXVALS = {
    jnp.uint32.dtype: jnp.uint32(0xFFFFFFFF),
    jnp.int32.dtype: jnp.int32(2**31 - 1),
}


def _merge_split(ops, axis: str, j: int, k: int):
    """One bitonic compare-exchange round between partners i and i^j."""
    i = lax.axis_index(axis)
    nd = lax.axis_size(axis)
    partner = i ^ j
    perm = [(s, s ^ j) for s in range(nd)]
    theirs = [lax.ppermute(x, axis, perm) for x in ops]
    both = [jnp.concatenate([a, b]) for a, b in zip(ops, theirs)]
    merged = lax.sort(tuple(both), num_keys=len(both), is_stable=False)
    b = ops[0].shape[0]
    ascending = (i & k) == 0
    keep_lo = (i < partner) == ascending
    return [jnp.where(keep_lo, m[:b], m[b:]) for m in merged]


def _block_bitonic(*ops, axis: str, n_devices: int):
    """Bitonic network over n_devices locally-sorted blocks."""
    ops = list(lax.sort(tuple(ops), num_keys=len(ops), is_stable=False))
    k = 2
    while k <= n_devices:
        j = k // 2
        while j >= 1:
            ops = _merge_split(ops, axis, j, k)
            j //= 2
        k *= 2
    return tuple(ops)


_IMPL_CACHE: dict = {}


def make_sharded_sort_impl(mesh: Mesh, axis: str):
    """Return a ``lax.sort``-compatible callable that sorts 1-D arrays
    sharded over ``axis`` of ``mesh`` with the block-bitonic network.

    Caller contract (satisfied by every sort in the rank-block sorter):
    the operand tuple, taken in full as a lexicographic key, is a total
    order (the last operand is a unique position/row id). ``num_keys``
    and ``is_stable`` are accepted for signature parity; all operands
    participate as keys, which subsumes stability.
    """
    cached = _IMPL_CACHE.get((mesh, axis))
    if cached is not None:
        return cached
    n_devices = mesh.devices.size
    assert n_devices & (n_devices - 1) == 0, "mesh size must be a power of 2"

    def sharded_sort(operands, num_keys=None, is_stable=True):
        del num_keys, is_stable
        operands = tuple(operands)
        n = operands[0].shape[0]
        n_pad = -(-n // n_devices) * n_devices
        if n_pad != n:
            # pads carry maximal keys so they sort to the global end
            padded = []
            for x in operands:
                fill = jnp.full(n_pad - n, _MAXVALS[x.dtype], x.dtype)
                padded.append(jnp.concatenate([x, fill]))
            operands = tuple(padded)

        shardmapped = jax.shard_map(
            partial(_block_bitonic, axis=axis, n_devices=n_devices),
            mesh=mesh,
            in_specs=tuple(P(axis) for _ in operands),
            out_specs=tuple(P(axis) for _ in operands),
        )
        out = shardmapped(*operands)
        if n_pad != n:
            out = tuple(x[:n] for x in out)
        return out

    _IMPL_CACHE[(mesh, axis)] = sharded_sort
    return sharded_sort


def sharded_k_ordered_suffix_array(mesh: Mesh, text, k, axis: str = "seq"):
    """k-ordered SA with the text and every intermediate sharded over
    the sequence axis and all global sorts on the block-bitonic network.

    Bit-identical to the single-device sorter (tests/test_sharded.py).
    """
    from kiss_tpu.ops import pack, suffix_sort

    sort_impl = make_sharded_sort_impl(mesh, axis)
    plan = suffix_sort._make_plan(
        text.shape[0], suffix_sort._normalize_k(k), pack.DNA
    )

    key = (mesh, axis, plan)
    run = _IMPL_CACHE.get(key)
    if run is None:
        # no forced in/out shardings: N = n+1 is generally not divisible
        # by the mesh; the block-bitonic sort pads and shards internally
        run = jax.jit(
            lambda t: suffix_sort._run_plan(
                t, plan, pack.DNA, jittable=True, sort_impl=sort_impl
            )
        )
        _IMPL_CACHE[key] = run

    return run(text)
