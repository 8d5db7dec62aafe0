"""k-ordered suffix array construction, TPU-native.

The reference builds k-ordered suffix arrays with two CPU strategies:
kISS-1 "PARALLEL_SORTING" (per-bucket AVX2 comparison sorts of LMS
suffixes + induced L/S scans, reference:
include/biovoltron/algo/sort/kiss1_core.hpp) and kISS-2 "PREFIX_DOUBLING"
(super-character encoding + rank doubling with segment sorts/merges,
reference: include/biovoltron/algo/sort/kiss2_core.hpp). Both are built
from CPU idioms -- pointer-chasing induced scans, per-thread bucket
cursors, comparison sorts -- that do not map to a TPU.

This module re-expresses the same *problem* (sort every suffix by its
first k characters, ties broken by text position, sentinel/empty suffix
first -- reference semantics: kiss1_core.hpp:94-135 comparator, ties at
>= k chars resolved by ``i < j``) in the TPU-native dataflow idiom:

  1. Pack the first L0 characters of every suffix into big-endian integer
     words (:mod:`kiss_tpu.ops.pack`) and run ONE stable multi-key
     ``lax.sort`` over all n+1 suffixes. Stability over position-major
     operands gives the ``i < j`` tie rule for free.
  2. Prefix-double: each pass stably re-sorts positions by the pair
     (rank of first L chars, rank of the L chars at offset L), computed
     with two gathers, then recomputes ranks with a vectorized segmented
     scan (compare-adjacent + cummax). Coverage doubles per pass, so
     k=256 needs 4 passes after the 16-char seed.
  3. Early exit: when every rank group is a singleton the order is final;
     remaining passes collapse to a no-op branch of ``lax.cond``. (On
     genomes most groups are singletons after 32-64 characters.)
  4. Exact-k landing: when k is not L0*2^t, a final stable multi-key sort
     combines saved rank levels along the greedy binary decomposition of
     k (e.g. k=100 = 64 + 32 + 4: keys rank64[p], rank32[p+64],
     word4[p+96]), so ties beyond exactly k characters are *not* used --
     matching the kISS-1 comparator's exact-k cut rather than kISS-2's
     power-of-two overshoot.

Everything is shape-static and jit-compiled once per (n, k, alphabet).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial, reduce

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from kiss_tpu.ops import pack
from kiss_tpu.utils import timing


@dataclass(frozen=True)
class _SortPlan:
    """Static (python-time) schedule for one (n, k, alphabet) instance."""

    seed_chars: int  # L0: characters covered by the initial sort
    doublings: int  # number of rank-doubling passes
    decomp: tuple[int, ...]  # saved rank levels used by the final combine
    tail_chars: int  # raw-word characters closing the gap to exactly k
    unbounded: bool

    @property
    def save_levels(self) -> frozenset[int]:
        return frozenset(self.decomp)


def _make_plan(n: int, k: int | None, alphabet: pack.Alphabet) -> _SortPlan:
    seed_max = 2 * alphabet.chars_per_word  # two packed words
    if k is None or k < 0 or k > n:
        # comparing n characters fully distinguishes all suffixes
        # (reference: k = -1 wraps to SIZE_MAX, README.md:56)
        doublings = 0
        cover = seed_max
        while cover < n:
            cover *= 2
            doublings += 1
        return _SortPlan(seed_max, doublings, (), 0, True)

    if k <= seed_max:
        return _SortPlan(max(k, 1), 0, (), 0, False)

    seed = seed_max
    levels = [seed]
    cover = seed
    while 2 * cover <= k:
        cover *= 2
        levels.append(cover)
    rem = k - cover
    # greedy binary decomposition of the remainder over available levels
    decomp = []
    for lv in reversed(levels[:-1]):
        if lv <= rem:
            decomp.append(lv)
            rem -= lv
    assert rem < seed
    return _SortPlan(seed, len(levels) - 1, tuple(decomp), rem, False)


def _group_ranks(neq: jnp.ndarray, sa: jnp.ndarray):
    """Ranks from adjacent-inequality flags over the sorted order.

    rank[p] = index of the first row of p's equal-key group, plus 1 --
    the same "head index + 1" convention as the reference's rank
    initialization (reference: kiss2_core.hpp:191-249), computed as a
    cummax segmented scan instead of a per-thread carry stitch.
    """
    m = neq.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    head = lax.cummax(jnp.where(neq, idx, 0))
    rank = jnp.zeros(m, dtype=jnp.int32).at[sa].set(head + 1)
    done = jnp.all(neq)
    return rank, done


def _neq_adjacent(sorted_keys) -> jnp.ndarray:
    neq = reduce(
        jnp.logical_or,
        [ks != jnp.roll(ks, 1) for ks in sorted_keys],
    )
    return neq.at[0].set(True)


def _rank_at(rank: jnp.ndarray, pos: jnp.ndarray, offset: int, n: int):
    """rank of the suffix ``offset`` characters further in; 0 when the
    suffix ends before that (past-end compares smallest, the reference's
    ``get_key`` returning 0 past the end -- kiss2_core.hpp:102-111)."""
    nxt = jnp.minimum(pos + offset, n)
    return jnp.where(pos + offset <= n, rank[nxt], 0)


def _double_pass(rank, sa, done, pos, offset: int, n: int):
    """One prefix-doubling pass: coverage L -> 2L, skipped when done."""

    def run(args):
        rank, sa, _ = args
        key2 = _rank_at(rank, pos, offset, n)
        r1s, r2s, sa2 = lax.sort(
            (rank, key2, pos), num_keys=2, is_stable=True
        )
        neq = _neq_adjacent((r1s, r2s))
        rank2, done2 = _group_ranks(neq, sa2)
        return rank2, sa2, done2

    return lax.cond(done, lambda args: args, run, (rank, sa, done))


@partial(jax.jit, static_argnames=("k", "alphabet"))
def k_ordered_suffix_array_device(
    text: jnp.ndarray, k: int | None = 256, alphabet: pack.Alphabet = pack.DNA
) -> jnp.ndarray:
    """Jitted core: int8 text of length n -> int32 SA of length n+1.

    SA[0] is always n (the empty/sentinel suffix sorts first, reference:
    kiss_common.hpp:479 ``SA[m] = n`` sentinel placement).
    """
    n = text.shape[0]
    plan = _make_plan(n, k, alphabet)
    pos = jnp.arange(n + 1, dtype=jnp.int32)

    seed_words = pack.suffix_key_words(text, plan.seed_chars, 0, alphabet)
    ops = lax.sort(
        tuple(seed_words) + (pos,), num_keys=len(seed_words), is_stable=True
    )
    sa = ops[-1]
    if plan.doublings == 0 and not plan.decomp and plan.tail_chars == 0:
        return sa

    rank, done = _group_ranks(_neq_adjacent(ops[:-1]), sa)

    saved = {}
    cover = plan.seed_chars
    if cover in plan.save_levels:
        saved[cover] = rank
    for _ in range(plan.doublings):
        rank, sa, done = _double_pass(rank, sa, done, pos, cover, n)
        cover *= 2
        if cover in plan.save_levels:
            saved[cover] = rank

    if plan.decomp or plan.tail_chars:
        keys = [rank]
        off = cover
        for lv in plan.decomp:
            keys.append(_rank_at(saved[lv], pos, off, n))
            off += lv
        if plan.tail_chars:
            keys.extend(
                pack.suffix_key_words(text, plan.tail_chars, off, alphabet)
            )
        ops = lax.sort(
            tuple(keys) + (pos,), num_keys=len(keys), is_stable=True
        )
        sa = ops[-1]
    return sa


def _normalize_k(k) -> int | None:
    k = int(k)
    if k < 0 or k >= 2**63:  # reference: -1 parsed as size_t wraps to max
        return None
    return k


def k_ordered_suffix_array(
    ref: np.ndarray, k=256, alphabet: pack.Alphabet = pack.DNA
) -> np.ndarray:
    """Host entry point: numpy int8 text -> numpy uint32 SA (length n+1).

    Ordering contract (reference: kiss1_core.hpp:94-135): suffixes sorted
    by first k characters; a suffix that ends within k characters sorts
    before any longer suffix sharing its prefix; full-k ties broken by
    ascending text position; SA[0] = n.
    """
    ref = np.ascontiguousarray(ref, dtype=np.int8)
    n = ref.shape[0]
    if n == 0:
        return np.zeros(1, dtype=np.uint32)
    with timing.stage("k_ordered_suffix_array") as out:
        sa = k_ordered_suffix_array_device(
            jnp.asarray(ref), _normalize_k(k), alphabet
        )
        out["block_on"] = sa
    return np.asarray(sa).astype(np.uint32)


class _SorterBase:
    """API facade matching the reference sorter contract
    (reference: include/biovoltron/algo/sort/sorter.hpp:7-10,
    kiss1_sorter.hpp:8-50): static ``get_suffix_array_dna`` /
    ``get_suffix_array`` / ``prepare_aligned_ref``.

    ``num_threads`` is accepted for signature parity but ignored: on TPU
    the parallelism knob is the device mesh, not a thread count
    (reference: src/main.cpp:23-26 TBB global_control).
    """

    SA_dtype = np.uint32

    @staticmethod
    def prepare_aligned_ref(seq) -> np.ndarray:
        return np.ascontiguousarray(seq, dtype=np.int8)

    @staticmethod
    def get_suffix_array_dna(ref, k=256, num_threads=None) -> np.ndarray:
        return k_ordered_suffix_array(ref, k, pack.DNA)

    @staticmethod
    def get_suffix_array(ref, k=256, num_threads=None) -> np.ndarray:
        return k_ordered_suffix_array(ref, k, pack.GENERAL)


class Kiss1Sorter(_SorterBase):
    """PARALLEL_SORTING strategy facade (reference: kiss1_sorter.hpp)."""


class Kiss2Sorter(_SorterBase):
    """PREFIX_DOUBLING strategy facade (reference: kiss2_sorter.hpp).

    On TPU both reference strategies collapse onto the same
    prefix-doubling dataflow: the packed-word seed sort IS the kISS-1
    bucket sort generalized, and the doubling passes ARE kISS-2's loop
    re-expressed as whole-array stable sorts. Both facades therefore
    share one core and one (stronger) ordering contract: exact-k cut with
    position tiebreaks.
    """
