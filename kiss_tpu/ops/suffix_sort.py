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

  1. Seed: pack the first 32 characters of every suffix into big-endian
     integer words (:mod:`kiss_tpu.ops.pack`) and run ONE stable
     multi-key ``lax.sort`` over all n+1 suffixes. Stability over
     position-major operands gives the ``i < j`` tie rule for free.
  2. Rank: group heads by compare-adjacent + ``cummax`` segmented scan;
     the position-major rank array is rebuilt by sorting (sa, rank) by
     sa -- a stable sort is ~1.5x faster than XLA's random scatter at
     this scale, and ``rank[p+offset]`` lookups are pure shifted slices
     (no gather) because rank is position-major.
  3. Refine (prefix doubling on the ACTIVE SET): only suffixes in
     unresolved tie groups are re-sorted. The active rows are compacted
     to a power-of-two capacity (this is kISS-2's ``compact`` step,
     reference: kiss2_core.hpp:464-536, as dataflow); each round stably
     sorts (rank, rank@+offset, position) for the compacted set and
     scatters results back into the suffix array rows it came from.
     Coverage doubles per round; the loop is host-driven off the active
     count (one scalar device->host sync per round).
  4. Exact-k landing: when k is not seed*2^t, a final compacted
     multi-key sort combines saved rank levels along the greedy binary
     decomposition of k (e.g. k=100 = 64 + 32 + 4: keys rank64[p],
     rank32[p+64], word4[p+96]), so ties beyond exactly k characters are
     *not* used -- matching the kISS-1 comparator's exact-k cut rather
     than kISS-2's power-of-two overshoot.

A fully-jitted single-program variant
(:func:`k_ordered_suffix_array_device`) is kept for embedding inside
larger jitted/SPMD programs (FM-index build fusion, sharded pipelines);
the host-driven variant is the fast path for the public API.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial, reduce

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from kiss_tpu.ops import pack
from kiss_tpu.utils import timing

SEED_WORDS = 4  # 32 chars for DNA, 12 for the general alphabet


# ---------------------------------------------------------------------------
# static planning
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _SortPlan:
    """Static (python-time) schedule for one (n, k, alphabet) instance."""

    seed_chars: int  # characters covered by the initial sort
    doublings: int  # number of rank-doubling rounds
    decomp: tuple[int, ...]  # saved rank levels used by the final combine
    tail_chars: int  # raw-word characters closing the gap to exactly k
    unbounded: bool

    @property
    def save_levels(self) -> frozenset[int]:
        return frozenset(self.decomp)


def _make_plan(n: int, k: int | None, alphabet: pack.Alphabet) -> _SortPlan:
    seed_max = SEED_WORDS * alphabet.chars_per_word
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


# ---------------------------------------------------------------------------
# shared device helpers
# ---------------------------------------------------------------------------


def _neq_adjacent(sorted_keys) -> jnp.ndarray:
    neq = reduce(
        jnp.logical_or,
        [ks != jnp.roll(ks, 1) for ks in sorted_keys],
    )
    return neq.at[0].set(True)


def _rank_shift(rank: jnp.ndarray, offset) -> jnp.ndarray:
    """Position-major lookup rank[p+offset] with 0 past the end, as a
    dynamic slice of the padded array -- no gather. ``offset`` may be a
    traced scalar. (Past-end compares smallest: the reference's
    ``get_key`` returns 0 there, kiss2_core.hpp:102-111.)"""
    N = rank.shape[0]
    padded = jnp.concatenate([rank, jnp.zeros(N, rank.dtype)])
    return lax.dynamic_slice(padded, (offset,), (N,))


def _rank_by_position(sa: jnp.ndarray, rank_sorted: jnp.ndarray):
    """Invert the sorted-order rank to position-major by sorting
    (sa, rank) on sa: for a permutation this equals the scatter
    rank[sa] = rank_sorted but runs ~1.5x faster than XLA's scatter."""
    _, rank = lax.sort((sa, rank_sorted), num_keys=1, is_stable=False)
    return rank


# ---------------------------------------------------------------------------
# host-driven fast path
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("seed_chars", "alphabet"))
def _seed_sort(text: jnp.ndarray, seed_chars: int, alphabet: pack.Alphabet):
    """Full-array seed sort by the first ``seed_chars`` characters.

    Returns (sa, rank, active, m): suffix order, position-major group
    ranks, per-row unresolved flags, and the unresolved count.
    """
    n = text.shape[0]
    N = n + 1
    pos = jnp.arange(N, dtype=jnp.int32)
    words = pack.suffix_key_words(text, seed_chars, 0, alphabet)
    ops = lax.sort(tuple(words) + (pos,), num_keys=len(words), is_stable=True)
    sa = ops[-1]
    neq = _neq_adjacent(ops[:-1])
    head = lax.cummax(jnp.where(neq, pos, 0))
    rank = _rank_by_position(sa, head + 1)
    # active rows: any member of a group of size >= 2
    nxt = jnp.concatenate([neq[1:], jnp.ones(1, bool)])
    active = ~(neq & nxt)
    return sa, rank, active, jnp.sum(active, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("capacity",))
def _compact_rows(active: jnp.ndarray, capacity: int):
    """Row indices of active suffixes, ascending, zero-filled to a static
    capacity (the dataflow form of kISS-2's compact,
    reference: kiss2_core.hpp:464-536)."""
    (rows,) = jnp.nonzero(active, size=capacity, fill_value=0)
    return rows.astype(jnp.int32)


def _gather_at_offset(arr: jnp.ndarray, p: jnp.ndarray, offset) -> jnp.ndarray:
    """arr[p + offset] with 0 past the end (compacted-set variant of
    :func:`_rank_shift`: a small gather instead of a full-size shift)."""
    n = arr.shape[0] - 1
    q = p + offset
    return jnp.where(q <= n, arr[jnp.minimum(q, n)], 0)


@partial(jax.jit, donate_argnames=("sa", "rank"))
def _refine_round(sa, rank, rows, offset):
    """One active-set prefix-doubling round: re-sort the compacted
    unresolved suffixes by (rank, rank@+offset, position) and write the
    new order back into their own suffix-array rows.

    Fill entries (rows == 0) alias the sentinel row: its rank 1 is the
    global minimum so they sort to the front as a block, scatter the
    unchanged sentinel back to row 0, and never perturb real groups.

    Returns (sa, rank, rows_next, m_next): rows_next has the same
    capacity with still-active rows first (ascending), zero-filled.
    """
    n = sa.shape[0] - 1
    p = sa[rows]
    key1 = rank[p]
    key2 = _gather_at_offset(rank, p, offset)
    k1s, k2s, ps = lax.sort((key1, key2, p), num_keys=2, is_stable=True)
    trows = jnp.sort(rows)
    sa = sa.at[trows].set(ps)

    m = rows.shape[0]
    neq = _neq_adjacent((k1s, k2s))
    head = lax.cummax(jnp.where(neq, trows, 0))
    is_fill = ps == n
    rank = rank.at[ps].set(jnp.where(is_fill, 1, head + 1))

    nxt = jnp.concatenate([neq[1:], jnp.ones(1, bool)])
    still = ~(neq & nxt) & ~is_fill
    (keep,) = jnp.nonzero(still, size=m, fill_value=-1)
    rows_next = jnp.where(keep >= 0, trows[jnp.maximum(keep, 0)], 0)
    return sa, rank, rows_next.astype(jnp.int32), jnp.sum(still, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("n_rank_keys", "tail_chars", "alphabet"),
         donate_argnames=("sa",))
def _landing_round(sa, rank_levels, offsets, rows, text, n_rank_keys,
                   tail_chars, alphabet, tail_offset):
    """Final exact-k combine on the compacted active set: stable sort by
    the decomposition keys (saved rank levels at their char offsets, then
    raw packed words for the sub-seed tail) and write back. Fill entries
    behave as in :func:`_refine_round`."""
    p = sa[rows]
    keys = [
        _gather_at_offset(rank_levels[i], p, offsets[i])
        for i in range(n_rank_keys)
    ]
    if tail_chars:
        for w in pack.suffix_key_words(text, tail_chars, 0, alphabet):
            keys.append(_gather_at_offset(w, p, tail_offset))
    ops = lax.sort(tuple(keys) + (p,), num_keys=len(keys), is_stable=True)
    return sa.at[jnp.sort(rows)].set(ops[-1])


def _next_capacity(m: int, cap: int) -> int:
    c = 1024
    while c < m:
        c *= 2
    return min(c, cap)


def k_ordered_suffix_array(
    ref, k=256, alphabet: pack.Alphabet = pack.DNA, as_numpy: bool = True
):
    """Host entry point: int8 text -> uint32 SA (length n+1).

    Ordering contract (reference: kiss1_core.hpp:94-135): suffixes sorted
    by first k characters; a suffix that ends within k characters sorts
    before any longer suffix sharing its prefix; full-k ties broken by
    ascending text position; SA[0] = n.

    ``as_numpy=False`` leaves the result on device (callers composing
    with further device work should prefer this; device->host transfer
    of a genome-scale SA is expensive).
    """
    if not isinstance(ref, jnp.ndarray):
        ref = np.ascontiguousarray(ref, dtype=np.int8)
    n = ref.shape[0]
    if n == 0:
        sa0 = np.zeros(1, dtype=np.uint32)
        return sa0 if as_numpy else jnp.asarray(sa0)
    k = _normalize_k(k)
    plan = _make_plan(n, k, alphabet)
    N = n + 1

    with timing.stage("k_ordered_suffix_array") as out:
        text = jnp.asarray(ref)
        sa, rank, active, m_dev = _seed_sort(text, plan.seed_chars, alphabet)
        m = int(m_dev)

        saved = {}
        cover = plan.seed_chars
        if cover in plan.save_levels:
            saved[cover] = jnp.copy(rank)  # rank buffers are donated below
        if m > 0 and (plan.doublings or plan.decomp or plan.tail_chars):
            rows = _compact_rows(active, _next_capacity(m, N))
            for _ in range(plan.doublings):
                if m > 0:
                    ncap = _next_capacity(m, N)
                    if ncap < rows.shape[0]:
                        rows = rows[:ncap]
                    sa, rank, rows, m_dev = _refine_round(
                        sa, rank, rows, jnp.int32(cover)
                    )
                    m = int(m_dev)
                cover *= 2
                if cover in plan.save_levels:
                    saved[cover] = jnp.copy(rank)

            if m > 0 and (plan.decomp or plan.tail_chars):
                ncap = _next_capacity(m, N)
                if ncap < rows.shape[0]:
                    rows = rows[:ncap]
                # key i applies at the char offset where previous keys end
                levels, offs = [rank], [0]
                off = cover
                for lv in plan.decomp:
                    levels.append(saved[lv])
                    offs.append(off)
                    off += lv
                sa = _landing_round(
                    sa,
                    tuple(levels),
                    tuple(jnp.int32(o) for o in offs),
                    rows,
                    text,
                    len(levels),
                    plan.tail_chars,
                    alphabet,
                    jnp.int32(off),
                )
        out["block_on"] = sa
    if as_numpy:
        return np.asarray(sa).astype(np.uint32)
    return sa


# ---------------------------------------------------------------------------
# fully-jitted single-program variant (for SPMD / fusion contexts)
# ---------------------------------------------------------------------------


def _group_ranks(neq: jnp.ndarray, sa: jnp.ndarray):
    m = neq.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    head = lax.cummax(jnp.where(neq, idx, 0))
    rank = _rank_by_position(sa, head + 1)
    done = jnp.all(neq)
    return rank, done


def _double_pass(rank, sa, done, pos, offset: int, n: int):
    """One full-array prefix-doubling pass: coverage L -> 2L, skipped
    via lax.cond when every group is already a singleton."""

    def run(args):
        rank, sa, _ = args
        key2 = _rank_shift(rank, offset)
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
    """Jitted single-program core: int8 text of length n -> int32 SA of
    length n+1. Same ordering contract as the host-driven path; useful
    inside larger jitted programs (SPMD pipelines, fused index builds).

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
            keys.append(_rank_shift(saved[lv], off))
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
    if k is None:
        return None
    k = int(k)
    if k < 0 or k >= 2**63:  # reference: -1 parsed as size_t wraps to max
        return None
    return k


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
