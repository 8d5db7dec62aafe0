"""Sharded FM-index build: chm13-scale indexes without any unsharded
N-array.

The single-device build (:func:`kiss_tpu.models.fm_index.
build_index_device`) mirrors the reference's build_occ/build_bwt/build_sa
(reference: fm_index.hpp:277-371) as whole-array dataflow -- fine up to
~10^8 rows, impossible at chm13 (n = 3.117e9): the SA alone is 12.5 GB,
and the reference itself has no distributed story (single shared-memory
node, SURVEY.md section 2.5). This module runs the same build with every
N-sized array sharded over the sequence-axis mesh:

  - **BWT without a distributed gather.** ``bwt[i] = text[sa[i] - 1]``
    is a random gather across all shards. But ``prev = sa - 1`` over the
    non-sentinel rows is exactly a permutation of [0, n), so after a
    distributed sort of (prev, row) by prev, the request in global slot
    j has prev == j -- and its symbol is the TEXT ELEMENT IN THE SAME
    SLOT. One more sort by row delivers the symbols to BWT order. Two
    2-operand columnsorts (kiss_tpu.parallel.dsort) replace the gather;
    no shard ever sees more than its block.
  - **occ/cnt/marks shard-locally.** Blocks are padded to a multiple of
    256 rows per device, so every occ2 superblock, mark word, and
    b_occ block is device-local; the only cross-device traffic is an
    all_gather of the per-device symbol/mark totals ([D, 4] and [D] --
    bytes, not arrays) for the exclusive prefix offsets: the distributed
    form of the reference's per-thread count + serial prefix fixup
    (reference: fm_index.hpp:277-308).
  - **Sampled SA by one more sort.** The reference compacts marked rows
    with a serial scan (fm_index.hpp:331-371); here each row's target
    slot (its global mark rank) is computed locally, and one 2-operand
    distributed sort by target slot IS the compaction.

Per-chip memory: every table is P('seq')-sharded, so resident bytes
scale 1/D; the transient peak is the 2-operand columnsort (~16 bytes
per row per device block during the merge step). See ROADMAP for the
chm13 byte budget.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kiss_tpu.models import fm_index as fm
from kiss_tpu.ops import pack
from kiss_tpu.parallel import dsort

SEQ_AXIS = "seq"

# rows per device are padded to a multiple of this: one occ1 superblock
# (256 rows) is the least common multiple of every block structure the
# body needs (occ2 16, b words 32, b_occ 64, occ1 256)
_ROW_ALIGN = fm.OCC1_INTV


def _padded_rows(N: int, d: int) -> int:
    # N + 1 so the canonical tables' final (partial) block row exists
    # even when N divides the alignment exactly: occ2 has N//16 + 1
    # rows, b_occ N//64 + 1, and queries read lf_tab[N // 16]
    blk = -(-(N + 1) // d)
    blk = -(-blk // _ROW_ALIGN) * _ROW_ALIGN
    return blk * d


def _exclusive_over_devices(local_totals, axis):
    """Exclusive prefix of per-device totals along the mesh axis: the
    cross-shard half of the count/prefix-sum idiom (SURVEY.md P2/P3).
    ``local_totals`` may be any shape; returns the same shape."""
    allt = lax.all_gather(local_totals, axis)  # [D, ...]
    d = lax.axis_index(axis)
    mask = (jnp.arange(allt.shape[0]) < d)
    shape = (allt.shape[0],) + (1,) * (allt.ndim - 1)
    return jnp.sum(allt * mask.reshape(shape).astype(allt.dtype), axis=0)


def _occ_body(N: int, sa_intv: int, idt, axis: str):
    """shard_map body: (bwt symbols block, sa block) -> every per-device
    index table + the global scalars (cnt, pri) + the sampled-SA sort
    key. All blocks are _ROW_ALIGN-aligned so every table row is local."""

    def body(bwt, sa):
        blk = bwt.shape[0]
        base = (lax.axis_index(axis) * blk).astype(jnp.uint32)
        gidx = base + jnp.arange(blk, dtype=jnp.uint32)
        valid = gidx < jnp.uint32(N)

        words = pack.pack_dibits_u32(bwt)
        starts = jnp.arange(words.shape[0], dtype=jnp.uint32) * jnp.uint32(
            fm.OCC2_INTV
        ) + base
        t = jnp.clip(
            jnp.uint32(N) - jnp.minimum(starts, jnp.uint32(N)),
            0,
            jnp.uint32(fm.OCC2_INTV),
        )
        c16 = jnp.stack(
            [
                pack.count_symbol_prefix(words, jnp.uint32(c), t).astype(
                    jnp.int32
                )
                for c in range(4)
            ],
            axis=1,
        )
        # the sentinel row packs as symbol 0: subtract it from its block
        # (reference: the sentinel contributes to no occ count,
        # fm_index.hpp:277-308)
        is_pri = valid & (sa == 0)
        pri = lax.psum(jnp.sum(jnp.where(is_pri, gidx, 0)), axis).astype(idt)
        pri_in_blk = jnp.sum(
            jnp.where(is_pri, 1, 0).reshape(-1, fm.OCC2_INTV), axis=1
        )
        c16 = c16.at[:, 0].add(-pri_in_blk)

        # occ2: exclusive cumsum within each (local) 256-superblock
        grp = c16.reshape(-1, fm.OCC1_INTV // fm.OCC2_INTV, 4)
        occ2 = (jnp.cumsum(grp, axis=1) - grp).reshape(-1, 4)
        # occ1: exclusive cumsum of superblock totals, device offset via
        # the tiny all_gather
        sup_tot = grp.sum(axis=1).astype(idt)
        occ1 = jnp.cumsum(sup_tot, axis=0) - sup_tot
        dev_tot = sup_tot.sum(axis=0)
        occ1 = occ1 + _exclusive_over_devices(dev_tot, axis)[None, :]
        totals = lax.psum(dev_tot, axis)
        cnt = (jnp.cumsum(totals) - totals + 1).astype(idt)

        lf_tab = jnp.concatenate(
            [
                (
                    jnp.repeat(
                        occ1.astype(jnp.uint32),
                        fm.OCC1_INTV // fm.OCC2_INTV,
                        axis=0,
                    )
                    + occ2.astype(jnp.uint32)
                ),
                words[:, None],
            ],
            axis=1,
        )

        if sa_intv == 1:
            z32 = jnp.zeros(blk // 32, jnp.uint32)
            zb = jnp.zeros(blk // 64, idt)
            return (words, occ1, occ2, cnt, pri, z32, zb, lf_tab,
                    jnp.zeros((blk // 64, 3), jnp.uint32),
                    gidx.astype(jnp.uint32))

        b = valid & (sa % jnp.asarray(sa_intv, sa.dtype) == 0)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        b_words = (
            (b.reshape(-1, 32).astype(jnp.uint32) << shifts[None, :])
            .sum(axis=1)
            .astype(jnp.uint32)
        )
        c64 = b.reshape(-1, fm.B_OCC_INTV).sum(axis=1).astype(idt)
        b_occ = jnp.cumsum(c64) - c64
        b_occ = b_occ + _exclusive_over_devices(c64.sum(), axis)
        b_tab = jnp.stack(
            [b_occ.astype(jnp.uint32), b_words[0::2], b_words[1::2]], axis=1
        )

        # per-row global mark rank = the target slot of this row's SA
        # value in the sampled-SA compaction; unmarked/pad rows get a
        # unique out-of-range key so the sort stays a total order
        bi = b.astype(jnp.uint32)
        rank_in_blk = jnp.cumsum(bi) - bi
        b_rank = rank_in_blk + _exclusive_over_devices(bi.sum(), axis)
        n_samp = (N + sa_intv - 1) // sa_intv
        samp_key = jnp.where(b, b_rank, jnp.uint32(n_samp) + gidx)
        return (words, occ1, occ2, cnt, pri, b_words, b_occ, lf_tab,
                b_tab, samp_key)

    return body


def build_index_sharded(
    mesh: Mesh, text, sa, sa_intv: int = 4, force_u32: bool = False,
    axis: str = SEQ_AXIS,
):
    """text int8[n], sa [N = n+1] -> FMArrays with every row-indexed
    table sharded P(axis) over ``mesh`` (padded to the mesh-aligned
    block size; pad rows are never selected by queries). The canonical
    (serialization) shapes are the leading slices -- see
    :func:`trim_canonical`.

    Bit-identical to :func:`kiss_tpu.models.fm_index.build_index_device`
    on the canonical slices (tests/test_fm_build_sharded.py).
    """
    n = int(text.shape[0])
    N = n + 1
    d = mesh.devices.size
    idt = fm._index_dtype(N, force_u32)
    npad = _padded_rows(N, d)
    sort_impl = dsort.make_sharded_sort_impl(mesh, axis)
    row_sh = NamedSharding(mesh, P(axis))

    @partial(jax.jit, out_shardings=None)
    def run(text, sa):
        sa = sa.astype(idt)
        # ---- BWT by sort-gather (see module docstring): prev over the
        # non-sentinel rows is a permutation of [0, n), the sentinel gets
        # the unique key n, so slot j of the prev-sorted order needs
        # exactly text[j] (0 for the sentinel's slot n).
        row = jnp.arange(N, dtype=jnp.uint32)
        sau = sa.astype(jnp.uint32)
        prevv = jnp.where(sau == 0, jnp.uint32(n), sau - 1)
        _, rows_s = sort_impl((prevv, row), num_keys=2)
        textN = jnp.zeros(N, jnp.uint32).at[:n].set(
            text.view(jnp.uint8).astype(jnp.uint32)
            if text.dtype == jnp.int8
            else text.astype(jnp.uint32)
        )
        _, bwt_u = sort_impl((rows_s, textN), num_keys=2)

        # ---- pad to the mesh-aligned block size; pad sa rows carry 1
        # (never the sentinel, never marked)
        bwt_pad = jnp.zeros(npad, jnp.int8).at[:N].set(bwt_u.astype(jnp.int8))
        sa_pad = jnp.full(npad, jnp.asarray(1, idt)).at[:N].set(sa)

        body = _occ_body(N, sa_intv, idt, axis)
        (words, occ1, occ2, cnt, pri, b_words, b_occ, lf_tab, b_tab,
         samp_key) = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(), P(), P(axis),
                       P(axis), P(axis, None), P(axis, None), P(axis)),
        )(bwt_pad, sa_pad)

        # ---- sampled SA: one distributed sort by target slot (the
        # dataflow form of build_sa's serial compaction,
        # fm_index.hpp:331-371)
        if sa_intv == 1:
            sa_samp = sa
        else:
            # slice to the canonical sample count rounded up to an even
            # shard multiple, then explicitly re-balance: a bare prefix
            # slice of the sorted [npad] array would land the whole
            # sample on the first devices (~3 GB on one chip at chm13),
            # while keeping the full padded length wastes sa_intv x the
            # memory. Rows in [ceil(N/sa_intv), ns_pad) are pad
            # (unmarked rows sort behind every real mark rank) and are
            # never gathered; trim_canonical slices them off for
            # serialization.
            _, samp_sorted = sort_impl(
                (samp_key, sa_pad.astype(jnp.uint32)), num_keys=2
            )
            ns = -(-N // sa_intv)
            ns_pad = -(-ns // (d * _ROW_ALIGN)) * (d * _ROW_ALIGN)
            sa_samp = jax.lax.with_sharding_constraint(
                samp_sorted[:ns_pad].astype(idt), row_sh
            )

        occ2 = occ2.astype(jnp.int32)
        lookup = jnp.array([0, N], idt)
        return fm.FMArrays(
            words, occ1, occ2, cnt, pri, sa_samp,
            b_words, b_occ, lookup, lf_tab, b_tab,
        )

    return run(jnp.asarray(text), jnp.asarray(sa))


def trim_canonical(arrays: fm.FMArrays, N: int, sa_intv: int) -> fm.FMArrays:
    """Slice a sharded-built FMArrays down to the canonical
    (serialization-layout) row counts of the single-device build:
    occ1 N//256+1, occ2 N//16+1, bwt words ceil(N/16), mark words
    2*ceil(N/64), b_occ N//64+1 (reference layout: fm_index.hpp:106-148).
    Device->host transfer of the results is the caller's choice."""
    nb1 = N // fm.OCC1_INTV + 1
    nb2 = N // fm.OCC2_INTV + 1
    nw = -(-N // 16)
    if sa_intv == 1:
        # the single-device build keeps 1-row placeholders for the mark
        # structures when the SA is unsampled
        nbw, nbo = 1, 1
        ns = arrays.sa_samp.shape[0]
    else:
        nbw = 2 * (-(-N // 64))
        # ceil, not floor+1: when N % 64 == 0 the single-device build's
        # c64 blocking yields exactly N/64 rows (queries never read past
        # row (N-1)//64, so both counts serve every lookup)
        nbo = -(-N // fm.B_OCC_INTV)
        ns = -(-N // sa_intv)
    return arrays._replace(
        bwt_words=arrays.bwt_words[:nw],
        occ1=arrays.occ1[:nb1],
        occ2=arrays.occ2[:nb2],
        sa_samp=arrays.sa_samp[:ns],
        b_words=arrays.b_words[:nbw],
        b_occ=arrays.b_occ[:nbo],
        lf_tab=arrays.lf_tab[:nb2],
        b_tab=arrays.b_tab[:nbo],
    )
