"""Row-sharded FM-index queries: the index split across the mesh.

:func:`kiss_tpu.parallel.mesh.sharded_batch_query` shards the QUERY axis
and replicates the index -- right whenever the index fits one chip. At
chm13 scale the device tables (packed BWT ~0.8 GB, fused occ ~3.1 GB,
sampled SA ~3.1 GB, marks) crowd a single chip's HBM, and the reference
has no answer at all (single shared-memory node, SURVEY.md section 2.5).
This module shards the INDEX over the sequence axis instead: device d
holds row-block d of every row-indexed table, queries are replicated,
and each LF step resolves its gathers with one ``psum``:

    every device gathers the rows of its own block (others contribute
    zero) and the partial results are summed over the mesh -- the
    distributed form of the occ/bwt word lookups in compute_occ
    (reference: fm_index.hpp:166-182).

Cost model: an LF step is one psum of a few Q-sized lanes over ICI
(~us-scale) instead of a local gather -- latency-bound, so throughput
still scales with the query batch; memory per chip scales 1/D.
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

SEQ_AXIS = "seq"


def _pad_rows(x: jnp.ndarray, d: int) -> jnp.ndarray:
    r = (-x.shape[0]) % d
    if r:
        x = jnp.concatenate([x, jnp.zeros((r,) + x.shape[1:], x.dtype)])
    return x


def shard_fm_arrays(mesh: Mesh, arrays: fm.FMArrays) -> fm.FMArrays:
    """Lay the row-indexed tables out sharded over the mesh (padded to
    the device count) and the small tables replicated. The result is
    what :func:`sharded_get_ranges` / :func:`sharded_locate_rows`
    consume; padding rows are zeros and are never selected."""
    d = mesh.devices.size
    row_sh = NamedSharding(mesh, P(SEQ_AXIS))
    row2_sh = NamedSharding(mesh, P(SEQ_AXIS, None))
    repl = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    return fm.FMArrays(
        bwt_words=put(_pad_rows(arrays.bwt_words, d), row_sh),
        occ1=put(arrays.occ1, repl),  # host/serialization only
        occ2=put(arrays.occ2, repl),
        cnt=put(arrays.cnt, repl),
        pri=put(arrays.pri, repl),
        sa_samp=put(_pad_rows(arrays.sa_samp, d), row_sh),
        b_words=put(_pad_rows(arrays.b_words, 2 * d), row_sh),
        b_occ=put(_pad_rows(arrays.b_occ, d), row_sh),
        lookup=put(arrays.lookup, repl),
        occf=put(_pad_rows(arrays.occf, d), row2_sh),
    )


def _block_gather(table: jnp.ndarray, idx: jnp.ndarray, axis: str, *cols):
    """Masked local gather of ``table`` rows (this device's block of a
    globally row-sharded table) at GLOBAL indices ``idx``; rows owned by
    other devices contribute 0. Summing over the mesh (the caller's
    psum) completes the distributed gather."""
    rows = table.shape[0]
    base = lax.axis_index(axis) * rows
    local = idx - base
    mine = (local >= 0) & (local < rows)
    safe = jnp.clip(local, 0, rows - 1)
    vals = table[(safe,) + cols]
    return jnp.where(mine, vals, jnp.zeros((), vals.dtype))


def _occ_sharded(bwt_words, occf, pri, axis, c, i):
    """compute_occ with row-block tables: one fused psum resolves the
    packed-BWT word and the fused-occ row (reference: fm_index.hpp:
    166-182)."""
    idt = occf.dtype
    w_idx = i // fm.OCC2_INTV
    word_part = _block_gather(bwt_words, w_idx, axis)
    occ_part = _block_gather(occf, w_idx, axis, c)
    word, occv = lax.psum((word_part, occ_part), axis)
    partial_cnt = pack.count_symbol_prefix(word, c, i % fm.OCC2_INTV)
    beg = i - i % fm.OCC2_INTV
    pass_pri = (c == 0) & (beg <= pri) & (pri < i)
    return occv + partial_cnt.astype(idt) - pass_pri.astype(idt)


@partial(jax.jit, static_argnames=("mesh", "qlen", "lookup_len"))
def sharded_get_ranges(mesh: Mesh, arrays: fm.FMArrays,
                       qwords: jnp.ndarray, qlen: int, lookup_len: int = 0):
    """Backward search over 2-bit packed patterns against a row-sharded
    index (tables from :func:`shard_fm_arrays`). Same results as
    :func:`kiss_tpu.models.fm_index.get_range_packed_device`."""

    def body(bwt_words, occf, cnt, pri, lookup, qwords):
        q = qwords.shape[0]
        idt = lookup.dtype
        beg = jnp.zeros(q, idt)
        end = jnp.full(q, lookup[-1], idt)
        steps = qlen
        if lookup_len and qlen >= lookup_len:
            key = jnp.zeros(q, jnp.int32)
            for j in range(qlen - lookup_len, qlen):
                key = (key << 2) | (
                    (qwords[:, j // 16] >> jnp.uint32(2 * (j % 16))) & 3
                ).astype(jnp.int32)
            beg = lookup[key]
            end = lookup[key + 1]
            steps = qlen - lookup_len
        offs = jnp.full(q, steps, jnp.int32)

        def step(t, carry):
            beg, end, offs = carry
            j = steps - 1 - t
            w = lax.dynamic_slice_in_dim(qwords, j // 16, 1, axis=1)[:, 0]
            c = ((w >> (2 * (j % 16)).astype(jnp.uint32)) & 3).astype(
                jnp.int32
            )
            # both bounds resolved by ONE fused psum: the two gathers
            # ride the same collective
            nbeg = cnt[c] + _occ_sharded(
                bwt_words, occf, pri, SEQ_AXIS, c, beg
            )
            nend = cnt[c] + _occ_sharded(
                bwt_words, occf, pri, SEQ_AXIS, c, end
            )
            alive = end > beg
            return (
                jnp.where(alive, nbeg, beg),
                jnp.where(alive, nend, end),
                jnp.where(alive, j, offs),
            )

        return lax.fori_loop(0, steps, step, (beg, end, offs))

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SEQ_AXIS), P(SEQ_AXIS, None), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
    )(arrays.bwt_words, arrays.occf, arrays.cnt, arrays.pri, arrays.lookup,
      qwords)


@partial(jax.jit, static_argnames=("mesh", "sa_intv"))
def sharded_locate_rows(mesh: Mesh, arrays: fm.FMArrays,
                        rows: jnp.ndarray, sa_intv: int):
    """Row-sharded form of ``locate_rows_device`` (vectorized compute_sa,
    reference: fm_index.hpp:210-222): the masked LF walk's per-step
    gathers (bwt word for the own-symbol LF, mark word, mark rank,
    sampled SA) each become block gathers + one psum."""

    def body(bwt_words, occf, cnt, pri, sa_samp, b_words, b_occ, rows):
        idt = sa_samp.dtype

        def b_at(i):
            part = _block_gather(b_words, i // 32, SEQ_AXIS)
            word = lax.psum(part, SEQ_AXIS)
            return ((word >> (i % 32).astype(jnp.uint32)) & 1) == 1

        def lf_own(i):
            w_idx = i // fm.OCC2_INTV
            word_part = _block_gather(bwt_words, w_idx, SEQ_AXIS)
            word = lax.psum(word_part, SEQ_AXIS)
            off = (i % fm.OCC2_INTV).astype(jnp.uint32)
            c = ((word >> (2 * off)) & 3).astype(jnp.int32)
            occ_part = _block_gather(occf, w_idx, SEQ_AXIS, c)
            occv = lax.psum(occ_part, SEQ_AXIS)
            partial_cnt = pack.count_symbol_prefix(
                word, c, i % fm.OCC2_INTV
            ).astype(idt)
            beg = i - i % fm.OCC2_INTV
            pass_pri = (c == 0) & (beg <= pri) & (pri < i)
            return cnt[c] + occv + partial_cnt - pass_pri.astype(idt)

        def b_rank(i):
            blk = i // fm.B_OCC_INTV
            off = i - blk * fm.B_OCC_INTV
            w0 = _block_gather(b_words, 2 * blk, SEQ_AXIS)
            w1 = _block_gather(b_words, 2 * blk + 1, SEQ_AXIS)
            bo = _block_gather(b_occ, blk, SEQ_AXIS)
            w0, w1, bo = lax.psum((w0, w1, bo), SEQ_AXIS)
            lo = jnp.minimum(off, 32).astype(jnp.uint32)
            hi = jnp.where(
                off > 32, off - 32, jnp.zeros((), off.dtype)
            ).astype(jnp.uint32)
            m0 = jnp.where(
                lo >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << lo) - 1
            )
            m1 = jnp.where(
                hi >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << hi) - 1
            )
            cnt_bits = pack.popcount_u32(w0 & m0) + pack.popcount_u32(w1 & m1)
            return bo + cnt_bits.astype(bo.dtype)

        i = rows.astype(idt)
        steps = jnp.zeros_like(i)
        done = b_at(i)
        for _ in range(sa_intv - 1):
            nxt = lf_own(i)
            i = jnp.where(done, i, nxt)
            steps = steps + jnp.where(
                done, jnp.zeros((), idt), jnp.ones((), idt)
            )
            done = b_at(i)
        samp = lax.psum(
            _block_gather(sa_samp, b_rank(i), SEQ_AXIS), SEQ_AXIS
        )
        return samp + steps

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SEQ_AXIS), P(SEQ_AXIS, None), P(), P(), P(SEQ_AXIS),
                  P(SEQ_AXIS), P(SEQ_AXIS), P()),
        out_specs=P(),
    )(arrays.bwt_words, arrays.occf, arrays.cnt, arrays.pri, arrays.sa_samp,
      arrays.b_words, arrays.b_occ, rows)
