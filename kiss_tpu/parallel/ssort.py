"""Splitter-based distributed sample sort over a device mesh.

Columnsort (:mod:`kiss_tpu.parallel.dsort`) costs 4 local sorts + 2
full-block all_to_alls regardless of D -- a sort-stage speedup ceiling
of D/4. Sample sort is the classic upgrade: ONE local sort, a splitter
partition, one bucket exchange, one merge. The textbook formulation
needs a ragged all_to_all (`lax.ragged_all_to_all` -- unimplemented on
XLA:CPU, untestable without real multi-chip hardware, ROADMAP r2), so
this implementation uses static shapes throughout:

  0. **decorrelating deal**: element j of each block is re-dealt to
     device j mod D (one uniform all_to_all). Without it, per-source
     bucket capacity blows up whenever key values correlate with text
     position -- which is exactly what genome-local repeats do (a
     device whose block is one tandem array concentrates its whole
     block into the few buckets its repeat keys fall in; measured
     cvec up to 288 vs C = 235 on the repeat-heavy test corpus). After
     the deal every device holds a stride-D subsample of the global
     distribution, so per-source bucket loads track bucket_total / D;
  1. local sort of the dealt B-row block (all W operands are keys; the
     last operand is a unique position, making the order total);
  2. regular sampling: OVERSAMPLE midpoint-strided rows per device,
     all_gather, replicated sample sort, splitters at every
     OVERSAMPLE-th sample (the PSRS scheme -- Shi & Schaeffer 1992);
  3. bucket boundaries by vectorized W-word lexicographic rank of each
     splitter in the sorted block (D-1 masked passes, no gather);
  4. **capacity-padded uniform all_to_all**: each (src, dst) bucket
     ships in a fixed C = ceil(slack * B / D) slot padded with MAX keys
     -- a uniform exchange of slack*B rows/device replaces the ragged
     one at the cost of the slack factor in traffic;
  5. merge = one local sort of the received slack*B rows (pads sort to
     the tail);
  6. **static-window rebalance** to exactly B rows/device: exchanged
     bucket counts (one tiny all_gather) give every device the global
     offset of its merged run; under the balance invariant |off_d -
     d*B| <= S (S = slack*B - B), a block's rows live only on devices
     d-1, d, d+1, so two S-row ppermute slivers + three static-shape
     masked windows reassemble the uniform layout. No gathers anywhere.

Total local sort work: (1 + slack) * B vs columnsort's 4B -- a ~1.6x
sort-stage win at the default slack 1.5, with (1 + slack)*B exchange
volume vs columnsort's 2B.

**Overflow contract**: with adversarial key skew a bucket can exceed C,
or the drift can exceed S. Collectives inside `lax.cond` are not
portable, so instead of a conditional fallback every output row is
POISONED to 0xFFFFFFFF when any device overflows -- never silently
wrong. The flag is deterministic and identical on all devices (it is
computed from the replicated count matrix), and is RETURNED as an
explicit extra output (:func:`block_sample_sort_flag`) so the facade
can accumulate it across a pipeline's sorts and raise
``SampleSortOverflow`` at the API boundary instead of handing callers
a poisoned permutation. Callers choose this algorithm explicitly
(``algorithm="sample"``); the default columnsort needs no sampling
assumptions. Oversampling (64 per device) makes overflow vanishingly
unlikely at slack 1.5 on real key distributions; tests drive both the
clean path (bit-identical to ``lax.sort``) and the poison path
(adversarial constant keys).

Re-expresses SURVEY.md P2 (the histogram -> bucket-cursor -> scatter
radix partition idiom, reference: kiss1_core.hpp:41-83) as its
distributed form: per-shard boundaries -> all_to_all bucket shuffle.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

OVERSAMPLE = 64
SLACK = 1.5
_MAXVALS = {
    jnp.uint32.dtype: jnp.uint32(0xFFFFFFFF),
    jnp.int32.dtype: jnp.int32(2**31 - 1),
}


def _mx(x):
    return _MAXVALS[x.dtype]


def _lex_less_count(ops, splitter_ops, t):
    """Number of rows in the (sorted) block strictly lex-less than
    splitter t. ``ops``: W arrays [B]; ``splitter_ops``: W arrays
    [D-1]."""
    acc = jnp.zeros(ops[0].shape, bool)
    for x, s in zip(reversed(ops), reversed(splitter_ops)):
        sv = s[t]
        acc = (x < sv) | ((x == sv) & acc)
    return jnp.sum(acc, dtype=jnp.int32)


def _sizes(B: int, D: int, slack: float):
    C = max(-(-int(B * slack) // D), 1)
    M = C * D
    S = M - B
    assert 0 < S <= B, (B, D, slack, "need 1 < slack <= 2")
    return C, M, S


def block_sample_sort(*ops, axis: str, n_devices: int, slack: float = SLACK,
                      oversample: int = OVERSAMPLE):
    """shard_map body: globally sort the blocks of ``ops`` (uint32 or
    int32; jointly a total order). Returns the sorted blocks; every
    row is the dtype max in every operand if any device overflowed
    (see module docstring). Row counts use int32 internally: the
    sample path supports global N < 2^31 (columnsort, the default, has
    no such limit; the facade asserts the bound at entry)."""
    out = block_sample_sort_flag(
        *ops, axis=axis, n_devices=n_devices, slack=slack,
        oversample=oversample,
    )
    return out[:-1]


def block_sample_sort_flag(*ops, axis: str, n_devices: int,
                           slack: float = SLACK,
                           oversample: int = OVERSAMPLE):
    """:func:`block_sample_sort` plus an explicit overflow flag as the
    last output: int32[1] per device (nonzero = this sort poisoned its
    output). The facade (:func:`kiss_tpu.parallel.dsort.
    make_sharded_sort_impl`) accumulates it across every sort of a
    pipeline and raises at the API boundary -- closing the
    silent-poison gap (ADVICE r4: consumers proceeded on poisoned
    output with no error)."""
    D = n_devices
    W = len(ops)
    B = ops[0].shape[0]
    if D == 1:
        out = lax.sort(tuple(ops), num_keys=W, is_stable=False)
        return tuple(out) + (jnp.zeros(1, jnp.int32),)
    # step 0: decorrelating deal (see module docstring); B % D == 0 is
    # the facade's padding contract
    dealt = []
    for x in ops:
        y = x.reshape(-1, D).T
        z = lax.all_to_all(y, axis, split_axis=0, concat_axis=0)
        dealt.append(z.reshape(-1))
    sorted_ops = list(
        lax.sort(tuple(dealt), num_keys=W, is_stable=False)
    )
    C, M, S = _sizes(B, D, slack)

    # ---- splitters from a replicated regular sample
    # midpoint positions (2j+1)B/2s: evenly covers the whole block incl.
    # its top -- floor-strided j*(B//s) sampling never sees the last
    # B mod s rows, which systematically under-places the top splitter
    # and overflows the last bucket
    s = min(oversample, B)
    stride_idx = (
        (2 * jnp.arange(s, dtype=jnp.int64) + 1) * B // (2 * s)
    ).astype(jnp.int32)
    samples = [x[stride_idx] for x in sorted_ops]
    gathered = [
        lax.all_gather(x, axis).reshape(-1) for x in samples
    ]  # [D * s] each
    ssorted = lax.sort(tuple(gathered), num_keys=W, is_stable=False)
    spl_idx = (jnp.arange(1, D) * s).astype(jnp.int32)
    splitters = [x[spl_idx] for x in ssorted]  # [D - 1] each

    # ---- bucket boundaries in the sorted block
    bs = [jnp.zeros((), jnp.int32)]
    for t in range(D - 1):
        bs.append(_lex_less_count(sorted_ops, splitters, t))
    bs.append(jnp.full((), B, jnp.int32))
    b = jnp.stack(bs)  # [D + 1], nondecreasing
    cvec = b[1:] - b[:-1]  # my send counts, [D]
    over_fwd = jnp.any(cvec > C)

    # ---- capacity-padded exchange
    def send_buffer(x):
        xpad = jnp.concatenate([x, jnp.full(C, _mx(x), x.dtype)])
        parts = []
        jj = jnp.arange(C, dtype=jnp.int32)
        for d in range(D):
            sl = lax.dynamic_slice(xpad, (b[d],), (C,))
            parts.append(jnp.where(jj < cvec[d], sl, _mx(x)))
        return jnp.stack(parts)  # [D, C]

    received = [
        lax.all_to_all(send_buffer(x), axis, split_axis=0, concat_axis=0)
        for x in sorted_ops
    ]
    merged = list(
        lax.sort(
            tuple(r.reshape(-1) for r in received), num_keys=W,
            is_stable=False,
        )
    )  # [M] each; valid prefix, MAX pads at the tail

    # ---- replicated counts -> offsets -> rebalance invariant
    cmat = lax.all_gather(cvec, axis)  # [D, D]; row e = sends of dev e
    m = cmat.sum(axis=0)  # rows landing on each device
    offx = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(m).astype(jnp.int32)]
    )  # [D + 1]; offx[d] = global start of device d's merged run
    i = lax.axis_index(axis)
    off_i = offx[i]
    m_i = m[i]
    drift = offx[:D] - jnp.arange(D, dtype=jnp.int32) * B
    over_drift = jnp.any(jnp.abs(drift) > S)
    flag = over_fwd | over_drift

    # sliver counts (identical formulas on every device, from offx)
    t_prev = jnp.clip(off_i - i * B, 0, S)  # rows arriving from d-1
    t_send = jnp.clip(off_i + m_i - (i + 1) * B, 0, S)  # my tail to d+1
    h_next = jnp.clip((i + 1) * B - offx[jnp.minimum(i + 1, D)], 0, S)
    q = offx[jnp.minimum(i + 1, D)] - i * B  # slot of next's first row
    shift = jnp.clip(q - (B - S), 0, 2 * S)

    fwd = [(e, e + 1) for e in range(D - 1)]
    back = [(e, e - 1) for e in range(1, D)]
    jS = jnp.arange(S, dtype=jnp.int32)
    outs = []
    for x in merged:
        tail = lax.dynamic_slice(
            jnp.concatenate([x, jnp.full(S, _mx(x), x.dtype)]),
            (jnp.clip(m_i - t_send, 0, M),), (S,),
        )
        head = x[:S]
        pt = lax.ppermute(tail, axis, fwd)  # zeros at device 0: masked
        nh = lax.ppermute(head, axis, back)  # zeros at device D-1
        # own rows shifted to their block slots (front-padded window)
        own = lax.dynamic_slice(
            jnp.concatenate([jnp.full(S, _mx(x), x.dtype), x]),
            (jnp.clip(S + i * B - off_i, 0, 2 * S),), (B,),
        )
        jB = jnp.arange(B, dtype=jnp.int32)
        own_valid = (jB >= t_prev) & (jB < off_i + m_i - i * B)
        out = jnp.where(own_valid, own, _mx(x))
        # prev's tail occupies the first t_prev slots
        ptB = jnp.concatenate([pt, jnp.full(B - S, _mx(x), x.dtype)])
        out = jnp.where(jB < t_prev, ptB, out)
        # next's head occupies the last slots: static window [B-S, B)
        nh_shift = lax.dynamic_slice(
            jnp.concatenate([jnp.full(2 * S, _mx(x), x.dtype), nh]),
            (jnp.clip(2 * S - shift, 0, 2 * S),), (S,),
        )
        nh_valid = (jS >= shift) & (jS - shift < h_next)
        tail_out = jnp.where(nh_valid, nh_shift, out[B - S :])
        out = jnp.concatenate([out[: B - S], tail_out])
        outs.append(jnp.where(flag, _mx(x), out))
    return tuple(outs) + (flag.astype(jnp.int32)[None],)
