"""Query-path roofline: is the batched backward search gather-bound?

Round 4 closed the SORT floor against measured stream bandwidth
(results_roofline.md). This does the same for the QUERY path: the
1M-pattern device counts time (~0.45 s, bench.py) is 25 LF steps, each
gathering two [Q, 5]-u32 rows (beg and end bounds) from the fused LF
table plus a few VPU ops. If a stripped kernel that does ONLY the row
gathers (no masks, no symbol decode, no cnt add) costs the same, the
search is at its memory floor and further tuning must reduce GATHERS,
not arithmetic (the lookup table, which removes whole steps, is
exactly that lever -- bench's lookup12 metric).

Run on the real chip: python experiments/micro_query_roofline.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

QLEN = 25
NQ = 1_000_000


def timeit(fn, reps=3):
    fn()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import sample_patterns, synth_genome
    from kiss_tpu.models import fm_index as fm
    from kiss_tpu.ops import pack
    from kiss_tpu.ops.suffix_sort import k_ordered_suffix_array_device
    from kiss_tpu.utils import timing

    n = 48_800_648
    text_host = synth_genome(n)
    text = jax.device_put(jnp.asarray(text_host))
    sa = k_ordered_suffix_array_device(text, None)
    arrays = fm.build_index_device(text, sa, 4)
    timing.sync(arrays)
    pats = sample_patterns(text_host, NQ, QLEN)
    qwords = jax.device_put(jnp.asarray(pack.np_pack_queries_2bit(pats)))
    timing.sync(qwords)

    # ---- the real counts kernel -----------------------------------------
    def counts():
        c = fm.counts_packed_device(arrays, qwords, QLEN, 0)
        timing.sync(c)

    t_real = timeit(counts)

    # ---- gather-only skeleton: same loop, same gather volume, no search
    lf_tab = arrays.lf_tab  # [N/16 + 1, 5] u32
    rows = lf_tab.shape[0]

    @partial(jax.jit, static_argnames=("steps",))
    def gather_only(qw, steps: int):
        q = qw.shape[0]
        beg = jnp.zeros(q, jnp.int32)
        end = jnp.full(q, rows - 1, jnp.int32)

        def step(t, carry):
            beg, end = carry
            ra = lf_tab[beg % rows]
            rb = lf_tab[end % rows]
            # mix so the next step's addresses depend on the loads
            # (defeats dead-code elimination AND keeps the random-access
            # pattern of a real LF walk)
            nb = (ra[:, 0] ^ ra[:, 4]).astype(jnp.int32) % rows
            ne = (rb[:, 1] + rb[:, 4]).astype(jnp.int32) % rows
            return nb, ne

        beg, end = jax.lax.fori_loop(0, steps, step, (beg, end))
        return beg + end

    def gonly():
        timing.sync(gather_only(qwords, QLEN))

    t_gather = timeit(gonly)

    # ---- arithmetic-only skeleton: same loop, no table loads
    @partial(jax.jit, static_argnames=("steps",))
    def alu_only(qw, steps: int):
        q = qw.shape[0]
        beg = jnp.zeros(q, jnp.uint32)
        end = jnp.full(q, 12345, jnp.uint32)

        def step(t, carry):
            beg, end = carry
            w = jax.lax.dynamic_slice_in_dim(qw, 0, 1, axis=1)[:, 0]
            c = (w >> (2 * (t % 16)).astype(jnp.uint32)) & 3
            return beg * 5 + c, end * 3 + c

        beg, end = jax.lax.fori_loop(0, steps, step, (beg, end))
        return beg + end

    def aonly():
        timing.sync(alu_only(qwords, QLEN))

    t_alu = timeit(aonly)

    bytes_per_step = 2 * NQ * 5 * 4  # two [Q,5]-u32 row gathers
    total_gb = QLEN * bytes_per_step / 1e9
    eff_real = total_gb / t_real
    eff_gather = total_gb / t_gather

    lines = [
        f"counts device (real search): {t_real:.4f} s",
        f"gather-only skeleton:        {t_gather:.4f} s "
        f"({t_gather / t_real * 100:.0f}% of real)",
        f"alu-only skeleton:           {t_alu:.4f} s "
        f"({t_alu / t_real * 100:.0f}% of real)",
        f"gather volume: {total_gb:.2f} GB "
        f"-> real {eff_real:.0f} GB/s, gather-only {eff_gather:.0f} GB/s "
        f"effective random-row bandwidth",
    ]
    for ln in lines:
        print(ln, file=sys.stderr, flush=True)
    md = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "results_query_roofline.md")
    with open(md, "a") as f:
        f.write(f"\n## Run {time.strftime('%Y-%m-%d %H:%M')} "
                f"({jax.devices()[0]})\n\n```\n")
        f.write("\n".join(lines))
        f.write("\n```\n")


if __name__ == "__main__":
    main()
