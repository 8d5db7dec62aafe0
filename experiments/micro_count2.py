"""Round-3 probe #2: the counts-only end-to-end path (uint32 counts
pulled per chunk, async) vs get_ranges (3x int32 pulled), plus a
breakdown of batch_query_stats' 4.36 s (search / expansion kernel /
host syncs)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from kiss_tpu.models import fm_index as fm
from kiss_tpu.ops.suffix_sort import k_ordered_suffix_array_device
from kiss_tpu.utils import timing

N = bench.N


def timed(label, fn, n=2):
    fn()
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:56s} {best:8.4f}s", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    text_host = bench.synth_genome(N)
    text = jax.device_put(jnp.asarray(text_host))
    timing.sync(text)

    fmi = fm.FMIndex(sa_intv=4, lookup_len=0)
    sa = k_ordered_suffix_array_device(text, fm.SORT_LEN)
    fmi.arrays = fm.build_index_device(text, sa, 4)
    fmi.n_rows = N + 1
    fmi._build_lookup()
    timing.sync(fmi.arrays)

    pats = bench.sample_patterns(text_host, bench.NQ, bench.QLEN)

    timed("counts() end-to-end (uint32 pull, async chunks)",
          lambda: fmi.counts(pats))
    timed("get_ranges() end-to-end (3x int32 pull)",
          lambda: fmi.get_ranges(pats))

    # ---- stats breakdown
    beg, end, _ = fm._ranges_chunked(fmi.arrays, pats, 0)
    timing.sync((beg, end))
    total = int(jnp.sum(end - beg))
    cap = 128
    while cap < total:
        cap *= 2
    print(f"total occ={total} cap={cap}", flush=True)

    def kernel_only():
        timing.sync(
            fm.batch_locate_stats_device(fmi.arrays, beg, end, 4, cap)
        )

    timed("batch_locate_stats_device kernel only", kernel_only)
    timed("batch_query_stats full", lambda: fmi.batch_query_stats(pats))


if __name__ == "__main__":
    main()
