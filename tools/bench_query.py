"""TPU benchmark: FM-index build + batch query throughput (dev tool).

Reference comparison point: batch fmindex_query accumulates search time
over patterns read from a binary file and reports occ + checksum
(reference: include/command/fmindex_query.hpp:66-99). Here: build the
index for the bench corpus on device, then time batched count+locate.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import synth_genome
from kiss_tpu.models.fm_index import FMIndex
from kiss_tpu.utils import compile_cache, timing

compile_cache.enable()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48_800_648
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    qlen = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    lookup_len = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    text = synth_genome(n)
    rng = np.random.default_rng(1)
    starts = rng.integers(0, n - qlen, q)
    queries = text[starts[:, None] + np.arange(qlen)[None, :]]

    t0 = time.perf_counter()
    fmi = FMIndex(sa_intv=4, lookup_len=lookup_len).build(text)
    timing.sync(fmi.arrays)
    print(f"build: {time.perf_counter() - t0:.2f}s (incl. compile)", flush=True)

    # count-only, queries already device-resident (compute cost)
    from kiss_tpu.models.fm_index import get_range_device

    qd = jax.device_put(jnp.asarray(queries))
    timing.sync(qd)
    out = get_range_device(fmi.arrays, qd, fmi.lookup_len)  # warm/compile
    timing.sync(out)
    t0 = time.perf_counter()
    out = get_range_device(fmi.arrays, qd, fmi.lookup_len)
    timing.sync(out)
    dt = time.perf_counter() - t0
    print(f"count (device-resident): {q / dt / 1e6:.2f} Mq/s  "
          f"({dt:.3f}s for {q})", flush=True)
    t0 = time.perf_counter()
    beg, end, _ = fmi.get_ranges(queries)
    dt = time.perf_counter() - t0
    print(f"count (incl host->device): {q / dt / 1e6:.2f} Mq/s  "
          f"({dt:.3f}s)", flush=True)

    # count + locate + checksum, device-side reductions (the CLI batch
    # path)
    occ, checksum = fmi.batch_query_stats(queries)  # warm
    t0 = time.perf_counter()
    occ, checksum = fmi.batch_query_stats(queries)
    dt = time.perf_counter() - t0
    print(
        f"stats: {q / dt / 1e6:.2f} Mq/s  ({dt:.3f}s, {occ} locations, "
        f"checksum {checksum})",
        flush=True,
    )


if __name__ == "__main__":
    main()
