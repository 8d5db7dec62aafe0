"""Round-3 probes: where do fmindex_build's 3.38 s and the 1M-count
path's 3.5 s actually go?  Stages timed separately on the real chip:
build = full-sort SA + build_index_device + lookup; count = host pack +
transfer + device search (chunked vs one dispatch).  Uses the bench
corpus generator so numbers line up with BENCH_r03."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from kiss_tpu.models import fm_index as fm
from kiss_tpu.ops.suffix_sort import k_ordered_suffix_array_device
from kiss_tpu.ops.pack import np_pack_queries_2bit
from kiss_tpu.utils import timing

N = bench.N


def timed(label, fn, n=3):
    fn()  # compile/warm
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

    print(f"SORT_LEN={fm.SORT_LEN}", flush=True)
    sa_holder = {}

    def do_sort():
        sa = k_ordered_suffix_array_device(text, fm.SORT_LEN)
        timing.sync(sa)
        sa_holder["sa"] = sa

    timed("full-sort SA (SORT_LEN)", do_sort)
    sa = sa_holder["sa"]

    def do_sort256():
        timing.sync(k_ordered_suffix_array_device(text, 256))

    timed("k=256 SA (headline)", do_sort256)

    arrays_holder = {}

    def do_build():
        a = fm.build_index_device(text, sa, 4)
        timing.sync(a)
        arrays_holder["a"] = a

    timed("build_index_device(sa_intv=4)", do_build)
    arrays = arrays_holder["a"]

    # ---- count path ----
    pats = bench.sample_patterns(text_host, bench.NQ, bench.QLEN)

    def pack_only():
        np_pack_queries_2bit(pats)

    timed("host 2-bit pack (1M x 25)", pack_only, n=2)
    qwords = np_pack_queries_2bit(pats)

    def transfer_only():
        timing.sync(jax.device_put(qwords))

    timed("host->device transfer (8 MB packed)", transfer_only, n=2)
    qdev = jax.device_put(qwords)
    timing.sync(qdev)

    def search_1shot():
        timing.sync(
            fm.get_range_packed_device(arrays, qdev, bench.QLEN, 0)
        )

    timed("device search, ONE dispatch of 1M", search_1shot)

    def search_chunked():
        parts = [
            qdev[i : i + fm._Q_CHUNK]
            for i in range(0, bench.NQ, fm._Q_CHUNK)
        ]
        outs = [
            fm.get_range_packed_device(arrays, p, bench.QLEN, 0)
            for p in parts
        ]
        timing.sync(outs)

    timed("device search, 4 chunks of 256k", search_chunked)

    def end_to_end():
        beg, end, _ = fm._ranges_chunked(arrays, pats, 0)
        timing.sync((beg, end))

    timed("end-to-end _ranges_chunked (pack+ship+search)", end_to_end)


if __name__ == "__main__":
    main()
