"""Benchmark: all three reference workloads on real TPU hardware.

Headline metric mirrors the reference's flagship number: suffix_sort of a
drosophila-chr1_2-sized text (n = 48,800,648) at k = 256, which the
reference does in 0.4809 s on 24 CPU threads = ~101.5 Mbp/s
(reference: README.md:87-89; BASELINE.md). The bundled corpus is stripped
from the mirror, so we synthesize a text of the same length with
drosophila-like repeat structure: ~70% fresh sequence, ~25% segments
copied from earlier in the text with ~1% mutations (transposon-like
dispersed repeats), ~5% tandem repeats -- long approximate repeats are
exactly what makes real genomes hard to suffix-sort.

The other two workloads (reference: fmindex_build / batch fmindex_query,
include/command/fmindex_{build,query}.hpp) are measured on the same
corpus: device index build seconds (full-sort SA + BWT/occ/marks/SA
sample; the `.fmi` disk serialization is excluded -- on this tunneled
platform the host link runs at ~5-8 MB/s, which measures the tunnel,
not the machine), and 1M len-25 pattern counts per second end-to-end
(host patterns -> 2-bit packed transfer -> backward search -> per-query
uint32 counts pulled back to the host, chunk-overlapped), with the
count+locate checksum printed for conformance.

Timing covers the full device pipeline (host-driven rounds included);
the SA stays on device (a genome-scale device->host pull is not part of
the reference's measured suffix_sort either -- it keeps the SA in RAM).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"extra_metrics": [...]} -- the extra metrics carry the build/query
numbers in the same {metric, value, unit, vs_baseline} shape
(vs_baseline null where BASELINE.md has no reference number).
"""

import json
import sys
import time

import numpy as np

N = 48_800_648
K = 256
NQ = 1_000_000
QLEN = 25
BASELINE_MBP_S = 48.800648 / 0.4809  # reference: README.md:87-89


def synth_genome(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    out = np.empty(n, dtype=np.int8)
    pos = 0
    # seed the text with fresh sequence so early copies have a source
    boot = min(1 << 20, n)
    out[:boot] = rng.integers(0, 4, boot, dtype=np.int8)
    pos = boot
    while pos < n:
        r = rng.random()
        if r < 0.70 or pos < (1 << 21):
            seg = min(int(rng.integers(2_000, 30_000)), n - pos)
            out[pos : pos + seg] = rng.integers(0, 4, seg, dtype=np.int8)
        elif r < 0.95:
            # dispersed repeat: copy an earlier segment, ~1% mutations
            seg = min(int(rng.integers(500, 8_000)), n - pos, pos)
            start = int(rng.integers(0, pos - seg + 1))
            chunk = out[start : start + seg].copy()
            nmut = max(1, seg // 100)
            mi = rng.integers(0, seg, nmut)
            chunk[mi] = rng.integers(0, 4, nmut, dtype=np.int8)
            out[pos : pos + seg] = chunk
        else:
            # tandem repeat: short unit tiled
            unit = rng.integers(0, 4, int(rng.integers(2, 200)), dtype=np.int8)
            seg = min(int(rng.integers(200, 5_000)), n - pos)
            reps = -(-seg // len(unit))
            out[pos : pos + seg] = np.tile(unit, reps)[:seg]
        pos += seg
    return out


def sample_patterns(text: np.ndarray, nq: int, qlen: int,
                    seed: int = 7) -> np.ndarray:
    """90% patterns sampled from the text (hits), 10% random (mostly
    misses) -- the reference batch protocol samples real reads; misses
    exercise the early-stop path."""
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, len(text) - qlen, nq)
    idx = starts[:, None] + np.arange(qlen)[None, :]
    pats = text[idx]
    miss = rng.random(nq) < 0.10
    pats[miss] = rng.integers(0, 4, (int(miss.sum()), qlen), dtype=np.int8)
    return np.ascontiguousarray(pats, dtype=np.int8)


def bench_suffix_sort(text_dev) -> float:
    import jax  # noqa: F401

    from kiss_tpu.ops.suffix_sort import k_ordered_suffix_array_device
    from kiss_tpu.utils import timing

    def run():
        # single-dispatch jitted pipeline: one program, no host round
        # trips (the tunnel adds ~64ms per dispatch/sync)
        sa = k_ordered_suffix_array_device(text_dev, K)
        timing.sync(sa)
        return sa

    sa = run()  # compile + warm every capacity bucket
    assert int(sa[0]) == N

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"# suffix_sort n={N} k={K} best={best:.4f}s "
        f"times={[round(t, 4) for t in times]}",
        file=sys.stderr,
    )
    return best


def bench_fmindex(text_dev, text_host):
    """(build_seconds, counts_per_s, occ, checksum): device index build
    + end-to-end 1M-pattern count throughput + conformance stats."""
    from kiss_tpu.models import fm_index as fm
    from kiss_tpu.ops.suffix_sort import k_ordered_suffix_array_device
    from kiss_tpu.utils import timing

    def build():
        fmi = fm.FMIndex(sa_intv=4, lookup_len=0)
        sa = k_ordered_suffix_array_device(text_dev, fm.SORT_LEN)
        arrays = fm.build_index_device(text_dev, sa, fmi.sa_intv)
        fmi.arrays = arrays
        fmi.n_rows = N + 1
        fmi._build_lookup()
        timing.sync(fmi.arrays)
        return fmi

    fmi = build()  # compile
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        fmi = build()
        times.append(time.perf_counter() - t0)
    build_s = min(times)
    print(f"# fmindex_build times={[round(t, 4) for t in times]}",
          file=sys.stderr)

    pats = sample_patterns(text_host, NQ, QLEN)
    cnts = fmi.counts(pats)  # compile + warm
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        cnts = fmi.counts(pats)
        times.append(time.perf_counter() - t0)
    count_s = min(times)
    assert int(cnts.sum()) > 0
    print(f"# fmindex_query count-path times={[round(t, 4) for t in times]}",
          file=sys.stderr)

    # conformance stats over the full batch (count + locate + checksum,
    # the reference batch loop accumulators, fmindex_query.hpp:87-94);
    # run twice so the reported time is steady-state, not compile time
    # (the locate program compiles per capacity bucket)
    fmi.batch_query_stats(pats)
    t0 = time.perf_counter()
    occ, checksum = fmi.batch_query_stats(pats)
    stats_s = time.perf_counter() - t0
    print(
        f"# fmindex_query count+locate stats: occ={occ} "
        f"checksum={checksum} elapsed={stats_s:.4f}s",
        file=sys.stderr,
    )
    return build_s, NQ / count_s, stats_s, occ, checksum


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kiss_tpu.utils import compile_cache, timing

    compile_cache.enable()

    text_host = synth_genome(N)
    text_dev = jax.device_put(jnp.asarray(text_host))
    timing.sync(text_dev)

    best = bench_suffix_sort(text_dev)
    mbps = N / 1e6 / best
    build_s, counts_per_s, stats_s, occ, checksum = bench_fmindex(
        text_dev, text_host
    )

    extra = [
        {
            "metric": "fmindex_build_seconds_drosophila",
            "value": round(build_s, 3),
            "unit": "s",
            "vs_baseline": None,  # no reference build time in BASELINE.md
        },
        {
            "metric": "fmindex_query_1M_len25_counts_per_s",
            "value": round(counts_per_s, 1),
            "unit": "patterns/s",
            "vs_baseline": None,  # reference publishes no batch number
            "occ": int(occ),
            "checksum": int(checksum),
        },
        {
            # full reference batch-loop accumulators: count + locate +
            # Sum(positions) checksum for 1M patterns, end to end
            # (fmindex_query.hpp:87-94)
            "metric": "fmindex_query_1M_len25_stats_seconds",
            "value": round(stats_s, 3),
            "unit": "s",
            "vs_baseline": None,  # reference publishes no batch number
        },
    ]
    print(
        json.dumps(
            {
                "metric": "suffix_sort_throughput_drosophila_k256",
                "value": round(mbps, 3),
                "unit": "Mbp/s",
                "vs_baseline": round(mbps / BASELINE_MBP_S, 3),
                "extra_metrics": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
