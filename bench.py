"""Benchmark: k-ordered suffix sort throughput on real TPU hardware.

Headline metric mirrors the reference's flagship number: suffix_sort of a
drosophila-chr1_2-sized text (n = 48,800,648) at k = 256, which the
reference does in 0.4809 s on 24 CPU threads = ~101.5 Mbp/s
(reference: README.md:87-89; BASELINE.md). The bundled corpus is stripped
from the mirror, so we synthesize a genome-like text of the same length
(segments copied from an ancestral pool with ~1% mutations -- long
approximate repeats, the property that makes genomes hard to
suffix-sort).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

N = 48_800_648
K = 256
BASELINE_MBP_S = 48.800648 / 0.4809  # reference: README.md:87-89


def synth_genome(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    anc = rng.integers(0, 4, 1 << 22, dtype=np.int8)  # 4 Mbp ancestral pool
    out = np.empty(n, dtype=np.int8)
    pos = 0
    while pos < n:
        seg = min(int(rng.integers(5_000, 50_000)), n - pos)
        start = int(rng.integers(0, len(anc) - seg))
        chunk = anc[start : start + seg].copy()
        nmut = max(1, seg // 100)
        mi = rng.integers(0, seg, nmut)
        chunk[mi] = rng.integers(0, 4, nmut, dtype=np.int8)
        out[pos : pos + seg] = chunk
        pos += seg
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kiss_tpu.ops import pack
    from kiss_tpu.ops.suffix_sort import k_ordered_suffix_array_device

    text = jax.device_put(jnp.asarray(synth_genome(N)))

    def run():
        return k_ordered_suffix_array_device(text, K, pack.DNA)

    sa = jax.block_until_ready(run())  # compile + warm
    assert int(sa[0]) == N

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        times.append(time.perf_counter() - t0)
    best = min(times)
    mbps = N / 1e6 / best

    print(
        json.dumps(
            {
                "metric": "suffix_sort_throughput_drosophila_k256",
                "value": round(mbps, 3),
                "unit": "Mbp/s",
                "vs_baseline": round(mbps / BASELINE_MBP_S, 3),
            }
        )
    )
    print(
        f"# n={N} k={K} best={best:.4f}s times={[round(t, 4) for t in times]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
