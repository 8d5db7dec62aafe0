"""Does lax.sort cost scale with operand COUNT or operand BYTES?

Decides whether narrow (u8/u16) trailing operands are worth packing
tricks (dev tool; see ROADMAP "Measured platform facts").
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from bench import N
from kiss_tpu.utils import compile_cache, timing

compile_cache.enable()


def timed(label, fn, *args, n=3):
    timing.sync(fn(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        timing.sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:52s} {best*1e3:9.3f}ms", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)

    @jax.jit
    def make():
        ks = jax.random.bits(jax.random.key(1), (6, N), dtype=jnp.uint32)
        return list(jnp.unstack(ks))

    keys = make()
    timing.sync(keys[0])
    k8 = [k.astype(jnp.uint8) for k in keys]
    k16 = [k.astype(jnp.uint16) for k in keys]
    timing.sync(k8[0])
    timing.sync(k16[0])

    def sortn(*ops):
        return lax.sort(ops, num_keys=len(ops), is_stable=False)

    f = jax.jit(sortn)
    timed("sort 4x u32", f, *keys[:4])
    timed("sort 5x u32", f, *keys[:5])
    timed("sort 6x u32", f, *keys[:6])
    timed("sort 4x u32 + 1x u8", f, *keys[:4], k8[4])
    timed("sort 4x u32 + 1x u16", f, *keys[:4], k16[4])
    timed("sort 4x u32 + 2x u8", f, *keys[:4], k8[4], k8[5])
    timed("sort 5x u16", f, *k16[:5])
    timed("sort 5x u8", f, *k8[:5])

    # stable vs unstable at 5 ops (how much does the hidden iota cost?)
    g = jax.jit(lambda *ops: lax.sort(ops, num_keys=4, is_stable=True))
    timed("sort 4 keys +1 payload u32 STABLE", g, *keys[:5])


if __name__ == "__main__":
    main()
