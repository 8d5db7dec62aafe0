"""Micro-benchmarks grounding the Pallas sort design (dev tool).

Measures on the real TPU, at the bench scale (N=48.8M):
  - lax.sort wall time vs operand count (stable, u32 keys + i32 payload)
  - gather (rank[sa]) and scatter (.at[sa].set) throughput
  - argsort-then-gather vs multi-operand sort
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from kiss_tpu.utils import compile_cache, timing

compile_cache.enable()

N = 48_800_649


def timed(label, fn, *args, n=3):
    fn(*args)  # compile+warm
    best = min(
        (lambda t0: (timing.sync(fn(*args)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(n)
    )
    gb = 0
    print(f"{label:48s} {best:8.4f}s", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)

    @jax.jit
    def make():
        ks = jax.random.bits(jax.random.key(0), (9, N), dtype=jnp.uint32)
        pos = jnp.arange(N, dtype=jnp.int32)
        # random permutation on device: sort random keys, take payload
        _, perm = lax.sort((ks[8], pos), num_keys=1, is_stable=False)
        return list(jnp.unstack(ks)), pos, perm

    keys, pos, perm = make()
    vals = keys[0]
    timing.sync(perm)
    print("data ready", flush=True)

    for nk in (1, 2, 4, 8):
        f = jax.jit(
            lambda *ops, nk=nk: lax.sort(ops, num_keys=nk, is_stable=True)
        )
        timed(f"lax.sort stable {nk}k+pos", f, *keys[:nk], pos)

    f = jax.jit(lambda a, b: lax.sort((a, b), num_keys=1, is_stable=False))
    timed("lax.sort unstable 1k+payload", f, keys[0], pos)

    f = jax.jit(lambda k: lax.sort((k,), num_keys=1, is_stable=False))
    timed("lax.sort unstable 1k alone", f, keys[0])

    f = jax.jit(lambda v, p: v[p])
    timed("gather v[perm] (random)", f, vals, perm)

    f = jax.jit(lambda v, p: jnp.zeros_like(v).at[p].set(v))
    timed("scatter zeros.at[perm].set(v)", f, vals, perm)

    f = jax.jit(lambda v, p: jnp.take(v, p, indices_are_sorted=True))
    timed("gather v[iota] (sorted idx)", f, vals, pos)

    # sort once by 1 key, carry permutation, gather remaining operands
    def argsort_gather(k0, k1, k2, p):
        s = lax.sort((k0, p), num_keys=1, is_stable=True)
        return s[0], k1[s[1]], k2[s[1]], s[1]

    timed("1k sort + gather 2 operands", jax.jit(argsort_gather),
          keys[0], keys[1], keys[2], pos)


if __name__ == "__main__":
    main()
