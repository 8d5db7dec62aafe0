"""Validate the windowed-refinement cost model: batched lax.sort of
(N/W, W) rows vs one global sort, at the bench scale."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from kiss_tpu.utils import compile_cache, timing

compile_cache.enable()

N = 48_800_649


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

    for W in (256, 512, 2048, 16384, 262144):
        M = (N // W) * W

        for nops in (3, 8):
            @jax.jit
            def f(key, W=W, M=M, nops=nops):
                ops = tuple(
                    jax.random.bits(key, (M // W, W), dtype=jnp.uint32)
                    for _ in range(nops)
                )
                out = lax.sort(ops, num_keys=nops, is_stable=False,
                               dimension=1)
                return out[0]

            timed(f"batched sort W={W} {nops} ops", f, jax.random.key(0))

    # global baseline
    @jax.jit
    def g(key):
        ops = tuple(
            jax.random.bits(key, (N,), dtype=jnp.uint32) for _ in range(8)
        )
        return lax.sort(ops, num_keys=8, is_stable=False)[0]

    timed("global sort 8 ops", g, jax.random.key(0))


if __name__ == "__main__":
    main()
