"""Round-2 query-path probes: is a row gather ([Q, F] from [T, F]) the
same cost as an element gather ([Q] from [T])? Decides whether fusing
occf + bwt word into one 5-wide table row halves LF-step gather count."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from kiss_tpu.utils import compile_cache, timing

compile_cache.enable()

T = 3_050_041  # occf rows for a 48.8M-text index
Q = 1_000_000


def timed(label, fn, *args, n=5):
    timing.sync(fn(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        timing.sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:56s} {best*1e3:9.3f}ms", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.key(0)
    tab1 = jax.random.bits(key, (T,), dtype=jnp.uint32)
    tab4 = jax.random.bits(key, (T, 4), dtype=jnp.uint32)
    tab5 = jax.random.bits(key, (T, 5), dtype=jnp.uint32)
    tab8 = jax.random.bits(key, (T, 8), dtype=jnp.uint32)
    idxs = jax.random.randint(jax.random.key(1), (Q,), 0, T, jnp.int32)
    timing.sync((tab8, idxs))

    timed("elem gather [Q] from [T]", jax.jit(lambda t, i: t[i]), tab1, idxs)
    timed("row gather [Q,4] from [T,4]", jax.jit(lambda t, i: t[i]), tab4, idxs)
    timed("row gather [Q,5] from [T,5]", jax.jit(lambda t, i: t[i]), tab5, idxs)
    timed("row gather [Q,8] from [T,8]", jax.jit(lambda t, i: t[i]), tab8, idxs)

    # 2 separate elem gathers vs one 2Q elem gather (beg+end batching)
    i2 = jnp.concatenate([idxs, idxs + 1])
    timed("two elem gathers [Q]+[Q]",
          jax.jit(lambda t, a: (t[a], t[a + 1])), tab1, idxs)
    timed("one elem gather [2Q]", jax.jit(lambda t, i: t[i]), tab1, i2)

    # one LF-step shape: gather row + one-hot select + popcount-ish math
    def lf_fused(t5, i, c):
        row = t5[i]
        sel = (row[:, :4] * (c[:, None] == jnp.arange(4, dtype=jnp.int32))
               .astype(jnp.uint32)).sum(axis=1)
        return sel + (row[:, 4] & 0xFF)

    c = (idxs % 4).astype(jnp.int32)
    timed("fused LF step (row gather + select)",
          jax.jit(lf_fused), tab5, idxs, c)

    def lf_twogather(t4, t1, i, c):
        sel = t4[i, c]
        return sel + (t1[i] & 0xFF)

    timed("current LF step (2 elem gathers)",
          jax.jit(lf_twogather), tab4, tab1, idxs, c)


if __name__ == "__main__":
    main()
