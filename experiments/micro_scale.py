"""Round-2 probes: sort cost vs N / operand width / key count, and
gather-scatter rates at several sizes. Grounds the decision whether any
compaction or sampling scheme can beat the flat wide-sort pipeline."""

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
    timing.sync(fn(*args))  # compile+warm
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        timing.sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:56s} {best:8.4f}s", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)

    @jax.jit
    def make():
        ks = jax.random.bits(jax.random.key(0), (6, N), dtype=jnp.uint32)
        pos = jnp.arange(N, dtype=jnp.int32)
        _, perm = lax.sort((ks[5], pos), num_keys=1, is_stable=False)
        return list(jnp.unstack(ks)), pos, perm

    keys, pos, perm = make()
    timing.sync(perm)
    print("data ready", flush=True)

    # 1. sort cost vs N at fixed 5 u32 operands (the seed-sort shape)
    for frac in (1, 2, 4, 8, 16):
        m = N // frac
        ops = [k[:m] for k in keys[:5]]
        f = jax.jit(lambda *o: lax.sort(o, num_keys=5, is_stable=False))
        timed(f"sort unstable 5xu32 N/{frac} ({m/1e6:.1f}M)", f, *ops)

    # 2. u16 operands: does operand width matter or only count?
    k16 = [(k >> 16).astype(jnp.uint16) for k in keys[:5]]
    f = jax.jit(lambda *o: lax.sort(o, num_keys=5, is_stable=False))
    timed("sort unstable 5xu16 full N", f, *k16)
    f = jax.jit(lambda *o: lax.sort(o, num_keys=2, is_stable=False))
    timed("sort unstable 2xu32 full N", f, *keys[:2])
    mixed = (keys[0], k16[1], k16[2])
    f = jax.jit(lambda *o: lax.sort(o, num_keys=3, is_stable=False))
    timed("sort unstable u32+2xu16 full N", f, *mixed)

    # 3. keys vs payload: 2 keys + 3 payload vs 5 keys
    f = jax.jit(lambda *o: lax.sort(o, num_keys=5, is_stable=False))
    timed("sort unstable 5 keys 0 payload", f, *keys[:5])
    f = jax.jit(lambda *o: lax.sort(o, num_keys=2, is_stable=False))
    timed("sort unstable 2 keys 3 payload", f, *keys[:5])

    # 4. gather at several output sizes from a full-N table
    for frac in (1, 4, 16, 64):
        m = N // frac
        f = jax.jit(lambda v, p, m=m: v[p[:m]])
        timed(f"gather N-table -> {m/1e6:.1f}M out", f, keys[0], perm)

    # 5. scatter m values into an N-array
    for frac in (4, 16, 64):
        m = N // frac
        f = jax.jit(
            lambda v, p, m=m: jnp.zeros_like(v).at[p[:m]].set(v[:m])
        )
        timed(f"scatter {m/1e6:.1f}M into N", f, keys[0], perm)
    f = jax.jit(
        lambda v, p: v.at[p[: N // 16]].set(jnp.uint32(1))
    )
    timed("scatter-update 3.1M into donated N", f, keys[0], perm)

    # 6. nonzero-compact at full N (the active-set extraction cost)
    f = jax.jit(
        lambda v: jnp.nonzero(v > jnp.uint32(0xF0000000), size=N // 8,
                              fill_value=0)[0]
    )
    timed("nonzero(size=N/8) over full N", f, keys[0])


if __name__ == "__main__":
    main()
