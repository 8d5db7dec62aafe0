"""Unknowns for the packed-unstable redesign (dev tool).

  - unstable lax.sort scaling with operand count
  - gather cost vs output size (tail-refine viability)
  - post-seed active fraction on the bench corpus
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bench import N, synth_genome
from kiss_tpu.ops import pack
from kiss_tpu.ops import suffix_sort as ss
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
        ks = jax.random.bits(jax.random.key(1), (8, N), dtype=jnp.uint32)
        pos = jnp.arange(N, dtype=jnp.int32)
        return list(jnp.unstack(ks)), pos

    keys, pos = make()
    timing.sync(pos)

    for nk in (2, 3, 4, 8):
        f = jax.jit(
            lambda *ops, nk=nk: lax.sort(ops, num_keys=nk, is_stable=False)
        )
        timed(f"lax.sort UNSTABLE {nk} ops total-order", f, *keys[: nk - 1],
              pos)

    # gather scaling: out size m from a 48.8M table
    table = keys[0]
    for m in (1 << 20, 1 << 22, 1 << 24):
        idx = (keys[1][:m] % jnp.uint32(N)).astype(jnp.int32)
        timed(f"gather {m>>20}M from 48.8M table",
              jax.jit(lambda t, i: t[i]), table, idx)

    # active fraction after 32-char seed on the bench corpus
    text = jax.device_put(jnp.asarray(synth_genome(N - 1)))
    timing.sync(text)

    @jax.jit
    def active_after_seed(text):
        sa, rank, done = ss._seed_sort._fun(text, 32, pack.DNA, True)
        key_sorted = rank[sa]
        neq = ss._neq_adjacent((key_sorted,))
        nxt = jnp.concatenate([neq[1:], jnp.ones(1, bool)])
        active = ~(neq & nxt)
        return jnp.sum(active, dtype=jnp.int32)

    try:
        a = int(active_after_seed(text))
    except Exception:
        # fall back: call the jitted public pieces
        sa, rank, done = ss._seed_sort(text, 32, pack.DNA, True)
        active, a_dev = ss._active_rows_of(sa, rank)
        a = int(a_dev)
    print(f"active after 32-char seed: {a} / {N} = {a/N:.3%}")

    # also: how many remain after 64 chars (2 levels)?
    @jax.jit
    def active_after(text, cover_chars):
        words = pack.suffix_key_words(text, cover_chars, 0, pack.DNA)
        posn = jnp.arange(text.shape[0] + 1, dtype=jnp.int32)
        ops = lax.sort(tuple(words) + (posn,), num_keys=len(words),
                       is_stable=True)
        neq = ss._neq_adjacent(ops[:-1])
        nxt = jnp.concatenate([neq[1:], jnp.ones(1, bool)])
        return jnp.sum(~(neq & nxt), dtype=jnp.int32)

    for chars in (16, 64):
        a = int(active_after(text, chars))
        print(f"active after {chars}-char prefix: {a} = {a/N:.3%}",
              flush=True)


if __name__ == "__main__":
    main()
