"""Pallas viability + throughput micro-benchmarks for the sort kernel.

Measures on the real TPU:
  - streaming copy through VMEM tiles (HBM roofline check)
  - one bitonic compare-exchange stage over a (R,128) tile, 2 operands
  - full in-tile bitonic sort of (key, payload) per grid tile
  - in-kernel dynamic gather x[idx] viability and speed
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kiss_tpu.utils import compile_cache, timing

compile_cache.enable()

N = 48_800_649
LANES = 128


def timed(label, fn, *args, n=3):
    try:
        out = fn(*args)
        timing.sync(out)
    except Exception as e:  # noqa: BLE001
        print(f"{label:48s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        timing.sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:48s} {best*1e3:9.3f}ms", flush=True)
    return best


# --------------------------------------------------------------- copy kernel
def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.uint32(1)


def stream_copy(x, rows):
    ntiles = x.shape[0] // rows
    return pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)


# ------------------------------------------------- bitonic stage / full sort
def _cmpx(k, v, d, up_mask):
    """Compare-exchange flattened partners i, i^d on a (R,128) tile.

    d is a power of two < R*128. Partner exchange via reshape+flip of the
    paired axis; up_mask True where element should keep the min.
    """
    R, L = k.shape
    T = R * L
    kf = k.reshape(T // (2 * d), 2, d)
    vf = v.reshape(T // (2 * d), 2, d)
    ko = jnp.flip(kf, axis=1).reshape(R, L)
    vo = jnp.flip(vf, axis=1).reshape(R, L)
    lt = (k < ko) | ((k == ko) & (v < vo))
    take_self = jnp.where(up_mask, lt, ~lt)
    return (
        jnp.where(take_self, k, ko),
        jnp.where(take_self, v, vo),
    )


def bitonic_stage_kernel(k_ref, v_ref, ko_ref, vo_ref, *, d, stage_d):
    R, L = k_ref.shape
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) * L
        + jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    )
    asc = (idx & (2 * stage_d)) == 0  # direction per bitonic run
    keep_min = asc == ((idx & d) == 0)
    k, v = _cmpx(k_ref[:], v_ref[:], d, keep_min)
    ko_ref[:] = k
    vo_ref[:] = v


def one_stage(k, v, rows, d, stage_d):
    ntiles = k.shape[0] // rows
    kern = functools.partial(bitonic_stage_kernel, d=d, stage_d=stage_d)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(k, v)


def tile_sort_kernel(k_ref, v_ref, ko_ref, vo_ref):
    R, L = k_ref.shape
    T = R * L
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) * L
        + jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    )
    k, v = k_ref[:], v_ref[:]
    size = 2
    while size <= T:
        asc = (idx & size) == 0
        d = size // 2
        while d >= 1:
            keep_min = asc == ((idx & d) == 0)
            k, v = _cmpx(k, v, d, keep_min)
            d //= 2
        size *= 2
    ko_ref[:] = k
    vo_ref[:] = v


def tile_sort(k, v, rows):
    ntiles = k.shape[0] // rows
    return pl.pallas_call(
        tile_sort_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(k, v)


# --------------------------------------------------------- in-kernel gather
def gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = x_ref[idx_ref[:]]


def kernel_gather(x, idx, rows):
    ntiles = idx.shape[0] // rows
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, x.dtype),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full table
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x, idx)


def main():
    print("device:", jax.devices()[0], flush=True)
    ROWS = 2048  # 2048*128 = 256K elements/tile
    Np = (N // (ROWS * LANES)) * ROWS * LANES

    @jax.jit
    def make():
        k = jax.random.bits(jax.random.key(0), (Np,), dtype=jnp.uint32)
        v = jnp.arange(Np, dtype=jnp.int32)
        return k.reshape(-1, LANES), v.reshape(-1, LANES)

    k, v = make()
    timing.sync(k)
    gb = Np * 4 / 1e9
    print(f"N={Np} ({gb:.2f} GB/operand)", flush=True)

    t = timed("stream copy u32 (rows=2048)", jax.jit(
        lambda x: stream_copy(x, 2048)), k)
    if t:
        print(f"  -> {2 * gb / t:.0f} GB/s")

    t = timed("1 bitonic stage d=1 (2 ops)", jax.jit(
        lambda a, b: one_stage(a, b, 2048, 1, 1)), k, v)
    t = timed("1 bitonic stage d=128 (2 ops)", jax.jit(
        lambda a, b: one_stage(a, b, 2048, 128, 128)), k, v)
    t = timed("1 bitonic stage d=64k (2 ops)", jax.jit(
        lambda a, b: one_stage(a, b, 2048, 1 << 16, 1 << 16)), k, v)

    for rows in (256, 1024, 2048):
        t = timed(f"full tile sort {rows*128//1024}K (2 ops)", jax.jit(
            functools.partial(tile_sort, rows=rows)), k, v)
        if t:
            nst = (np.log2(rows * 128) * (np.log2(rows * 128) + 1)) / 2
            print(f"  -> {t*1e3:.1f}ms for {nst:.0f} stages "
                  f"({t*1e3/nst:.3f} ms/stage-equivalent)")

    # lax.sort baseline at same shape
    kf, vf = k.reshape(-1), v.reshape(-1)
    timed("lax.sort 1k+pos stable (baseline)", jax.jit(
        lambda a, b: lax.sort((a, b), num_keys=1, is_stable=True)), kf, vf)

    # in-kernel gather: table of 64K u32 in VMEM, random idx
    table = k.reshape(-1)[: 1 << 16]
    idx = (v % (1 << 16)).astype(jnp.int32)
    timed("in-kernel gather (64K table)", jax.jit(
        lambda t_, i_: kernel_gather(t_, i_, 2048)), table, idx)


if __name__ == "__main__":
    main()
