"""Why is a trivial Pallas streaming copy slow? Test variants."""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kiss_tpu.utils import compile_cache, timing

compile_cache.enable()

N = 48_758_784
LANES = 128


def timed(label, fn, *args, n=3):
    try:
        out = fn(*args)
        timing.sync(out)
    except Exception as e:  # noqa: BLE001
        print(f"{label:52s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        timing.sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    gbs = N * 4 * 2 / 1e9 / best
    print(f"{label:52s} {best*1e3:9.3f}ms  {gbs:7.1f} GB/s", flush=True)
    return best


def kern(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def copy_grid(x, rows, semantics=None):
    ntiles = x.shape[0] // rows
    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,)
        )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        **params,
    )(x)


def copy_2d(x, rows):
    # 2D layout: (tiles, rows*128) with last dim blocked
    ntiles = x.shape[0] // rows
    x2 = x.reshape(ntiles, rows * LANES)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((1, rows * LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows * LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2)


def main():
    print("device:", jax.devices()[0], flush=True)
    x = jax.random.bits(jax.random.key(0), (N,), dtype=jnp.uint32)
    x = x.reshape(-1, LANES)
    timing.sync(x)

    timed("xla copy (x+1)", jax.jit(lambda a: a + 1), x)
    for rows in (512, 2048, 8192, 32768):
        timed(f"pallas grid copy rows={rows}",
              jax.jit(functools.partial(copy_grid, rows=rows)), x)
    timed("pallas grid copy rows=2048 parallel",
          jax.jit(functools.partial(copy_grid, rows=2048,
                                    semantics="parallel")), x)
    timed("pallas grid copy rows=2048 arbitrary",
          jax.jit(functools.partial(copy_grid, rows=2048,
                                    semantics="arbitrary")), x)
    timed("pallas 2d copy rows=2048",
          jax.jit(functools.partial(copy_2d, rows=2048)), x)

    # compute-heavy kernel to see VPU rate: 64 fused ops per element
    def heavy(x_ref, o_ref):
        v = x_ref[:]
        for _ in range(64):
            v = v * jnp.uint32(2654435761) + jnp.uint32(12345)
        o_ref[:] = v

    def run_heavy(x, rows):
        ntiles = x.shape[0] // rows
        return pl.pallas_call(
            heavy,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(ntiles,),
            in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    t = timed("pallas heavy x128ops rows=2048",
              jax.jit(functools.partial(run_heavy, rows=2048)), x)
    if t:
        print(f"  -> {N * 128 / t / 1e12:.2f} Tops/s (u32 mul+add)")


if __name__ == "__main__":
    main()
