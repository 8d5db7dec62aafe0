"""Per-stage TPU profiling of the k-ordered sorter (dev tool).

Runs the host-driven pipeline with a forced sync between stages so each
stage's device time is attributable, and reports active-set sizes per
round -- the data that decides where kernel work (Pallas) pays off.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import N, synth_genome
from kiss_tpu.ops import pack
from kiss_tpu.ops import suffix_sort as ss
from kiss_tpu.utils import timing

K = 256


def t(label, fn, *args, **kw):
    out = fn(*args, **kw)
    timing.sync(out)
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    timing.sync(out)
    print(f"{label:28s} {time.perf_counter() - t0:7.4f}s", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N
    text = jax.device_put(jnp.asarray(synth_genome(n)))
    timing.sync(text)
    plan = ss._make_plan(n, K, pack.DNA)
    print("plan:", plan)

    sa, rank, active, m_dev = t(
        "seed_sort(32ch)", ss._seed_sort, text, plan.seed_chars, pack.DNA
    )
    m = int(m_dev)
    print(f"active after seed: {m} ({100 * m / (n + 1):.1f}%)")

    cap = ss._next_capacity(m, n + 1)
    rows = t("compact_rows", ss._compact_rows, active, cap)
    cover = plan.seed_chars
    for r in range(plan.doublings):
        if m == 0:
            break
        ncap = ss._next_capacity(m, n + 1)
        if ncap < rows.shape[0]:
            rows = rows[:ncap]
        # donation invalidates inputs; keep copies for the timed re-run
        sa2, rank2, rows2, m_dev = ss._refine_round(
            jnp.copy(sa), jnp.copy(rank), rows, jnp.int32(cover)
        )
        timing.sync(rows2)
        t0 = time.perf_counter()
        sa, rank, rows, m_dev = ss._refine_round(sa, rank, rows, jnp.int32(cover))
        timing.sync(rows)
        dt = time.perf_counter() - t0
        m = int(m_dev)
        print(
            f"refine r{r} cover={cover:3d} cap={ncap:>9}   {dt:7.4f}s"
            f"  -> active {m} ({100 * m / (n + 1):.1f}%)",
            flush=True,
        )
        cover *= 2


if __name__ == "__main__":
    main()
