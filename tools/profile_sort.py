"""Per-stage TPU profiling of the k-ordered sorter (dev tool).

Times the seed sort and each rank-block round separately (forced syncs
between stages) and reports the resolved fraction after the seed.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import N, synth_genome
from kiss_tpu.ops import pack
from kiss_tpu.ops import suffix_sort as ss
from kiss_tpu.utils import timing

K = 256


def timed(label, fn, *args, **kw):
    out = fn(*args, **kw)
    timing.sync(out)
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    timing.sync(out)
    print(f"{label:40s} {time.perf_counter() - t0:7.4f}s", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N
    k = int(sys.argv[2]) if len(sys.argv) > 2 else K
    text = jax.device_put(jnp.asarray(synth_genome(n)))
    timing.sync(text)
    plan = ss._make_plan(n, ss._normalize_k(k), pack.DNA)
    print("plan:", plan)

    sa, rank, done = timed(
        "seed_sort", ss._seed_sort, text, plan.seed_chars, pack.DNA,
        len(plan.rounds) > 0,
    )
    print(f"done after seed: {bool(done)}")
    ranks = {plan.seed_chars: rank}
    for i, rnd in enumerate(plan.rounds):
        if bool(done):
            print("early exit")
            break
        need_rank = (i < len(plan.rounds) - 1) or plan.unbounded
        level_ids = tuple(sorted(ranks))
        sa, rank, done = timed(
            f"round {i}: {len(rnd.rank_keys)} rank keys + "
            f"{rnd.tail_chars}ch tail -> cover {rnd.new_cover}",
            ss._rank_block_sort,
            text, tuple(ranks[lv] for lv in level_ids), level_ids,
            rnd.rank_keys, rnd.tail_chars, rnd.tail_offset, pack.DNA,
            need_rank,
        )
        if need_rank:
            ranks[rnd.new_cover] = rank


if __name__ == "__main__":
    main()
