"""Persistent XLA compilation cache (OPT-IN).

Compiling the sort pipelines on the tunneled TPU takes ~30-60 s per
program; a persistent cache would make every process after the first
start hot. However, on the tunneled TPU backend a process that READS a
cache entry written by an earlier process was observed to deadlock at
its first device operation (round 3: cold-cache runs complete,
warm-cache runs of the identical program hang forever in executable
deserialization; the hang also swallows plain transfers).

Round-5 re-test (experiments/results_cache_retest.md): the hang did
NOT reproduce across 5 consecutive cache-enabled processes, toy and
real CLI programs alike -- but warm-cache CLI invocations still cost
14-206 s wall at ~3 s CPU, because the per-process TUNNEL WARMUP
(~60-200 s first device round-trip) dominates and no compile cache
removes it. So the cache stays DISABLED unless KISS_TPU_CACHE_ENABLE=1
(historical hang + marginal benefit), and the supported low-latency
path is the long-lived ``kISS serve`` command (second query measured
sub-0.1 s). KISS_TPU_CACHE=<dir> still redirects the directory; if a
run ever hangs with the cache on, clear ~/.cache/kiss_tpu_xla and
unset the enable flag.
"""

from __future__ import annotations

import os

_enabled = False


def enable() -> None:
    global _enabled
    if _enabled or os.environ.get("KISS_TPU_NO_CACHE"):
        return
    if os.environ.get("KISS_TPU_CACHE_ENABLE") != "1":
        return
    import jax

    cache_dir = os.environ.get(
        "KISS_TPU_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "kiss_tpu_xla"
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
