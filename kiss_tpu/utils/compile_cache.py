"""Persistent XLA compilation cache.

Compiling the sort pipelines on the tunneled TPU takes minutes per
program; a persistent cache makes every process after the first start
hot (CLI invocations, benchmarks, the driver's bench run). Enabled by
the CLI and bench entry points; opt out with KISS_TPU_NO_CACHE=1 or
redirect with KISS_TPU_CACHE=<dir>.
"""

from __future__ import annotations

import os

_enabled = False


def enable() -> None:
    global _enabled
    if _enabled or os.environ.get("KISS_TPU_NO_CACHE"):
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
