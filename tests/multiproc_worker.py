"""Worker for the multi-process distributed test (run via subprocess).

Each process hosts 2 virtual CPU devices; jax.distributed stitches them
into one 4-device runtime; the sharded sorter must produce the same SA
as a single process. Usage: python multiproc_worker.py <pid> <nproc> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from kiss_tpu.parallel import distributed  # noqa: E402

distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from kiss_tpu.parallel import dsort  # noqa: E402

info = distributed.process_info()
assert info["global_devices"] == 2 * nproc, info

mesh = distributed.global_mesh()
rng = np.random.default_rng(7)
text_np = rng.integers(0, 4, 4096).astype(np.int8)
text = jax.device_put(text_np, NamedSharding(mesh, P()))  # replicated

sa = dsort.sharded_k_ordered_suffix_array(mesh, text, 64)
from jax.experimental import multihost_utils  # noqa: E402

sa_full = multihost_utils.process_allgather(sa, tiled=True)
# single-controller expectation computed independently per process
from kiss_tpu.ops import pack  # noqa: E402
from kiss_tpu.ops.suffix_sort import _make_plan, _run_plan  # noqa: E402

plan = _make_plan(4096, 64, pack.DNA)
import jax.numpy as jnp  # noqa: E402

want = np.asarray(
    jax.jit(lambda t: _run_plan(t, plan, pack.DNA, jittable=True))(
        jnp.asarray(text_np)
    )
)
got = np.asarray(sa_full).reshape(-1)[: len(want)]
np.testing.assert_array_equal(got, want)
print(f"proc {pid}: OK", flush=True)
