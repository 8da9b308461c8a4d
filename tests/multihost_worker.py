"""Worker for the 2-process jax.distributed validation (run by
test_multihost.py, one instance per simulated host).

Each process owns 4 virtual CPU devices; the global mesh spans 8
devices across both processes. The signature matrix is document-sharded
across the processes' devices and the golden query must come back exact
on every process.
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from cobs_tpu.parallel import distributed  # noqa: E402

distributed.initialize(coordinator_address=f"localhost:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from cobs_tpu.parallel.sharded import (  # noqa: E402
    assemble_scores,
    make_mesh,
    score_sharded,
)

# a deterministic synthetic index, built identically on both processes
rng = np.random.default_rng(7)
R, W = 257, 32          # 1024 documents over 8 shards (4 words each)
matrix_host = rng.integers(0, 1 << 32, size=(R + 1, W),
                           dtype=np.uint64).astype(np.uint32)
matrix_host[-1] = 0

mesh = make_mesh(n_batch=2, n_docs=4)
matrix = jax.device_put(matrix_host, NamedSharding(mesh, P(None, "docs")))

B, T, h = 4, 64, 2
rows_idx_host = rng.integers(0, R, size=(B, T, h, 1)).astype(np.int32)
rows_idx = jax.device_put(
    jnp.asarray(rows_idx_host),
    NamedSharding(mesh, P("batch", None, None, None)))

scores = score_sharded(mesh, matrix, rows_idx, h)
# reshard to fully-replicated so every process can fetch the whole
# result (shards on the other process are not addressable locally)
replicated = jax.jit(
    lambda x: x,
    out_shardings=NamedSharding(mesh, P(None, None, None, None)))(scores)
got = assemble_scores(jax.block_until_ready(replicated), W * 32)

# single-device truth computed locally
anded = matrix_host[rows_idx_host[:, :, 0, 0]]
for j in range(1, h):
    anded = anded & matrix_host[rows_idx_host[:, :, j, 0]]
bits = (anded[..., None] >> np.arange(32, dtype=np.uint32)) & 1
want = bits.sum(axis=1).reshape(B, -1).astype(np.int32)

np.testing.assert_array_equal(got, want)
print(f"process {pid}: multihost scores exact", flush=True)
