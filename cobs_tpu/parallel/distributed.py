"""Multi-host deployment: process-group init + global mesh.

The reference is strictly single-node (pthread pool + mmap, no network
layer — reference: cobs/util/parallel_for.hpp:24-63); scaling beyond one
host is a capability this framework introduces. The recipe:

1. every host calls :func:`initialize` (JAX's distributed runtime —
   coordinator handshake, global device visibility);
2. :func:`global_mesh` builds the ("batch", "docs") mesh over ALL
   devices in the job; the signature matrix is sharded on "docs" with
   `NamedSharding`, so each host's chips hold their documents' columns
   in HBM and XLA places the (single, tiny) score assembly all-gather
   on ICI within a slice / DCN across slices;
3. construction stays host-local: each host builds the classic batches
   for its own document range (the batch files double as checkpoints,
   reference: cobs/construction/classic_index.cpp:173-174), and the
   per-host sub-indices federate at query time exactly like the
   reference's multi-index search.

Queries are broadcast (replicated spec) — they are KB-scale against a
GB-scale matrix, so replication is the right trade.
"""

import jax

from cobs_tpu.parallel.sharded import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime (no-op if single-process).

    Mirrors `jax.distributed.initialize`; on TPU pods the arguments are
    auto-detected from the environment and may be omitted.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def global_mesh(n_batch: int = 1):
    """("batch", "docs") mesh over every device in the (multi-host) job.

    Use the result as `Search(..., mesh=global_mesh())` — the identical
    shard_map program runs single-host and multi-host.
    """
    return make_mesh(n_batch=n_batch, devices=jax.devices())


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()
