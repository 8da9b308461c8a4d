"""Batched-DMA Pallas row gather.

The amortization experiment the one-row-per-BlockSpec kernel
(ops/query_kernel.py) left open: issue G row copies per grid step with
manual ``make_async_copy``, double-buffered across grid steps, so the
scalar-core descriptor-issue cost amortizes against the transfers in
flight and the write-back overlaps the next group's DMA stream.

Mosaic notes (hard-won on a v5e through the remote compiler):

- a single Bloom row of a tiled 2-D ``[R, W]`` array is not DMA-able
  (single-sublane slice); the matrix is viewed flat ``[1, R*W]`` and a
  row is the lane-aligned block ``[0, r*W : (r+1)*W]`` — same trick as
  ops/query_kernel.py;
- a DMA *destination* must be a whole ref, not a sublane slice of a
  tiled VMEM buffer (``scratch.at[i]`` of an ``[G, W]`` scratch fails
  to compile); each in-flight copy therefore gets its own ``(1, W)``
  scratch buffer (2*G of them for the two pipeline slots).

Layout ceiling: XLA tiles HBM arrays in (8, 128) tiles, so a random
row read touches whole tiles either way; what this kernel can beat is
per-row *software* issue overhead, not the physical layout.

The wrapper ``dma_gather_rows`` is a drop-in ``jnp.take(axis=0)``
replacement used for measurement and as an alternative backend.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: scalar-prefetch budget for row indices per pallas_call (bytes)
_IDX_SMEM_BUDGET = 96 * 1024


def _kernel(idx_ref, hbm_ref, out_ref, *rest, G, W, n_steps):
    """Grid (n_steps,): gather rows [s*G, (s+1)*G) into the output
    block. rest = 2*G per-copy (1, W) scratch buffers + DMA semaphore
    array (2, G); slot s%2 holds this step's copies, slot (s+1)%2 is
    being filled for the next step."""
    scr = rest[:2 * G]
    sems = rest[2 * G]
    s = pl.program_id(0)
    parity = s % 2

    def copy(step, slot, i):
        # slot is a *static* int: scratch buffers are separate refs
        r = idx_ref[step * G + i]
        return pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds(r * W, W)],
            scr[slot * G + i],
            sems.at[slot, i])

    def start(step, slot):
        for i in range(G):
            copy(step, slot, i).start()

    @pl.when(s == 0)
    def _():
        start(0, 0)

    for nxt in (0, 1):
        @pl.when(jnp.logical_and(s + 1 < n_steps, (1 - parity) == nxt))
        def _(nxt=nxt):
            start(s + 1, nxt)

    for slot in (0, 1):
        @pl.when(parity == slot)
        def _(slot=slot):
            for i in range(G):
                copy(s, slot, i).wait()
                out_ref[pl.ds(i, 1), :] = scr[slot * G + i][...]


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def dma_gather_rows(matrix: jax.Array, rows: jax.Array,
                    group: int = 16, interpret: bool = False
                    ) -> jax.Array:
    """matrix u32 [R, W], rows i32 [N] -> u32 [N, W] (= matrix[rows]).

    N must be a multiple of `group` (a multiple of 8); pad with any
    valid row id (e.g. a zero row) and drop the padding at the caller.
    """
    N = rows.shape[0]
    R, W = matrix.shape
    G = group
    if N % G:
        raise ValueError(f"N={N} must be a multiple of group={G}")
    if G % 8:
        raise ValueError(f"group={G} must be a multiple of 8 sublanes")
    if W % 128:
        raise ValueError(f"W={W} must be a multiple of 128 lanes")
    if R * W >= 1 << 31:
        # flat-view offsets r*W are computed in int32 on the scalar core
        raise ValueError(f"matrix too large for the flat view: R*W = "
                         f"{R * W} >= 2^31")
    flat = matrix.reshape(1, R * W)

    per_call = max(G, _IDX_SMEM_BUDGET // 4 // G * G)
    outs = []
    calls = {}
    for n0 in range(0, N, per_call):
        n = min(per_call, N - n0)
        if n not in calls:
            n_steps = n // G
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_steps,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (G, W), lambda s, idx: (s, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=(
                    [pltpu.VMEM((1, W), jnp.uint32)
                     for _ in range(2 * G)]
                    + [pltpu.SemaphoreType.DMA((2, G))]),
            )
            calls[n] = pl.pallas_call(
                functools.partial(_kernel, G=G, W=W, n_steps=n_steps),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n, W), jnp.uint32),
                cost_estimate=pl.CostEstimate(
                    flops=0, bytes_accessed=2 * n * W * 4,
                    transcendentals=0),
                interpret=interpret,
            )
        idx = jax.lax.dynamic_slice_in_dim(rows, n0, n, axis=0)
        outs.append(calls[n](idx, flat))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
