"""Pallas TPU kernel: fused row-gather -> AND -> popcount-accumulate.

This is the framework's hottest loop — the TPU-native replacement for the
reference's SSE2 expansion tables (reference:
cobs/query/classic_search.cpp:279-307, 507-1022).

Why a hand-written kernel: the straightforward XLA formulation must
materialize each ANDed row as 32 int32 document lanes before the term
reduction — ~32x the VPU work of the data actually moved. This kernel
keeps the per-term work in *packed* uint32 form with a Harley-Seal
carry-save adder network:

- the signature matrix is viewed as ``[1, (R+1)*W]`` so one Bloom row is
  one lane-aligned block; the row gather is Pallas's pipelined BlockSpec
  DMA, with block indices taken from the scalar-prefetched row-index
  tensor (TPU tiling forbids single-sublane slices of a 2-D matrix, so
  the flat view is what makes a row-granular gather legal);
- each grid step consumes a group of 16 terms (16*num_hashes gathered
  row blocks), ANDs the hash rows, and reduces the 16 indicator planes
  with carry-save adders into persistent bit-plane counters
  ones/twos/fours/eights (+16/32/64/128 ripple) held in VMEM scratch;
- only once per 8 groups (128 terms) are the 8 planes expanded into the
  [32-lane, words] int32 score accumulator — the expensive unpack,
  amortized over 128 terms instead of paid per term.

Per term that is ~8 packed-vector ops versus ~100 for the naive
expansion.

Status: the production engine uses the XLA path (jnp.take gather +
packed Wallace-tree counting, cobs_tpu/query/engine.py) — measured
faster on hardware because XLA's native gather outruns row-granular
BlockSpec DMA, whose per-row issue cost dominates at 1.5 KB rows. This
kernel is kept as the fused single-pass alternative (bit-exact, tested
compiled and in interpret mode) and as the substrate for future
DMA-batching work.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 16          # terms per grid step (one carry-save block)
FLUSH_GROUPS = 8    # groups per plane flush => CHUNK = 128 terms
CHUNK = GROUP * FLUSH_GROUPS
#: scalar-prefetch budget for row indices per pallas_call (bytes)
_IDX_SMEM_BUDGET = 32 * 1024


def _csa(a, b, c):
    """Carry-save full adder on packed bit planes: 5 vector ops."""
    u = a ^ b
    return u ^ c, (a & b) | (u & c)


def _expand(plane, width):
    """u32 [1, W] bit plane -> i32 [32, W] per-document indicators."""
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (32, width), 0)
    return ((plane >> shifts) & jnp.uint32(1)).astype(jnp.int32)


def _query_kernel(idx_ref, *refs, num_hashes, width, n_groups):
    """Grid (B, P, n_groups); refs = 16*h matrix-row blocks [1, W],
    out_ref [1, 1, 32, W], planes scratch [8, W] u32.

    planes[k] holds bit 2^k of each document's in-flight term count;
    they are flushed into out_ref every FLUSH_GROUPS groups.
    """
    h = num_hashes
    mat_refs = refs[: GROUP * h]
    out_ref = refs[GROUP * h]
    planes = refs[GROUP * h + 1]
    g = pl.program_id(2)

    @pl.when(g == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        planes[...] = jnp.zeros_like(planes)

    def val(i):
        v = mat_refs[i * h][0, :]
        for j in range(1, h):
            v = v & mat_refs[i * h + j][0, :]
        return v.reshape(1, width)

    ones = planes[0:1, :]
    twos = planes[1:2, :]
    fours = planes[2:3, :]
    eights = planes[3:4, :]
    ones, t0 = _csa(ones, val(0), val(1))
    ones, t1 = _csa(ones, val(2), val(3))
    twos, f0 = _csa(twos, t0, t1)
    ones, t0 = _csa(ones, val(4), val(5))
    ones, t1 = _csa(ones, val(6), val(7))
    twos, f1 = _csa(twos, t0, t1)
    fours, e0 = _csa(fours, f0, f1)
    ones, t0 = _csa(ones, val(8), val(9))
    ones, t1 = _csa(ones, val(10), val(11))
    twos, f0 = _csa(twos, t0, t1)
    ones, t0 = _csa(ones, val(12), val(13))
    ones, t1 = _csa(ones, val(14), val(15))
    twos, f1 = _csa(twos, t0, t1)
    fours, e1 = _csa(fours, f0, f1)
    eights, s16 = _csa(eights, e0, e1)
    planes[0:1, :] = ones
    planes[1:2, :] = twos
    planes[2:3, :] = fours
    planes[3:4, :] = eights
    # ripple the sixteens plane through the higher counters
    c = planes[4:5, :]
    planes[4:5, :] = c ^ s16
    carry = c & s16
    c = planes[5:6, :]
    planes[5:6, :] = c ^ carry
    carry = c & carry
    c = planes[6:7, :]
    planes[6:7, :] = c ^ carry
    carry = c & carry
    planes[7:8, :] = planes[7:8, :] ^ carry  # <=128 terms: no carry out

    # flush: expand the 8 planes once per CHUNK terms (amortized unpack)
    last = g == n_groups - 1
    @pl.when(jnp.logical_or((g + 1) % FLUSH_GROUPS == 0, last))
    def _():
        acc = out_ref[0, 0]
        for k in range(8):
            acc = acc + (_expand(planes[k:k + 1, :], width) << k)
        out_ref[0, 0] = acc
        planes[...] = jnp.zeros_like(planes)


def _make_call(B, P, T, h, W, interpret):  # noqa: C901
    n_groups = T // GROUP
    kernel = functools.partial(
        _query_kernel, num_hashes=h, width=W, n_groups=n_groups)

    def mat_spec(i, j):
        # block index of (term g*16+i, hash j)'s Bloom row in the flat
        # [1, R1*W] matrix view: the row number itself. idx is
        # prefetched flat [B, T*h*P] (a 4-D scalar operand would get
        # its unit last dim padded to 128 lanes in SMEM).
        return pl.BlockSpec(
            (1, W),
            lambda b, p, g, idx, i=i, j=j:
                (0, idx[b, ((g * GROUP + i) * h + j) * P + p]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, P, n_groups),
        in_specs=[mat_spec(i, j) for i in range(GROUP) for j in range(h)],
        out_specs=pl.BlockSpec((1, 1, 32, W),
                               lambda b, p, g, idx: (b, p, 0, 0)),
        scratch_shapes=[pltpu.VMEM((8, W), jnp.uint32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, 32, W), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=B * P * T * 10 * W,
            bytes_accessed=B * P * T * h * W * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("num_hashes", "interpret"))
def gather_and_count_pallas(matrix: jax.Array, rows_idx: jax.Array,
                            num_hashes: int,
                            interpret: bool = False) -> jax.Array:
    """matrix u32 [R+1, W], rows_idx i32 [B, T, h, P] -> i32 [B, P*W*32].

    Drop-in replacement for the XLA `_gather_and_count` path (T must be
    a multiple of CHUNK=128; padding terms point at the zero row R).
    Scores are in document order (page-major, doc = word*32 + bit).

    Queries are processed in sub-batches sized to the scalar-prefetch
    SMEM budget for the row-index tensor.
    """
    B, T, h, P = rows_idx.shape
    R1, W = matrix.shape
    if T % CHUNK:
        raise ValueError(f"T={T} must be a multiple of {CHUNK}")
    flat = matrix.reshape(1, R1 * W)
    rows_flat = rows_idx.reshape(B, T * h * P)

    b_sub = max(1, _IDX_SMEM_BUDGET // (T * h * P * 4))
    b_sub = min(b_sub, B)
    outs = []
    calls = {}
    for b0 in range(0, B, b_sub):
        nb = min(b_sub, B - b0)
        if nb not in calls:
            calls[nb] = _make_call(nb, P, T, h, W, interpret)
        idx_slice = jax.lax.dynamic_slice_in_dim(
            rows_flat, b0, nb, axis=0)
        # one operand per (term-in-group, hash) spec — all the same
        # buffer; XLA passes aliases, no copies
        outs.append(calls[nb](idx_slice, *([flat] * (GROUP * h))))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    # [B, P, 32, W] -> doc order [B, P, W, 32] -> [B, P*W*32]
    return jnp.transpose(out, (0, 1, 3, 2)).reshape(B, -1)
