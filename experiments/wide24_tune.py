"""Focused (Bs, tc) tune at the 24 KB-row shape (sig=2^17, W=6144).

width_sweep.py (post batch-tiling) measured this shape at 84 GB/s e2e
while its neighbors reached 118 (6 KB) and 140 (96 KB) — all three run
the same ~34 MB fused chunk under the production planner, so either the
planner's (Bs=4, tc=342) choice is off for this aspect ratio or the
gather itself dips here. Variants:

  gather      - jnp.take + u32 fold, no count (the shape's ceiling)
  BsX/tcY     - the production _gather_count_block over explicit
                sub-batches: lax.map over B//X sub-batches, term axis
                scanned in Y-term chunks

Protocol (CLAUDE.md): differenced lax.scan lengths, round-robin over
variants x ROUNDS, per-variant best. Run on the real chip, idle host.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from cobs_tpu.query.engine import _bucket, _gather_count_block

B, T, H = 64, 1000, 1
T_PAD = _bucket(T)
ROUNDS = 4
LG_SIG, W = 17, 6144           # 24 KB rows, ~196k docs
GRID = []


def make_scan(step):
    @jax.jit
    def multi(m, idxs):
        def body(c, idx):
            return c, step(m, idx)
        return lax.scan(body, 0, idxs)[1]
    return multi


def gather_step_fold(m, idx):
    rows = idx[..., 0, 0]                       # [B, T_PAD]
    g = jnp.take(m, rows, axis=0)               # [B, T_PAD, W]
    # cheap data-dependent fold (sum), forces the full gather
    return jnp.sum(g, axis=(1, 2), dtype=jnp.uint32).astype(jnp.int32)


def prod_step(m, idx):
    # the production planner's end-to-end path (joint (Bs, tc) plan)
    from cobs_tpu.query.engine import _gather_and_count
    return _gather_and_count(m, idx, H).sum(axis=1).astype(jnp.int32)


def block_step(Bs, tc):
    def step(m, idx):
        # pad T to a multiple of tc with the zero row
        pad = (-T_PAD) % tc
        if pad:
            idx = jnp.concatenate([
                idx, jnp.full((B, pad, H, 1), m.shape[0] - 1,
                              jnp.int32)], axis=1)
        sub = idx.reshape(B // Bs, Bs, T_PAD + pad, H, 1)
        out = lax.map(
            lambda rs: _gather_count_block(m, rs, H, tc), sub)
        return out.reshape(B, -1).sum(axis=1)
    return step


def gather_tiled_step(Bs, tc):
    """Gather-only with the SAME (lax.map over blocks, scan over term
    chunks) loop structure as the production tile plan: separates
    'count not hidden' from 'gather degraded by the loop structure'."""
    def step(m, idx):
        pad = (-T_PAD) % tc
        if pad:
            idx = jnp.concatenate([
                idx, jnp.full((B, pad, H, 1), m.shape[0] - 1,
                              jnp.int32)], axis=1)
        sub = idx[..., 0, 0].reshape(B // Bs, Bs, (T_PAD + pad) // tc,
                                     tc)

        def per_block(rs):
            def cbody(acc, rc):
                g = jnp.take(m, rc, axis=0)         # [Bs, tc, W]
                return acc + jnp.sum(
                    g, axis=1, dtype=jnp.uint32), None
            acc0 = jnp.zeros((Bs, m.shape[1]), jnp.uint32)
            return lax.scan(cbody, acc0,
                            jnp.moveaxis(rs, 1, 0))[0]

        out = lax.map(per_block, sub)
        return out.reshape(B, -1).sum(axis=1).astype(jnp.int32)
    return step


def flat_step(Bs, tc):
    """ONE scan over all (block, chunk) steps instead of a map-of-
    scans: XLA software-pipelines a single loop, so the per-block
    pipeline bubbles (first chunk's gather not overlapped, last
    chunk's count exposed — ~2 of ~5 chunks per block at this shape)
    disappear; the cost is accumulating into a [B, P*W*32] carry via
    a dynamic batch-slice add each step."""
    from cobs_tpu.query.engine import _gather_count_once

    def step(m, idx):
        pad = (-T_PAD) % tc
        if pad:
            idx = jnp.concatenate([
                idx, jnp.full((B, pad, H, 1), m.shape[0] - 1,
                              jnp.int32)], axis=1)
        Tp = T_PAD + pad
        nb, nc = B // Bs, Tp // tc
        # step order: block-major (all chunks of block 0, then 1, ...)
        sub = (idx.reshape(nb, Bs, nc, tc, H, 1)
               .transpose(0, 2, 1, 3, 4, 5)
               .reshape(nb * nc, Bs, tc, H, 1))
        W = m.shape[1]

        def body(acc, xs):
            i, rc = xs
            cnt = _gather_count_once(m, rc, H).reshape(Bs, -1)
            return lax.dynamic_update_slice(
                acc, lax.dynamic_slice(
                    acc, (i * Bs, 0), (Bs, W * 32)) + cnt,
                (i * Bs, 0)), None

        blk = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), nc)
        acc0 = jnp.zeros((B, W * 32), jnp.int32)
        out, _ = lax.scan(body, acc0, (blk, sub))
        return out.sum(axis=1)
    return step


def pipe_step(Bs, tc):
    """Software-pipelined block: the scan body gathers chunk i+1's
    rows while counting chunk i's already-gathered block — an explicit
    data-independence the compiler can schedule as DMA || VPU. The
    plain fused body measured ~zero overlap at wide rows (prod =
    gather + count serially)."""
    from cobs_tpu.query.engine import _count_csa

    def step(m, idx):
        pad = (-T_PAD) % tc
        if pad:
            idx = jnp.concatenate([
                idx, jnp.full((B, pad, H, 1), m.shape[0] - 1,
                              jnp.int32)], axis=1)
        Tp = T_PAD + pad
        W = m.shape[1]

        def per_block(rs):                     # rs [Bs, Tp, H, 1]
            rows = rs[..., 0, 0].reshape(Bs, Tp // tc, tc)
            chunks = jnp.moveaxis(rows, 1, 0)  # [nc, Bs, tc]

            def body(carry, idx_next):
                acc, g_prev = carry
                g_next = jnp.take(m, idx_next, axis=0)  # DMA next
                acc = acc + _count_csa(
                    g_prev[:, :, None, :])              # VPU prev
                return (acc, g_next), None

            g0 = jnp.take(m, chunks[0], axis=0)
            acc0 = jnp.zeros((Bs, 1, W, 32), jnp.int32)
            (acc, g_last), _ = lax.scan(body, (acc0, g0), chunks[1:])
            acc = acc + _count_csa(g_last[:, :, None, :])
            return acc

        out = lax.map(per_block, idx.reshape(B // Bs, Bs, Tp, H, 1))
        return out.reshape(B, -1).sum(axis=1)
    return step


def planes_step(Bs, tc):
    """Chunk-scan whose CARRY is the packed plane accumulator: each
    chunk's tree stops at one plane per weight and ripple-adds into
    the carried planes; ONE expansion after the scan. Cuts the
    per-chunk i32 expansion write + [*, W, 32] accumulator RW (the
    count-side HBM traffic) to ~L planes of u32. (Productionized as
    engine._gather_count_block planes_acc — the helpers are imported
    from there so the benchmark measures the shipped code.)"""
    from cobs_tpu.query.engine import (_bitplane_add, _csa_to_planes,
                                       _expand32)

    def step(m, idx):
        pad = (-T_PAD) % tc
        if pad:
            idx = jnp.concatenate([
                idx, jnp.full((B, pad, H, 1), m.shape[0] - 1,
                              jnp.int32)], axis=1)
        Tp = T_PAD + pad
        W = m.shape[1]
        L = Tp.bit_length() + 1

        def per_block(rs):
            rows = rs[..., 0, 0].reshape(Bs, Tp // tc, tc)
            chunks = jnp.moveaxis(rows, 1, 0)

            def body(acc, rc):
                g = jnp.take(m, rc, axis=0)             # [Bs, tc, W]
                planes = _csa_to_planes(g, L)
                return _bitplane_add(acc, planes), None

            acc0 = jnp.zeros((L, Bs, W), jnp.uint32)
            acc, _ = lax.scan(body, acc0, chunks)
            total = jnp.zeros((Bs, W, 32), jnp.int32)
            for k in range(L):
                total = total + (_expand32(acc[k]) << k)
            return total

        out = lax.map(per_block, idx.reshape(B // Bs, Bs, Tp, H, 1))
        return out.reshape(B, -1).sum(axis=1)
    return step


def main():
    dev = jax.devices()[0]
    sig = 1 << LG_SIG
    print(f"wide24_tune: {dev.device_kind} sig={sig} W={W} "
          f"B={B} T={T}->{T_PAD}", flush=True)
    rng = np.random.default_rng(0xC0B5)
    matrix = jax.jit(lambda k: jax.random.bits(
        k, (sig + 1, W), dtype=jnp.uint32).at[-1].set(0))(
        jax.random.key(7))
    jax.block_until_ready(matrix)

    def make(K):
        return jnp.asarray(rng.integers(
            0, sig, size=(K, B, T_PAD),
            dtype=np.int64).astype(np.int32)[..., None, None])

    k_small, k_large = 2, 6
    idxs_s, idxs_l = make(k_small), make(k_large)
    iters = k_large - k_small

    # rows actually gathered per query: block variants pad T_PAD up to
    # a multiple of tc with zero rows, which still cost full HBM time
    variants = {"gather": (make_scan(gather_step_fold), T_PAD),
                "prod": (make_scan(prod_step), T_PAD + (-T_PAD) % 256)}
    for Bs, tc in [(8, 256), (8, 512), (16, 256), (8, 128), (4, 512)]:
        variants[f"planes{Bs}/{tc}"] = (
            make_scan(planes_step(Bs, tc)), T_PAD + (-T_PAD) % tc)
    for Bs, tc in GRID:
        variants[f"Bs{Bs}/tc{tc}"] = (
            make_scan(block_step(Bs, tc)), T_PAD + (-T_PAD) % tc)
        variants[f"gtile{Bs}/{tc}"] = (
            make_scan(gather_tiled_step(Bs, tc)),
            T_PAD + (-T_PAD) % tc)
        variants[f"flat{Bs}/{tc}"] = (
            make_scan(flat_step(Bs, tc)), T_PAD + (-T_PAD) % tc)
        variants[f"pipe{Bs}/{tc}"] = (
            make_scan(pipe_step(Bs, tc)), T_PAD + (-T_PAD) % tc)
        variants[f"planes{Bs}/{tc}"] = (
            make_scan(planes_step(Bs, tc)), T_PAD + (-T_PAD) % tc)

    recs = {}
    for name, (f, rows_q) in variants.items():
        t0 = time.perf_counter()
        np.asarray(f(matrix, idxs_s))
        np.asarray(f(matrix, idxs_l))
        print(f"  compiled {name} ({time.perf_counter()-t0:.0f}s)",
              flush=True)
        recs[name] = [f, float("inf"), float("inf"), rows_q]

    for r in range(ROUNDS):
        for name, rec in recs.items():
            f = rec[0]
            t0 = time.perf_counter()
            np.asarray(f(matrix, idxs_s))
            rec[1] = min(rec[1], time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(f(matrix, idxs_l))
            rec[2] = min(rec[2], time.perf_counter() - t0)
        print(f"  round {r+1}/{ROUNDS} done", flush=True)

    print(f"{'variant':>12}     q/s    GB/s")
    for name, (f, bs, bl, rows_q) in recs.items():
        dt = max(bl - bs, 1e-9)
        q = iters * B
        gbps = q * rows_q * H * W * 4 / dt / 1e9
        print(f"{name:>12} {q/dt:8.1f}  {gbps:6.1f}", flush=True)


if __name__ == "__main__":
    main()
