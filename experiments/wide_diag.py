"""Diagnose the wide-row e2e collapse seen in width_sweep.py.

width_sweep measured e2e bandwidth FALLING with row width (127 GB/s at
W=384 -> 31 at W=24576) while the raw gather microbench RISES with row
width. Hypothesis: the packed-CSA count's int32 accumulator
[B, P*W, 32] (3 MB at W=384 -> 201 MB at W=24576) outgrows VMEM, and
its per-weight expansion read-modify-write traffic (~32*log2(tc)/tc of
the gathered bytes) starts contending with the gather in HBM.

Variants at each W (same differenced-scan protocol as width_sweep):
  gather   - jnp.take + u32 fold (no count)
  e2e      - engine _gather_and_count as-is
  doctile  - gather+count tiled over the document axis in Wc-word
             tiles: same gathered bytes, but each tile's accumulator
             is Wc*32*4*B bytes (VMEM-sized again)

Run: python experiments/wide_diag.py
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

from cobs_tpu.query.engine import (_bucket, _count_csa,
                                   _gather_and_count, _plan_chunks)

B, T, H = 64, 1000, 1
T_PAD = _bucket(T)
ROUNDS = 4
WC = 1536            # doc-tile width (6 KB row segments)

CONFIGS = [(19, 1536), (17, 6144), (15, 24576)]


def e2e(m, idxs):
    def body(c, idx):
        return c, _gather_and_count(m, idx, H).sum(axis=1)
    return lax.scan(body, 0, idxs)[1]


def gather_only(m, idxs):
    def body(c, idx):
        g = jnp.take(m, idx[..., 0, 0], axis=0)   # [B, T, W]
        # fold to force every byte without count work
        return c, g.astype(jnp.uint32).sum(axis=(1, 2))
    return lax.scan(body, 0, idxs)[1]


def make_doctile(W):
    n_tiles = W // WC

    def doctile(m, idxs):
        tc = 256                                  # divides T_PAD=1024

        def body(c, idx):
            rows = idx[..., 0, 0]                 # [B, T]
            chunks = jnp.moveaxis(
                rows.reshape(B, T_PAD // tc, tc), 1, 0)

            def tile(wi):
                msl = lax.dynamic_slice_in_dim(m, wi * WC, WC, axis=1)

                def cbody(acc, rc):
                    g = jnp.take(msl, rc, axis=0)  # [B, tc, WC]
                    return acc + _count_csa(
                        g[:, :, None, :]), None
                acc0 = jnp.zeros((B, 1, WC, 32), jnp.int32)
                out, _ = lax.scan(cbody, acc0, chunks)
                return out.reshape(B, WC * 32)

            scores = lax.map(tile, jnp.arange(n_tiles))
            return c, scores.sum(axis=(0, 2))
        return lax.scan(body, 0, idxs)[1]
    return doctile


def make_btile(W):
    """Tile the BATCH axis so each term-chunk's gathered block stays
    ~32 MiB (the headline config's de-facto fused-chunk size): full-W
    rows keep the wide-row gather bandwidth, while the count's
    working set shrinks back to what XLA keeps on-chip."""
    tc = 256
    Bs = max(1, (32 << 20) // (tc * W * 4))
    while B % Bs:
        Bs -= 1

    def btile(m, idxs):
        def body(c, idx):
            rows = idx[..., 0, 0]                 # [B, T]
            sub = jnp.moveaxis(
                rows.reshape(B // Bs, Bs, T_PAD), 0, 0)

            def per_sub(rs):
                chunks = jnp.moveaxis(
                    rs.reshape(Bs, T_PAD // tc, tc), 1, 0)

                def cbody(acc, rc):
                    g = jnp.take(m, rc, axis=0)   # [Bs, tc, W]
                    return acc + _count_csa(g[:, :, None, :]), None
                acc0 = jnp.zeros((Bs, 1, W, 32), jnp.int32)
                out, _ = lax.scan(cbody, acc0, chunks)
                return out.reshape(Bs, W * 32).sum(axis=1)

            scores = lax.map(per_sub, sub)        # [B/Bs, Bs]
            return c, scores.reshape(B)
        return lax.scan(body, 0, idxs)[1]
    return btile


def main():
    dev = jax.devices()[0]
    print(f"wide_diag: {dev.device_kind} B={B} T={T}->{T_PAD}",
          flush=True)
    rng = np.random.default_rng(0xC0B5)

    setups = []
    for lg_sig, W in CONFIGS:
        sig = 1 << lg_sig
        k_small = 2
        k_large = k_small + max(4, (16 * 384) // W)
        key = jax.random.key(lg_sig)
        matrix = jax.jit(lambda k, s=sig, w=W: jax.random.bits(
            k, (s + 1, w), dtype=jnp.uint32).at[-1].set(0))(key)
        jax.block_until_ready(matrix)

        def make(K, s=sig):
            idx = np.full((K, B, T_PAD, H, 1), s, dtype=np.int32)
            idx[:, :, :T] = rng.integers(
                0, s, size=(K, B, T, H, 1)).astype(np.int32)
            return jnp.asarray(idx)

        variants = {"gather": gather_only, "e2e": e2e,
                    "doctile": make_doctile(W),
                    "btile": make_btile(W)}
        fns = {}
        idxs_s, idxs_l = make(k_small), make(k_large)
        for name, fn in variants.items():
            f = jax.jit(fn)
            np.asarray(f(matrix, idxs_s))
            np.asarray(f(matrix, idxs_l))
            fns[name] = [f, float("inf"), float("inf")]
        setups.append(dict(W=W, matrix=matrix, idxs_s=idxs_s,
                           idxs_l=idxs_l, iters=k_large - k_small,
                           fns=fns))

    for r in range(ROUNDS):
        for st in setups:
            for name, rec in st["fns"].items():
                f = rec[0]
                t0 = time.perf_counter()
                np.asarray(f(st["matrix"], st["idxs_s"]))
                rec[1] = min(rec[1], time.perf_counter() - t0)
                t0 = time.perf_counter()
                np.asarray(f(st["matrix"], st["idxs_l"]))
                rec[2] = min(rec[2], time.perf_counter() - t0)
        print(f"  round {r + 1}/{ROUNDS} done", flush=True)

    for st in setups:
        for name, (f, bs, bl) in st["fns"].items():
            dt = max(bl - bs, 1e-9)
            q = st["iters"] * B
            gbps = q * T_PAD * H * st["W"] * 4 / dt / 1e9
            print(f"W={st['W']:>6} {name:8s} {q / dt:>9.1f} q/s "
                  f"{gbps:>7.1f} GB/s")


if __name__ == "__main__":
    main()
