"""Measure the batched-DMA Pallas gather vs XLA's native gather.

Evidence for BASELINE.md (VERDICT item 1): G row-DMAs per grid step,
double buffered — the amortization experiment the round-1 one-row-per-
BlockSpec kernel left open. Same timing protocol as
experiments/gather_ceiling.py.
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

from cobs_tpu.ops.dma_gather import dma_gather_rows


def timed(fn, mat, xs_small, xs_large, repeats=5):
    f = jax.jit(fn)
    np.asarray(f(mat, xs_small))
    np.asarray(f(mat, xs_large))
    best_s = best_l = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(f(mat, xs_small))
        best_s = min(best_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f(mat, xs_large))
        best_l = min(best_l, time.perf_counter() - t0)
    return max(best_l - best_s, 1e-9)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    rng = np.random.default_rng(11)
    N_ROWS = 16384

    for W in (384, 6144, 16384):
        # scale the scan-length difference so the differenced work is
        # >> the ~32 ms dispatch jitter at every row width
        K_S, K_L = 2, 2 + max(4, (200 << 20) // (N_ROWS * W * 4))
        R = min(1 << 21, (4 << 30) // (W * 4))
        mat = jax.jit(lambda k, R=R, W=W: jax.random.bits(
            k, (R, W), dtype=jnp.uint32))(jax.random.key(1))
        jax.block_until_ready(mat)
        idx = rng.integers(0, R, size=(K_L, N_ROWS)).astype(np.int32)
        moved = (K_L - K_S) * N_ROWS * W * 4

        def xla(m, idxs):
            def body(c, i):
                g = jnp.take(m, i, axis=0)
                return c ^ jnp.bitwise_xor.reduce(g.ravel()), None
            c, _ = lax.scan(body, jnp.uint32(0), idxs)
            return c

        dt = timed(xla, mat, jnp.asarray(idx[:K_S]), jnp.asarray(idx))
        print(f"W={W:6d} xla_take        {moved/dt/1e9:8.1f} GB/s",
              flush=True)

        for G in (8, 16, 32):
            def dma(m, idxs, G=G):
                def body(c, i):
                    g = dma_gather_rows(m, i, group=G)
                    return c ^ jnp.bitwise_xor.reduce(g.ravel()), None
                c, _ = lax.scan(body, jnp.uint32(0), idxs)
                return c

            try:
                dt = timed(dma, mat, jnp.asarray(idx[:K_S]),
                           jnp.asarray(idx))
                print(f"W={W:6d} dma_gather G={G:3d} "
                      f"{moved/dt/1e9:8.1f} GB/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"W={W:6d} dma_gather G={G:3d} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        del mat


if __name__ == "__main__":
    main()
