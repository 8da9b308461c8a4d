"""Tune the batch-tiled wide-row count: term-chunk x chunk-byte target.

Follow-up to wide_diag.py (btile recovered 2-4.4x at wide W but sits
at ~55-75% of gather-only): sweep tc and the fused-chunk byte target.

Run: python experiments/wide_tune.py
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

from cobs_tpu.query.engine import _bucket, _count_csa

B, T, H = 64, 1000, 1
T_PAD = _bucket(T)
ROUNDS = 4

CONFIGS = [(19, 1536), (17, 6144), (15, 24576)]
VARIANTS = [(128, 16), (256, 16), (256, 32), (512, 32), (256, 64),
            (512, 64), (512, 128)]          # (tc, chunk MiB)


def make_btile(W, tc, mib):
    Bs = max(1, (mib << 20) // (tc * W * 4))
    while B % Bs:
        Bs -= 1

    def btile(m, idxs):
        def body(c, idx):
            rows = idx[..., 0, 0]

            def per_sub(rs):
                chunks = jnp.moveaxis(
                    rs.reshape(Bs, T_PAD // tc, tc), 1, 0)

                def cbody(acc, rc):
                    g = jnp.take(m, rc, axis=0)
                    return acc + _count_csa(g[:, :, None, :]), None
                acc0 = jnp.zeros((Bs, 1, W, 32), jnp.int32)
                out, _ = lax.scan(cbody, acc0, chunks)
                return out.reshape(Bs, W * 32).sum(axis=1)

            scores = lax.map(
                per_sub, rows.reshape(B // Bs, Bs, T_PAD))
            return c, scores.reshape(B)
        return lax.scan(body, 0, idxs)[1]
    return btile, Bs


def main():
    dev = jax.devices()[0]
    print(f"wide_tune: {dev.device_kind} B={B} T={T}->{T_PAD}",
          flush=True)
    rng = np.random.default_rng(0xC0B5)

    setups = []
    for lg_sig, W in CONFIGS:
        sig = 1 << lg_sig
        k_small = 2
        k_large = k_small + max(4, (16 * 384) // W)
        matrix = jax.jit(lambda k, s=sig, w=W: jax.random.bits(
            k, (s + 1, w), dtype=jnp.uint32).at[-1].set(0)
        )(jax.random.key(lg_sig))
        jax.block_until_ready(matrix)

        def make(K, s=sig):
            idx = rng.integers(0, s, size=(K, B, T_PAD),
                               dtype=np.int64).astype(np.int32)
            return jnp.asarray(idx[..., None, None])

        idxs_s, idxs_l = make(k_small), make(k_large)
        fns = {}
        for tc, mib in VARIANTS:
            if T_PAD % tc:
                continue
            fn, Bs = make_btile(W, tc, mib)
            f = jax.jit(fn)
            np.asarray(f(matrix, idxs_s))
            np.asarray(f(matrix, idxs_l))
            fns[f"tc{tc}/{mib}M(Bs{Bs})"] = [f, float("inf"),
                                             float("inf")]
        setups.append(dict(W=W, matrix=matrix, idxs_s=idxs_s,
                           idxs_l=idxs_l, iters=k_large - k_small,
                           fns=fns))

    for r in range(ROUNDS):
        for st in setups:
            for rec in st["fns"].values():
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
            print(f"W={st['W']:>6} {name:18s} {q / dt:>9.1f} q/s "
                  f"{gbps:>7.1f} GB/s")


if __name__ == "__main__":
    main()
