"""Corpus-width scaling: gather bandwidth and q/s vs Bloom row width.

The per-chip query cost is the row gather: T rows of `row_size =
ceil(docs/8)` bytes per query. Measured gather bandwidth RISES with row
width (r2: 90-122 GB/s at 1.5 KB rows, 158 at 16 KB, 207 at 64 KB), so
a chip serves wide corpora (many documents) at better efficiency than
the headline 10k-doc config — the question this sweep answers with the
end-to-end program (gather + packed CSA count), not a gather microbench.

All configs hold the matrix at the same total HBM bytes (the headline
3.2 GB) and vary the aspect ratio: halving signature rows while
doubling row width models the practical trade a deployment makes when
packing more documents per chip at a fixed HBM budget.

Protocol (CLAUDE.md): differenced lax.scan lengths inside one process,
round-robin over configs x R rounds, per-config best — the tunneled
chip's rate drifts between and within processes.

Run on the real chip with an otherwise-idle host:
    python experiments/width_sweep.py
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

from cobs_tpu.query.engine import _bucket, _gather_and_count

B, T, H = 64, 1000, 1
T_PAD = _bucket(T)
ROUNDS = 4

# (log2 sig_size, W int32 words): constant sig*W product = 2^21 * 384
CONFIGS = [
    (21, 384),      # 1.5 KB rows ~ 12k docs  (headline aspect)
    (19, 1536),     # 6 KB rows   ~ 49k docs
    (17, 6144),     # 24 KB rows  ~ 196k docs
    (15, 24576),    # 96 KB rows  ~ 786k docs
]


def main():
    dev = jax.devices()[0]
    print(f"width_sweep: {dev.device_kind} B={B} T={T}->{T_PAD} h={H}",
          flush=True)
    rng = np.random.default_rng(0xC0B5)

    @jax.jit
    def multi(m, idxs):
        def body(carry, idx):
            return carry, _gather_and_count(m, idx, H).sum(axis=1)
        _, totals = lax.scan(body, 0, idxs)
        return totals

    setups = []
    for lg_sig, W in CONFIGS:
        sig = 1 << lg_sig
        # equal gathered bytes per measured scan: K ~ 1/W
        k_small = 2
        k_large = k_small + max(4, (32 * 384) // W)
        key = jax.random.key(lg_sig)
        matrix = jax.jit(lambda k, s=sig, w=W: jax.random.bits(
            k, (s + 1, w), dtype=jnp.uint32).at[-1].set(0))(key)
        jax.block_until_ready(matrix)

        def make(K, s=sig):
            idx = np.full((K, B, T_PAD, H, 1), s, dtype=np.int32)
            idx[:, :, :T] = rng.integers(
                0, s, size=(K, B, T, H, 1)).astype(np.int32)
            return jnp.asarray(idx)

        idxs_s, idxs_l = make(k_small), make(k_large)
        np.asarray(multi(matrix, idxs_s))   # compile + warm
        np.asarray(multi(matrix, idxs_l))
        setups.append(dict(lg=lg_sig, W=W, matrix=matrix,
                           idxs_s=idxs_s, idxs_l=idxs_l,
                           iters=k_large - k_small,
                           best_s=float("inf"), best_l=float("inf")))

    for r in range(ROUNDS):
        for st in setups:
            t0 = time.perf_counter()
            np.asarray(multi(st["matrix"], st["idxs_s"]))
            st["best_s"] = min(st["best_s"], time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(multi(st["matrix"], st["idxs_l"]))
            st["best_l"] = min(st["best_l"], time.perf_counter() - t0)
        print(f"  round {r + 1}/{ROUNDS} done", flush=True)

    print(f"{'sig':>8} {'row_KB':>7} {'docs':>7} {'q/s':>9} "
          f"{'GB/s':>7}")
    for st in setups:
        dt = max(st["best_l"] - st["best_s"], 1e-9)
        q = st["iters"] * B
        qps = q / dt
        gbps = q * T_PAD * H * st["W"] * 4 / dt / 1e9
        docs = st["W"] * 32
        print(f"{1 << st['lg']:>8} {st['W'] * 4 / 1024:>7.1f} "
              f"{docs:>7} {qps:>9.1f} {gbps:>7.1f}")


if __name__ == "__main__":
    main()
