"""Real-chip batch-size sweep for the headline query benchmark.

VERDICT r2 item 4: the remaining gap to the same-shape gather ceiling
is the count stage's non-overlapped tail plus per-scan-step overhead,
both of which amortize with more queries per dispatch. This sweeps
B (queries per scan step) under bench.py's exact differenced-scan
timing protocol so the winner can become bench.py's default.

Run on the real chip with an otherwise-idle host (CLAUDE.md gotcha 3):
    python experiments/batch_sweep.py [B ...]
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


def bench_b(B: int, sig_size: int, W: int, T: int, num_hashes: int,
            work_batches: int) -> tuple[float, float]:
    """(queries/s, GB/s gathered) at batch size B, fixed total work."""
    from cobs_tpu.query.engine import _gather_and_count

    key = jax.random.key(0xC0B5)
    matrix = jax.jit(
        lambda k: jax.random.bits(
            k, (sig_size + 1, W), dtype=jnp.uint32).at[-1].set(0)
    )(key)
    jax.block_until_ready(matrix)
    rng = np.random.default_rng(0xC0B5)

    @jax.jit
    def multi(m, idxs):
        def body(carry, idx):
            return carry, _gather_and_count(m, idx, num_hashes) \
                .sum(axis=1)
        _, totals = lax.scan(body, 0, idxs)
        return totals

    def make_idxs(K):
        return jnp.asarray(rng.integers(
            0, sig_size, size=(K, B, T, num_hashes, 1)).astype(np.int32))

    # hold total queries constant across B so scan lengths shrink as
    # B grows; difference two lengths to cancel dispatch overhead
    k_large = max(2, work_batches * 64 // B)
    k_small = max(1, k_large // 8)
    idxs_s, idxs_l = make_idxs(k_small), make_idxs(k_large)
    np.asarray(multi(matrix, idxs_s))
    np.asarray(multi(matrix, idxs_l))
    best_s = best_l = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(multi(matrix, idxs_s))
        best_s = min(best_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(multi(matrix, idxs_l))
        best_l = min(best_l, time.perf_counter() - t0)
    dt = max(best_l - best_s, 1e-9)
    queries = (k_large - k_small) * B
    qps = queries / dt
    gbps = queries * T * num_hashes * W * 4 / dt / 1e9
    return qps, gbps


def main() -> None:
    dev = jax.devices()[0]
    sweep = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
    sig_size, num_docs, T, h = 1 << 21, 10_000, 1000, 1
    W = max(128, -(-(-(-num_docs // 8) // 4) // 128) * 128)
    print(f"sweep on {dev.device_kind}: sig={sig_size} docs={num_docs} "
          f"W={W} T={T} h={h}", file=sys.stderr)
    for B in sweep:
        qps, gbps = bench_b(B, sig_size, W, T, h, work_batches=36)
        print(f"RESULT B={B} queries_per_s={qps:.1f} "
              f"gather_GBps={gbps:.1f}")


if __name__ == "__main__":
    main()
