"""Measure the platform ceiling for the bit-sliced query hot loop.

Round-2 evidence gathering for BASELINE.md (VERDICT item 1): what is
the fastest way to read T random Bloom rows per query from HBM, and
how close does the end-to-end gather+count loop get?

Variants:
  gather2d:W     - jnp.take of random rows from [R, W] u32
  gsorted:W      - gather2d with globally sorted row indices
  gqsort:W       - indices sorted within each 1024-row query block
                   (score-preserving: the term reduction is
                   order-agnostic, so the engine may sort freely)
  e2e            - current engine _gather_and_count (gather+AND+count)
  e2e_qsort      - e2e with per-query sorted indices
  e2e_chunked    - e2e forced through a lax.scan over term chunks
  count_only     - the packed carry-save count on resident data
                   (isolates the non-gather cost)

Results recorded in BASELINE.md. A [R, 8, W/8] "tile-aligned" 3D
gather variant measured 4-5 GB/s (30x WORSE - XLA lowers multi-dim
row gathers catastrophically) and was removed.

Timing protocol (CLAUDE.md): everything under test runs K times inside
ONE compiled lax.scan dispatch; the clock is the device-to-host fetch
of a tiny data-dependent reduction; two K values are differenced so
per-dispatch (tunnel) overhead cancels; repeats interleave and take
minima.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, mat, xs_small, xs_large, repeats=5):
    """fn(mat, xs) -> tiny array; seconds for the (large-small) delta.
    mat passed as an argument (closure capture would embed it in the
    remote-compile payload)."""
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


def report(name, bytes_moved, dt, iters):
    gbps = bytes_moved / dt / 1e9
    print(f"{name:24s} {gbps:8.1f} GB/s   ({dt/iters*1e3:.3f} ms/iter)",
          flush=True)
    return gbps


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    rng = np.random.default_rng(7)
    K_S, K_L = 2, 6
    iters = K_L - K_S
    results = {}

    # ---- row gathers
    N_ROWS = 65536           # rows gathered per scan step
    for W in (384, 1024, 4096):
        R = 1 << 21
        if R * W * 4 > 6 << 30:
            R = (6 << 30) // (W * 4)
        mat = jax.jit(lambda k, R=R, W=W: jax.random.bits(
            k, (R, W), dtype=jnp.uint32))(jax.random.key(1))
        jax.block_until_ready(mat)
        idx = rng.integers(0, R, size=(K_L, N_ROWS)).astype(np.int32)
        moved = iters * N_ROWS * W * 4

        def g2(m, idxs):
            def body(c, i):
                g = jnp.take(m, i, axis=0)
                return c ^ jnp.bitwise_xor.reduce(g.ravel()), None
            c, _ = lax.scan(body, jnp.uint32(0), idxs)
            return c

        dt = timed(g2, mat, jnp.asarray(idx[:K_S]), jnp.asarray(idx))
        results[f"gather2d:{W}"] = report(
            f"gather2d W={W}", moved, dt, iters)

        sidx = np.sort(idx, axis=1)
        dt = timed(g2, mat, jnp.asarray(sidx[:K_S]), jnp.asarray(sidx))
        results[f"gsorted:{W}"] = report(
            f"gather2d sorted W={W}", moved, dt, iters)

        qidx = np.sort(idx.reshape(K_L, 64, 1024), axis=2) \
            .reshape(K_L, N_ROWS)
        dt = timed(g2, mat, jnp.asarray(qidx[:K_S]), jnp.asarray(qidx))
        results[f"gqsort:{W}"] = report(
            f"gather2d qsorted W={W}", moved, dt, iters)
        del mat

    # ---- end-to-end engine loop at the bench workload shape
    from cobs_tpu.query.engine import (_count_csa, _gather_and_count,
                                       _gather_count_once)
    sig, W, B, T, h = 1 << 21, 384, 64, 1024, 1
    mat = jax.jit(lambda k: jax.random.bits(
        k, (sig + 1, W), dtype=jnp.uint32).at[-1].set(0))(
            jax.random.key(2))
    jax.block_until_ready(mat)
    idx = rng.integers(0, sig, size=(K_L, B, T, h, 1)).astype(np.int32)
    moved = iters * B * T * h * W * 4

    def e2e(m, idxs):
        def body(c, i):
            s = _gather_and_count(m, i, h)
            return c + s.sum(), None
        c, _ = lax.scan(body, jnp.int32(0), idxs)
        return c

    dt = timed(e2e, mat, jnp.asarray(idx[:K_S]), jnp.asarray(idx))
    results["e2e"] = report("e2e current", moved, dt, iters)

    qidx = np.sort(idx, axis=2)
    dt = timed(e2e, mat, jnp.asarray(qidx[:K_S]), jnp.asarray(qidx))
    results["e2e_qsort"] = report("e2e qsorted", moved, dt, iters)

    for tc in (256, 512):
        def e2e_chunked(m, idxs, tc=tc):
            def body(c, i):
                chunks = jnp.moveaxis(
                    i.reshape(B, T // tc, tc, h, 1), 1, 0)

                def inner(acc, ic):
                    return acc + _gather_count_once(m, ic, h), None
                acc0 = jnp.zeros((B, 1, W, 32), jnp.int32)
                s, _ = lax.scan(inner, acc0, chunks)
                return c + s.sum(), None
            c, _ = lax.scan(body, jnp.int32(0), idxs)
            return c

        dt = timed(e2e_chunked, mat, jnp.asarray(idx[:K_S]),
                   jnp.asarray(idx))
        results[f"e2e_chunked:{tc}"] = report(
            f"e2e chunked tc={tc}", moved, dt, iters)

    # ---- count-only: resident anded tensor, no gather
    anded = jax.jit(lambda k: jax.random.bits(
        k, (B, T, 1, W), dtype=jnp.uint32))(jax.random.key(3))
    jax.block_until_ready(anded)
    ks = jnp.arange(K_L, dtype=jnp.uint32)

    def count_only(a, kv):
        def body(c, k):
            s = _count_csa(a ^ k)          # ^k defeats CSE across iters
            return c + s.sum(), None
        c, _ = lax.scan(body, jnp.int32(0), kv)
        return c

    dt = timed(count_only, anded, ks[:K_S], ks)
    results["count_only"] = report("count_only (CSA)", moved, dt, iters)

    print("\nsummary:", {k: round(v, 1) for k, v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
