"""Real-chip round-robin sweep of the gather->count scan chunk size.

The tunneled chip's effective rate drifts 50-74k q/s between (and
within) processes for the *same* program, so single-ordering sweeps
produce phantom winners. Protocol: compile every (T, tc) config up
front, then interleave measurements round-robin across configs for
several rounds and keep each config's best — slow drift then hits all
configs equally and the per-config minima are comparable.

Findings recorded in BASELINE.md (round 3):
  - T=1000 h=1: tc=250 and tc=500 tie at ~103.7 GB/s; tc<=200 falls
    off 15%+ (the _COUNT_CHUNK=500 target with divisor adaptation).
  - T=1024 h=1: the divisor chunk 342 gives 103.0 GB/s vs 92.1 for a
    fixed 256.
  - T=1200 h=1: the *shape itself* runs at ~86 GB/s — evidence behind
    the 8-step/octave bucket ladder (engine._bucket).
  - T=1000 h=3: 167-term chunks (constant bytes/chunk across h) beat
    250/500 — evidence behind the 1/h target scaling.

Run on the real chip with an otherwise-idle host (CLAUDE.md gotcha 3):
    python experiments/chunk_sweep.py [T:tc[:h] ...]
e.g. python experiments/chunk_sweep.py 1000:250 1000:500 1024:342
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


def main() -> None:
    import cobs_tpu.query.engine as eng

    specs = []
    for a in sys.argv[1:]:
        parts = a.split(":")
        specs.append((int(parts[0]), int(parts[1]),
                      int(parts[2]) if len(parts) > 2 else 1))
    if not specs:
        specs = [(1000, 250, 1), (1000, 500, 1), (1024, 342, 1)]

    sig, W, B = 1 << 21, 384, 64
    dev = jax.devices()[0]
    print(f"sweep on {dev.device_kind}: sig={sig} W={W} B={B} "
          f"configs={specs}", file=sys.stderr)
    key = jax.random.key(0xC0B5)
    matrix = jax.jit(
        lambda k: jax.random.bits(
            k, (sig + 1, W), dtype=jnp.uint32).at[-1].set(0))(key)
    np.asarray(jnp.sum(matrix[:4]))  # drain any leftover backlog

    rng = np.random.default_rng(7)
    progs = {}
    for T, tc, h in specs:
        eng._COUNT_CHUNK = tc * h  # target/h inside the engine

        @jax.jit
        def multi(m, idxs, h=h):
            def body(c, idx):
                return c, eng._gather_and_count(m, idx, h).sum(axis=1)
            _, tot = lax.scan(body, 0, idxs)
            return tot

        kl, ks = max(2, 24 // h), max(1, 3 // h)

        def mk(K, T=T, h=h):
            return jnp.asarray(rng.integers(
                0, sig, size=(K, B, T, h, 1)).astype(np.int32))

        a, b = mk(ks), mk(kl)
        np.asarray(multi(matrix, a))
        np.asarray(multi(matrix, b))
        progs[(T, tc, h)] = (multi, a, b, kl - ks)
        print(f"compiled T={T} tc={tc} h={h}", file=sys.stderr)

    best = {c: float("inf") for c in specs}
    for rnd in range(4):
        for c in specs:
            multi, a, b, dk = progs[c]
            t0 = time.perf_counter()
            np.asarray(multi(matrix, a))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(multi(matrix, b))
            tl = time.perf_counter() - t0
            best[c] = min(best[c], max(tl - ts, 1e-9) / (dk * B))
    for T, tc, h in specs:
        qps = 1.0 / best[(T, tc, h)]
        gbps = qps * T * h * W * 4 / 1e9
        print(f"RESULT T={T} tc={tc} h={h} qps={qps:.0f} "
              f"gather_gbps={gbps:.1f}")


if __name__ == "__main__":
    main()
