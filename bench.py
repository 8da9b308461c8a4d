"""Driver benchmark: query throughput of the bit-sliced signature index.

Mirrors the reference's `cobs benchmark-fpr` harness semantics
(reference: src/cobs.cpp:605-730 — random index, warmup, measured query
loop) at the reference's synthetic scale (`classic-construct-random`
defaults: 10,000 documents, 2 Mi-bit signature, 1000-k-mer queries,
reference: src/cobs.cpp:243-291).

Prints ONE JSON line:
  {"metric": "query_throughput", "value": <queries/s>, "unit":
   "queries/s", "vs_baseline": <ratio over the reference's single-node
   memory-bandwidth roofline>}

The reference publishes no numeric baselines (see BASELINE.md), so
`vs_baseline` compares against the reference's *best-case* single-node
throughput at this workload: its mmap row gather + SSE2 scoring is
DRAM-bound, reading T*h rows of row_size bytes per query; at an
(optimistic) 50 GB/s of effective random-row DRAM bandwidth that is
  50e9 / (1000 * 1 * 1250) = 40,000 queries/s.
Timing protocol: several query batches are scored inside ONE compiled
lax.scan dispatch and the device-to-host fetch of the (tiny,
data-dependent) per-query totals is the clock — remote/async runtimes
cannot acknowledge it early — and two scan lengths are differenced so
the per-dispatch overhead cancels.
"""

import json
import os
import sys
import time

# peak HBM bandwidth by chip generation, GB/s (public spec sheets)
_HBM_GBPS = {
    "v2": 700.0, "v3": 900.0, "v4": 1228.0,
    "v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0,
    "v6 lite": 1640.0, "v6e": 1640.0,
}


def _chip_hbm_gbps(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in _HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0  # conservative default


def main() -> None:
    import numpy as np

    import jax

    if os.environ.get("COBS_BENCH_CPU"):
        # env JAX_PLATFORMS=cpu is NOT enough when a sitecustomize has
        # pinned a hardware platform — only the live config override
        # skips the (possibly wedged) backend init. Same trick as
        # tests/conftest.py.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"

    if on_tpu:
        sig_size = 1 << 21      # 2 Mi Bloom rows (reference default)
        num_docs = 10_000
        B, T, iters = 64, 1000, 36
    else:                       # CPU smoke fallback
        sig_size = 1 << 16
        num_docs = 2_048
        B, T, iters = 8, 128, 8
    num_hashes = 1
    W = max(128, -(-(-(-num_docs // 8) // 4) // 128) * 128)

    print(f"bench: {dev.device_kind} sig={sig_size} docs={num_docs} "
          f"W={W} B={B} T={T}", file=sys.stderr)

    rng = np.random.default_rng(0xC0B5)
    # random index generated on device (no multi-GB host transfer)
    key = jax.random.key(0xC0B5)
    matrix = jax.jit(
        lambda k: jax.random.bits(
            k, (sig_size + 1, W), dtype=jnp.uint32).at[-1].set(0)
    )(key)
    jax.block_until_ready(matrix)

    from cobs_tpu.query.engine import _gather_and_count

    from jax import lax

    @jax.jit
    def multi(m, idxs):
        """Score idxs [K, B, T, h, P] sequentially on device; returns
        per-query totals [K, B] (tiny, but data-dependent on every
        gathered row, so fetching it forces the whole chain)."""
        def body(carry, idx):
            return carry, _gather_and_count(m, idx, num_hashes) \
                .sum(axis=1)
        _, totals = lax.scan(body, 0, idxs)
        return totals

    # queries enter the engine padded to the term bucket with zero-row
    # terms, exactly as serving does (engine._bucket) — measured: the
    # power-of-two padded shape often gathers FASTER than the exact
    # T=1000 shape, so this is both the honest production shape and
    # the better one. q/s still counts real (T-term) queries.
    from cobs_tpu.query.engine import _bucket
    T_pad = _bucket(T)

    def make_idxs(K):
        idx = np.full((K, B, T_pad, num_hashes, 1), sig_size,
                      dtype=np.int32)  # sig_size = the all-zero row
        idx[:, :, :T] = rng.integers(
            0, sig_size, size=(K, B, T, num_hashes, 1)).astype(np.int32)
        return jnp.asarray(idx)

    # difference two scan lengths: per-dispatch overhead (large on
    # remote/tunneled runtimes) cancels, leaving pure device time.
    # Small/large measurements interleave and take per-size minima so
    # transient tunnel slowdowns cannot skew the difference.
    k_small, k_large = 4, iters
    idxs_s, idxs_l = make_idxs(k_small), make_idxs(k_large)
    np.asarray(multi(matrix, idxs_s))    # compile + warm
    np.asarray(multi(matrix, idxs_l))
    # 10 rounds: the tunneled chip's effective rate drifts within a
    # process (observed 50-74k q/s for the same program); per-size
    # minima over more rounds converge on the clean-state throughput
    best_s = best_l = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(multi(matrix, idxs_s))  # fetch = true sync
        best_s = min(best_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(multi(matrix, idxs_l))
        best_l = min(best_l, time.perf_counter() - t0)
    dt = max(best_l - best_s, 1e-9)
    iters = k_large - k_small

    queries = iters * B
    qps = queries / dt
    # hot-loop HBM traffic: the row gather reads T_pad*h rows of W
    # words per query (padding terms gather the zero row at full HBM
    # cost); score output write is negligible (B*W*32*4 per batch).
    bytes_moved = queries * T_pad * num_hashes * W * 4
    achieved_gbps = bytes_moved / dt / 1e9
    roofline = _chip_hbm_gbps(dev)
    # reference best case: DRAM-roofline row gather on one node
    ref_qps = 50e9 / (T * num_hashes * (num_docs / 8.0))
    vs = qps / ref_qps if on_tpu else 0.0

    print(f"bench: {qps:.1f} queries/s ({achieved_gbps:.1f} GB/s "
          f"gathered, chip HBM ~{roofline:.0f} GB/s); reference "
          f"DRAM-roofline ~{ref_qps:.0f} q/s", file=sys.stderr)
    print(json.dumps({
        "metric": "query_throughput",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(vs, 4),
    }))


def _watchdog() -> None:
    """Run the measurement in a child with a hard timeout.

    A wedged remote-tunnel backend can hang `jax.devices()` itself
    indefinitely (observed; see CLAUDE.md). The driver needs ONE JSON
    line regardless, so: try the real chip under a timeout; on a hang,
    kill the child (exact PID) and fall back to the CPU smoke
    measurement (vs_baseline 0.0 marks it as such); if even that
    fails, emit an explicit zero rather than nothing.
    """
    import subprocess

    def attempt(env, timeout):
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, env=env, text=True)
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            return None
        if proc.returncode != 0:
            return None
        for line in (out or "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                return line
        return None

    base = dict(os.environ, COBS_BENCH_CHILD="1")
    line = attempt(base, float(os.environ.get(
        "COBS_BENCH_TIMEOUT", "1500")))
    if line is None:
        print("bench: device attempt hung/failed; CPU fallback",
              file=sys.stderr)
        line = attempt(dict(base, COBS_BENCH_CPU="1"), 600.0)
        if line is not None:
            note = ("device unreachable (remote tunnel down); CPU "
                    "smoke fallback, NOT the TPU number — see "
                    "BASELINE.md round-3 measured results")
            line = json.dumps({**json.loads(line), "note": note})
    if line is None:
        line = json.dumps({"metric": "query_throughput", "value": 0.0,
                           "unit": "queries/s", "vs_baseline": 0.0,
                           "note": "no measurement possible"})
    print(line, flush=True)


if __name__ == "__main__":
    if os.environ.get("COBS_BENCH_CHILD"):
        main()
    else:
        _watchdog()
