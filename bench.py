"""Driver benchmark: query throughput of the bit-sliced signature index.

Mirrors the reference's `cobs benchmark-fpr` harness semantics
(reference: src/cobs.cpp:605-730 — random index, warmup, measured query
loop) at the reference's synthetic scale (`classic-construct-random`
defaults: 10,000 documents, 2 Mi-bit signature, 1000-k-mer queries,
reference: src/cobs.cpp:243-291).

Prints ONE JSON line:
  {"metric": "query_throughput", "value": <queries/s>, "unit":
   "queries/s", "vs_baseline": <achieved HBM bandwidth / chip roofline>}

The reference publishes no numeric baselines (see BASELINE.md), so
`vs_baseline` reports the fraction of the chip's HBM-bandwidth roofline
the gather-AND-popcount hot loop achieves — the BASELINE.md north-star
target is >= 0.8.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

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
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"

    if on_tpu:
        sig_size = 1 << 21      # 2 Mi Bloom rows (reference default)
        num_docs = 10_000
        B, T, iters = 64, 1000, 20
    else:                       # CPU smoke fallback
        sig_size = 1 << 16
        num_docs = 2_048
        B, T, iters = 8, 100, 3
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

    n_bufs = 4
    idx_bufs = [jnp.asarray(rng.integers(
        0, sig_size, size=(B, T, num_hashes, 1)).astype(np.int32))
        for _ in range(n_bufs)]

    # warmup / compile
    jax.block_until_ready(_gather_and_count(matrix, idx_bufs[0],
                                            num_hashes))
    jax.block_until_ready(_gather_and_count(matrix, idx_bufs[1],
                                            num_hashes))

    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(_gather_and_count(matrix, idx_bufs[i % n_bufs],
                                      num_hashes))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    queries = iters * B
    qps = queries / dt
    # hot-loop HBM traffic: the row gather reads T*h rows of W words per
    # query; score output write is negligible (B*W*32*4 per batch).
    bytes_moved = queries * T * num_hashes * W * 4
    achieved_gbps = bytes_moved / dt / 1e9
    roofline = _chip_hbm_gbps(dev)
    vs = achieved_gbps / roofline if on_tpu else 0.0

    print(f"bench: {qps:.1f} queries/s, {achieved_gbps:.1f} GB/s "
          f"of ~{roofline:.0f} GB/s roofline", file=sys.stderr)
    print(json.dumps({
        "metric": "query_throughput",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
