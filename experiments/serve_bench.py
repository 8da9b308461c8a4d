"""Serving front-end overhead: QueryServer through a real socket vs
the direct pipelined stream on the same index and backend.

The server adds socket transport, JSON framing, linger batching and
per-request refinement on top of `search_stream`'s scoring path; this
harness measures what that costs at serving batch sizes:

  python experiments/serve_bench.py /tmp/benchidx/rand.cobs_classic \
      --limit 100 --batch 1024 --clients 4 --queries 8192

Prints RESULT lines:
  RESULT mode=direct ... queries_per_s=...
  RESULT mode=served ... queries_per_s=... overhead_pct=...

Run on the real chip for device backends (no JAX_PLATFORMS override);
`--streamed` exercises the host-scored backend and needs no chip.
"""

import argparse
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def random_queries(n, num_kmers, term_size=31, seed=0xC0B5):
    rng = np.random.default_rng(seed)
    length = num_kmers + term_size - 1
    codes = rng.integers(0, 4, size=(n, length), dtype=np.uint8)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    return [bytes(alphabet[c]).decode() for c in codes]


def drive_direct(search, queries, threshold, limit, batch):
    t0 = time.perf_counter()
    n = 0
    for res in search.search_stream(queries, threshold, limit,
                                    batch_size=batch):
        n += 1
    dt = time.perf_counter() - t0
    return n / dt


def drive_served(search, queries, threshold, limit, batch, clients,
                 linger_ms):
    from cobs_tpu.query.client import QueryClient
    from cobs_tpu.query.server import QueryServer

    sock = str(Path(tempfile.mkdtemp()) / "bench.sock")
    srv = QueryServer(search, unix_path=sock, threshold=threshold,
                      num_results=limit, batch_size=batch,
                      linger_ms=linger_ms)
    per_client = [queries[i::clients] for i in range(clients)]
    counts = [0] * clients

    def worker(i):
        with QueryClient(sock, timeout=600) as c:
            qs = per_client[i]
            for j in range(0, len(qs), batch):
                counts[i] += len(c.search_batch(qs[j:j + batch]))

    with srv:
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        p50, p99 = srv._latency_ms()
    assert sum(counts) == len(queries), (sum(counts), len(queries))
    return len(queries) / dt, p50, p99


def main():
    p = argparse.ArgumentParser()
    p.add_argument("index")
    p.add_argument("-t", "--threshold", type=float, default=0.8)
    p.add_argument("-l", "--limit", type=int, default=100)
    p.add_argument("-b", "--batch", type=int, default=1024)
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--queries", type=int, default=8192)
    p.add_argument("--kmers", type=int, default=1000)
    p.add_argument("--warmup", type=int, default=256)
    p.add_argument("--linger-ms", type=float, default=5.0)
    p.add_argument("--streamed", action="store_true")
    p.add_argument("--skip-direct", action="store_true")
    args = p.parse_args()

    import cobs_tpu

    def open_search():
        return cobs_tpu.Search(
            args.index, streamed=True if args.streamed else False)

    queries = random_queries(args.queries, args.kmers)
    warm = queries[:min(args.warmup, len(queries))]

    base = f"batch={args.batch} limit={args.limit} " \
           f"kmers={args.kmers} queries={args.queries} " \
           f"backend={'streamed' if args.streamed else 'device'}"

    # ONE Search for both modes: a device index uploads to HBM once
    # (minutes through a tunnel), and same-process comparison avoids
    # the documented between-process chip-state drift
    s = open_search()
    for _ in s.search_stream(warm, args.threshold, args.limit,
                             batch_size=args.batch):
        pass

    direct_qps = None
    if not args.skip_direct:
        direct_qps = drive_direct(s, queries, args.threshold,
                                  args.limit, args.batch)
        print(f"RESULT mode=direct {base} "
              f"queries_per_s={direct_qps:.1f}", flush=True)

    served_qps, p50, p99 = drive_served(
        s, queries, args.threshold, args.limit, args.batch,
        args.clients, args.linger_ms)
    extra = ""
    if direct_qps:
        extra = (f" overhead_pct="
                 f"{100 * (1 - served_qps / direct_qps):.1f}")
    print(f"RESULT mode=served {base} clients={args.clients} "
          f"linger_ms={args.linger_ms} "
          f"queries_per_s={served_qps:.1f} "
          f"lat_p50_ms={p50} lat_p99_ms={p99}{extra}", flush=True)


if __name__ == "__main__":
    main()
