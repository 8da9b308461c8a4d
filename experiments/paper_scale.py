"""Reference-paper-scale end-to-end: construct -> repack -> serve.

The reference's claim to fame is indexing ~100k-genome corpora with
bit matrices beyond RAM (reference: README.md:17-24, the memory-bounded
batch + combine machinery, cobs/construction/classic_index.cpp:143-189).
This harness exercises the same machinery at that document count, sized
to this machine: generate a 100k-document FASTA corpus with varied doc
sizes, compact-construct it with the matrix FORCED out of core (small
--memory so the per-page batch+combine tree engages), `cobs repack` it
for serving, verify planted queries exactly, and measure served q/s.

Stages are separate subcommands so the slow ones run once:

  python experiments/paper_scale.py gen     DIR [--docs 100000]
  python experiments/paper_scale.py build   DIR [--memory 256MiB]
  python experiments/paper_scale.py verify  DIR
  python experiments/paper_scale.py serve   DIR [--queries 16384] \
      [--batch 512] [--mega 8] [--streamed]

Planted ground truth: doc i (for i in the PLANT set) contains the
31-mer-rich PLANT_SEQ at a doc-dependent offset, so `verify` knows the
exact expected positives with score = full term count.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PLANT_SEQ = ("AGTCAACGCTAAGGCATTTCCCCCCTGCCTCCTGCCTGCTGCCAAGCCCT"
             "GATGGTACCTTAGCAGGTCCAGGGTCGATGGATCCTTAAGGCAATTCGAG")
PLANT_EVERY = 9973  # docs i with i % PLANT_EVERY == 0 carry PLANT_SEQ


def gen(root: Path, n_docs: int, doc_size: int = 20_000,
        seed: int = 0xC0B5) -> None:
    """Corpus: one .fasta per document (the reference's primary
    layout — DocumentList dir scan), bucketed 1000 per subdir.
    Sizes are EXACTLY equal so every compact page computes the same
    Bloom size and `cobs repack` merges maximally (the planted
    sequence OVERWRITES a slice in place, preserving length)."""
    docs = root / "docs"
    docs.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    t0 = time.perf_counter()
    for i in range(n_docs):
        seq = bases[rng.integers(0, 4, size=doc_size)].tobytes()
        if i % PLANT_EVERY == 0:
            off = 17 * (i % 97) + 11
            seq = (seq[:off] + PLANT_SEQ.encode()
                   + seq[off + len(PLANT_SEQ):])
        sub = docs / f"{i // 1000:03d}"
        if i % 1000 == 0:
            sub.mkdir(exist_ok=True)
        (sub / f"doc{i:06d}.fasta").write_bytes(b">s\n" + seq + b"\n")
        if (i + 1) % 10000 == 0:
            dt = time.perf_counter() - t0
            print(f"gen {i + 1}/{n_docs} ({dt:.0f}s)", flush=True)
    print(f"gen done: {n_docs} docs x {doc_size} bp = "
          f"{n_docs * doc_size / 1e9:.2f} GB, "
          f"{time.perf_counter() - t0:.0f}s", flush=True)


def build(root: Path, memory: str) -> None:
    from cobs_tpu.cli.main import main as cli
    out = root / "paper.cobs_compact"
    t0 = time.perf_counter()
    rc = cli(["compact-construct", str(root / "docs"), str(out),
              "--memory", memory, "--clobber"])
    dt = time.perf_counter() - t0
    print(f"RESULT name=paper_construct docs_dir={root / 'docs'} "
          f"memory={memory} rc={rc} seconds={dt:.1f}", flush=True)
    t0 = time.perf_counter()
    rc = cli(["repack", str(out), str(root / "paper_wide.cobs_compact")])
    print(f"RESULT name=paper_repack rc={rc} "
          f"seconds={time.perf_counter() - t0:.1f}", flush=True)


def _planted(root: Path):
    n_docs = sum(1 for _ in (root / "docs").rglob("doc*.fasta"))
    return n_docs, [i for i in range(0, n_docs, PLANT_EVERY)]


def verify(root: Path) -> None:
    """Planted queries return exactly the planted docs at full score
    on BOTH the construct output and the repacked index."""
    from cobs_tpu.query.search import Search
    n_docs, plants = _planted(root)
    T = len(PLANT_SEQ) - 31 + 1
    want = sorted(f"doc{i:06d}" for i in plants)
    for name in ("paper.cobs_compact", "paper_wide.cobs_compact"):
        s = Search(str(root / name))
        res = s.search(PLANT_SEQ, threshold=0.9)
        got = sorted(r.doc_name for r in res if r.score == T)
        assert got == want, (name, got[:5], want[:5])
        assert all(r.score == T or r.score < 0.9 * T for r in res)
        print(f"verify {name}: {len(want)} planted positives exact "
              f"(score {T}/{T}) among {n_docs} docs", flush=True)


def serve(root: Path, n_queries: int, batch: int, mega: int,
          streamed: bool, num_kmers: int = 1000) -> None:
    from cobs_tpu.query.search import Search
    from cobs_tpu.settings import settings
    from mega_serve_bench import random_queries

    settings.mega_batches = mega
    idx = root / "paper_wide.cobs_compact"
    t0 = time.perf_counter()
    s = Search(str(idx), streamed=True if streamed else None)
    print(f"open+upload: {time.perf_counter() - t0:.1f}s", flush=True)
    queries = random_queries(n_queries, num_kmers)
    # warmup compiles outside the clock
    for _ in s.search_stream(queries[:batch * max(1, mega)], 0.8, 100,
                             batch_size=batch):
        pass
    for rnd in range(2):
        t0 = time.perf_counter()
        n = sum(1 for _ in s.search_stream(queries, 0.8, 100,
                                           batch_size=batch))
        dt = time.perf_counter() - t0
        print(f"RESULT name=paper_serve round={rnd} B={batch} "
              f"mega={mega} streamed={int(streamed)} queries={n} "
              f"queries_per_s={n / dt:.1f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["gen", "build", "verify",
                                      "serve"])
    ap.add_argument("dir")
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--doc-size", type=int, default=20_000)
    ap.add_argument("--memory", default="256MiB")
    ap.add_argument("--queries", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--mega", type=int, default=8)
    ap.add_argument("--streamed", action="store_true")
    args = ap.parse_args()
    root = Path(args.dir)
    if args.stage == "gen":
        gen(root, args.docs, args.doc_size)
    elif args.stage == "build":
        build(root, args.memory)
    elif args.stage == "verify":
        verify(root)
    else:
        serve(root, args.queries, args.batch, args.mega,
              args.streamed)


if __name__ == "__main__":
    main()
