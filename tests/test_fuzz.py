"""Randomized differential fuzzing across construction configurations.

For random corpora and random (k, h, fpr, page_size, memory budget)
configurations, every document's own substring must be found with a
full score, and classic/compact must agree on it. Catches interactions
(batch boundaries, page boundaries, combine levels) that fixed-shape
tests miss.
"""

from pathlib import Path

import numpy as np
import pytest

import cobs_tpu
from cobs_tpu.query.search import Search
from cobs_tpu.settings import settings


@pytest.fixture(autouse=True)
def _no_cache():
    settings.disable_cache = True
    yield
    settings.disable_cache = False


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_config_own_substring_invariant(tmp_path, seed):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    n_docs = int(rng.integers(9, 60))
    k = int(rng.choice([15, 21, 31]))
    h = int(rng.integers(1, 4))
    fpr = float(rng.choice([0.1, 0.3]))
    page_size = int(rng.choice([1, 2, 4]))

    docs = tmp_path / "docs"
    docs.mkdir()
    seqs = []
    # ~half the seeds draw sizes from a few TIERS: repeated sizes
    # create equal-Bloom page runs, exercising the load-time coalescers
    # (uniform-factor AND run-length merges) differentially
    tiers = (sorted(int(rng.integers(3 * k, 40 * k)) for _ in range(3))
             if rng.integers(0, 2) else None)
    for i in range(n_docs):
        n = (int(rng.choice(tiers)) if tiers
             else int(rng.integers(3 * k, 40 * k)))
        seq = bases[rng.integers(0, 4, size=n)].tobytes()
        seqs.append(seq)
        (docs / f"d{i:03d}.fasta").write_bytes(b">s\n" + seq + b"\n")
    dl = cobs_tpu.DocumentList(docs)

    ci = tmp_path / "x.cobs_classic"
    co = tmp_path / "x.cobs_compact"
    cp = cobs_tpu.ClassicIndexParameters(
        term_size=k, num_hashes=h, false_positive_rate=fpr,
        clobber=True)
    cp.mem_bytes = int(rng.choice([1 << 10, 1 << 30]))
    cobs_tpu.classic_construct(dl, ci, index_params=cp)
    pp = cobs_tpu.CompactIndexParameters(
        term_size=k, num_hashes=h, false_positive_rate=fpr,
        page_size=page_size, clobber=True)
    cobs_tpu.compact_construct(dl, co, index_params=pp)

    sample = rng.choice(n_docs, size=min(8, n_docs), replace=False)
    queries, wants = [], []
    for i in sample:
        seq = seqs[i]
        qlen = int(rng.integers(k, min(len(seq), 5 * k)))
        start = int(rng.integers(0, len(seq) - qlen + 1))
        queries.append(seq[start:start + qlen].decode())
        wants.append((f"d{i:03d}", qlen - k + 1))

    for path in (ci, co):
        s = Search(str(path))
        for res, (name, score) in zip(
                s.search_batch(queries, threshold=1.0), wants):
            hits = {r.doc_name: r.score for r in res}
            assert hits.get(name) == score, (path.suffix, name)


@pytest.mark.parametrize("seed", [5, 6])
def test_random_text_qgram_invariant(tmp_path, seed):
    """Text mode: random binary-ish text documents, q-gram exactness."""
    rng = np.random.default_rng(seed)
    k = int(rng.choice([4, 8, 12]))
    docs = tmp_path / "docs"
    docs.mkdir()
    texts = []
    alphabet = np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyz0123456789 _-", np.uint8)
    n_docs = int(rng.integers(5, 20))
    for i in range(n_docs):
        n = int(rng.integers(5 * k, 500))
        t = alphabet[rng.integers(0, len(alphabet), size=n)].tobytes()
        texts.append(t)
        (docs / f"t{i:02d}.txt").write_bytes(t)
    idx = tmp_path / "x.cobs_classic"
    cobs_tpu.classic_construct(
        cobs_tpu.DocumentList(docs), idx,
        index_params=cobs_tpu.ClassicIndexParameters(
            term_size=k, canonicalize=0, num_hashes=2, clobber=True))
    s = Search(str(idx))
    for i in rng.choice(n_docs, size=min(5, n_docs), replace=False):
        t = texts[i]
        qlen = int(rng.integers(k, min(len(t), 6 * k)))
        start = int(rng.integers(0, len(t) - qlen + 1))
        q = t[start:start + qlen].decode()
        res = s.search(q, threshold=1.0)
        hits = {r.doc_name: r.score for r in res}
        assert hits.get(f"t{i:02d}") == qlen - k + 1
