"""Streaming ingest: bounded-memory parsing of arbitrarily large
documents (reference: cobs/fasta_file.hpp:156-182, text_file.hpp:45-68
— bounded sliding buffers; a 100 GB document must construct without
being resident in memory)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from cobs_tpu.ingest.fasta import FastaFile
from cobs_tpu.ingest.fastq import FastqFile
from cobs_tpu.ingest.text import TextFile
from cobs_tpu.ingest.util import iter_lines, sliding_windows
from cobs_tpu.settings import settings


@pytest.fixture(autouse=True)
def _no_cache():
    settings.disable_cache = True
    yield
    settings.disable_cache = False


def _random_seq(rng, n):
    return np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, size=n)].tobytes()


def _collect(batches):
    batches = [np.asarray(b) for b in batches]
    return (np.concatenate(batches, axis=0) if batches
            else np.empty((0, 0), np.uint8))


def test_iter_lines_matches_getline_semantics(tmp_path):
    p = tmp_path / "f.txt"
    p.write_bytes(b"abc\n\ndef\r\nghi")  # \r kept, no trailing newline
    assert list(iter_lines(p)) == [b"abc", b"", b"def\r", b"ghi"]
    p.write_bytes(b"abc\n")  # trailing newline: no empty final line
    assert list(iter_lines(p)) == [b"abc"]
    p.write_bytes(b"")
    assert list(iter_lines(p)) == []


def test_iter_lines_crosses_read_chunks(tmp_path, monkeypatch):
    import cobs_tpu.ingest.util as util
    monkeypatch.setattr(util, "_READ_CHUNK", 7)
    p = tmp_path / "f.txt"
    lines = [b"x" * n for n in (1, 13, 0, 6, 29)]
    p.write_bytes(b"\n".join(lines) + b"\n")
    assert list(util.iter_lines(p)) == lines


@pytest.mark.parametrize("chunk", [64, 1024, 1 << 20])
def test_fasta_chunked_windows_bit_exact(tmp_path, rng, chunk):
    p = tmp_path / "d.fasta"
    seqs = [_random_seq(rng, n) for n in (500, 30, 31, 2000, 77)]
    with open(p, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b">seq%d\n" % i)
            # split into ragged lines
            for j in range(0, len(s), 60):
                f.write(s[j:j + 60] + b"\n")
    fa = FastaFile(p)
    want = _collect(sliding_windows(np.frombuffer(s, np.uint8), 31)
                    for s in seqs if len(s) >= 31)
    got = _collect(fa.term_windows(31, chunk_bytes=chunk))
    np.testing.assert_array_equal(got, want)
    assert got.shape[0] == fa.num_terms(31)


def test_fastq_packed_windows_bit_exact(tmp_path, rng):
    p = tmp_path / "d.fastq"
    seqs = [_random_seq(rng, n) for n in (100, 31, 30, 64, 150)]
    with open(p, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b"@r%d\n" % i + s + b"\n+\n" + b"I" * len(s) + b"\n")
    fq = FastqFile(p)
    want = _collect(sliding_windows(np.frombuffer(s, np.uint8), 31)
                    for s in seqs if len(s) >= 31)
    for chunk in (1, 512, 1 << 20):  # 1 => one batch per read
        got = _collect(fq.term_windows(31, chunk_bytes=chunk))
        np.testing.assert_array_equal(got, want)
    assert want.shape[0] == fq.num_terms(31)


@pytest.mark.parametrize("chunk", [32, 100, 1 << 20])
def test_text_chunked_windows_bit_exact(tmp_path, rng, chunk):
    p = tmp_path / "d.txt"
    data = rng.integers(32, 127, size=5000, dtype=np.uint8).tobytes()
    p.write_bytes(data)
    tf = TextFile(p)
    want = sliding_windows(np.frombuffer(data, np.uint8), 19)
    got = _collect(tf.term_windows(19, chunk_bytes=chunk))
    np.testing.assert_array_equal(got, want)
    assert got.shape[0] == tf.num_terms(19)


def test_native_sequence_fast_path_matches_window_path(rng):
    from cobs_tpu import native
    if native.lib() is None:
        pytest.skip("native library unavailable")
    seq = np.frombuffer(_random_seq(rng, 3000), np.uint8)
    view = sliding_windows(seq, 31)           # strides (1, 1) view
    assert view.strides == (1, 1)
    dense = np.ascontiguousarray(view)        # strides (31, 1) copy
    for canonical in (0, 1):
        a, ga = native.window_rows(view, 3, 99991, canonical)
        b, gb = native.window_rows(dense, 3, 99991, canonical)
        np.testing.assert_array_equal(a, b)
        assert ga == gb


_RSS_SCRIPT = r"""
import os, sys
import numpy as np

def vm_hwm_kib():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                return int(line.split()[1])
    raise SystemExit("no VmHWM")

path = sys.argv[1]
# write a ~192 MiB single-sequence FASTA without holding it in memory
rng = np.random.default_rng(7)
block = np.frombuffer(b"ACGT", np.uint8)[
    rng.integers(0, 4, size=4 << 20)].tobytes()
with open(path, "wb") as f:
    f.write(b">big\n")
    for _ in range(48):
        f.write(block)
        f.write(b"\n")
del block

from cobs_tpu.ingest.fasta import FastaFile
from cobs_tpu.construct.bitmatrix import doc_row_indices
from cobs_tpu.settings import settings
settings.disable_cache = True

base = vm_hwm_kib()
fa = FastaFile(path)
total = 0
acc = np.uint64(0)
for w in fa.term_windows(31):
    rows, _ = doc_row_indices(w, 1 << 20, 1, 1)
    total += w.shape[0]
    acc ^= np.bitwise_xor.reduce(rows)
peak = vm_hwm_kib()
assert total == fa.num_terms(31), (total, fa.num_terms(31))
growth_mib = (peak - base) / 1024.0
print(f"terms={total} growth_mib={growth_mib:.1f}")
# document is 192 MiB; bounded streaming must stay far below that
assert growth_mib < 120, growth_mib
"""


def test_large_document_bounded_rss(tmp_path):
    """A ~192 MiB single-sequence FASTA streams through construction
    hashing with < 120 MiB of additional peak RSS (whole-file ingest
    would add >= the file size)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", _RSS_SCRIPT, str(tmp_path / "big.fasta")],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr + r.stdout
    assert "growth_mib" in r.stdout
