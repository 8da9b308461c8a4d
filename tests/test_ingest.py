"""Parsers and DocumentList over the parity corpora
(reference: tests/fasta_file.cpp, fastq_file.cpp, text_file.cpp,
cortex_file.cpp, fasta_multifile.cpp)."""

import os
from pathlib import Path

import numpy as np
import pytest

from cobs_tpu.ingest.cortex import CortexFile
from cobs_tpu.ingest.document_list import (
    DocumentList, FileType, identify_filetype, load)
from cobs_tpu.ingest.fasta import FastaFile
from cobs_tpu.ingest.fasta_multi import FastaMultifile
from cobs_tpu.ingest.fastq import FastqFile
from cobs_tpu.ingest.text import TextFile
from cobs_tpu.settings import settings

DATA = Path(__file__).parent / "data"


@pytest.fixture(autouse=True)
def _no_cache():
    settings.disable_cache = True
    yield
    settings.disable_cache = False


def _streamed_count(obj, k):
    return sum(w.shape[0] for w in obj.term_windows(k))


def test_fasta_dir_scan():
    dl = DocumentList(DATA / "fasta")
    assert dl.size() == 7
    assert [e.name for e in dl.list()] == [
        f"sample{i}" for i in range(1, 8)]


def test_fasta_num_terms_matches_stream():
    for path in sorted((DATA / "fasta").iterdir()):
        if identify_filetype(path) != FileType.Fasta:
            continue
        f = FastaFile(path)
        for k in [10, 31]:
            assert f.num_terms(k) == _streamed_count(f, k), path


def test_fasta_gzip_same_as_plain():
    plain = FastaFile(DATA / "fasta" / "sample1.fasta")
    # sample3 is gzipped; test it parses and counts consistently
    gz = FastaFile(DATA / "fasta" / "sample3.fasta.gz")
    assert gz.num_terms(31) == _streamed_count(gz, 31)
    assert plain.num_terms(31) == _streamed_count(plain, 31)


def test_fasta_cache_roundtrip(tmp_path):
    settings.disable_cache = False
    src = (DATA / "fasta" / "sample1.fasta").read_bytes()
    p = tmp_path / "s.fasta"
    p.write_bytes(src)
    f1 = FastaFile(p)
    assert os.path.exists(f1.cache_path())
    f2 = FastaFile(p)  # loads from cache
    assert f2.size_hist == f1.size_hist
    assert f2.size() == f1.size()
    assert f2.sequence_count == f1.sequence_count


def test_fastq_parse():
    for name in ["sample1.fastq", "sample2.fastq.gz", "sample3.fastq"]:
        f = FastqFile(DATA / "fastq" / name)
        assert f.num_terms(31) == _streamed_count(f, 31)
        assert f.sequence_count > 0


def test_text_parse():
    t = TextFile(DATA / "text" / "sample1.txt")
    n = t.size()
    assert t.num_terms(31) == n - 30
    ws = list(t.term_windows(31))
    assert sum(w.shape[0] for w in ws) == n - 30
    # q-grams include newlines verbatim
    raw = (DATA / "text" / "sample1.txt").read_bytes()
    assert ws[0][0].tobytes() == raw[:31]


@pytest.mark.parametrize("name,k", [("sample1-k15", 15),
                                    ("sample1-k19", 19),
                                    ("sample1-k31", 31)])
def test_cortex_matches_ground_truth(name, k):
    """Streamed k-mers equal the checked-in ground-truth dumps
    (reference: tests/cortex_file.cpp)."""
    ctx = CortexFile(DATA / "cortex" / f"{name}.ctx")
    assert ctx.kmer_size == k
    truth = (DATA / "cortex" / f"{name}.txt").read_text().split()
    got = ["".join(map(chr, row)) for row in ctx.kmers()]
    assert sorted(got) == sorted(truth)


def test_cortex_document():
    ctx = CortexFile(DATA / "cortex" / "document.ctx")
    truth = (DATA / "cortex" / "document_sorted.txt").read_text().split()
    got = sorted("".join(map(chr, row)) for row in ctx.kmers())
    assert got == sorted(truth)


def test_fasta_multifile():
    m1 = FastaMultifile(DATA / "fasta_multi" / "sample1.mfasta")
    assert m1.num_documents() == 1
    m = FastaMultifile(DATA / "fasta_multi" / "sample2.mfasta")
    assert m.num_documents() == 5
    entries = load(DATA / "fasta_multi" / "sample2.mfasta")
    assert len(entries) == m.num_documents()
    assert entries[0].name.endswith("_000000")
    # sizes equal concatenated sequence length
    for i in range(m.num_documents()):
        assert m.size(i) == m.subdoc_sequence(i).size


def test_list_file():
    # the .list file names 4 fasta files relative to its own directory
    dl = DocumentList(DATA / "fasta_files.list")
    assert dl.size() == 4
    assert {e.name for e in dl.list()} == {
        "sample1", "sample2", "sample3", "sample6"}


def test_document_entry_num_terms():
    dl = DocumentList(DATA / "fasta")
    for e in dl.list():
        assert e.num_terms(31) == sum(
            w.shape[0] for w in e.term_windows(31))


def test_mfasta_rewritten_at_same_path_rereads(tmp_path):
    """Handle LRU + index cache are keyed on the file's stat signature:
    rewriting an .mfasta at the same path mid-process must not serve
    stale bytes from the old inode."""
    import os
    import time

    p = tmp_path / "x.mfasta"
    p.write_bytes(b">a\nACGTACGT\n>b\nGGGGCCCC\n")
    m = FastaMultifile(p, use_cache=False)
    assert m.subdoc_sequence(0).tobytes() == b"ACGTACGT"
    # rewrite via replace (new inode) and in place (same inode)
    q = tmp_path / "y.mfasta"
    q.write_bytes(b">a\nTTTTTTTT\n>b\nAAAACCCC\n")
    os.replace(q, p)
    m2 = FastaMultifile(p, use_cache=False)
    assert m2.subdoc_sequence(0).tobytes() == b"TTTTTTTT"
    time.sleep(0.01)   # ensure a distinct mtime_ns for in-place write
    p.write_bytes(b">a\nCCCCGGGG\n>b\nAAAATTTT\n")
    m3 = FastaMultifile(p, use_cache=False)
    assert m3.subdoc_sequence(1).tobytes() == b"AAAATTTT"


def test_list_file_comments_and_blanks(tmp_path):
    """# comments and blank lines are skipped; relative paths resolve
    against the list file's directory
    (reference: cobs/document_list.hpp:345-407)."""
    import shutil
    shutil.copytree(DATA / "fasta", tmp_path / "fasta")
    lst = tmp_path / "docs.list"
    lst.write_text("# a comment\n\nfasta/sample1.fasta\n"
                   "# another\nfasta/sample4.fasta\n\n")
    dl = DocumentList(lst)
    assert {e.name for e in dl.list()} == {"sample1", "sample4"}
