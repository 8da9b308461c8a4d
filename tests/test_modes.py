"""Coverage of the BASELINE.md workload configs: text q-gram mode (no
canonicalization), heterogeneous multi-index federation, the
benchmark-fpr harness, and a medium multi-document batch-query run."""

import shutil
from pathlib import Path

import numpy as np
import pytest

import cobs_tpu
from cobs_tpu.cli import main as cli
from cobs_tpu.query.search import Search
from cobs_tpu.settings import settings

DATA = Path(__file__).parent / "data"


@pytest.fixture(autouse=True)
def _no_cache():
    settings.disable_cache = True
    yield
    settings.disable_cache = False


def test_text_qgram_mode(tmp_path):
    """Text documents, q-grams over the raw byte stream, no
    canonicalization (reference: cobs/text_file.hpp:45-68)."""
    d = tmp_path / "text"
    shutil.copytree(DATA / "text", d)
    idx = tmp_path / "t.cobs_classic"
    p = cobs_tpu.ClassicIndexParameters(
        term_size=8, canonicalize=0, clobber=True)
    cobs_tpu.classic_construct(cobs_tpu.DocumentList(d), idx,
                               index_params=p)
    # an exact substring of sample1 must hit it with a full score
    content = (d / "sample1.txt").read_bytes()
    q = content[5:30]
    results = Search(str(idx)).search(q.decode(), threshold=1.0)
    names = [r.doc_name for r in results]
    assert "sample1" in names
    top = {r.doc_name: r.score for r in results}
    assert top["sample1"] == len(q) - 8 + 1


def test_heterogeneous_federation(tmp_path):
    """One search over indices with different term sizes and hash
    counts; per-index thresholds use each index's own term count
    (reference: cobs/query/classic_search.cpp:444-449)."""
    d = tmp_path / "fasta"
    shutil.copytree(DATA / "fasta", d)
    dl = cobs_tpu.DocumentList(d)
    i1 = tmp_path / "k31.cobs_classic"
    i2 = tmp_path / "k15.cobs_classic"
    cobs_tpu.classic_construct(
        dl, i1, index_params=cobs_tpu.ClassicIndexParameters(
            term_size=31, clobber=True))
    cobs_tpu.classic_construct(
        dl, i2, index_params=cobs_tpu.ClassicIndexParameters(
            term_size=15, num_hashes=2, clobber=True))
    q = "AGTCAACGCTAAGGCATTTCCCCCCTGCCTCCTGCCTGCTGCCAAGCCCT"
    results = Search([str(i1), str(i2)]).search(q, threshold=0.9)
    scores = {}
    for r in results:
        scores.setdefault(r.doc_name, []).append(r.score)
    # sample1 passes threshold in both indices: k31 -> 20, k15 -> 36
    assert sorted(scores["sample1"], reverse=True) == [36, 20]


def test_benchmark_fpr_harness(tmp_path, capsys):
    """The benchmark harness runs end-to-end and prints RESULT lines
    (reference: src/cobs.cpp:605-730)."""
    d = tmp_path / "fasta"
    shutil.copytree(DATA / "fasta", d)
    idx = tmp_path / "b.cobs_classic"
    assert cli.main(["classic-construct", str(d), str(idx),
                     "--clobber"]) == 0
    assert cli.main(["benchmark-fpr", str(idx), "-q", "50",
                     "-k", "40", "-w", "2"]) == 0
    out = capsys.readouterr().out
    assert "RESULT" in out


def test_medium_corpus_batch_query_file(tmp_path, rng, capsys):
    """~200-document corpus with a batch FASTA query file through the
    CLI (BASELINE.md config #3 scaled for CI)."""
    docs = tmp_path / "docs"
    docs.mkdir()
    bases = np.frombuffer(b"ACGT", np.uint8)
    seqs = []
    for i in range(200):
        seq = bases[rng.integers(0, 4, size=300)].tobytes()
        seqs.append(seq)
        (docs / f"d{i:03d}.fasta").write_bytes(b">s\n" + seq + b"\n")
    idx = tmp_path / "m.cobs_compact"
    assert cli.main(["compact-construct", str(docs), str(idx),
                     "--clobber"]) == 0
    qf = tmp_path / "q.fa"
    with open(qf, "wb") as f:
        for i in (0, 50, 150):
            f.write(b">q%d\n" % i + seqs[i][:80] + b"\n")
    assert cli.main(["query", "-i", str(idx), "-f", str(qf),
                     "-t", "1.0"]) == 0
    out = capsys.readouterr().out.splitlines()
    # each query's own document scores 80-31+1 = 50
    for i, tag in zip((0, 50, 150), ("q0", "q50", "q150")):
        j = out.index(next(l for l in out if l.startswith(f"*{tag}\t")))
        assert f"d{i:03d}\t50" in out[j + 1:j + 1 + int(
            out[j].split("\t")[1])]


def test_generate_queries_positives_are_findable(tmp_path, capsys):
    """Positive queries sampled by generate-queries hit their source
    document (reference: src/cobs.cpp:734-959)."""
    d = tmp_path / "fasta"
    shutil.copytree(DATA / "fasta", d)
    assert cli.main(["generate-queries", str(d), "--positive", "5",
                     "-k", "31", "-s", "31", "--seed", "7"]) == 0
    out = capsys.readouterr().out.splitlines()
    idx = tmp_path / "g.cobs_classic"
    assert cli.main(["classic-construct", str(d), str(idx),
                     "--clobber"]) == 0
    capsys.readouterr()
    pairs = [(out[i], out[i + 1]) for i in range(0, len(out) - 1, 2)
             if out[i].startswith(">doc:")]
    assert pairs
    s = cobs_tpu.Search(str(idx))
    checked = 0
    for header, seq in pairs:
        if set(seq) - set("ACGT"):
            continue   # invalid letters die in the query path, exactly
            # as in the reference (reference: classic_search.cpp:93-96)
        # header format: >doc:<doc_id>:term:<pos>:<name>
        name = header.split(":")[-1]
        results = s.search(seq, threshold=1.0)
        assert name in [r.doc_name for r in results], header
        checked += 1
    assert checked > 0


def test_compact_default_page_size_formula():
    from cobs_tpu.construct.compact import _round_up_pow2
    assert _round_up_pow2(1) == 1
    assert _round_up_pow2(3) == 4
    assert _round_up_pow2(4) == 4
    assert _round_up_pow2(1000) == 1024


def test_multifasta_subdocuments_end_to_end(tmp_path):
    """Each `>`-sequence of a multi-FASTA is its own indexed document;
    querying any sub-sequence's k-mers finds exactly that sub-document
    (reference: tests/fasta_multifile.cpp end-to-end section)."""
    d = tmp_path / "mf"
    shutil.copytree(DATA / "fasta_multi", d)
    dl = cobs_tpu.DocumentList(d)
    assert dl.size() == 6  # 2 files -> 6 sub-documents
    assert sorted({e.name[:7] for e in dl}) == ["sample1", "sample2"]
    idx = tmp_path / "mf.cobs_classic"
    cobs_tpu.classic_construct(
        dl, idx, index_params=cobs_tpu.ClassicIndexParameters(
            clobber=True, term_size=15))
    s = Search(str(idx))
    checked = 0
    for e in dl:
        done = False
        for w in e.term_windows(15):
            for row in w:
                seq = row.tobytes().decode()
                if set(seq) - set("ACGT"):
                    continue
                results = s.search(seq, threshold=1.0)
                assert e.name in [r.doc_name for r in results], e.name
                checked += 1
                done = True
                break
            if done:
                break
    assert checked >= 1  # sample2 contains protein sequences (invalid
    # DNA letters, exactly as the reference treats them)
