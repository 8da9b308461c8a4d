"""End-to-end: construct + query over the parity corpora.

The golden anchor is the reference's own Python test
(reference: python/tests/test_cobs_index.py:22-61): a 50 bp query over the
7-document FASTA corpus returns 7 results with top hit ("sample1", 20) —
20 = all 50-31+1 query k-mers matched — for both classic and compact
indices.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

import cobs_tpu
from cobs_tpu.core.params import calc_average_set_bit_ratio
from cobs_tpu.fmt import classic as fmt_classic
from cobs_tpu.fmt import compact as fmt_compact
from cobs_tpu.settings import settings

DATA = Path(__file__).parent / "data"
GOLDEN_QUERY = "AGTCAACGCTAAGGCATTTCCCCCCTGCCTCCTGCCTGCTGCCAAGCCCT"


@pytest.fixture(autouse=True)
def _no_cache():
    settings.disable_cache = True
    yield
    settings.disable_cache = False


@pytest.fixture()
def fasta_dir(tmp_path):
    d = tmp_path / "fasta"
    shutil.copytree(DATA / "fasta", d)
    return d


def test_classic_construct_and_golden_query(fasta_dir, tmp_path):
    index_file = tmp_path / "test.cobs_classic"
    dl = cobs_tpu.DocumentList(fasta_dir)
    p = cobs_tpu.ClassicIndexParameters(clobber=True)
    cobs_tpu.classic_construct(dl, index_file, index_params=p)
    assert index_file.is_file()

    h = fmt_classic.read_classic_header(index_file)
    assert h.term_size == 31
    assert h.canonicalize == 1
    assert h.num_hashes == 1
    assert len(h.file_names) == 7
    assert h.file_names == [f"sample{i}" for i in range(1, 8)]

    s = cobs_tpu.Search(str(index_file))
    r = s.search(GOLDEN_QUERY)
    assert len(r) == 7
    assert r[0].doc_name == "sample1"
    assert r[0].score == 20


def test_compact_construct_and_golden_query(fasta_dir, tmp_path):
    index_file = tmp_path / "test.cobs_compact"
    dl = cobs_tpu.DocumentList(fasta_dir)
    p = cobs_tpu.CompactIndexParameters(clobber=True)
    cobs_tpu.compact_construct(dl, index_file, index_params=p)
    assert index_file.is_file()

    h, _ = fmt_compact.read_compact_header(index_file)
    assert len(h.file_names) == 7

    s = cobs_tpu.Search(str(index_file))
    r = s.search(GOLDEN_QUERY)
    assert len(r) == 7
    assert r[0].doc_name == "sample1"
    assert r[0].score == 20


def test_classic_set_bit_ratio_bound(fasta_dir, tmp_path):
    """Per-document ones ratio bounded by the analytic expectation
    (reference: tests/classic_index_construction.cpp:73-92)."""
    index_file = tmp_path / "r.cobs_classic"
    dl = cobs_tpu.DocumentList(fasta_dir)
    p = cobs_tpu.ClassicIndexParameters(num_hashes=3,
                                        false_positive_rate=0.1,
                                        clobber=True)
    cobs_tpu.classic_construct(dl, index_file, index_params=p)
    h, rows = fmt_classic.read_classic_index(index_file)
    bound = calc_average_set_bit_ratio(h.signature_size, 3, 0.1)
    bits = np.unpackbits(rows, axis=1, bitorder="little")
    for d in range(len(h.file_names)):
        ratio = bits[:, d].mean()
        assert ratio <= 1.01 * bound


def test_query_every_source_kmer_finds_doc(fasta_dir, tmp_path):
    """Every k-mer of every source document must be found in that document
    (no false negatives — Bloom filters are one-sided)."""
    index_file = tmp_path / "fn.cobs_classic"
    dl = cobs_tpu.DocumentList(fasta_dir)
    cobs_tpu.classic_construct(
        dl, index_file,
        index_params=cobs_tpu.ClassicIndexParameters(clobber=True))
    from cobs_tpu.core.canonical import canonicalize_batch

    s = cobs_tpu.Search(str(index_file))
    for e in dl.list():
        windows = e.all_term_windows(31)
        # queries with non-ACGT letters are rejected (reference dies);
        # restrict to valid source k-mers
        _, good = canonicalize_batch(windows)
        windows = windows[good]
        if windows.shape[0] == 0:
            continue
        step = max(1, windows.shape[0] // 20)
        queries = ["".join(map(chr, w)) for w in windows[::step][:20]]
        for res_list, q in zip(s.search_batch(queries), queries):
            found = {r.doc_name: r.score for r in res_list}
            assert found.get(e.name, 0) >= 1, (e.name, q)


def test_batch_matches_serial(fasta_dir, tmp_path):
    index_file = tmp_path / "b.cobs_classic"
    dl = cobs_tpu.DocumentList(fasta_dir)
    cobs_tpu.classic_construct(
        dl, index_file,
        index_params=cobs_tpu.ClassicIndexParameters(clobber=True))
    s = cobs_tpu.Search(str(index_file))
    queries = [GOLDEN_QUERY, GOLDEN_QUERY[:40], GOLDEN_QUERY[5:]]
    batch = s.search_batch(queries, threshold=0.1)
    for q, want in zip(queries, batch):
        got = s.search(q, threshold=0.1)
        assert [(r.doc_name, r.score) for r in got] == \
            [(r.doc_name, r.score) for r in want]


def test_threshold_and_limit(fasta_dir, tmp_path):
    index_file = tmp_path / "t.cobs_classic"
    dl = cobs_tpu.DocumentList(fasta_dir)
    cobs_tpu.classic_construct(
        dl, index_file,
        index_params=cobs_tpu.ClassicIndexParameters(clobber=True))
    s = cobs_tpu.Search(str(index_file))
    # threshold 0.8: ceil(0.8*20)=16 -> only sample1 (score 20)
    r = s.search(GOLDEN_QUERY, threshold=0.8)
    assert [x.doc_name for x in r] == ["sample1"]
    # limit
    r = s.search(GOLDEN_QUERY, num_results=3)
    assert len(r) == 3
    assert r[0].doc_name == "sample1"


def test_multi_index_federation(fasta_dir, tmp_path):
    """Querying two sub-indices federated must equal one big index
    (reference: tests/classic_index_query.cpp:156-197)."""
    files = sorted(fasta_dir.iterdir())
    d1, d2 = tmp_path / "part1", tmp_path / "part2"
    d1.mkdir(), d2.mkdir()
    for f in files[:4]:
        shutil.copy(f, d1 / f.name)
    for f in files[4:]:
        shutil.copy(f, d2 / f.name)

    idx_all = tmp_path / "all.cobs_classic"
    idx1 = tmp_path / "p1.cobs_classic"
    idx2 = tmp_path / "p2.cobs_classic"
    P = cobs_tpu.ClassicIndexParameters
    cobs_tpu.classic_construct(cobs_tpu.DocumentList(fasta_dir), idx_all,
                               index_params=P(clobber=True))
    cobs_tpu.classic_construct(cobs_tpu.DocumentList(d1), idx1,
                               index_params=P(clobber=True))
    cobs_tpu.classic_construct(cobs_tpu.DocumentList(d2), idx2,
                               index_params=P(clobber=True))

    s_fed = cobs_tpu.Search([str(idx1), str(idx2)])
    r_fed = {x.doc_name: x.score for x in s_fed.search(GOLDEN_QUERY)}
    assert len(r_fed) == 7
    assert r_fed["sample1"] == 20
    # scores for the golden query must match the digested single index for
    # the true-positive doc; FP noise may differ (different Bloom sizes)
    s_all = cobs_tpu.Search(str(idx_all))
    r_all = {x.doc_name: x.score for x in s_all.search(GOLDEN_QUERY)}
    assert r_all["sample1"] == 20


def test_construct_resume_skips_existing(fasta_dir, tmp_path):
    """--continue reuses existing batch artifacts
    (reference: classic_index.cpp:173-174, 604-631)."""
    index_file = tmp_path / "c.cobs_classic"
    dl = cobs_tpu.DocumentList(fasta_dir)
    P = cobs_tpu.ClassicIndexParameters
    cobs_tpu.classic_construct(dl, index_file, index_params=P())
    with pytest.raises(FileExistsError):
        cobs_tpu.classic_construct(dl, index_file, index_params=P())
    # clobber overwrites
    cobs_tpu.classic_construct(dl, index_file,
                               index_params=P(clobber=True))
    assert index_file.is_file()
