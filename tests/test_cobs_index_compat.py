"""The reference's own Python API test, run verbatim against the shim
(reference: python/tests/test_cobs_index.py:1-64)."""

import shutil
from pathlib import Path

import pytest

import cobs_index as cobs

DATA = Path(__file__).parent / "data"
GOLDEN = "AGTCAACGCTAAGGCATTTCCCCCCTGCCTCCTGCCTGCTGCCAAGCCCT"


@pytest.fixture(autouse=True)
def _no_cache():
    cobs.disable_cache()
    yield
    cobs.disable_cache(False)


@pytest.fixture()
def datadir(tmp_path):
    shutil.copytree(DATA / "fasta", tmp_path / "fasta")
    return tmp_path


def test_doc_list(datadir):
    l1 = cobs.DocumentList(datadir / "fasta")
    assert l1.size() == 7

    l2 = cobs.DocumentList()
    l2.add_recursive(datadir / "fasta")
    assert l2.size() == 7


def test_classic_construct_query(datadir):
    index_file = datadir / "python_test.cobs_classic"
    p = cobs.ClassicIndexParameters()
    p.clobber = True
    cobs.classic_construct(
        input=str(datadir / "fasta"),
        out_file=index_file,
        index_params=p)
    assert index_file.is_file()

    s = cobs.Search(str(index_file))
    r = s.search(GOLDEN)
    assert len(r) == 7
    assert r[0].doc_name == "sample1"
    assert r[0].score == 20


def test_compact_construct_query(datadir):
    index_file = datadir / "python_test.cobs_compact"
    p = cobs.CompactIndexParameters()
    p.clobber = True
    cobs.compact_construct(
        input=str(datadir / "fasta"),
        out_file=index_file,
        index_params=p)
    assert index_file.is_file()

    s = cobs.Search(str(index_file))
    r = s.search(GOLDEN)
    assert len(r) == 7
    assert r[0].doc_name == "sample1"
    assert r[0].score == 20


def test_classic_construct_list(datadir):
    dl = cobs.DocumentList(datadir / "fasta")
    index_file = datadir / "list_test.cobs_classic"
    p = cobs.ClassicIndexParameters()
    p.clobber = True
    cobs.classic_construct_list(dl, index_file, index_params=p)
    assert index_file.is_file()
