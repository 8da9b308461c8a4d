"""Construction semantics oracles: resume/continue, clobber, compact
payload identity (reference: tests/compact_index_construction.cpp,
cobs/construction/classic_index.cpp:173-174, 603-631)."""

import shutil
from pathlib import Path

import numpy as np
import pytest

import cobs_tpu
from cobs_tpu.fmt import classic as fmt_classic
from cobs_tpu.fmt import compact as fmt_compact
from cobs_tpu.settings import settings

DATA = Path(__file__).parent / "data"


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


def test_clobber_refusal_and_force(fasta_dir, tmp_path):
    out = tmp_path / "x.cobs_classic"
    dl = cobs_tpu.DocumentList(fasta_dir)
    cobs_tpu.classic_construct(
        dl, out, index_params=cobs_tpu.ClassicIndexParameters())
    with pytest.raises(Exception, match="[Oo]utput file exists"):
        cobs_tpu.classic_construct(
            dl, out, index_params=cobs_tpu.ClassicIndexParameters())
    cobs_tpu.classic_construct(
        dl, out,
        index_params=cobs_tpu.ClassicIndexParameters(clobber=True))


def test_continue_skips_finished_batches(fasta_dir, tmp_path):
    """--continue reuses the tmp dir; finished batch files are not
    rebuilt (their mtimes survive)."""
    out = tmp_path / "x.cobs_classic"
    tmp = tmp_path / "tmp"
    dl = cobs_tpu.DocumentList(fasta_dir)
    p = cobs_tpu.ClassicIndexParameters(keep_temporary=True)
    cobs_tpu.classic_construct(dl, out, tmp, index_params=p)
    batch_files = sorted(tmp.rglob("*.cobs_classic"))
    assert batch_files
    mtimes = {f: f.stat().st_mtime_ns for f in batch_files}
    out.unlink()

    p2 = cobs_tpu.ClassicIndexParameters(continue_=True,
                                         keep_temporary=True)
    cobs_tpu.classic_construct(dl, out, tmp, index_params=p2)
    assert out.is_file()
    for f, m in mtimes.items():
        if f.exists():
            assert f.stat().st_mtime_ns == m, f


def test_compact_payload_identical_to_classic_subindices(fasta_dir,
                                                         tmp_path):
    """Each compact page's payload is bit-identical to the intermediate
    classic sub-index it came from
    (reference: tests/compact_index_construction.cpp:143-169)."""
    out = tmp_path / "x.cobs_compact"
    tmp = tmp_path / "tmp"
    dl = cobs_tpu.DocumentList(fasta_dir)
    p = cobs_tpu.CompactIndexParameters(page_size=1, keep_temporary=True)
    cobs_tpu.compact_construct(dl, out, tmp, index_params=p)

    h, pages = fmt_compact.read_compact_index(out)
    subindex_files = sorted(tmp.rglob("*.cobs_classic"))
    assert len(subindex_files) >= len(pages) > 0
    # the per-page combined classic files are the deepest ones
    per_page = [f for f in subindex_files]
    matched = 0
    for pg, param in zip(pages, h.parameters):
        for f in per_page:
            ch = fmt_classic.read_classic_header(f)
            if ch.signature_size != param.signature_size:
                continue
            _, rows = fmt_classic.read_classic_index(f)
            if rows.shape[0] != pg.shape[0]:
                continue
            if (pg[:, :rows.shape[1]] == rows).all() and \
                    (pg[:, rows.shape[1]:] == 0).all():
                matched += 1
                break
    assert matched == len(pages)


def test_compact_per_page_signature_sizes(tmp_path, rng):
    """Each compact page's signature size equals calc_signature_size of
    the page's largest (8th) document's term count
    (reference: tests/compact_index_construction.cpp:107-115)."""
    from cobs_tpu.core.params import calc_signature_size

    docs = tmp_path / "docs"
    docs.mkdir()
    bases = np.frombuffer(b"ACGT", np.uint8)
    term_counts = []
    for i in range(32):
        n = 100 + 13 * i
        seq = bases[rng.integers(0, 4, size=n)].tobytes()
        (docs / f"d{i:02d}.fasta").write_bytes(b">s\n" + seq + b"\n")
        term_counts.append(n - 30)
    out = tmp_path / "x.cobs_compact"
    p = cobs_tpu.CompactIndexParameters(
        page_size=1, num_hashes=3, false_positive_rate=0.1, clobber=True)
    cobs_tpu.compact_construct(cobs_tpu.DocumentList(docs), out,
                               index_params=p)
    h, _ = fmt_compact.read_compact_header(out)
    term_counts.sort()
    for pg, param in enumerate(h.parameters):
        largest = term_counts[min(pg * 8 + 7, len(term_counts) - 1)]
        assert param.signature_size == calc_signature_size(
            largest, 3, 0.1)
        assert param.num_hashes == 3


def test_multi_batch_construct_and_combine_golden(fasta_dir, tmp_path):
    """A tiny memory budget forces multiple batch files and the
    hierarchical combine; the golden query must still be exact
    (reference: cobs/construction/classic_index.cpp:143-148, 642-647)."""
    from cobs_tpu.query.search import Search

    out = tmp_path / "x.cobs_classic"
    p = cobs_tpu.ClassicIndexParameters(clobber=True, num_threads=1)
    p.mem_bytes = 1  # batch_size floors at 8 docs -> 7 docs still 1
    # force real multi-batch: duplicate corpus to 14 docs
    for f in list(fasta_dir.iterdir()):
        if f.suffix in (".fasta",):
            (fasta_dir / ("z_" + f.name)).write_bytes(f.read_bytes())
    dl = cobs_tpu.DocumentList(fasta_dir)
    assert dl.size() > 8
    cobs_tpu.classic_construct(dl, out, index_params=p)
    r = Search(str(out)).search(
        "AGTCAACGCTAAGGCATTTCCCCCCTGCCTCCTGCCTGCTGCCAAGCCCT", 0.0)
    scores = {x.doc_name: x.score for x in r}
    assert scores["sample1"] == 20
    assert scores["z_sample1"] == 20
    assert len(r) == dl.size()


def test_document_list_ignores_unknown_extensions(tmp_path):
    d = tmp_path / "mix"
    d.mkdir()
    (d / "a.fasta").write_text(">s\nACGTACGTACGTACGTACGTACGTACGTACGTACGT\n")
    (d / "junk.bin").write_bytes(b"\x00\x01")
    (d / "notes.md").write_text("hello")
    dl = cobs_tpu.DocumentList(d)
    assert dl.size() == 1


def test_interleave_rows_bit_packing_slow_path(rng):
    """Row interleave with non-byte-aligned widths (the bit-shifting
    slow path, reference: classic_index.cpp:194-327)."""
    from cobs_tpu.construct.classic import _interleave_rows

    R = 17
    a = rng.integers(0, 256, size=(R, 1), dtype=np.uint8)  # 5 bits used
    b = rng.integers(0, 256, size=(R, 1), dtype=np.uint8)  # 3 bits used
    a &= 0x1F
    b &= 0x07
    out = _interleave_rows([a, b], [5, 3])
    assert out.shape == (R, 1)
    want = (a[:, 0] | (b[:, 0] << 5)).astype(np.uint8)
    np.testing.assert_array_equal(out[:, 0], want)

    # byte-aligned fast path for comparison
    c = rng.integers(0, 256, size=(R, 2), dtype=np.uint8)
    out2 = _interleave_rows([c, b], [16, 3])
    np.testing.assert_array_equal(out2[:, :2], c)
    np.testing.assert_array_equal(out2[:, 2], b[:, 0])
