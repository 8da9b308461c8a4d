"""File format round-trips (reference: tests/file.cpp)."""

import io

import numpy as np
import pytest

from cobs_tpu.fmt import classic, compact, kmer_buffer, magic
from cobs_tpu.core import kmer as kmer_codec


def test_classic_roundtrip(tmp_path, rng):
    h = classic.ClassicIndexHeader(
        term_size=31, canonicalize=1, signature_size=200, num_hashes=3,
        file_names=[f"file_{i}" for i in range(33)])
    assert h.row_size == 5
    data = rng.integers(0, 256, size=(200, 5), dtype=np.uint8)
    p = tmp_path / "t.cobs_classic"
    classic.write_classic_index(p, h, data)

    h2, data2 = classic.read_classic_index(p)
    assert h2 == h
    np.testing.assert_array_equal(data, data2)
    assert classic.is_classic_file(p)
    assert not compact.is_compact_file(p)


def test_compact_roundtrip(tmp_path, rng):
    page_size = 16
    params = [compact.CompactSubIndexParams(100, 2),
              compact.CompactSubIndexParams(317, 2)]
    h = compact.CompactIndexHeader(
        term_size=31, canonicalize=1, page_size=page_size,
        parameters=params,
        file_names=[f"doc_{i}" for i in range(2 * 8 * page_size)])
    pages = [rng.integers(0, 256, size=(p.signature_size, page_size),
                          dtype=np.uint8) for p in params]
    p = tmp_path / "t.cobs_compact"
    compact.write_compact_index(p, h, pages)

    h2, pages2 = compact.read_compact_index(p)
    assert h2 == h
    for a, b in zip(pages, pages2):
        np.testing.assert_array_equal(a, b)

    # payload must start page-aligned (reference: tests/
    # compact_index_construction.cpp:39-58)
    raw = p.read_bytes()
    buf = io.BytesIO(raw)
    compact.CompactIndexHeader.deserialize(buf)
    assert buf.tell() % page_size == 0
    assert compact.is_compact_file(p)


def test_kmer_buffer_roundtrip(tmp_path, rng):
    packed = kmer_codec.random_packed(50, 31, rng)
    p = tmp_path / "t.cobs_doc"
    kmer_buffer.write_kmer_buffer(p, "mydoc", 31, packed)
    h, packed2 = kmer_buffer.read_kmer_buffer(p)
    assert h.name == "mydoc"
    assert h.kmer_size == 31
    np.testing.assert_array_equal(packed, packed2)
    assert kmer_buffer.is_kmer_buffer_file(p)


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.cobs_classic"
    p.write_bytes(b"NOT A COBS FILE")
    assert not classic.is_classic_file(p)
    with pytest.raises(magic.FileIOError):
        classic.read_classic_index(p)


def test_base_name_strips_all_extensions():
    """reference: tests/file.cpp:21-24 + cobs/util/file.hpp:69-76"""
    from cobs_tpu.ingest.util import base_name
    assert base_name("data/out/file/classic_index.cobs_doc") == \
        "classic_index"
    assert base_name("/a/b/sample3.fasta.gz") == "sample3"
    assert base_name("plain") == "plain"


def test_compact_header_page_alignment_empty(tmp_path):
    """Payload starts page-aligned even with no parameters/files
    (reference: tests/file.cpp:122-144)."""
    import io
    from cobs_tpu.fmt.compact import CompactIndexHeader
    h = CompactIndexHeader(term_size=31, canonicalize=1, page_size=4096,
                           parameters=[], file_names=[])
    buf = io.BytesIO()
    h.serialize(buf)
    assert buf.tell() % 4096 == 0
