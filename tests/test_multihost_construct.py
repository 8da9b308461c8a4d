"""Multi-host construction driver: deterministic partition, per-host
shard construction, query-time federation (single-process exercises of
cobs_tpu.parallel.distributed.construct; the real 2-process job is
tests/test_multihost.py + multihost_construct_worker.py).
"""

from pathlib import Path

import numpy as np
import pytest

import cobs_tpu
from cobs_tpu.parallel import distributed
from cobs_tpu.parallel.sharded import make_mesh
from cobs_tpu.query.search import Search
from cobs_tpu.settings import settings


@pytest.fixture(autouse=True)
def _no_cache():
    settings.disable_cache = True
    yield
    settings.disable_cache = False


def _corpus(tmp_path, n_docs=20, seed=3):
    rng = np.random.default_rng(seed)
    d = tmp_path / "docs"
    d.mkdir()
    bases = np.frombuffer(b"ACGT", np.uint8)
    seqs = []
    for i in range(n_docs):
        seq = bases[rng.integers(0, 4, size=120 + 41 * i)].tobytes()
        seqs.append(seq)
        (d / f"doc{i:03d}.fasta").write_bytes(b">d\n" + seq + b"\n")
    return d, seqs


def test_partition_documents_covers_and_aligns(tmp_path):
    d, _ = _corpus(tmp_path, n_docs=20)
    dl = cobs_tpu.DocumentList(d)
    parts = [distributed.partition_documents(dl, 2, i)
             for i in range(2)]
    assert len(parts[0]) % 8 == 0          # octet-aligned boundary
    assert len(parts[0]) + len(parts[1]) == 20
    names = [e.name for p in parts for e in p.list()]
    assert names == sorted(e.name for e in dl.list())
    # deterministic: same result from a re-scan
    again = distributed.partition_documents(
        cobs_tpu.DocumentList(d), 2, 0)
    assert [e.name for e in again.list()] == \
        [e.name for e in parts[0].list()]


def test_multihost_classic_federation_is_bit_exact(tmp_path):
    """Classic shards share the globally-computed signature size, so
    federated (doc, score) results equal the single-index build's
    exactly — FP noise included."""
    d, seqs = _corpus(tmp_path, n_docs=20)
    dl = cobs_tpu.DocumentList(d)
    single = tmp_path / "single.cobs_classic"
    cobs_tpu.classic_construct(
        dl, single,
        index_params=cobs_tpu.ClassicIndexParameters(clobber=True))

    prefix = tmp_path / "fed"
    paths = [distributed.construct(
        cobs_tpu.DocumentList(d), prefix, kind="classic",
        index_params=cobs_tpu.ClassicIndexParameters(clobber=True),
        num_processes=2, process_id=i) for i in range(2)]
    assert paths == distributed.shard_paths(prefix, 2, "classic")
    assert all(Path(p).is_file() for p in paths)

    fed = distributed.open_federated(prefix, 2, "classic")
    ref = Search(str(single))
    queries = [seqs[0][:60].decode(), seqs[9][10:80].decode(),
               seqs[19][:50].decode()]
    want = ref.search_batch(queries, 0.0)
    got = fed.search_batch(queries, 0.0)
    for a, b in zip(got, want):
        assert [(r.doc_name, r.score) for r in a] == \
            [(r.doc_name, r.score) for r in b]


@pytest.mark.parametrize("n_docs,page_size", [
    (24, 1),
    # 36 docs at 16 docs/page: the naive octet-rounded chunk (24) is
    # NOT a page multiple — this config breaks without page alignment
    (36, 2),
])
def test_multihost_compact_federation_is_bit_exact(tmp_path, n_docs,
                                                   page_size):
    """Compact shard boundaries align to whole pages (multiples of
    8*page_size documents in global size order), so every shard's pages
    are exactly the single-process build's pages and the federated
    (doc, score) results match it bit for bit — FP noise included
    (reference page machinery: cobs/construction/compact_index.cpp:
    171-340)."""
    d, seqs = _corpus(tmp_path, n_docs=n_docs)
    dl = cobs_tpu.DocumentList(d)
    single = tmp_path / "single.cobs_compact"
    cobs_tpu.compact_construct(
        dl, single, index_params=cobs_tpu.CompactIndexParameters(
            clobber=True, page_size=page_size))

    prefix = tmp_path / "fedc"
    for i in range(2):
        distributed.construct(
            cobs_tpu.DocumentList(d), prefix, kind="compact",
            index_params=cobs_tpu.CompactIndexParameters(
                clobber=True, page_size=page_size),
            num_processes=2, process_id=i)
    fed = distributed.open_federated(prefix, 2, "compact")
    for i in (0, 11, n_docs - 1):
        q = seqs[i][:62].decode()
        r = fed.search(q, 0.8)
        assert r[0].doc_name == f"doc{i:03d}"
        assert r[0].score == 62 - 31 + 1

    ref = Search(str(single))
    queries = [seqs[0][:62].decode(), seqs[11][5:90].decode(),
               seqs[n_docs - 1][:50].decode(), "ACGT" * 20]
    want = ref.search_batch(queries, 0.0)
    got = fed.search_batch(queries, 0.0)
    for a, b in zip(got, want):
        assert [(r.doc_name, r.score) for r in a] == \
            [(r.doc_name, r.score) for r in b]


def test_multihost_compact_global_default_page_size(tmp_path):
    """With page_size unset, every shard must use the page size the
    single-process build over the WHOLE corpus would pick, not one
    fitted to its slice."""
    from cobs_tpu.fmt.compact import read_compact_header

    d, _ = _corpus(tmp_path, n_docs=24)
    single = tmp_path / "single.cobs_compact"
    cobs_tpu.compact_construct(
        cobs_tpu.DocumentList(d), single,
        index_params=cobs_tpu.CompactIndexParameters(clobber=True))
    want_page = read_compact_header(single)[0].page_size

    prefix = tmp_path / "fedd"
    # 24 docs at the global default (8 B pages = 64 docs/page): one
    # page total, so only a 1-process "partition" is constructible —
    # the geometry contract is what's under test
    p = distributed.construct(
        cobs_tpu.DocumentList(d), prefix, kind="compact",
        index_params=cobs_tpu.CompactIndexParameters(clobber=True),
        num_processes=1, process_id=0)
    assert read_compact_header(p)[0].page_size == want_page
    # and a corpus with fewer docs than one page per process refuses
    # rather than silently de-aligning
    with pytest.raises(ValueError, match="fewer than one"):
        distributed.construct(
            cobs_tpu.DocumentList(d), tmp_path / "bad", kind="compact",
            index_params=cobs_tpu.CompactIndexParameters(clobber=True),
            num_processes=2, process_id=1)


def test_federated_search_over_mesh_matches(tmp_path):
    """open_federated(mesh=...) scores through the shard_map engine;
    results must equal the host federation."""
    d, seqs = _corpus(tmp_path, n_docs=16)
    prefix = tmp_path / "fedm"
    for i in range(2):
        distributed.construct(
            cobs_tpu.DocumentList(d), prefix, kind="classic",
            index_params=cobs_tpu.ClassicIndexParameters(clobber=True),
            num_processes=2, process_id=i)
    queries = [seqs[2][:60].decode(), seqs[13][:45].decode()]
    flat = distributed.open_federated(prefix, 2, "classic")
    mesh = make_mesh(n_batch=2, n_docs=4)
    meshed = distributed.open_federated(prefix, 2, "classic",
                                        mesh=mesh)
    want = flat.search_batch(queries, 0.0)
    got = meshed.search_batch(queries, 0.0)
    for a, b in zip(got, want):
        assert [(r.doc_name, r.score) for r in a] == \
            [(r.doc_name, r.score) for r in b]


def test_open_federated_missing_shard_raises(tmp_path):
    d, _ = _corpus(tmp_path, n_docs=8)
    prefix = tmp_path / "half"
    distributed.construct(
        cobs_tpu.DocumentList(d), prefix, kind="classic",
        index_params=cobs_tpu.ClassicIndexParameters(clobber=True),
        num_processes=2, process_id=0)
    with pytest.raises(FileNotFoundError):
        distributed.open_federated(prefix, 2, "classic")
