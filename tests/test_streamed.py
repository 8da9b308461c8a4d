"""Host-mmap streamed backend vs the HBM-resident engine (bit-exact)."""

import shutil
from pathlib import Path

import numpy as np
import pytest

import cobs_tpu
from cobs_tpu.query.engine import (
    DeviceIndex,
    StreamedIndex,
    create_hashes,
    score_batch,
)
from cobs_tpu.query.search import Search
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


def _mk(tmp_path, fasta_dir, kind):
    idx = tmp_path / f"t.cobs_{kind}"
    dl = cobs_tpu.DocumentList(fasta_dir)
    if kind == "classic":
        cobs_tpu.classic_construct(
            dl, idx,
            index_params=cobs_tpu.ClassicIndexParameters(clobber=True))
    else:
        cobs_tpu.compact_construct(
            dl, idx,
            index_params=cobs_tpu.CompactIndexParameters(clobber=True))
    return idx


@pytest.mark.parametrize("score_mode", ["host", "device"])
@pytest.mark.parametrize("kind", ["classic", "compact"])
def test_streamed_scores_match_device(tmp_path, fasta_dir, kind,
                                      score_mode, monkeypatch):
    idx = _mk(tmp_path, fasta_dir, kind)
    dev = DeviceIndex.from_file(idx)
    st = StreamedIndex(idx)
    monkeypatch.setattr(settings, "streamed_host_score", score_mode)
    queries = [GOLDEN_QUERY.encode(), GOLDEN_QUERY[3:].encode()]
    hashes = create_hashes(queries, dev.term_size, dev.num_hashes,
                           dev.canonicalize)
    np.testing.assert_array_equal(st.score_batch(hashes),
                                  score_batch(dev, hashes))


@pytest.mark.parametrize("kind", ["classic", "compact"])
def test_host_and_device_streamed_agree_random(tmp_path, fasta_dir,
                                               kind, monkeypatch):
    """Randomized queries: the native expansion-add kernel and the
    upload+device path must be bit-identical."""
    idx = _mk(tmp_path, fasta_dir, kind)
    st = StreamedIndex(idx)
    rng = np.random.default_rng(5)
    # raw unmodded u64 hashes, varying term counts incl. > 64
    hashes = [rng.integers(0, 1 << 63, size=(t, st.num_hashes),
                           dtype=np.uint64)
              for t in (1, 7, 130)]
    monkeypatch.setattr(settings, "streamed_host_score", "host")
    got_host = st.score_batch(hashes)
    monkeypatch.setattr(settings, "streamed_host_score", "device")
    got_dev = st.score_batch(hashes)
    np.testing.assert_array_equal(got_host, got_dev)
    monkeypatch.setattr(settings, "streamed_host_score", "host")
    vh, dh = st.score_topk(hashes, 5)
    monkeypatch.setattr(settings, "streamed_host_score", "device")
    vd, dd = st.score_topk(hashes, 5)
    np.testing.assert_array_equal(vh, vd)
    # doc order may differ only where scores are -1 padding
    np.testing.assert_array_equal(dh[vh >= 0], dd[vd >= 0])


@pytest.mark.parametrize("kind", ["classic", "compact"])
def test_striped_hbm_load_matches(tmp_path, fasta_dir, kind,
                                  monkeypatch):
    """DeviceIndex loads stripe-by-stripe; force many tiny stripes and
    verify scores equal the streamed (mmap) backend bit-exactly."""
    from cobs_tpu.query import engine

    idx = _mk(tmp_path, fasta_dir, kind)
    monkeypatch.setattr(engine, "_UPLOAD_STRIPE_BYTES", 1 << 12)
    dev = DeviceIndex.from_file(idx)
    # stripe of 4 KiB over >= 512 B rows -> at most 8 rows per transfer
    assert dev.matrix.shape[0] > (1 << 12) // (dev.word_width * 4)
    st = StreamedIndex(idx)
    queries = [GOLDEN_QUERY.encode(), GOLDEN_QUERY[3:].encode()]
    hashes = create_hashes(queries, dev.term_size, dev.num_hashes,
                           dev.canonicalize)
    np.testing.assert_array_equal(score_batch(dev, hashes),
                                  st.score_batch(hashes))


@pytest.mark.parametrize("score_mode", ["host", "device"])
@pytest.mark.parametrize("kind", ["classic", "compact"])
def test_cold_cache_scores_match_warm(tmp_path, fasta_dir, kind,
                                      score_mode, monkeypatch):
    """drop_cache mode pulls rows with the io_uring batch (falling back
    to mmap when unavailable); scores must equal the warm path."""
    idx = _mk(tmp_path, fasta_dir, kind)
    monkeypatch.setattr(settings, "streamed_host_score", score_mode)
    warm = StreamedIndex(idx)
    cold = StreamedIndex(idx, drop_cache=True)
    queries = [GOLDEN_QUERY.encode(), GOLDEN_QUERY[3:].encode()]
    hashes = create_hashes(queries, warm.term_size, warm.num_hashes,
                           warm.canonicalize)
    np.testing.assert_array_equal(cold.score_batch(hashes),
                                  warm.score_batch(hashes))
    vw, dw = warm.score_topk(hashes, 5)
    vc, dc = cold.score_topk(hashes, 5)
    np.testing.assert_array_equal(vc, vw)
    np.testing.assert_array_equal(dc[vc >= 0], dw[vw >= 0])


def test_uring_gather_bit_exact(tmp_path, fasta_dir):
    """The io_uring row gather equals direct payload reads (skipped
    when the kernel/seccomp denies io_uring)."""
    from cobs_tpu import native

    idx = _mk(tmp_path, fasta_dir, "classic")
    st = StreamedIndex(idx)
    rng = np.random.default_rng(9)
    rows = rng.integers(0, st.total_rows, size=300).astype(np.int64)
    out = np.zeros((300, st._row_bytes), dtype=np.uint8)
    if not native.gather_rows_file(st.path, st._payload_off,
                                   st._row_bytes, rows, out):
        pytest.skip("io_uring unavailable in this environment")
    np.testing.assert_array_equal(out, np.asarray(st._payload[rows]))


def test_uring_dontcache_gather_bit_exact(tmp_path, fasta_dir):
    """RWF_DONTCACHE (cache-bypass) reads return identical bytes; on
    kernels/filesystems without the flag the gather must still complete
    (through the cache) and report unsupported rather than fail — the
    reference's O_DIRECT-cold behavior (aio_search_file.cpp:23-41)."""
    from cobs_tpu import native

    idx = _mk(tmp_path, fasta_dir, "classic")
    st = StreamedIndex(idx)
    rng = np.random.default_rng(11)
    rows = rng.integers(0, st.total_rows, size=300).astype(np.int64)
    out = np.zeros((300, st._row_bytes), dtype=np.uint8)
    if not native.gather_rows_file(st.path, st._payload_off,
                                   st._row_bytes, rows, out,
                                   dontcache=True):
        pytest.skip("io_uring unavailable in this environment")
    np.testing.assert_array_equal(out, np.asarray(st._payload[rows]))
    # the probe ran, so support is now a definite boolean either way
    assert native.dontcache_supported() in (True, False)


def test_after_score_skips_eviction_under_dontcache(tmp_path, fasta_dir,
                                                    monkeypatch):
    """When DONTCACHE reads are active, the per-batch fadvise eviction
    is a no-op (the reads never warmed the cache); without support the
    eviction fallback must still run."""
    from cobs_tpu import native

    idx = _mk(tmp_path, fasta_dir, "classic")
    cold = StreamedIndex(idx, drop_cache=True)
    calls = []
    monkeypatch.setattr(cold, "drop_cache", lambda: calls.append(1))

    monkeypatch.setattr(native, "_dontcache_ok", True)
    cb = cold._after_score()
    assert cb is not None
    cb()
    assert calls == []

    monkeypatch.setattr(native, "_dontcache_ok", False)
    cold._after_score()()
    assert calls == [1]

    warm = StreamedIndex(idx)
    assert warm._after_score() is None


def test_search_streamed_golden(tmp_path, fasta_dir):
    idx = _mk(tmp_path, fasta_dir, "classic")
    s = Search(str(idx), streamed=True)
    assert isinstance(s.index_files[0], StreamedIndex)
    r = s.search(GOLDEN_QUERY)
    assert (r[0].doc_name, r[0].score) == ("sample1", 20)
    assert len(r) == 7


def test_search_auto_streams_large_indices(tmp_path, fasta_dir,
                                           monkeypatch):
    idx = _mk(tmp_path, fasta_dir, "classic")
    monkeypatch.setattr(settings, "max_device_index_bytes", 10)
    s = Search(str(idx))
    assert isinstance(s.index_files[0], StreamedIndex)
    monkeypatch.setattr(settings, "load_complete_index", True)
    s = Search(str(idx))
    assert isinstance(s.index_files[0], DeviceIndex)


@pytest.mark.parametrize("score_mode", ["host", "device"])
@pytest.mark.parametrize("num_results", [0, 3])
def test_search_stream_pipelined_streamed_backend(
        tmp_path, fasta_dir, score_mode, num_results, monkeypatch):
    """The pipelined stream over a StreamedIndex (host- and
    device-scored, full and top-k) must equal search_batch."""
    idx = _mk(tmp_path, fasta_dir, "compact")
    monkeypatch.setattr(settings, "streamed_host_score", score_mode)
    s = Search(str(idx), streamed=True)
    queries = [GOLDEN_QUERY, GOLDEN_QUERY[:40], GOLDEN_QUERY[5:]] * 2
    want = s.search_batch(queries, 0.0, num_results)
    got = list(s.search_stream(iter(queries), 0.0, num_results,
                               batch_size=2))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert [(r.doc_name, r.score) for r in a] == \
            [(r.doc_name, r.score) for r in b]


def test_search_stream_topk_device(tmp_path, fasta_dir):
    idx = _mk(tmp_path, fasta_dir, "classic")
    s = Search(str(idx), streamed=False)
    queries = [GOLDEN_QUERY, GOLDEN_QUERY[:40], GOLDEN_QUERY[2:]] * 2
    for threshold, k in ((0.0, 3), (0.8, 1), (0.0, 50)):
        want = s.search_batch(queries, threshold, k)
        got = list(s.search_stream(iter(queries), threshold, k,
                                   batch_size=2))
        for a, b in zip(got, want):
            assert [(r.doc_name, r.score) for r in a] == \
                [(r.doc_name, r.score) for r in b], (threshold, k)


def test_search_stream_short_query_yields_error(tmp_path, fasta_dir):
    """One malformed query must not kill the serving loop
    (reference dies process-wide: classic_search.cpp:66-107)."""
    from cobs_tpu.query.search import QueryError

    idx = _mk(tmp_path, fasta_dir, "classic")
    for streamed in (False, True):
        s = Search(str(idx), streamed=streamed)
        queries = [GOLDEN_QUERY, "ACGT", GOLDEN_QUERY[5:],
                   "AGTCAACGCTAANGGCATTTCCCCCCTGCCTCCTGCCTGCTG"]
        got = list(s.search_stream(iter(queries), 0.0, batch_size=2))
        assert len(got) == 4
        assert isinstance(got[1], QueryError)
        assert "too short" in got[1].message
        assert not got[1] and len(got[1]) == 0
        assert isinstance(got[3], QueryError)
        assert "Invalid DNA base pair" in got[3].message
        # the valid slots still score exactly
        want = s.search_batch([queries[0], queries[2]], 0.0)
        for a, b in ((got[0], want[0]), (got[2], want[1])):
            assert [(r.doc_name, r.score) for r in a] == \
                [(r.doc_name, r.score) for r in b]


def test_streamed_topk_matches_full(tmp_path, fasta_dir):
    idx = _mk(tmp_path, fasta_dir, "classic")
    s = Search(str(idx), streamed=True)
    assert isinstance(s.index_files[0], StreamedIndex)
    for threshold in (0.0, 0.8):
        full = s.search(GOLDEN_QUERY, threshold, 0)
        for k in (1, 3, 10):
            got = s.search(GOLDEN_QUERY, threshold, k)
            assert [(r.doc_name, r.score) for r in got] == \
                [(r.doc_name, r.score) for r in full[:k]]
