"""Equal-size compact page coalescing (HBM re-layout).

Pages whose Bloom signature sizes are equal probe the same row per
hash, so DeviceIndex merges groups of m consecutive equal-size pages
column-wise into one wider page at load time (engine._load_matrix_
coalesced) — fewer, wider gathers for the same bits. These tests pin
the merge-factor arithmetic and bit-exactness of the merged layout
against the unmerged load (reference page layout:
cobs/construction/compact_index.cpp:171-340).
"""

import numpy as np
import pytest

import cobs_tpu
from cobs_tpu.fmt.compact import coalesce_factor
from cobs_tpu.query.engine import DeviceIndex, create_hashes, score_batch
from cobs_tpu.settings import settings


@pytest.fixture(autouse=True)
def _no_cache():
    settings.disable_cache = True
    yield
    settings.disable_cache = False


def test_coalesce_factor_arithmetic():
    assert coalesce_factor([7]) == 1
    assert coalesce_factor([7, 7, 7, 7]) == 4          # uniform: one page
    assert coalesce_factor([7, 7, 9, 9]) == 2          # two equal runs
    assert coalesce_factor([7, 7, 7, 9]) == 1          # break at 3 ∤ 4
    assert coalesce_factor([7, 9, 7, 9]) == 1          # alternating
    assert coalesce_factor([7, 7, 9, 9, 8, 8]) == 2    # three runs of 2
    assert coalesce_factor([7, 7, 7, 9, 9, 9]) == 3
    assert coalesce_factor([7, 7, 7, 7, 9, 9]) == 2    # gcd(6, 4) = 2
    # every group must be a single size: factor divides ALL run breaks
    assert coalesce_factor([7, 7, 9, 9, 9, 9, 8, 8]) == 2


def _build_corpus(tmp_path, rng, doc_lens):
    docs = tmp_path / "docs"
    docs.mkdir()
    bases = np.frombuffer(b"ACGT", np.uint8)
    for i, n in enumerate(doc_lens):
        seq = bases[rng.integers(0, 4, size=n)].tobytes()
        (docs / f"d{i:03d}.fasta").write_bytes(b">s\n" + seq + b"\n")
    return docs


def _load_both(monkeypatch, idx):
    monkeypatch.setenv("COBS_TPU_COALESCE_PAGES", "0")
    plain = DeviceIndex.from_file(idx)
    monkeypatch.delenv("COBS_TPU_COALESCE_PAGES")
    merged = DeviceIndex.from_file(idx)
    return plain, merged


@pytest.mark.parametrize("layout", ["uniform", "two_runs"])
def test_coalesced_scores_bit_exact(tmp_path, rng, monkeypatch, layout):
    if layout == "uniform":
        doc_lens = [300] * 64            # 4 pages, one signature size
        want_merged_pages = 1
    else:
        doc_lens = [300] * 32 + [4000] * 32   # [a, a, b, b] -> m = 2
        want_merged_pages = 2
    docs = _build_corpus(tmp_path, rng, doc_lens)
    idx = tmp_path / "x.cobs_compact"
    cobs_tpu.compact_construct(
        cobs_tpu.DocumentList(docs), idx,
        index_params=cobs_tpu.CompactIndexParameters(
            num_hashes=2, page_size=2, clobber=True))

    plain, merged = _load_both(monkeypatch, idx)
    assert plain.num_pages == 4
    assert merged.num_pages == want_merged_pages
    assert merged.counts_size == plain.counts_size
    assert merged.docs_per_page * merged.num_pages == \
        plain.docs_per_page * plain.num_pages
    assert merged.file_names == plain.file_names

    bases = np.frombuffer(b"ACGT", np.uint8)
    queries = [bases[rng.integers(0, 4, size=n)].tobytes()
               for n in (31, 64, 200)]
    # a real-positive query: a window of one of the documents
    seq = (docs / "d000.fasta").read_bytes().splitlines()[1]
    queries.append(seq[40:140])
    hashes = create_hashes(queries, plain.term_size, plain.num_hashes,
                           plain.canonicalize)
    np.testing.assert_array_equal(
        score_batch(merged, hashes), score_batch(plain, hashes))


def test_run_coalesce_without_uniform_factor(tmp_path, rng,
                                             monkeypatch):
    """Sizes [a, a, a, b]: the run break at 3 divides nothing, so no
    uniform factor exists — the RUN coalescer merges the 3-page run
    anyway, tracking variable doc counts per merged page
    (DeviceIndex.page_docs), and every score stays bit-exact."""
    doc_lens = [300] * 48 + [4000] * 16
    docs = _build_corpus(tmp_path, rng, doc_lens)
    idx = tmp_path / "x.cobs_compact"
    cobs_tpu.compact_construct(
        cobs_tpu.DocumentList(docs), idx,
        index_params=cobs_tpu.CompactIndexParameters(
            num_hashes=1, page_size=2, clobber=True))
    plain, merged = _load_both(monkeypatch, idx)
    assert plain.num_pages == 4
    assert merged.num_pages == 2
    assert list(merged.page_docs) == [48, 16]
    assert merged.counts_size == plain.counts_size
    assert merged.file_names == plain.file_names

    bases = np.frombuffer(b"ACGT", np.uint8)
    queries = [bases[rng.integers(0, 4, size=n)].tobytes()
               for n in (31, 64, 200)]
    seq = (docs / "d000.fasta").read_bytes().splitlines()[1]
    queries.append(seq[40:140])
    seq2 = (docs / "d060.fasta").read_bytes().splitlines()[1]
    queries.append(seq2[100:400])   # positive in the second run
    hashes = create_hashes(queries, plain.term_size, plain.num_hashes,
                           plain.canonicalize)
    np.testing.assert_array_equal(
        score_batch(merged, hashes), score_batch(plain, hashes))


def test_run_coalesce_search_paths_exact(tmp_path, rng, monkeypatch):
    """Full Search surface over a run-coalesced index (4-tier corpus,
    tiers straddling page boundaries): full-rank, top-k, and the
    streamed top-k must equal the uncoalesced load exactly."""
    doc_lens = ([120] * 13 + [240] * 13 + [480] * 13 + [960] * 25)
    docs = _build_corpus(tmp_path, rng, doc_lens)
    idx = tmp_path / "x.cobs_compact"
    cobs_tpu.compact_construct(
        cobs_tpu.DocumentList(docs), idx,
        index_params=cobs_tpu.CompactIndexParameters(
            num_hashes=1, page_size=2, clobber=True))
    merged = DeviceIndex.from_file(idx)
    assert merged.page_docs is not None, "fixture must run-coalesce"
    monkeypatch.setenv("COBS_TPU_COALESCE_PAGES", "0")
    plain = DeviceIndex.from_file(idx)
    monkeypatch.delenv("COBS_TPU_COALESCE_PAGES")
    assert plain.num_pages > merged.num_pages

    s_m = cobs_tpu.Search(merged)
    s_p = cobs_tpu.Search(plain)
    seqs = [(docs / f"d{i:03d}.fasta").read_bytes().splitlines()[1]
            for i in (0, 20, 40, 60)]
    queries = [seqs[0][:80].decode(), seqs[1][10:90].decode(),
               seqs[2][:45].decode(), seqs[3][200:500].decode()] * 3

    def pairs(results):
        return [[(r.doc_name, r.score) for r in rl] for rl in results]

    for thr, k in ((0.0, 0), (0.5, 0), (0.8, 100), (0.1, 5)):
        got = s_m.search_batch(queries, threshold=thr, num_results=k)
        want = s_p.search_batch(queries, threshold=thr, num_results=k)
        assert pairs(got) == pairs(want), (thr, k)
    got = list(s_m.search_stream(queries, threshold=0.2,
                                 num_results=7, batch_size=4))
    want = list(s_p.search_stream(queries, threshold=0.2,
                                  num_results=7, batch_size=4))
    assert pairs(got) == pairs(want)


def test_repack_bit_exact_and_queryable(tmp_path, rng, monkeypatch):
    """`cobs repack` materializes the merge into a real compact file:
    identical scores through BOTH backends, valid format round-trip."""
    from cobs_tpu.cli.main import main as cli_main
    from cobs_tpu.fmt.compact import read_compact_header
    from cobs_tpu.query.engine import StreamedIndex

    docs = _build_corpus(tmp_path, rng, [500] * 64)  # 4 uniform pages
    idx = tmp_path / "x.cobs_compact"
    cobs_tpu.compact_construct(
        cobs_tpu.DocumentList(docs), idx,
        index_params=cobs_tpu.CompactIndexParameters(
            num_hashes=2, page_size=2, clobber=True))
    out = tmp_path / "wide.cobs_compact"
    assert cli_main(["repack", str(idx), str(out)]) == 0

    h0, _ = read_compact_header(idx)
    h1, _ = read_compact_header(out)
    assert h1.page_size == 4 * h0.page_size
    assert len(h1.parameters) == 1
    assert h1.file_names == h0.file_names
    assert h1.parameters[0].signature_size == \
        h0.parameters[0].signature_size

    monkeypatch.setenv("COBS_TPU_COALESCE_PAGES", "0")
    plain = DeviceIndex.from_file(idx)
    repacked = DeviceIndex.from_file(out)
    assert repacked.num_pages == 1
    bases = np.frombuffer(b"ACGT", np.uint8)
    queries = [bases[rng.integers(0, 4, size=n)].tobytes()
               for n in (31, 100, 333)]
    hashes = create_hashes(queries, plain.term_size, plain.num_hashes,
                           plain.canonicalize)
    want = score_batch(plain, hashes)
    np.testing.assert_array_equal(score_batch(repacked, hashes), want)
    np.testing.assert_array_equal(StreamedIndex(out).score_batch(hashes),
                                  want)

    # --page-size target: pick the largest achievable <= the ask
    out2 = tmp_path / "mid.cobs_compact"
    from cobs_tpu.construct.compact import compact_repack
    new_page = compact_repack(idx, out2,
                              page_size=2 * h0.page_size + 1)
    assert new_page == 2 * h0.page_size
    h2, _ = read_compact_header(out2)
    assert len(h2.parameters) == 2
    rp2 = DeviceIndex.from_file(out2)
    np.testing.assert_array_equal(score_batch(rp2, hashes), want)

    # clobber contract
    with pytest.raises(FileExistsError):
        compact_repack(idx, out)


def test_repack_rejects_unmergeable(tmp_path, rng):
    from cobs_tpu.construct.compact import compact_repack

    docs = _build_corpus(tmp_path, rng, [300] * 48 + [4000] * 16)
    idx = tmp_path / "x.cobs_compact"
    cobs_tpu.compact_construct(
        cobs_tpu.DocumentList(docs), idx,
        index_params=cobs_tpu.CompactIndexParameters(
            num_hashes=1, page_size=2, clobber=True))
    with pytest.raises(ValueError, match="unequal Bloom sizes"):
        compact_repack(idx, tmp_path / "y.cobs_compact")


def test_repack_rejects_same_path(tmp_path, rng):
    """In-place repack would truncate the memmapped input (SIGBUS +
    data loss); it must be refused up front."""
    from cobs_tpu.construct.compact import compact_repack

    docs = _build_corpus(tmp_path, rng, [300] * 16)
    idx = tmp_path / "x.cobs_compact"
    cobs_tpu.compact_construct(
        cobs_tpu.DocumentList(docs), idx,
        index_params=cobs_tpu.CompactIndexParameters(
            num_hashes=1, page_size=1, clobber=True))
    with pytest.raises(ValueError, match="must differ from input"):
        compact_repack(idx, idx, clobber=True)


def test_run_cap_splits_skewed_runs():
    """_best_run_cap picks the pages-per-merged-page cap minimizing
    tile-padded gather bytes (widest within 5% on ties), and
    _split_runs chunks at original page boundaries."""
    from cobs_tpu.query.engine import _best_run_cap, _split_runs

    # one 64-page run + 8 singleton runs at 64 B pages: padding every
    # merged page to 64 pages costs 9 x 4096 B/term; capping at 8
    # costs 16 x 512 B — the old all-or-nothing merge was refused
    # here, the capped one is a 4.5x byte win over it
    runs = [(0, 64)] + [(64 + i, 1) for i in range(8)]
    cap = _best_run_cap(runs, page_size=64)
    assert cap == 8
    split = _split_runs(runs, cap)
    assert split[:8] == [(i * 8, 8) for i in range(8)]
    assert split[8:] == [(64 + i, 1) for i in range(8)]
    assert sum(n for _, n in split) == 72

    # balanced runs at the same tile width: ties prefer the WIDEST cap
    # (wider rows gather faster per byte)
    runs = [(0, 11), (11, 10), (21, 9), (30, 10)]
    assert _best_run_cap(runs, page_size=64) == 11
    # sub-tile pages: every cap <= 8 pages costs one 512 B tile per
    # merged page, so the widest full-run cap wins outright
    assert _best_run_cap([(0, 3), (3, 1)], page_size=2) == 3


def test_capped_run_merge_scores_bit_exact(tmp_path, rng, monkeypatch):
    """End-to-end: a corpus whose run profile triggers capping loads
    with MORE merged pages than maximal runs, scores bit-exact, and
    keeps the public doc numbering."""
    from cobs_tpu.fmt.compact import coalesce_runs, read_compact_header

    # 7 pages of small docs (one run) + 1 big-doc page: page_size=2
    # keeps construction cheap; force the tile boundary with a
    # monkeypatched pad so capping engages at this tiny scale
    doc_lens = [150] * 112 + [3000] * 16
    docs = _build_corpus(tmp_path, rng, doc_lens)
    idx = tmp_path / "x.cobs_compact"
    cobs_tpu.compact_construct(
        cobs_tpu.DocumentList(docs), idx,
        index_params=cobs_tpu.CompactIndexParameters(
            num_hashes=1, page_size=2, clobber=True))
    h, _ = read_compact_header(idx)
    runs = coalesce_runs([p.signature_size for p in h.parameters])
    assert max(n for _, n in runs) == 7

    import cobs_tpu.query.engine as eng
    real_pad = eng._pad_words
    # pretend the lane tile is 2 words (8 B) so the byte-cost model
    # sees the skew at page_size=2: cap then splits the 7-run
    monkeypatch.setattr(eng, "_pad_words",
                        lambda w: max(2, -(-w // 2) * 2))
    try:
        cap = eng._best_run_cap(runs, page_size=2)
        assert cap < 7
    finally:
        monkeypatch.setattr(eng, "_pad_words", real_pad)

    # unpatched end-to-end load still merges (cap = widest here) and
    # stays bit-exact vs the unmerged layout
    plain, merged = _load_both(monkeypatch, idx)
    assert merged.num_pages < plain.num_pages
    assert merged.counts_size == plain.counts_size
    queries = [(docs / f"d{i:03d}.fasta").read_bytes().splitlines()[1]
               [:100] for i in (0, 50, 115)]
    hashes = create_hashes(queries, plain.term_size, plain.num_hashes,
                           plain.canonicalize)
    np.testing.assert_array_equal(
        score_batch(merged, hashes), score_batch(plain, hashes))


def test_run_coalesce_skips_wasteful_skew():
    """A skewed run profile (one long run + many distinct tail sizes)
    would pad every merged page to the long run's width — the
    worthwhileness guard must refuse it (HBM/gather inflation),
    keeping the unmerged load."""
    from cobs_tpu.query.engine import _runs_worthwhile
    from cobs_tpu.fmt.compact import coalesce_runs

    # 64 equal pages then 8 distinct large-signature pages
    sig_sizes = [1000] * 64 + [2000 + i for i in range(8)]
    runs = coalesce_runs(sig_sizes)
    assert max(n for _, n in runs) == 64
    assert not _runs_worthwhile(runs, sig_sizes, page_size=64)
    # balanced runs stay worthwhile
    sig2 = [1000] * 9 + [2000] * 10 + [3000] * 10 + [4000] * 11
    assert _runs_worthwhile(coalesce_runs(sig2), sig2, page_size=64)
