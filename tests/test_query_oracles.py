"""Reference query-invariant oracles over synthetic .cobs_doc corpora
(reference: tests/classic_index_query.cpp, tests/test_util.hpp:42-102).

Fixtures mirror the reference's generators:
- generate_documents_all: every canonicalized query k-mer i lands in
  documents j with j % (i % (n-1) + 1) == 0;
- generate_documents_one: only the query's FIRST k-mer, document i
  contains it 10*i+1 times (duplicates must not inflate the score).
"""


import numpy as np
import pytest

import cobs_tpu
from cobs_tpu.core.canonical import canonicalize_batch
from cobs_tpu.core.kmer import encode
from cobs_tpu.fmt.kmer_buffer import write_kmer_buffer
from cobs_tpu.ingest.util import pad_index, sliding_windows
from cobs_tpu.query.search import Search
from cobs_tpu.settings import settings
from cobs_tpu.utils.misc import random_sequence

K = 31
QUERY = random_sequence(50000, 2)


@pytest.fixture(autouse=True)
def _no_cache():
    settings.disable_cache = True
    yield
    settings.disable_cache = False


def _canon_kmers(query: str) -> np.ndarray:
    windows = sliding_windows(
        np.frombuffer(query.encode(), np.uint8), K)
    canon, good = canonicalize_batch(windows)
    assert good.all()
    return canon


def generate_documents_all(query, num_documents=33, num_terms=1000000,
                           out_dir=None):
    canon = _canon_kmers(query)[: min(num_terms, len(query) - K)]
    packed = encode(canon)
    docs = [[] for _ in range(num_documents)]
    for i in range(canon.shape[0]):
        step = i % (num_documents - 1) + 1
        for j in range(0, num_documents, step):
            docs[j].append(i)
    sizes = []
    for j, rows in enumerate(docs):
        name = "document_" + pad_index(j)
        write_kmer_buffer(out_dir / (name + ".cobs_doc"), name, K,
                          packed[rows])
        sizes.append(len(rows))
    return sizes


def generate_documents_one(query, num_documents=33, out_dir=None,
                           prefix=""):
    packed = encode(_canon_kmers(query)[:1])
    for i in range(num_documents):
        name = prefix + "document_" + pad_index(i)
        write_kmer_buffer(out_dir / (name + ".cobs_doc"), name, K,
                          np.repeat(packed, 10 * i + 1, axis=0))


def _construct(input_dir, index_path):
    p = cobs_tpu.ClassicIndexParameters(
        num_hashes=3, false_positive_rate=0.1, canonicalize=1,
        clobber=True)
    cobs_tpu.classic_construct(cobs_tpu.DocumentList(input_dir),
                               index_path, index_params=p)


def test_all_included_small_batch(tmp_path):
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    sizes = generate_documents_all(QUERY, out_dir=input_dir)
    index_path = tmp_path / "index.cobs_classic"
    _construct(input_dir, index_path)
    result = Search(str(index_path)).search(QUERY)
    assert len(result) == len(sizes)
    for r in result:
        index = int(r.doc_name[-2:])
        assert r.score >= sizes[index]


def test_one_included_small_batch(tmp_path):
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    generate_documents_one(QUERY, num_documents=2000, out_dir=input_dir)
    index_path = tmp_path / "index.cobs_classic"
    _construct(input_dir, index_path)
    result = Search(str(index_path)).search(QUERY)
    assert len(result) == 2000
    assert all(r.score == 1 for r in result)


def test_false_positive_bound(tmp_path):
    """<= 1070 positive scores per document over 10,000 random 31-mers
    (reference: tests/classic_index_query.cpp:113-146)."""
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    generate_documents_all(QUERY, out_dir=input_dir)
    index_path = tmp_path / "index.cobs_classic"
    _construct(input_dir, index_path)
    s = Search(str(index_path))

    queries = [random_sequence(31, i) for i in range(10000)]
    num_positive = {}
    for results in s.search_batch(queries):
        for r in results:
            assert r.score in (0, 1)
            num_positive[r.doc_name] = \
                num_positive.get(r.doc_name, 0) + r.score
    assert all(v <= 1070 for v in num_positive.values())


def test_one_included_multi_index_federation(tmp_path):
    """33+44+55-document indices federated in one search
    (reference: tests/classic_index_query.cpp:156-197)."""
    paths = []
    for n in (33, 44, 55):
        input_dir = tmp_path / f"input{n}"
        input_dir.mkdir()
        generate_documents_one(QUERY, num_documents=n,
                               out_dir=input_dir, prefix=f"i{n}_")
        index_path = tmp_path / f"index{n}.cobs_classic"
        _construct(input_dir, index_path)
        paths.append(str(index_path))
    result = Search(paths).search(QUERY)
    assert len(result) == 33 + 44 + 55
    assert all(r.score == 1 for r in result)


def test_classic_combine_ten_indices(tmp_path):
    """Construct 10 small indices, hierarchically combine, then every
    source k-mer must find its document
    (reference: tests/classic_index_construction.cpp:95-152)."""
    from cobs_tpu.construct.classic import classic_combine
    from cobs_tpu.core.kmer import decode

    index_dir = tmp_path / "index"
    index_dir.mkdir()
    doc_sets = []
    for ds in range(10):
        query = random_sequence(10000, ds + 1)
        input_dir = tmp_path / "input" / pad_index(ds)
        input_dir.mkdir(parents=True)
        canon = _canon_kmers(query)[:100]
        packed = encode(canon)
        docs = [[] for _ in range(3)]
        for i in range(canon.shape[0]):
            step = i % 2 + 1
            for j in range(0, 3, step):
                docs[j].append(i)
        kept = []
        for j, rows in enumerate(docs):
            name = f"set_{pad_index(ds)}_document_{pad_index(j)}"
            write_kmer_buffer(input_dir / (name + ".cobs_doc"), name, K,
                              packed[rows])
            kept.append(canon[rows])
        doc_sets.append(kept)
        p = cobs_tpu.ClassicIndexParameters(
            num_hashes=3, false_positive_rate=0.1, clobber=True)
        cobs_tpu.classic_construct(
            cobs_tpu.DocumentList(input_dir),
            index_dir / (pad_index(ds) + ".cobs_classic"),
            index_params=p)

    done, result_file = classic_combine(
        index_dir, tmp_path / "combined", 128 * 1024 * 1024, 4, False)
    assert done and result_file is not None

    s = Search(str(result_file))
    queries, expected = [], []
    for ds in range(10):
        for d, kmers in enumerate(doc_sets[ds]):
            for kmer in np.unique(kmers, axis=0)[:10]:
                queries.append(kmer.tobytes().decode())
                expected.append(
                    f"set_{pad_index(ds)}_document_{pad_index(d)}")
    for results, want in zip(s.search_batch(queries), expected):
        assert any(r.doc_name == want and r.score > 0 for r in results)


def test_classic_combine_many_files_threaded(tmp_path):
    """Many batch files under the global fd budget: 40 inputs combined
    with 8 threads must equal the single-threaded result byte for byte
    (grouping differs, final interleave order must not; reference fd
    budget: classic_index.cpp:385-423)."""
    from cobs_tpu.construct.classic import classic_combine
    from cobs_tpu.fmt import classic as fmt_classic

    rng = np.random.default_rng(17)
    sig = 64
    for threads, out_name in ((1, "t1"), (8, "t8")):
        index_dir = tmp_path / f"in_{out_name}"
        index_dir.mkdir()
        rng = np.random.default_rng(17)   # same inputs for both runs
        for i in range(40):
            h = fmt_classic.ClassicIndexHeader(
                term_size=31, canonicalize=1, signature_size=sig,
                num_hashes=2,
                file_names=[f"b{pad_index(i)}_d{j}"
                            for j in range(1 + i % 13)])
            data = rng.integers(0, 256, size=(sig, h.row_size),
                                dtype=np.uint8)
            fmt_classic.write_classic_index(
                index_dir / (pad_index(i) + ".cobs_classic"), h, data)
        level, in_dir = 0, index_dir
        while True:
            out_dir = tmp_path / f"lvl_{out_name}_{level}"
            done, result = classic_combine(in_dir, out_dir,
                                           8 * sig, threads, False)
            if done:
                break
            in_dir, level = out_dir, level + 1
        (tmp_path / f"final_{out_name}").write_bytes(
            result.read_bytes())
    assert (tmp_path / "final_t1").read_bytes() == \
        (tmp_path / "final_t8").read_bytes()


def test_resultlist_cut_and_pairs():
    """cut() prefix refinement must equal re-filtering; pairs() must
    match iteration (both are the serving front-end's hot helpers)."""
    import numpy as np

    from cobs_tpu.query.search import ResultList

    rng = np.random.default_rng(7)
    names = [f"d{i}" for i in range(50)]
    scores = rng.integers(0, 20, size=40).astype(np.int64)
    gidx = rng.permutation(50)[:40]
    order = np.lexsort((gidx, -scores))
    rl = ResultList(names, gidx[order], scores[order])

    assert rl.pairs() == [[r.doc_name, r.score] for r in rl]
    for thr in (0, 1, 5, 19, 25):
        got = rl.cut(min_score=thr)
        want = [r for r in rl if r.score >= thr]
        assert list(got) == want, thr
        for lim in (0, 3, 100):
            assert list(rl.cut(min_score=thr, limit=lim)) == want[:lim]
    assert list(rl.cut(limit=4)) == list(rl)[:4]


def test_rank_sparse_batch_equals_per_query(tmp_path):
    """The vectorized single-index top-k ranking (prefix length on the
    already-sorted lax.top_k rows) must equal the general per-query
    merge for every threshold."""
    import numpy as np

    import cobs_tpu

    rng = np.random.default_rng(17)
    docs = tmp_path / "docs"
    docs.mkdir()
    bases = np.frombuffer(b"ACGT", np.uint8)
    for i in range(12):
        seq = bases[rng.integers(0, 4, size=200)].tobytes()
        (docs / f"d{i}.fasta").write_bytes(b">s\n" + seq + b"\n")
    idx = tmp_path / "x.cobs_classic"
    cobs_tpu.classic_construct(
        cobs_tpu.DocumentList(docs), idx,
        index_params=cobs_tpu.ClassicIndexParameters(clobber=True))
    s = cobs_tpu.Search(str(idx))

    B, k = 5, 7
    # synthetic sorted top-k rows incl. -1 padding and score ties
    v = np.sort(rng.integers(-1, 20, size=(B, k)))[:, ::-1] \
        .astype(np.int32)
    d = np.stack([np.sort(rng.choice(12, size=k, replace=False))
                  for _ in range(B)]).astype(np.int64)
    qbytes = [b"A" * (31 + rng.integers(0, 40)) for _ in range(B)]
    for thr in (0.0, 0.1, 0.5, 1.0):
        lims = s._sparse_lims(qbytes, thr)
        fast = s._rank_sparse_batch(v, d, lims, k)
        for b in range(B):
            slow = s._rank_sparse([(v[b], d[b])], [int(lims[b])], k)
            assert [(r.doc_name, r.score) for r in fast[b]] == \
                [(r.doc_name, r.score) for r in slow], (b, thr)


def test_rank_sparse_multi_equals_per_query(tmp_path):
    """The vectorized federation top-k ranking (composed-key argsort)
    must equal the per-query merge oracle for every threshold,
    including -1 padding, cross-index score ties, and mixed term
    sizes (different per-index floors)."""
    import numpy as np

    import cobs_tpu

    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", np.uint8)
    idx_paths = []
    sizes = [9, 13]
    for j, n in enumerate(sizes):
        docs = tmp_path / f"docs{j}"
        docs.mkdir()
        for i in range(n):
            seq = bases[rng.integers(0, 4, size=180)].tobytes()
            (docs / f"g{j}_{i}.fasta").write_bytes(
                b">s\n" + seq + b"\n")
        idx = tmp_path / f"x{j}.cobs_classic"
        cobs_tpu.classic_construct(
            cobs_tpu.DocumentList(docs), idx,
            index_params=cobs_tpu.ClassicIndexParameters(
                term_size=31 if j == 0 else 21, clobber=True))
        idx_paths.append(str(idx))
    s = cobs_tpu.Search(idx_paths)

    B, k = 6, 8
    fetched = []
    for n in sizes:
        # sorted top-k rows incl. -1 padding; ties collide across
        # indexes so the merge order is exercised
        v = np.sort(rng.integers(-1, 6, size=(B, k)))[:, ::-1] \
            .astype(np.int32)
        d = np.stack([np.sort(rng.choice(n, size=k, replace=False))
                      for _ in range(B)]).astype(np.int64)
        fetched.append((v, d))
    qbytes = [b"A" * (31 + int(rng.integers(0, 40))) for _ in range(B)]
    for thr in (0.0, 0.02, 0.1, 1.0):
        lims = s._sparse_lims_multi(qbytes, thr)
        fast = s._rank_sparse_multi(fetched, lims, k)
        for b in range(B):
            slow = s._rank_sparse(
                [(v[b], d[b]) for v, d in fetched],
                [int(lims[j][b]) for j in range(len(sizes))], k)
            assert [(r.doc_name, r.score) for r in fast[b]] == \
                [(r.doc_name, r.score) for r in slow], (b, thr)


def test_merge_topk_host_equals_lexsort():
    """The vectorized mesh top-k merge must equal the naive per-query
    (score desc, doc asc) lexsort on randomized shard candidates."""
    import numpy as np

    from cobs_tpu.parallel.sharded import _merge_topk_host
    from cobs_tpu.query.engine import _uniform_layout

    rng = np.random.default_rng(41)
    W32, docs_per_page = 64, 64
    lay = _uniform_layout(4, W32 // 32, docs_per_page)
    for trial in range(5):
        B, k, shards = int(rng.integers(1, 9)), 10, 4
        S = shards * k
        # unique flat indices per row (docs partition across shards),
        # heavy score ties, -1 padding rows
        g = np.stack([rng.permutation(4 * W32)[:S]
                      for _ in range(B + 1)]).astype(np.int32)
        v = rng.integers(-1, 5, size=(B + 1, S)).astype(np.int32)
        out_v, out_d = _merge_topk_host(v, g, W32, lay, B, k)
        doc = (g[:B].astype(np.int64) // W32) * docs_per_page \
            + g[:B] % W32
        for b in range(B):
            order = np.lexsort((doc[b], -v[b, :S].astype(np.int64)))[:k]
            assert np.array_equal(out_v[b], v[b][order]), (trial, b)
            assert np.array_equal(out_d[b], doc[b][order]), (trial, b)


def test_wide_row_planes_accumulator_bit_exact(monkeypatch):
    """The wide-row batch-tiled path (packed-plane scan carry,
    _gather_count_block planes_acc) must count bit-exactly like the
    untiled path. Force tiling at a small shape by shrinking the
    fused-chunk budget."""
    import numpy as np

    import jax.numpy as jnp

    from cobs_tpu.query import engine

    rng = np.random.default_rng(31)
    sig, W, B, T, h = 512, 128, 16, 600, 2
    matrix = jnp.asarray(rng.integers(
        0, 1 << 32, size=(sig + 1, W), dtype=np.uint64)
        .astype(np.uint32)).at[-1].set(0)
    rows = jnp.asarray(rng.integers(
        0, sig, size=(B, T, h, 1), dtype=np.int64).astype(np.int32))

    ref = np.asarray(engine._gather_count_planes(matrix, rows, h))
    # budget below one full-batch chunk -> _plan_tile tiles the batch
    monkeypatch.setattr(engine, "_FUSED_CHUNK_BYTES", 1 << 20)
    Bs, tc = engine._plan_tile(B, T, h, 1, W,
                               engine._plan_chunks(T, h, 1 << 30))
    assert Bs < B and tc is not None, (Bs, tc)
    got = np.asarray(engine._gather_count_planes(matrix, rows, h))
    assert np.array_equal(got, ref)
