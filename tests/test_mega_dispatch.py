"""Multi-batch mega-dispatch: K query batches scored inside ONE device
program (r3 verdict next item 1) must be bit-exact against per-batch
dispatch for every payload kind, and the serving surfaces that use it
(search_stream, QueryServer) must keep their ordering/error contracts.

Reference loop being beaten: src/cobs.cpp:471-527 (one query at a time).
"""

import json
import socket
from pathlib import Path

import numpy as np
import pytest

import cobs_tpu
from cobs_tpu.query.engine import (
    DeviceIndex,
    QueryBytes,
    create_hashes,
    score_batch,
    score_batch_multi_async,
    score_topk,
    score_topk_multi_async,
)
from cobs_tpu.query.search import QueryError, Search
from cobs_tpu.settings import settings
from cobs_tpu.utils.misc import random_sequence

DATA = Path(__file__).parent / "data"
GOLDEN_QUERY = "AGTCAACGCTAAGGCATTTCCCCCCTGCCTCCTGCCTGCTGCCAAGCCCT"


@pytest.fixture(autouse=True)
def _no_cache():
    settings.disable_cache = True
    yield
    settings.disable_cache = False


@pytest.fixture(scope="module")
def classic_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mega")
    index_file = tmp / "test.cobs_classic"
    dl = cobs_tpu.DocumentList(DATA / "fasta")
    p = cobs_tpu.ClassicIndexParameters(clobber=True)
    cobs_tpu.classic_construct(dl, index_file, index_params=p)
    return index_file


@pytest.fixture(scope="module")
def compact_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mega_compact")
    docs = tmp / "docs"
    docs.mkdir()
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    for i in range(24):
        seq = bases[rng.integers(0, 4, size=120 + 31 * i)].tobytes()
        (docs / f"d{i:02d}.fasta").write_bytes(b">s\n" + seq + b"\n")
    index_file = tmp / "x.cobs_compact"
    cobs_tpu.compact_construct(
        cobs_tpu.DocumentList(docs), index_file,
        index_params=cobs_tpu.CompactIndexParameters(
            num_hashes=2, page_size=1, clobber=True))
    return index_file


def _batches(n_batches, per_batch, seed=5):
    """Variable-length query batches (different T buckets on purpose)."""
    out = []
    for g in range(n_batches):
        qs = []
        for b in range(per_batch):
            ln = 40 + 13 * ((g * per_batch + b) % 7)
            qs.append(random_sequence(ln, seed + g * 100 + b).encode())
        out.append(qs)
    return out


@pytest.mark.parametrize("index_fixture", ["classic_index",
                                           "compact_index"])
@pytest.mark.parametrize("kind", ["device_hash", "host_hash"])
def test_multi_batch_scores_equal_per_batch(request, index_fixture,
                                            kind):
    ix = DeviceIndex.from_file(request.getfixturevalue(index_fixture))
    groups = _batches(3, 4)
    if kind == "device_hash":
        payloads = [QueryBytes(qs) for qs in groups]
    else:
        payloads = [create_hashes(qs, ix.term_size, ix.num_hashes,
                                  ix.canonicalize) for qs in groups]
    pend = score_batch_multi_async(ix, payloads)
    assert len(pend) == 3
    for g, qs in enumerate(groups):
        want = score_batch(ix, create_hashes(
            qs, ix.term_size, ix.num_hashes, ix.canonicalize))
        np.testing.assert_array_equal(pend[g].fetch(), want)


@pytest.mark.parametrize("kind", ["device_hash", "host_hash"])
def test_multi_batch_topk_equal_per_batch(classic_index, kind):
    ix = DeviceIndex.from_file(classic_index)
    groups = _batches(4, 3)
    if kind == "device_hash":
        payloads = [QueryBytes(qs) for qs in groups]
    else:
        payloads = [create_hashes(qs, ix.term_size, ix.num_hashes,
                                  ix.canonicalize) for qs in groups]
    pend = score_topk_multi_async(ix, payloads, 5)
    for g, qs in enumerate(groups):
        want_v, want_d = score_topk(ix, create_hashes(
            qs, ix.term_size, ix.num_hashes, ix.canonicalize), 5)
        got_v, got_d = pend[g].fetch()
        np.testing.assert_array_equal(got_v, want_v)
        np.testing.assert_array_equal(got_d, want_d)


def test_dispatch_group_power_of_two_decomposition(classic_index,
                                                   monkeypatch):
    """A 7-batch group dispatches as 4 + 2 + 1 with exact results."""
    import cobs_tpu.query.engine as eng

    monkeypatch.setattr(settings, "mega_batches", 8)
    s = Search(str(classic_index))
    multi_ks = []
    orig = eng.score_topk_multi_async
    monkeypatch.setattr(
        eng, "score_topk_multi_async",
        lambda ix, ps, k, t=None: multi_ks.append(len(ps))
        or orig(ix, ps, k, t))
    groups = _batches(7, 3)
    hashed_group = [s._hash_batch([q for q in qs]) for qs in groups]
    pendings = s._dispatch_group_async(hashed_group, 4)
    assert multi_ks == [4, 2]   # + one single dispatch
    assert len(pendings) == 7
    ix = s.index_files[0]
    for g, qs in enumerate(groups):
        want_v, want_d = score_topk(ix, create_hashes(
            qs, ix.term_size, ix.num_hashes, ix.canonicalize), 4)
        got_v, got_d = pendings[g][0].fetch()
        np.testing.assert_array_equal(got_v, want_v)
        np.testing.assert_array_equal(got_d, want_d)


@pytest.mark.parametrize("num_results", [0, 3])
def test_search_stream_mega_matches_batch(classic_index, monkeypatch,
                                          num_results):
    """search_stream under mega grouping: same results, same order,
    errors isolated to their slots."""
    monkeypatch.setattr(settings, "mega_batches", 4)
    s = Search(str(classic_index))
    assert s._mega_k() == 4
    queries = []
    for g, qs in enumerate(_batches(6, 3)):
        queries.extend(q.decode() for q in qs)
    queries.insert(5, "ACGT")          # too short -> QueryError slot
    queries.insert(11, "AXGT" * 20)    # invalid letter
    want = s.search_batch([q for q in queries
                           if q not in ("ACGT",) and "X" not in q],
                          0.0, num_results)
    got = list(s.search_stream(iter(queries), 0.0, num_results,
                               batch_size=3))
    errors = [g for g in got if isinstance(g, QueryError)]
    good = [g for g in got if not isinstance(g, QueryError)]
    assert len(errors) == 2
    assert len(good) == len(want)
    for g, w in zip(good, want):
        assert [(r.doc_name, r.score) for r in g] == \
            [(r.doc_name, r.score) for r in w]


@pytest.mark.parametrize("num_results", [0, 3])
def test_prepack_on_off_identical(classic_index, monkeypatch,
                                  num_results):
    """Worker-side query prepack (engine.prepack_query_bytes) must be
    invisible: identical results with COBS_TPU_PREPACK on and off,
    including a mega group whose batches pad to DIFFERENT term buckets
    (batch 1 all 50 bp, batch 2 all 120 bp) — that group must take the
    dispatch-side repack fallback in engine._multi_query_args because
    the prepacked shapes differ across the group."""
    monkeypatch.setattr(settings, "mega_batches", 2)
    s = Search(str(classic_index))
    queries = [GOLDEN_QUERY] * 3 + [
        random_sequence(120, seed) for seed in (17, 18, 19)]

    def run():
        return [
            [(r.doc_name, r.score) for r in rl]
            for rl in s.search_stream(iter(queries), 0.0, num_results,
                                      batch_size=3)]

    monkeypatch.setenv("COBS_TPU_PREPACK", "1")
    on = run()
    monkeypatch.setenv("COBS_TPU_PREPACK", "0")
    off = run()
    assert on == off
    assert len(on) == len(queries) and all(on)


def test_fullrank_mega_capped_by_hbm_budget(classic_index,
                                             monkeypatch):
    """Full-rank mega groups hold [K, B, slots] u16 buffers in HBM
    until fetched; a tiny budget must cap the group size (bit-exact
    results either way), and top-k groups must NOT be capped."""
    import cobs_tpu.query.search as qs

    monkeypatch.setattr(settings, "mega_batches", 8)
    monkeypatch.setattr(qs, "_MEGA_FULLRANK_BYTES", 1)
    s = Search(str(classic_index))
    calls = []
    orig = s._dispatch_multi_async

    def spy(group, num_results):
        calls.append(len(group))
        return orig(group, num_results)

    monkeypatch.setattr(s, "_dispatch_multi_async", spy)
    queries = [q.decode() for qs_ in _batches(8, 3) for q in qs_]
    want = s.search_batch(queries, 0.0, 0)
    got = list(s.search_stream(iter(queries), 0.0, 0, batch_size=3))
    assert not calls  # budget of 1 byte -> every dispatch single-batch
    for g, w in zip(got, want):
        assert [(r.doc_name, r.score) for r in g] == \
            [(r.doc_name, r.score) for r in w]
    # top-k is unaffected by the full-rank budget
    got = list(s.search_stream(iter(queries), 0.0, 5, batch_size=3))
    assert calls  # mega groups formed
    want = s.search_batch(queries, 0.0, 5)
    for g, w in zip(got, want):
        assert [(r.doc_name, r.score) for r in g] == \
            [(r.doc_name, r.score) for r in w]


def _drain(sock_file, n):
    out = []
    while len(out) < n:
        line = sock_file.readline()
        assert line, "server closed early"
        out.append(json.loads(line))
    return out


def test_server_mega_dispatch_under_burst(classic_index, monkeypatch):
    """A burst deeper than one batch triggers mega-dispatch; every
    response stays exact and one-per-request."""
    from cobs_tpu.query.server import QueryServer

    monkeypatch.setattr(settings, "mega_batches", 4)
    s = Search(str(classic_index))
    want = [(r.doc_name, r.score)
            for r in s.search(GOLDEN_QUERY, 0.0, 3)]
    srv = QueryServer(s, batch_size=2, linger_ms=1.0, threshold=0.0,
                      num_results=3)
    try:
        import threading
        import time

        # accept intake WITHOUT the scorer: the burst queues up fully,
        # so the deep-queue mega path must engage deterministically
        srv._started = True
        srv._accept_thread = threading.Thread(
            target=srv._accept_loop, daemon=True)
        srv._accept_thread.start()
        host, port = srv.address
        c = socket.create_connection((host, port))
        f = c.makefile("rb")
        n = 16
        payload = b"".join(
            json.dumps({"id": i, "query": GOLDEN_QUERY,
                        "num_results": 3}).encode() + b"\n"
            for i in range(n))
        c.sendall(payload)
        deadline = time.monotonic() + 10
        while srv._rq.qsize() < n and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv._rq.qsize() == n
        srv._scorer_thread = threading.Thread(target=srv._scorer,
                                              daemon=True)
        srv._scorer_thread.start()
        resp = _drain(f, n)
        assert sorted(r["id"] for r in resp) == list(range(n))
        for r in resp:
            assert [tuple(x) for x in r["results"]] == want
        # stats must show at least one mega dispatch
        c.sendall(b'{"cmd": "stats", "id": "s"}\n')
        st = _drain(f, 1)[0]
        assert st["mega_dispatches"] >= 1
        assert st["queries"] == n
        c.close()
    finally:
        srv.close()


# (device_hash, 0) is omitted: the full-rank device-hash mesh multi
# program costs ~130 s of CPU-backend compile alone and is already
# exercised END TO END by test_sharded_stream_mega_matches_batch
# (search_stream auto-selects device hashing over the mesh)
@pytest.mark.parametrize("kind,num_results",
                         [("device_hash", 4), ("host_hash", 0),
                          ("host_hash", 4)])
def test_sharded_multi_batch_equal_per_batch(classic_index, kind,
                                             num_results):
    """Mesh mega-dispatch (K batches inside ONE shard_map program) is
    bit-exact against per-batch sharded dispatch, for full-rank and
    top-k, host- and device-hashed payloads."""
    from cobs_tpu.parallel import ShardedIndex, make_mesh

    dev = DeviceIndex.from_file(classic_index)
    sh = ShardedIndex(dev, make_mesh(n_batch=2, n_docs=4),
                      word_align=8)
    groups = _batches(3, 4, seed=23)
    if kind == "device_hash":
        payloads = [QueryBytes(g) for g in groups]
    else:
        payloads = [create_hashes(g, dev.term_size, dev.num_hashes,
                                  dev.canonicalize) for g in groups]
    if num_results == 0:
        multi = sh.score_batch_multi_async(payloads)
        for p, pd in zip(payloads, multi):
            np.testing.assert_array_equal(
                pd.fetch(), sh.score_batch_async(p).fetch())
    else:
        multi = sh.score_topk_multi_async(payloads, num_results)
        for p, pd in zip(payloads, multi):
            vm, dm = pd.fetch()
            v1, d1 = sh.score_topk_async(p, num_results).fetch()
            np.testing.assert_array_equal(vm, v1)
            np.testing.assert_array_equal(dm[vm >= 0], d1[v1 >= 0])


def test_sharded_stream_mega_matches_batch(classic_index, monkeypatch):
    """search_stream over a mesh with deep mega groups: identical
    results to search_batch, including error slots."""
    from cobs_tpu.parallel import make_mesh

    monkeypatch.setattr(settings, "mega_batches", 4)
    s = Search(str(classic_index), mesh=make_mesh(n_batch=2, n_docs=4))
    assert s._mega_k() == 4
    queries = [q.decode() for g in _batches(8, 3, seed=31) for q in g]
    queries.insert(7, "ACGT")  # error slot
    want = s.search_batch([q for q in queries if q != "ACGT"], 0.0, 5)
    got = list(s.search_stream(iter(queries), 0.0, 5, batch_size=3))
    errors = [g for g in got if isinstance(g, QueryError)]
    good = [g for g in got if not isinstance(g, QueryError)]
    assert len(errors) == 1
    for g, w in zip(good, want):
        assert [(r.doc_name, r.score) for r in g] == \
            [(r.doc_name, r.score) for r in w]


def test_sharded_multi_seq_split_falls_back(classic_index,
                                            monkeypatch):
    """A mega group holding a sequence-parallel-eligible batch must
    fall back to per-batch dispatch (seq split reshapes the mesh axes)
    and stay exact."""
    from cobs_tpu.parallel import ShardedIndex, make_mesh

    monkeypatch.setattr(settings, "seq_split_terms", 64)
    dev = DeviceIndex.from_file(classic_index)
    sh = ShardedIndex(dev, make_mesh(n_batch=2, n_docs=4),
                      word_align=8)
    long_q = [random_sequence(200, 7).encode()]   # 170 terms >= 64
    short = _batches(1, 3, seed=40)[0]
    payloads = [create_hashes(g, dev.term_size, dev.num_hashes,
                              dev.canonicalize)
                for g in (short, long_q)]
    assert sh._seq_split(payloads[1])
    multi = sh.score_batch_multi_async(payloads)
    for p, pd in zip(payloads, multi):
        np.testing.assert_array_equal(
            pd.fetch(), sh.score_batch_async(p).fetch())
