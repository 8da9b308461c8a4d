"""Device-side query hashing: bit-exactness vs the host pipeline.

The device-hash path (ops/device_hash + engine.QueryBytes) must be an
invisible substitution for host hashing: same XXH64 (reference:
cobs/util/misc.hpp:65-72), same truncated-half canonicalization
(reference: cobs/util/query.cpp:143-199), same errors, same ranked
results on classic and multi-page compact indexes.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cobs_tpu.cli import main as cli
from cobs_tpu.core.canonical import canonicalize_batch
from cobs_tpu.core.xxh64 import xxh64
from cobs_tpu.ops import device_hash as dh
from cobs_tpu.query.search import QueryError, Search
from cobs_tpu.settings import settings

DATA = Path(__file__).parent / "data"


@pytest.mark.parametrize("length", [7, 15, 31, 32, 33, 64, 100])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_xxh64_device_bit_exact(rng, length, seed):
    data = rng.integers(0, 256, size=(17, length)).astype(np.uint8)
    want = xxh64(data, seed)
    with jax.enable_x64():
        got = np.asarray(jax.jit(
            lambda d: dh.xxh64_device(d, length, seed))(
                jnp.asarray(data)))
    assert (got == want).all()


@pytest.mark.parametrize("k", [2, 3, 8, 31])
def test_canonicalize_device_bit_exact(rng, k):
    acgt = np.frombuffer(b"ACGT", np.uint8)
    wins = acgt[rng.integers(0, 4, size=(300, k))]
    want, _ = canonicalize_batch(wins)
    got = np.asarray(jax.jit(dh.canonicalize_device)(jnp.asarray(wins)))
    assert (got == want).all()


def _random_queries(rng, n, lo, hi):
    acgt = np.frombuffer(b"ACGT", np.uint8)
    return [bytes(acgt[rng.integers(0, 4, rng.integers(lo, hi))])
            for _ in range(n)]


@pytest.fixture
def _device_hash_toggle():
    old = settings.device_hash
    old_cache = settings.disable_cache
    settings.disable_cache = True
    yield
    settings.device_hash = old
    settings.disable_cache = old_cache


def _results(batches):
    return [[(r.doc_name, r.score) for r in b] for b in batches]


def _corpus(tmp_path, rng, n_docs=24):
    docs = tmp_path / "docs"
    docs.mkdir()
    acgt = np.frombuffer(b"ACGT", np.uint8)
    for i in range(n_docs):
        seq = bytes(acgt[rng.integers(0, 4, 300 + 13 * i)])
        (docs / f"doc{i:03d}.fasta").write_bytes(b">s\n" + seq + b"\n")
    return docs


@pytest.mark.parametrize("kind,num_hashes",
                         [("classic", 1), ("classic", 3),
                          ("compact", 2)])
def test_search_matches_host_hashing(tmp_path, rng, kind, num_hashes,
                                     _device_hash_toggle):
    """Ranked results identical with hashing on device vs host —
    variable query lengths exercise the zero-row term masking, and
    page_size=1 compacts exercise the per-page device re-mod."""
    docs = _corpus(tmp_path, rng)
    if kind == "classic":
        out = tmp_path / "t.cobs_classic"
        assert cli.main(["classic-construct", str(docs), str(out),
                         "-h", str(num_hashes)]) == 0
    else:
        out = tmp_path / "t.cobs_compact"
        assert cli.main(["compact-construct", str(docs), str(out),
                         "-h", str(num_hashes),
                         "--page-size", "1"]) == 0

    queries = _random_queries(rng, 9, 45, 120)
    settings.device_hash = "host"
    s_host = Search(str(out))
    assert not any(isinstance(h, object) and hasattr(h, "queries")
                   for h in s_host._hash_batch(queries))
    want = _results(s_host.search_batch(queries, 0.0, 0))
    want_topk = _results(s_host.search_batch(queries, 0.0, 5))

    settings.device_hash = "device"
    s_dev = Search(str(out))
    hashed = s_dev._hash_batch(queries)
    assert all(hasattr(h, "queries") for h in hashed)
    got = _results(s_dev.search_batch(queries, 0.0, 0))
    got_topk = _results(s_dev.search_batch(queries, 0.0, 5))
    assert got == want
    assert got_topk == want_topk

    # the streamed serving loop (lenient hashing + async dispatch)
    got_stream = _results(list(s_dev.search_stream(
        iter(queries), 0.0, 0, batch_size=4)))
    assert got_stream == want


def test_device_hash_error_parity(tmp_path, rng, _device_hash_toggle):
    fasta = tmp_path / "fasta"
    shutil.copytree(DATA / "fasta", fasta)
    out = tmp_path / "t.cobs_classic"
    assert cli.main(["classic-construct", str(fasta), str(out)]) == 0
    settings.device_hash = "device"
    s = Search(str(out))
    with pytest.raises(ValueError, match="Invalid DNA"):
        s.search_batch(["ACGTN" + "A" * 40])
    with pytest.raises(ValueError, match="too short"):
        s.search_batch(["ACGT"])
    # lenient stream: bad slots yield QueryError, good ones rank
    good = _random_queries(rng, 3, 45, 60)
    res = list(s.search_stream(iter([good[0], "ACGTX" + "A" * 40,
                                     good[1], "ACG", good[2]]),
                               0.0, 0, batch_size=2))
    assert isinstance(res[1], QueryError)
    assert isinstance(res[3], QueryError)
    for i in (0, 2, 4):
        assert not isinstance(res[i], QueryError)


def test_sharded_search_matches_host_hashing(tmp_path, rng,
                                             _device_hash_toggle):
    """Mesh-sharded search with device hashing equals host hashing
    (the query-bytes broadcast replaces the row-index broadcast)."""
    import jax as _jax
    from cobs_tpu.parallel import make_mesh

    if len(_jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    docs = _corpus(tmp_path, rng, n_docs=40)
    out = tmp_path / "t.cobs_classic"
    assert cli.main(["classic-construct", str(docs), str(out)]) == 0

    mesh = make_mesh(n_batch=2, n_docs=4)
    queries = _random_queries(rng, 6, 45, 100)

    settings.device_hash = "host"
    want = _results(Search(str(out), mesh=mesh)
                    .search_batch(queries, 0.0, 0))
    want_topk = _results(Search(str(out), mesh=mesh)
                         .search_batch(queries, 0.0, 4))

    settings.device_hash = "device"
    s = Search(str(out), mesh=mesh)
    hashed = s._hash_batch(queries)
    assert all(hasattr(h, "queries") for h in hashed)
    assert _results(s.search_batch(queries, 0.0, 0)) == want
    assert _results(s.search_batch(queries, 0.0, 4)) == want_topk


def test_pack_2bit_roundtrip(rng):
    acgt = np.frombuffer(b"ACGT", np.uint8)
    for L in (4, 7, 31, 64, 1030):
        qb = acgt[rng.integers(0, 4, size=(5, L))]
        packed = dh.pack_queries_2bit(qb)
        assert packed.shape == (5, -(-L // 4))
        got = np.asarray(jax.jit(
            lambda p: dh.decode_2bit_device(p, L))(jnp.asarray(packed)))
        assert (got == qb).all(), L
