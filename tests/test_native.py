"""Native C++ host runtime vs the NumPy reference kernels (bit-exact)."""

import numpy as np
import pytest

from cobs_tpu import native
from cobs_tpu.core.canonical import canonicalize_batch
from cobs_tpu.core.xxh64 import xxh64, xxh64_multi_seed

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="native library unavailable")


def _random_windows(rng, n, k, alphabet=b"ACGT"):
    a = np.frombuffer(alphabet, np.uint8)
    return a[rng.integers(0, len(a), size=(n, k))]


@pytest.mark.parametrize("length", [0, 1, 3, 4, 7, 8, 15, 31, 32, 33,
                                    63, 64, 100])
def test_xxh64_batch_matches_numpy(rng, length):
    import ctypes
    data = rng.integers(0, 256, size=(17, max(length, 1)),
                        dtype=np.uint8)[:, :length]
    data = np.ascontiguousarray(data)
    for seed in (0, 1, 0xDEADBEEF):
        out = np.empty(17, dtype=np.uint64)
        native.lib().cobs_xxh64_batch(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            17, length, seed,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        want = xxh64(data, seed)
        np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("canonical", [0, 1])
# 63/64/65 straddle the SIMD canonicalization's one-vector limit
@pytest.mark.parametrize("k", [1, 2, 4, 19, 31, 63, 64, 65])
def test_window_rows_matches_numpy(rng, canonical, k):
    windows = _random_windows(rng, 500, k)
    sig, h = 99991, 3
    rows, good = native.window_rows(windows, h, sig, canonical)
    cw, goodv = (canonicalize_batch(windows) if canonical
                 else (windows, np.ones(500, bool)))
    want = (xxh64_multi_seed(np.ascontiguousarray(cw), h)
            % np.uint64(sig)).ravel()
    np.testing.assert_array_equal(rows, want)
    assert good == bool(goodv.all())


def test_window_rows_invalid_letters(rng):
    windows = _random_windows(rng, 50, 31, alphabet=b"ACGTN")
    assert (windows == ord("N")).any()
    rows, good = native.window_rows(windows, 1, 1 << 20, 1)
    assert not good
    cw, _ = canonicalize_batch(windows)
    want = (xxh64_multi_seed(np.ascontiguousarray(cw), 1)
            % np.uint64(1 << 20)).ravel()
    np.testing.assert_array_equal(rows, want)


def test_window_hashes_matches_numpy(rng):
    windows = _random_windows(rng, 300, 31)
    hashes, good = native.window_hashes(windows, 2, 1)
    cw, _ = canonicalize_batch(windows)
    want = xxh64_multi_seed(np.ascontiguousarray(cw), 2)
    np.testing.assert_array_equal(hashes, want)
    assert good


def test_set_bits_matches_numpy(rng):
    sig, row_size = 997, 13
    data = np.zeros((sig, row_size), dtype=np.uint8)
    for doc in [0, 7, 8, 63, 100]:
        rows = rng.integers(0, sig, size=200).astype(np.uint64)
        assert native.set_bits(data, rows, doc)
        want_rows = np.unique(rows)
        col = data[:, doc >> 3]
        bit = np.uint8(1 << (doc & 7))
        assert ((col[want_rows.astype(np.int64)] & bit) == bit).all()
    # no bits outside the touched columns (docs hit bytes 0, 1, 7, 12)
    assert (data[:, [2, 3, 4, 5, 6, 8, 9, 10, 11]] == 0).all()


def test_end_to_end_equivalence_native_vs_fallback(tmp_path, monkeypatch):
    """The same corpus must produce byte-identical indices with and
    without the native library."""
    import shutil
    from pathlib import Path

    import cobs_tpu
    from cobs_tpu.settings import settings

    DATA = Path(__file__).parent / "data"
    settings.disable_cache = True
    try:
        outs = []
        for tag in ("native", "fallback"):
            d = tmp_path / tag
            shutil.copytree(DATA / "fasta", d / "fasta")
            if tag == "fallback":
                monkeypatch.setattr(native, "_lib", None)
                monkeypatch.setattr(native, "_tried", True)
            idx = d / "x.cobs_classic"
            cobs_tpu.classic_construct(
                cobs_tpu.DocumentList(d / "fasta"), idx,
                index_params=cobs_tpu.ClassicIndexParameters(clobber=True))
            outs.append(idx.read_bytes())
        assert outs[0] == outs[1]
    finally:
        settings.disable_cache = False
        monkeypatch.undo()
        native._tried = False
        native._lib = None


@pytest.mark.parametrize("k", [257, 300])
def test_window_hashes_large_k(rng, k):
    """k > 256 must not overflow the native canonicalize buffer
    (regression: fixed stack buffer; term_size is user-controlled)."""
    windows = _random_windows(rng, 37, k)
    out = native.window_hashes(windows, 2, 1)
    assert out is not None
    hashes, good = out
    assert good
    cw, _ = canonicalize_batch(windows)
    want = xxh64_multi_seed(np.ascontiguousarray(cw), 2)
    np.testing.assert_array_equal(hashes, want)


def test_window_rows_large_k(rng):
    k, sig = 400, 99991
    windows = _random_windows(rng, 23, k)
    rows, good = native.window_rows(windows, 3, sig, 1)
    assert good
    cw, _ = canonicalize_batch(windows)
    want = (xxh64_multi_seed(np.ascontiguousarray(cw), 3)
            % np.uint64(sig)).ravel()
    np.testing.assert_array_equal(rows, want)


def _score_oracle(payload, rows, zero_id):
    """NumPy reference for cobs_score_batch: per (b, t, p) AND the h
    gathered rows, add each bit (LSB-first) to its doc slot; padding
    terms (any row == zero_id) contribute nothing."""
    B, T, h, P = rows.shape
    row_bytes = payload.shape[1]
    out = np.zeros((B, P * 8 * row_bytes), dtype=np.int32)
    for b in range(B):
        for t in range(T):
            for p in range(P):
                r = rows[b, t, :, p]
                if (r == zero_id).any():
                    continue
                w = payload[r[0]]
                for j in range(1, h):
                    w = w & payload[r[j]]
                bits = np.unpackbits(w, bitorder="little")
                sl = out[b, p * 8 * row_bytes:(p + 1) * 8 * row_bytes]
                sl += bits
    return out


@pytest.mark.parametrize("row_bytes,T,h,P", [
    (3, 17, 1, 1),     # tail-only rows (docs < 64): scalar path
    (8, 255, 1, 1),    # exactly one SIMD word, exactly one term chunk
    (13, 256, 2, 1),   # word + tail, chunk boundary crossed by 1
    (40, 600, 3, 1),   # multi-word, multi-chunk, h > 1
    (9, 300, 1, 3),    # multi-page with per-page padding terms
])
def test_score_batch_kernel_matches_oracle(rng, row_bytes, T, h, P):
    """Direct kernel-vs-oracle check across the shapes that select the
    kernel's distinct code paths: the 64-bit SIMD lane loop, the
    sub-word tail, the <=255-term accumulator chunking, and padding
    terms. The e2e suites only reach this kernel through tiny corpora
    (row_bytes 1-3) or benchmark-scale ones, so the word/tail/chunk
    edges need a dedicated oracle."""
    sig = 211
    payload = rng.integers(0, 256, size=(sig + 1, row_bytes),
                           dtype=np.uint8)
    payload[sig] = 0
    B = 5
    rows = rng.integers(0, sig, size=(B, T, h, P)).astype(np.int64)
    # sprinkle padding terms: whole-term pads and single-hash pads
    pad = rng.random(size=(B, T, 1, P)) < 0.05
    rows = np.where(pad, np.int64(sig), rows)
    if h > 1:
        pad1 = rng.random(size=(B, T, h, P)) < 0.02
        rows = np.where(pad1, np.int64(sig), rows)
    got = native.score_batch_host(payload, row_bytes, rows, sig, 2)
    assert got is not None
    np.testing.assert_array_equal(got, _score_oracle(payload, rows, sig))


def test_random_rows_matches_numpy_oracle():
    """The fused random-document generator must equal the same
    splitmix64 stream decoded + canonicalized + hashed by the NumPy
    reference kernels (locks the PRNG contract: one draw per term,
    2 bits per letter, LSB-first)."""
    seed, n, k, h, sig = 0xC0B5, 500, 31, 3, 99991
    got = native.random_rows(seed, n, k, h, sig)
    assert got is not None

    g = np.uint64(0x9E3779B97F4A7C15)
    z = (np.uint64(seed) + (np.arange(1, n + 1, dtype=np.uint64)) * g)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    shifts = (np.uint64(2) * np.arange(k, dtype=np.uint64))[None, :]
    codes = ((z[:, None] >> shifts) & np.uint64(3)).astype(np.uint8)
    letters = np.frombuffer(b"ACGT", np.uint8)[codes]
    cw, good = canonicalize_batch(letters)
    assert good.all()
    want = (xxh64_multi_seed(np.ascontiguousarray(cw), h)
            % np.uint64(sig)).ravel()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("isa_flags", [
    ["-O3", "-mno-avx512f", "-mavx2"],   # AVX2 pshufb expansion path
    ["-O3", "-mno-avx", "-mno-avx2"],    # scalar ctz fallback path
])
def test_score_batch_isa_variants_match(tmp_path, rng, isa_flags):
    """The scoring kernel has three ISA paths (AVX-512BW vpmovm2b,
    AVX2 pshufb, scalar ctz) selected at compile time; a host with
    AVX-512 never executes the other two. Build each variant
    explicitly and check it against the NumPy oracle so all paths stay
    bit-exact regardless of the deploy machine."""
    import ctypes
    import subprocess

    so = tmp_path / "variant.so"
    try:
        subprocess.run(
            ["g++", *isa_flags, "-shared", "-fPIC", "-std=c++17",
             "-o", str(so), str(native._SRC)],
            check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        pytest.skip("variant toolchain unavailable")
    L = ctypes.CDLL(str(so))
    i64, u64, i32 = ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32
    p8 = ctypes.POINTER(ctypes.c_uint8)
    pi64 = ctypes.POINTER(ctypes.c_int64)
    pi32 = ctypes.POINTER(ctypes.c_int32)
    L.cobs_score_batch.argtypes = [p8, i64, pi64, i64, i64, i64, i64,
                                   i64, pi32, i32]
    L.cobs_score_batch.restype = None

    sig, row_bytes, B, T, h, P = 211, 13, 3, 300, 2, 1
    payload = rng.integers(0, 256, size=(sig + 1, row_bytes),
                           dtype=np.uint8)
    payload[sig] = 0
    rows = rng.integers(0, sig, size=(B, T, h, P)).astype(np.int64)
    out = np.empty((B, P * 8 * row_bytes), dtype=np.int32)
    L.cobs_score_batch(
        payload.ctypes.data_as(p8), row_bytes,
        rows.ctypes.data_as(pi64), B, T, h, P, sig,
        out.ctypes.data_as(pi32), 2)
    np.testing.assert_array_equal(out, _score_oracle(payload, rows, sig))

    # canonicalization also has per-ISA paths (AVX-512VBMI vs scalar);
    # check the variant's window hashing against the NumPy kernels,
    # including invalid letters (they map to 0 in the compare)
    pu64 = ctypes.POINTER(ctypes.c_uint64)
    L.cobs_window_rows.argtypes = [p8, i64, i64, i64, u64, i32, pu64]
    L.cobs_window_rows.restype = i32
    windows = _random_windows(rng, 200, 31, alphabet=b"ACGTN")
    wrows = np.empty(200, dtype=np.uint64)
    L.cobs_window_rows(windows.ctypes.data_as(p8), 200, 31, 1,
                       99991, 1, wrows.ctypes.data_as(pu64))
    cw, _ = canonicalize_batch(windows)
    want = (xxh64_multi_seed(np.ascontiguousarray(cw), 1)
            % np.uint64(99991)).ravel()
    np.testing.assert_array_equal(wrows, want)
