"""Canonicalization semantics (reference: cobs/util/query.cpp:143-199).

Includes the edge cases from the reference's own tests
(tests/util.cpp:33-60): invalid letters and the palindromic-prefix
truncated comparison.
"""

import numpy as np

from cobs_tpu.core import kmer
from cobs_tpu.core.canonical import canonicalize_batch, canonicalize_kmer


def _scalar_reference(term: bytes) -> tuple[bytes, bool]:
    """Direct port of the reference's scalar walk, used as test oracle."""
    fmap = {c: c for c in b"ACGT"}
    rmap = dict(zip(b"ACGT", b"TGCA"))
    size = len(term)
    fm = bytes(fmap.get(c, 0) for c in term)
    rm = bytes(rmap.get(c, 0) for c in reversed(term))
    good = all(c != 0 for c in fm)
    for i in range(size // 2):
        if fm[i] < rm[i]:
            return fm, good
        if fm[i] > rm[i]:
            return rm, good
    return fm, good


def test_revcomp_selection():
    # AGT: revcomp is ACT but first half ties -> forward kept
    canon, good = canonicalize_kmer(b"AGT")
    assert good
    assert canon == b"AGT"

    # GAT: revcomp ATC < GAT -> reverse wins at position 0
    canon, good = canonicalize_kmer(b"GAT")
    assert good
    assert canon == b"ATC"


def test_invalid_letters():
    canon, good = canonicalize_kmer(b"ACNGT")
    assert not good
    # N maps to 0 in whichever side is chosen
    assert 0 in canon


def test_matches_scalar_reference(rng):
    letters = np.frombuffer(b"ACGTN", dtype=np.uint8)
    for k in [3, 4, 5, 8, 15, 19, 31]:
        windows = letters[rng.integers(0, 5, size=(256, k))]
        canon, good = canonicalize_batch(windows)
        for i in range(windows.shape[0]):
            want, wgood = _scalar_reference(windows[i].tobytes())
            assert canon[i].tobytes() == want
            assert bool(good[i]) == wgood


def test_min_of_kmer_and_revcomp(rng):
    # For random valid 31-mers (no palindromic first-half ties in practice),
    # canonical == min(kmer, revcomp) (reference: tests/parameters.cpp:107-123)
    comp = dict(zip(b"ACGT", b"TGCA"))
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    windows = letters[rng.integers(0, 4, size=(1000, 31))]
    canon, good = canonicalize_batch(windows)
    assert good.all()
    for i in range(windows.shape[0]):
        s = windows[i].tobytes()
        rc = bytes(comp[c] for c in reversed(s))
        assert canon[i].tobytes() == min(s, rc)


def test_packed_canonicalize_matches_string(rng):
    # packed-form canonicalize (KMer::canonicalize) must agree with the
    # byte-level canonicalization for valid DNA
    for k in [15, 19, 31]:
        packed = kmer.random_packed(200, k, rng)
        strings = kmer.decode(packed, k)
        canon_packed = kmer.canonicalize_packed(packed, k)
        canon_str, good = canonicalize_batch(strings)
        assert good.all()
        np.testing.assert_array_equal(
            kmer.decode(canon_packed, k), canon_str)


def test_kmer_roundtrip(rng):
    for k in [4, 15, 19, 31, 32]:
        packed = kmer.random_packed(100, k, rng)
        strings = kmer.decode(packed, k)
        assert strings.shape == (100, k)
        back = kmer.encode(strings)
        np.testing.assert_array_equal(back, packed)


def test_mirror_is_revcomp(rng):
    comp = dict(zip(b"ACGT", b"TGCA"))
    for k in [15, 19, 31, 32]:
        packed = kmer.random_packed(50, k, rng)
        strings = kmer.decode(packed, k)
        mirrored = kmer.decode(kmer.mirror(packed, k), k)
        for i in range(50):
            s = strings[i].tobytes()
            rc = bytes(comp[c] for c in reversed(s))
            assert mirrored[i].tobytes() == rc
