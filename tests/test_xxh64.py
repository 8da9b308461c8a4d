"""XXH64 bit-exactness against the reference C implementation.

The whole system hashes with XXH64(term, seed=j) (reference:
cobs/util/misc.hpp:65-72), so this must match bit for bit. Oracle: the
`xxhash` PyPI package (bindings to the canonical C implementation).
"""

import numpy as np
import pytest
import xxhash

from cobs_tpu.core.xxh64 import process_hashes, xxh64, xxh64_multi_seed


@pytest.mark.parametrize("length", [0, 1, 3, 4, 5, 7, 8, 9, 12, 15, 16,
                                    19, 31, 32, 33, 40, 63, 64, 65, 100])
@pytest.mark.parametrize("seed", [0, 1, 2, 7, 2**63 + 5])
def test_matches_reference_lengths(length, seed, rng):
    data = rng.integers(0, 256, size=(16, length), dtype=np.uint8)
    got = xxh64(data, seed)
    for i in range(data.shape[0]):
        want = xxhash.xxh64(data[i].tobytes(), seed=seed).intdigest()
        assert got[i] == want, (length, seed, i)


def test_multi_seed(rng):
    data = rng.integers(0, 256, size=(8, 31), dtype=np.uint8)
    got = xxh64_multi_seed(data, 4)
    for i in range(8):
        for j in range(4):
            want = xxhash.xxh64(data[i].tobytes(), seed=j).intdigest()
            assert got[i, j] == want


def test_process_hashes_mod():
    term = b"ACGTACGTACGTACGTACGTACGTACGTACG"
    sig = 12345
    got = process_hashes(term, sig, 3)
    for j in range(3):
        assert got[j] == xxhash.xxh64(term, seed=j).intdigest() % sig


def test_dna_alphabet(rng):
    # realistic inputs: 31-mers over ACGT
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    data = letters[rng.integers(0, 4, size=(64, 31))]
    got = xxh64(data, 0)
    for i in range(64):
        want = xxhash.xxh64(data[i].tobytes(), seed=0).intdigest()
        assert got[i] == want
