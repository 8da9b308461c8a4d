"""Bloom parameter math (reference: cobs/util/calc_signature_size.cpp,
tests/parameters.cpp:25-104)."""

import numpy as np

from cobs_tpu.core.params import (
    calc_average_set_bit_ratio,
    calc_signature_size,
    calc_signature_size_ratio,
)
from cobs_tpu.core.xxh64 import xxh64_multi_seed


def test_ratio_known_values():
    # m/n for k=1, fpr=0.3 is -1/ln(0.7)
    import math
    assert abs(calc_signature_size_ratio(1, 0.3) - (-1 / math.log(0.7))) < 1e-12
    assert calc_signature_size(1000, 1, 0.3) == 2804


def test_fpr_simulation_real_hashes(rng):
    """Simulate a Bloom filter with real XXH64 hashes and check the fpr,
    mirroring tests/parameters.cpp:25-104."""
    num_elements = 10000
    for num_hashes, fpr in [(1, 0.3), (2, 0.1), (3, 0.1)]:
        sig = calc_signature_size(num_elements, num_hashes, fpr)
        letters = np.frombuffer(b"ACGT", dtype=np.uint8)
        terms = letters[rng.integers(0, 4, size=(num_elements, 31))]
        rows = (xxh64_multi_seed(terms, num_hashes)
                % np.uint64(sig)).ravel()
        filt = np.zeros(sig, dtype=bool)
        filt[rows] = True

        # set-bit ratio close to analytic expectation
        expected = calc_average_set_bit_ratio(sig, num_hashes, fpr)
        assert filt.mean() <= expected * 1.01

        # false positive rate of random probes close to target
        probes = letters[rng.integers(0, 4, size=(10000, 31))]
        prows = xxh64_multi_seed(probes, num_hashes) % np.uint64(sig)
        hits = filt[prows].all(axis=1)
        assert hits.mean() <= fpr * 1.2
