"""Pallas query kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cobs_tpu.ops.query_kernel import CHUNK, gather_and_count_pallas
from cobs_tpu.query.engine import _gather_and_count


def _ref_scores(matrix, rows_idx, num_hashes):
    out = _gather_and_count(jnp.asarray(matrix), jnp.asarray(rows_idx),
                            num_hashes)
    return np.asarray(out)


@pytest.mark.parametrize("num_hashes", [1, 3])
@pytest.mark.parametrize("B,T,P,W", [
    (2, CHUNK, 1, 128),
    (1, 2 * CHUNK, 1, 256),
    (2, CHUNK, 3, 128),       # compact: 3 pages
])
def test_pallas_matches_xla(rng, num_hashes, B, T, P, W):
    R = 97
    matrix = rng.integers(0, 1 << 32, size=(R + 1, W),
                          dtype=np.uint64).astype(np.uint32)
    matrix[-1] = 0
    rows_idx = rng.integers(0, R, size=(B, T, num_hashes, P)) \
        .astype(np.int32)
    # sprinkle padding terms pointing at the zero row
    rows_idx[:, -7:] = R
    got = np.asarray(gather_and_count_pallas(
        jnp.asarray(matrix), jnp.asarray(rows_idx), num_hashes,
        interpret=True))
    want = _ref_scores(matrix, rows_idx, num_hashes)
    np.testing.assert_array_equal(got, want)


def test_pallas_wide_matrix(rng):
    """A wide word axis (64K documents) through the whole-row blocks."""
    R, W = 31, 2048
    matrix = rng.integers(0, 1 << 32, size=(R + 1, W),
                          dtype=np.uint64).astype(np.uint32)
    matrix[-1] = 0
    rows_idx = rng.integers(0, R, size=(1, CHUNK, 1, 1)).astype(np.int32)
    got = np.asarray(gather_and_count_pallas(
        jnp.asarray(matrix), jnp.asarray(rows_idx), 1, interpret=True))
    np.testing.assert_array_equal(got, _ref_scores(matrix, rows_idx, 1))


def test_pallas_rejects_unpadded_T():
    matrix = jnp.zeros((4, 128), jnp.uint32)
    rows_idx = jnp.zeros((1, CHUNK - 1, 1, 1), jnp.int32)
    with pytest.raises(ValueError, match="multiple"):
        gather_and_count_pallas(matrix, rows_idx, 1, interpret=True)


class TestDmaGather:
    """Batched-DMA row gather (ops/dma_gather.py) vs matrix[rows]."""

    def test_exact(self, rng):
        from cobs_tpu.ops.dma_gather import dma_gather_rows
        matrix = rng.integers(0, 1 << 32, size=(512, 384),
                              dtype=np.uint64).astype(np.uint32)
        rows = rng.integers(0, 512, size=96).astype(np.int32)
        got = np.asarray(dma_gather_rows(
            jnp.asarray(matrix), jnp.asarray(rows), group=16,
            interpret=True))
        np.testing.assert_array_equal(got, matrix[rows])

    def test_multi_call_split(self, rng):
        """N larger than one pallas_call's scalar-prefetch budget."""
        import cobs_tpu.ops.dma_gather as dg
        matrix = rng.integers(0, 1 << 32, size=(64, 128),
                              dtype=np.uint64).astype(np.uint32)
        rows = rng.integers(0, 64, size=64).astype(np.int32)
        old = dg._IDX_SMEM_BUDGET
        dg._IDX_SMEM_BUDGET = 32 * 4  # 32 indices per call -> 2 calls
        try:
            got = np.asarray(dg.dma_gather_rows(
                jnp.asarray(matrix), jnp.asarray(rows), group=8,
                interpret=True))
        finally:
            dg._IDX_SMEM_BUDGET = old
        np.testing.assert_array_equal(got, matrix[rows])

    def test_rejects_bad_shapes(self):
        from cobs_tpu.ops.dma_gather import dma_gather_rows
        matrix = jnp.zeros((8, 128), jnp.uint32)
        with pytest.raises(ValueError, match="multiple of group"):
            dma_gather_rows(matrix, jnp.zeros(13, jnp.int32), group=8,
                            interpret=True)
        with pytest.raises(ValueError, match="128 lanes"):
            dma_gather_rows(jnp.zeros((8, 64), jnp.uint32),
                            jnp.zeros(8, jnp.int32), group=8,
                            interpret=True)
