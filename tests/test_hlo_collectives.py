"""Pin the "zero cross-device bytes in the hot loop" claim in the
COMPILED ARTIFACT, not the program structure (r3 verdict missing item
2 / next item 3): the lowered sharded scoring program must contain no
collective instructions — the matrix is document-sharded, row indices
replicate at upload, scores stay sharded. A positive control on the
sequence-parallel path (whose psum IS a collective) keeps the scanner
honest against HLO text-format drift.

Reference analog being scaled: cobs/query/classic_search.cpp:355-400
(score-batch parallelism over shared memory — zero communication by
construction there; here it must be proven against the compiler).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cobs_tpu.parallel.benchmark import (
    compiled_hot_loop_report, count_collectives)
from cobs_tpu.parallel.sharded import (
    make_mesh, score_seq_sharded, score_sharded, _topk_sharded,
    _topk_seq_sharded)


def _mesh(n_batch, n_docs):
    return make_mesh(n_batch=n_batch, n_docs=n_docs,
                     devices=jax.devices()[:n_batch * n_docs])


def _compile(mesh, fn, *specs):
    return jax.jit(fn).lower(*specs).compile().as_text()


def _m_spec(mesh, R=129, W=16):
    return jax.ShapeDtypeStruct((R, W), jnp.uint32,
                                sharding=NamedSharding(
                                    mesh, P(None, "docs")))


def test_full_rank_scoring_compiles_with_zero_collectives():
    mesh = _mesh(1, 8)
    i_spec = jax.ShapeDtypeStruct(
        (8, 64, 1, 1), jnp.int32,
        sharding=NamedSharding(mesh, P("batch", None, None, None)))
    txt = _compile(mesh, lambda m, i: score_sharded(mesh, m, i, 1),
                   _m_spec(mesh), i_spec)
    assert count_collectives(txt) == 0, (
        "a collective crept into the sharded scoring hot loop")


def test_topk_scoring_compiles_with_zero_collectives():
    mesh = _mesh(2, 4)
    i_spec = jax.ShapeDtypeStruct(
        (4, 64, 1, 1), jnp.int32,
        sharding=NamedSharding(mesh, P("batch", None, None, None)))
    mask_spec = jax.ShapeDtypeStruct(
        (1, 16, 32), jnp.bool_,
        sharding=NamedSharding(mesh, P(None, "docs", None)))
    txt = _compile(
        mesh,
        lambda m, i, msk: _topk_sharded(mesh, m, i, msk, 1, 3),
        _m_spec(mesh), i_spec, mask_spec)
    assert count_collectives(txt) == 0


def test_seq_parallel_psum_is_visible_to_the_scanner():
    """Positive control: the sequence-parallel paths DO contain
    exactly their psum — if HLO ever renames collectives, this fails
    before the zero assertions above can rot into vacuous truth."""
    mesh = _mesh(4, 2)
    i_spec = jax.ShapeDtypeStruct(
        (1, 64, 1, 1), jnp.int32,
        sharding=NamedSharding(mesh, P(None, "batch", None, None)))
    txt = _compile(mesh,
                   lambda m, i: score_seq_sharded(mesh, m, i, 1),
                   _m_spec(mesh), i_spec)
    assert count_collectives(txt) >= 1

    mask_spec = jax.ShapeDtypeStruct(
        (1, 16, 32), jnp.bool_,
        sharding=NamedSharding(mesh, P(None, "docs", None)))
    txt = _compile(
        mesh,
        lambda m, i, msk: _topk_seq_sharded(mesh, m, i, msk, 1, 3),
        _m_spec(mesh, W=16), i_spec, mask_spec)
    assert count_collectives(txt) >= 1


def test_compiled_hot_loop_report_fields():
    r = compiled_hot_loop_report(4)
    assert r["collective_ops"] == 0
    ba = r["bytes_accessed_per_query"]
    # XLA's cost analysis must at least see the gather traffic:
    # T=64 terms x W_local=8 words x 4 B = 2 KiB/query/shard
    assert np.isnan(ba) or ba > 1024


def test_count_collectives_matches_hlo_grammar():
    txt = ("%all-reduce.3 = f32[8]{0} all-reduce(f32[8]{0} %x), "
           "replica_groups={}, to_apply=%add\n"
           "%ag = f32[16]{0} all-gather-start(f32[8]{0} %y)\n"
           "%nothing = f32[8]{0} add(f32[8]{0} %all-reduce.3, %ag)\n")
    assert count_collectives(txt) == 2
