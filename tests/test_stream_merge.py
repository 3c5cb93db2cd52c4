"""Stream-merge scatter-add kernel tests (interpret mode, SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from meepoembedding_tpu.table.stream_merge import BLOCKR, MAXU, stream_merge_add


def _check(R, vrow, upd, rng):
    plane = rng.normal(size=(R, 128)).astype(np.float32)
    expect = plane.copy()
    for j, r in enumerate(vrow):
        if 0 <= r < R:
            expect[r] += upd[j]
    got = stream_merge_add(
        jnp.asarray(plane), jnp.asarray(vrow, jnp.int32), jnp.asarray(upd),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)


def test_sparse_updates(rng):
    R = 8 * BLOCKR
    m = 300
    vrow = rng.choice(R, size=m, replace=False).astype(np.int32)
    upd = rng.normal(size=(m, 128)).astype(np.float32)
    _check(R, vrow, upd, rng)


def test_duplicates_sum(rng):
    R = 4 * BLOCKR  # exercises the pallas path boundary (R >= 4*BLOCKR)
    vrow = np.array([7, 7, 7, 7, 2000, 2000], np.int32)
    upd = rng.normal(size=(6, 128)).astype(np.float32)
    _check(R, vrow, upd, rng)


def test_dense_block_overflow_windows(rng):
    """One block receives > MAXU updates: the planner repeats the block id
    with advancing windows; the kernel accumulates without a lost write."""
    R = 4 * BLOCKR
    m = MAXU + 257  # overflows one window
    vrow = rng.integers(0, BLOCKR, size=m).astype(np.int32)  # ALL in block 0
    upd = rng.normal(size=(m, 128)).astype(np.float32)
    _check(R, vrow, upd, rng)


def test_repeat_then_new_block(rng):
    """Dense block followed by sparse neighbors: repeat bookkeeping must not
    clobber the next block's slab."""
    R = 4 * BLOCKR
    v1 = rng.integers(0, BLOCKR, size=MAXU + 50)  # block 0, overflowing
    v2 = rng.integers(BLOCKR, 2 * BLOCKR, size=40)  # block 1
    v3 = rng.integers(3 * BLOCKR, 4 * BLOCKR, size=8)  # block 3
    vrow = np.concatenate([v1, v2, v3]).astype(np.int32)
    upd = rng.normal(size=(len(vrow), 128)).astype(np.float32)
    _check(R, vrow, upd, rng)


def test_dropped_rows(rng):
    R = 4 * BLOCKR
    vrow = np.array([-1, 5, R, 5, 2**30], np.int32)
    upd = rng.normal(size=(5, 128)).astype(np.float32)
    _check(R, vrow, upd, rng)


def test_all_dropped(rng):
    R = 4 * BLOCKR
    vrow = np.full((16,), -1, np.int32)
    upd = rng.normal(size=(16, 128)).astype(np.float32)
    _check(R, vrow, upd, rng)


def test_small_plane_fallback(rng):
    R = 256  # < 4*BLOCKR -> XLA fallback
    vrow = rng.choice(R, size=30, replace=False).astype(np.int32)
    upd = rng.normal(size=(30, 128)).astype(np.float32)
    _check(R, vrow, upd, rng)


@pytest.mark.slow
def test_large_random(rng):
    R = 16 * BLOCKR
    m = 4096
    vrow = rng.integers(0, R, size=m).astype(np.int32)
    upd = rng.normal(size=(m, 128)).astype(np.float32)
    _check(R, vrow, upd, rng)
