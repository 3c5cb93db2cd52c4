"""Stream-merge scatter-add/set kernel tests (interpret mode, SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from meepoembedding_tpu.table.stream_merge import (
    BLOCKR,
    MAXU,
    STRIDE,
    stream_merge_add,
    stream_merge_set,
)


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


def test_bf16_plane_add(rng):
    """bf16 planes (the 100M-row config's dtype): aligned window DMAs +
    f32 accumulate in the kernel."""
    R = 4 * BLOCKR
    m = MAXU + 100
    plane = (rng.normal(size=(R, 128)) * 0.1).astype(np.float32)
    plane_bf = jnp.asarray(plane).astype(jnp.bfloat16)
    vrow = rng.integers(0, R, size=m).astype(np.int32)
    upd = rng.normal(size=(m, 128)).astype(np.float32)
    expect = np.array(plane_bf.astype(jnp.float32))  # copy; plane is donated
    got = stream_merge_add(
        plane_bf, jnp.asarray(vrow), jnp.asarray(upd), interpret=True
    )
    # reference: group adds in f32 then one bf16 add per row (the kernel sums
    # each window in f32 on the MXU; cross-window splits only widen the loose
    # tolerance below)
    acc = {}
    for j, r in enumerate(vrow):
        acc.setdefault(int(r), np.zeros(128, np.float32))
        acc[int(r)] += upd[j]
    for r, a in acc.items():
        expect[r] = np.asarray(
            (jnp.asarray(expect[r]).astype(jnp.bfloat16)
             + jnp.asarray(a).astype(jnp.bfloat16)).astype(jnp.float32)
        )
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)), expect, rtol=2e-2, atol=2e-2
    )


class TestStreamMergeSet:
    def _check_set(self, R, vrow, upd, mask, rng, dtype=np.float32):
        plane = rng.normal(size=(R, 128)).astype(dtype)
        expect = plane.copy()
        for j, r in enumerate(vrow):
            if 0 <= r < R:
                expect[r] = np.where(mask[j] > 0, upd[j], expect[r])
        got = stream_merge_set(
            jnp.asarray(plane), jnp.asarray(vrow, jnp.int32), jnp.asarray(upd),
            jnp.asarray(mask), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6, atol=1e-6)

    def test_sparse_masked_set(self, rng):
        R = 4 * BLOCKR
        m = 200
        vrow = rng.choice(R, size=m, replace=False).astype(np.int32)
        upd = rng.normal(size=(m, 128)).astype(np.float32)
        mask = (rng.random((m, 128)) < 0.5).astype(np.float32)
        self._check_set(R, vrow, upd * mask, mask, rng)

    def test_disjoint_lane_duplicates(self, rng):
        """Two slots of the same storage row with disjoint windows: the
        one-hot dot must union masks and values."""
        R = 4 * BLOCKR
        vrow = np.array([9, 9, 700, 700], np.int32)
        mask = np.zeros((4, 128), np.float32)
        mask[0, :64] = 1
        mask[1, 64:] = 1
        mask[2, :32] = 1
        mask[3, 96:] = 1
        upd = rng.normal(size=(4, 128)).astype(np.float32) * mask
        self._check_set(R, vrow, upd, mask, rng)

    def test_dense_window_overflow_set(self, rng):
        R = 4 * BLOCKR
        m = MAXU + 2 * STRIDE + 3
        vrow = rng.choice(BLOCKR, size=min(m, BLOCKR), replace=False)[:m]
        m = len(vrow)
        upd = rng.normal(size=(m, 128)).astype(np.float32)
        mask = np.ones((m, 128), np.float32)
        self._check_set(R, vrow.astype(np.int32), upd, mask, rng)

    def test_dropped_and_small_plane(self, rng):
        vrow = np.array([-1, 5, 300, 5, 2**30], np.int32)
        upd = rng.normal(size=(5, 128)).astype(np.float32)
        mask = np.zeros((5, 128), np.float32)
        mask[1, :64] = 1
        mask[3, 64:] = 1  # same row 5, disjoint lanes
        upd = upd * mask
        R = 256  # XLA fallback path
        plane = rng.normal(size=(R, 128)).astype(np.float32)
        expect = plane.copy()
        for j, r in enumerate(vrow):
            if 0 <= r < R:
                expect[r] = np.where(mask[j] > 0, upd[j], expect[r])
        got = stream_merge_set(
            jnp.asarray(plane), jnp.asarray(vrow), jnp.asarray(upd),
            jnp.asarray(mask), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), expect, atol=1e-6)


@pytest.mark.slow
def test_large_random(rng):
    R = 16 * BLOCKR
    m = 4096
    vrow = rng.integers(0, R, size=m).astype(np.int32)
    upd = rng.normal(size=(m, 128)).astype(np.float32)
    _check(R, vrow, upd, rng)


def test_values_scatter_add_dispatch_equivalence(rng, monkeypatch):
    """values_scatter_add must produce the same result on both sides of
    STREAM_THRESHOLD_BYTES (r4 moved the default 6 -> 12 GiB after the XLA
    scatter proved in-place on donated big planes; the kernel remains the
    too-big-to-double-buffer fallback and must stay interchangeable)."""
    from meepoembedding_tpu.table import stream_merge

    R = 8 * BLOCKR
    plane = rng.normal(size=(R, 128)).astype(np.float32)
    vrow = rng.integers(-2, R + 2, size=300).astype(np.int32)
    upd = rng.normal(size=(300, 128)).astype(np.float32)

    monkeypatch.setattr(stream_merge, "STREAM_THRESHOLD_BYTES", 1 << 60)
    xla_out = stream_merge.values_scatter_add(
        jnp.asarray(plane), jnp.asarray(vrow), jnp.asarray(upd)
    )
    monkeypatch.setattr(stream_merge, "STREAM_THRESHOLD_BYTES", 0)
    # interpret-mode kernel off-TPU: call the kernel entry directly
    kern_out = stream_merge_add(
        jnp.asarray(plane), jnp.asarray(vrow), jnp.asarray(upd),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(xla_out), np.asarray(kern_out), rtol=1e-5, atol=1e-5
    )
