"""Pallas kernel tests in interpret mode (SURVEY.md §4.2): the DMA-pipelined
row gather/scatter kernels (C3/C4) run under `pallas_call(interpret=True)` on
CPU, so kernel correctness is CI-testable without a TPU. The same code
compiles via Mosaic when a TPU is present."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meepoembedding_tpu.table.pallas_ops import (
    BLK,
    combine_rows_by_vrow,
    row_gather,
    row_scatter_add,
    row_scatter_set,
)


@pytest.mark.parametrize("n", [1, 7, BLK, BLK + 3, 3 * BLK])
def test_row_gather_matches_take(rng, n):
    plane = jnp.asarray(rng.normal(size=(512, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 512, size=n), jnp.int32)
    out = row_gather(plane, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(plane)[np.asarray(idx)])


def test_row_gather_clips_negative(rng):
    plane = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    idx = jnp.asarray([-1, 0, 63], jnp.int32)
    out = row_gather(plane, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out)[1:], np.asarray(plane)[[0, 63]])


@pytest.mark.parametrize("n", [5, BLK, 2 * BLK + 17])
def test_row_scatter_add_unique(rng, n):
    rows = 4 * BLK
    plane = rng.normal(size=(rows, 128)).astype(np.float32)
    idx = rng.choice(rows, size=n, replace=False).astype(np.int32)
    upd = rng.normal(size=(n, 128)).astype(np.float32)
    expect = plane.copy()
    expect[idx] += upd
    got = row_scatter_add(jnp.asarray(plane), jnp.asarray(idx), jnp.asarray(upd),
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6)


def test_row_scatter_add_negative_idx_dropped(rng):
    plane = rng.normal(size=(BLK, 128)).astype(np.float32)
    idx = np.array([3, -1, 7], np.int32)
    upd = rng.normal(size=(3, 128)).astype(np.float32)
    expect = plane.copy()
    expect[3] += upd[0]
    expect[7] += upd[2]
    got = row_scatter_add(jnp.asarray(plane), jnp.asarray(idx), jnp.asarray(upd),
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6)


@pytest.mark.parametrize("n", [4, BLK + 9])
def test_row_scatter_set_masked(rng, n):
    rows = 2 * BLK
    plane = rng.normal(size=(rows, 128)).astype(np.float32)
    idx = rng.choice(rows, size=n, replace=False).astype(np.int32)
    upd = rng.normal(size=(n, 128)).astype(np.float32)
    mask = rng.random((n, 128)) < 0.4
    expect = plane.copy()
    for j in range(n):
        expect[idx[j]] = np.where(mask[j], upd[j], expect[idx[j]])
    got = row_scatter_set(
        jnp.asarray(plane), jnp.asarray(idx), jnp.asarray(upd), jnp.asarray(mask),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_row_scatter_set_negative_idx_dropped(rng):
    plane = rng.normal(size=(BLK, 128)).astype(np.float32)
    idx = np.array([5, -1], np.int32)
    upd = rng.normal(size=(2, 128)).astype(np.float32)
    mask = np.ones((2, 128), bool)
    expect = plane.copy()
    expect[5] = upd[0]
    got = row_scatter_set(
        jnp.asarray(plane), jnp.asarray(idx), jnp.asarray(upd), jnp.asarray(mask),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_combine_rows_by_vrow_disjoint_exact(rng):
    """The float combine is bit-exact for lane-disjoint contributions (the
    byte-plane integer path), regardless of batch-global magnitudes."""
    n, pack = 64, 4
    vrow = rng.integers(0, 8, size=n).astype(np.int32)
    sub = rng.integers(0, pack, size=n)
    # give each (vrow, sub) pair at most one contributor -> lane-disjoint runs
    seen = set()
    enabled = np.zeros(n, bool)
    for i in range(n):
        if (int(vrow[i]), int(sub[i])) not in seen:
            seen.add((int(vrow[i]), int(sub[i])))
            enabled[i] = True
    rows = np.zeros((n, 128), np.float32)
    d = 128 // pack
    vals = (rng.normal(size=(n, d)) * 1e4).astype(np.float32)  # large magnitudes
    for i in range(n):
        rows[i, sub[i] * d : (sub[i] + 1) * d] = vals[i]
    uv, comb = jax.jit(combine_rows_by_vrow)(
        jnp.asarray(vrow), jnp.asarray(rows), jnp.asarray(enabled)
    )
    uv, comb = np.asarray(uv), np.asarray(comb)
    expect: dict = {}
    for i in range(n):
        if enabled[i]:
            expect.setdefault(int(vrow[i]), np.zeros(128, np.float32))
            expect[int(vrow[i])] += rows[i]
    got = {int(v): comb[j] for j, v in enumerate(uv) if v >= 0}
    assert set(got) == set(expect)
    for k in expect:
        np.testing.assert_array_equal(got[k], expect[k])  # BIT-exact
