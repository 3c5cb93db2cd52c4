"""Public differentiable embed op (`meepoembedding_tpu.embed`) vs the oracle.

Covers the bring-your-own-model contract (SURVEY.md L4): `jax.grad` through
the returned `emb` + `embed.update` must match the dict oracle's dedup'd
sparse-optimizer math for every optimizer kind, batch shapes, duplicates,
fresh-row initialization, the eval (train=False) path, and dim > 128.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meepoembedding_tpu import embed
from meepoembedding_tpu.config import OptimizerConfig, TableConfig
from meepoembedding_tpu.table import hashing
from meepoembedding_tpu.table.layout import TableSpec, alloc_shard
from meepoembedding_tpu.table.oracle import OracleTable


def make_spec(dim=16, nb=64, **kw):
    cfg = TableConfig(dim=dim, capacity=nb * 128, **kw)
    return TableSpec.from_config(cfg)


def split(ids64):
    hi, lo = hashing.split_ids(np.asarray(ids64, np.int64))
    return jnp.asarray(hi), jnp.asarray(lo)


def step_fn(spec, w):
    """One user-style jitted train step: loss = 0.5 * w * sum(emb^2)."""

    @partial(jax.jit, donate_argnums=(0,), static_argnums=())
    def f(shard, hi, lo, step):
        shard, ctx, emb = embed.lookup(spec, shard, hi, lo, step)

        def loss_fn(emb):
            return 0.5 * w * jnp.sum(emb.astype(jnp.float32) ** 2)

        loss, g_emb = jax.value_and_grad(loss_fn)(emb)
        shard = embed.update(spec, shard, ctx, g_emb)
        return shard, loss, emb

    return f


@pytest.mark.parametrize("kind", ["sgd", "rowwise_adagrad", "adagrad", "adam"])
def test_grad_update_matches_oracle(rng, kind):
    w = 0.7
    opt = OptimizerConfig(kind=kind, learning_rate=0.1)
    spec = make_spec(dim=16, optimizer=opt)
    oracle = OracleTable(16, optimizer=opt)
    shard = alloc_shard(spec)
    f = step_fn(spec, w)

    ids = rng.integers(0, 50, size=96, dtype=np.int64)  # heavy duplicates
    for step in range(3):
        hi, lo = split(ids)
        shard, loss, emb = f(shard, hi, lo, jnp.int32(step))
        rows = oracle.lookup(ids, step=step)
        oracle.apply_grads(ids, w * rows)  # d(0.5*w*sum(e^2))/de = w*e
        ids = np.concatenate([ids[32:], rng.integers(0, 50, 32, np.int64)])

    # compare final table contents for every live key
    probe_ids = np.arange(0, 50, dtype=np.int64)
    hi, lo = split(probe_ids)
    _, _, emb = embed.lookup(spec, shard, hi, lo, jnp.int32(99), train=False)
    want = oracle.lookup(probe_ids, train=False)
    np.testing.assert_allclose(np.asarray(emb), want, rtol=2e-5, atol=2e-6)


def test_duplicates_segment_sum(rng):
    spec = make_spec(dim=8, optimizer=OptimizerConfig(kind="sgd", learning_rate=1.0))
    shard = alloc_shard(spec)
    # id 7 appears 3x, id 9 once: after one unit-grad step, row7 moved 3x more
    ids = np.array([7, 7, 7, 9], np.int64)
    hi, lo = split(ids)
    shard, ctx, emb = jax.jit(embed.lookup, static_argnums=(0,))(
        spec, shard, hi, lo, jnp.int32(0)
    )
    g = jnp.ones_like(emb)
    shard = jax.jit(embed.update, static_argnums=(0,))(spec, shard, ctx, g)
    _, _, after = embed.lookup(spec, shard, hi, lo, jnp.int32(1), train=False)
    d7 = np.asarray(emb[0] - after[0])
    d9 = np.asarray(emb[3] - after[3])
    np.testing.assert_allclose(d7, 3.0, rtol=1e-6)
    np.testing.assert_allclose(d9, 1.0, rtol=1e-6)


def test_batch_shape_and_padding(rng):
    spec = make_spec(dim=16)
    shard = alloc_shard(spec)
    ids = rng.integers(0, 100, size=(4, 3), dtype=np.int64)
    ids_flat = ids.reshape(-1).copy()
    ids_flat[5] = hashing.EMPTY_ID  # bag padding
    ids = ids_flat.reshape(4, 3)
    hi, lo = split(ids)
    shard, ctx, emb = embed.lookup(spec, shard, hi, lo, jnp.int32(0))
    assert emb.shape == (4, 3, 16)
    np.testing.assert_array_equal(np.asarray(emb.reshape(-1, 16)[5]), 0.0)
    # grads on the padded position must be dropped
    g = jnp.ones_like(emb)
    shard2 = embed.update(spec, shard, ctx, g)
    assert int(shard2.counters[0] + shard2.counters[1]) > 0  # ran


def test_eval_no_insert(rng):
    spec = make_spec(dim=16)
    shard = alloc_shard(spec)
    ids = rng.integers(0, 40, size=32, dtype=np.int64)
    hi, lo = split(ids)
    shard, _, emb = embed.lookup(spec, shard, hi, lo, jnp.int32(0), train=False)
    np.testing.assert_array_equal(np.asarray(emb), 0.0)
    assert int(jnp.sum(shard.cnt)) == 0  # nothing inserted

    # insert (lookup + zero-grad update pairs per the API contract: update's
    # scatter materializes fresh inits), then eval reads the same rows
    shard, ctx, emb1 = embed.lookup(spec, shard, hi, lo, jnp.int32(1))
    shard = embed.update(spec, shard, ctx, jnp.zeros_like(emb1))
    shard, _, emb2 = embed.lookup(spec, shard, hi, lo, jnp.int32(2), train=False)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2), rtol=1e-6)


def test_dim_gt_128(rng):
    opt = OptimizerConfig(kind="sgd", learning_rate=0.5)
    spec = make_spec(dim=256, nb=16, optimizer=opt)
    oracle = OracleTable(256, optimizer=opt)
    shard = alloc_shard(spec)
    f = step_fn(spec, 1.0)
    ids = rng.integers(0, 30, size=48, dtype=np.int64)
    for step in range(2):
        hi, lo = split(ids)
        shard, _, _ = f(shard, hi, lo, jnp.int32(step))
        rows = oracle.lookup(ids, step=step)
        oracle.apply_grads(ids, rows)
    probe_ids = np.arange(0, 30, dtype=np.int64)
    hi, lo = split(probe_ids)
    _, _, emb = embed.lookup(spec, shard, hi, lo, jnp.int32(9), train=False)
    np.testing.assert_allclose(
        np.asarray(emb), oracle.lookup(probe_ids, train=False), rtol=2e-5, atol=2e-6
    )


def test_window_grads_variant(rng):
    """update_window (trainer-style g128 differentiation) ≡ update (batch)."""
    from meepoembedding_tpu.table import xla_ops

    opt = OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.1)
    spec = make_spec(dim=16, optimizer=opt)
    ids = rng.integers(0, 60, size=64, dtype=np.int64)
    hi, lo = split(ids)

    shard_a = alloc_shard(spec)
    shard_a, ctx, emb = embed.lookup(spec, shard_a, hi, lo, jnp.int32(0))
    g_emb = 0.3 * emb
    shard_a = embed.update(spec, shard_a, ctx, g_emb)

    shard_b = alloc_shard(spec)
    shard_b, ctx_b, _ = embed.lookup(spec, shard_b, hi, lo, jnp.int32(0))

    def loss_fn(g128):
        e = xla_ops.rows_for_batch(spec, g128, ctx_b.sub, ctx_b.inverse)
        return 0.5 * 0.3 * jnp.sum(e**2)

    g_win = jax.grad(loss_fn)(ctx_b.g128)
    shard_b = embed.update_window(spec, shard_b, ctx_b, g_win)

    np.testing.assert_allclose(
        np.asarray(shard_a.values), np.asarray(shard_b.values), rtol=1e-6, atol=1e-7
    )
