"""Dense-tower LR schedules (ops/optim.py schedule_lr; RunConfig.lr_schedule)."""

import numpy as np
import pytest

from meepoembedding_tpu.config import ModelConfig, RunConfig, TableConfig
from meepoembedding_tpu.ops import optim


def _lr(kind, step, total=100, warmup=0, base=1.0):
    return float(optim.schedule_lr(kind, base, np.int32(step), total, warmup))


def test_schedule_endpoints():
    assert _lr("constant", 0) == 1.0 and _lr("constant", 100) == 1.0
    assert _lr("linear", 0) == 1.0
    assert _lr("linear", 50) == pytest.approx(0.5)
    assert _lr("linear", 100) == 0.0
    assert _lr("cosine", 0) == 1.0
    assert _lr("cosine", 50) == pytest.approx(0.5, abs=1e-6)
    assert _lr("cosine", 100) == pytest.approx(0.0, abs=1e-6)
    # past the horizon the schedule clamps (extra steps train at the floor)
    assert _lr("cosine", 250) == pytest.approx(0.0, abs=1e-6)


def test_warmup_ramp():
    assert _lr("constant", 0, warmup=10) == 0.0
    assert _lr("constant", 5, warmup=10) == pytest.approx(0.5)
    assert _lr("constant", 10, warmup=10) == 1.0
    # decay horizon starts AFTER warmup: cosine midpoint of the remaining 90
    assert _lr("cosine", 10 + 45, warmup=10) == pytest.approx(0.5, abs=1e-6)


def test_unknown_schedule_rejected():
    with pytest.raises(ValueError):
        _lr("exponential", 0)


def test_trainer_with_schedule_runs():
    from meepoembedding_tpu.train import Trainer

    rc = RunConfig(batch_size=64, steps=6, dense_learning_rate=1e-2,
                   lr_schedule="cosine", warmup_steps=2)
    tc = TableConfig(dim=8, capacity=1 << 10)
    mc = ModelConfig(kind="ctr_mlp", num_dense_features=3,
                     num_sparse_features=2, embedding_dim=8, top_mlp=(8, 1))
    tr = Trainer(rc, tc, mc)
    rng = np.random.default_rng(0)
    for _ in range(6):
        loss = tr.train_step({
            "ids": rng.integers(0, 500, size=(64, 2)).astype(np.int64),
            "dense": rng.normal(size=(64, 3)).astype(np.float32),
            "label": rng.integers(0, 2, size=64).astype(np.float32),
        })["loss"]
        assert np.isfinite(loss)


# --- dense grad clipping (RunConfig.grad_clip_norm) ---------------------------

def test_clip_by_global_norm_exact():
    import jax.numpy as jnp

    grads = {"a": np.full((3, 4), 2.0, np.float32),
             "b": np.full((2,), 2.0, np.float32)}
    norm = float(np.sqrt(4.0 * 14))  # 14 elements of 2.0
    out = optim.clip_by_global_norm(grads, norm / 2)
    got = float(np.sqrt(sum((np.asarray(g) ** 2).sum() for g in out.values())))
    assert got == pytest.approx(norm / 2, rel=1e-6)
    # under the threshold: bit-identical passthrough
    out2 = optim.clip_by_global_norm(grads, norm * 10)
    for k in grads:
        np.testing.assert_array_equal(np.asarray(out2[k]), grads[k])
    # bf16 grads survive the f32 round trip with the right dtype
    gb = {"a": jnp.full((4,), 3.0, jnp.bfloat16)}
    assert optim.clip_by_global_norm(gb, 1.0)["a"].dtype == jnp.bfloat16


def test_grad_clip_zero_freezes_towers():
    """grad_clip_norm=0.0 is the embedding-only fine-tune mode: dense params
    stay bit-identical across steps while the table keeps learning."""
    from meepoembedding_tpu.train import Trainer
    import jax

    rc = RunConfig(batch_size=64, steps=4, grad_clip_norm=0.0)
    tc = TableConfig(dim=8, capacity=1 << 10)
    mc = ModelConfig(kind="ctr_mlp", num_dense_features=3,
                     num_sparse_features=2, embedding_dim=8, top_mlp=(8, 1))
    tr = Trainer(rc, tc, mc)
    before = jax.tree.map(np.asarray, tr.params)
    rng = np.random.default_rng(0)
    for _ in range(4):
        tr.train_step({
            "ids": rng.integers(0, 500, size=(64, 2)).astype(np.int64),
            "dense": rng.normal(size=(64, 3)).astype(np.float32),
            "label": rng.integers(0, 2, size=64).astype(np.float32),
        })
    after = jax.tree.map(np.asarray, tr.params)
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)
    import jax.numpy as jnp
    assert int(jnp.sum(tr.shard.cnt)) > 0  # the table still admitted rows


def test_sharded_grad_clip_runs():
    """Clipping after the psum keeps the sharded step device-identical."""
    from meepoembedding_tpu.parallel.trainer import ShardedTrainer

    rc = RunConfig(batch_size=64, steps=3, grad_clip_norm=0.5)
    tc = TableConfig(dim=8, capacity=1 << 12)
    mc = ModelConfig(kind="ctr_mlp", num_dense_features=3,
                     num_sparse_features=2, embedding_dim=8, top_mlp=(8, 1))
    tr = ShardedTrainer(rc, tc, mc)
    rng = np.random.default_rng(1)
    for _ in range(3):
        out = tr.train_step({
            "ids": rng.integers(0, 500, size=(64, 2)).astype(np.int64),
            "dense": rng.normal(size=(64, 3)).astype(np.float32),
            "label": rng.integers(0, 2, size=64).astype(np.float32),
        })
        # pipelined trainer: loss lags pipeline_depth steps (None while filling)
        assert out["loss"] is None or np.isfinite(out["loss"])
    assert all(np.isfinite(l) for _, l in tr.flush())
