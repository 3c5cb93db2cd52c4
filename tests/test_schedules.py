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
