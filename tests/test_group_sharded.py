"""Distributed heterogeneous multi-table training (VERDICT r2 #4): the
ShardedGroupTrainer on the 8-virtual-device CPU mesh must match the
single-device GroupTrainer step for step, and its per-table elastic
checkpoints must round-trip across mesh sizes and trainer kinds."""

import jax
import numpy as np
import pytest

from meepoembedding_tpu.config import (
    ModelConfig,
    OptimizerConfig,
    RunConfig,
    TableConfig,
)
from meepoembedding_tpu.group_train import GroupTrainer, ShardedGroupTrainer
from meepoembedding_tpu.parallel.mesh import make_mesh

TABLES = {
    "user": TableConfig(
        dim=16, capacity=1 << 13, initializer_scale=0.02,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.05),
    ),
    "item": TableConfig(
        dim=8, capacity=1 << 12, initializer_scale=0.02,
        optimizer=OptimizerConfig(kind="ftrl", learning_rate=0.05),
    ),
}
# shared-embedding: columns 1 and 2 both read the item table
FEATURE_MAP = ["user", "item", "item"]
MODEL = ModelConfig(
    kind="ctr_mlp", num_dense_features=4, num_sparse_features=3,
    embedding_dim=16, top_mlp=(32, 1),
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(8)


def _batch(rng, b=128):
    return {
        "ids": np.stack(
            [
                rng.integers(0, 4000, size=b),
                rng.integers(0, 900, size=b),
                rng.integers(0, 900, size=b),
            ],
            axis=1,
        ).astype(np.int64),
        "dense": rng.normal(size=(b, 4)).astype(np.float32),
        "label": rng.integers(0, 2, size=b).astype(np.float32),
    }


def test_sharded_group_matches_single_device(mesh):
    run = RunConfig(batch_size=128, steps=8, dense_learning_rate=3e-3, seed=2,
                    pipeline_depth=0)
    t1 = GroupTrainer(run, TABLES, FEATURE_MAP, MODEL)
    t8 = ShardedGroupTrainer(run, TABLES, FEATURE_MAP, MODEL, mesh=mesh)
    rng = np.random.default_rng(0)
    l1, l8 = [], []
    for _ in range(8):
        b = _batch(rng)
        l1.append(t1.train_step(b)["loss"])
        l8.append(t8.train_step(b)["loss"])
    np.testing.assert_allclose(l1, l8, rtol=2e-3, atol=2e-4)
    c1, c8 = t1.counters(), t8.counters()
    for n in ("user", "item"):
        assert c1[n]["rows"] == c8[n]["rows"], (n, c1[n], c8[n])
        assert c1[n]["inserts"] == c8[n]["inserts"]


def test_sharded_group_pipelined_matches_sync(mesh):
    kw = dict(batch_size=128, steps=6, dense_learning_rate=3e-3, seed=7)
    ts = ShardedGroupTrainer(RunConfig(pipeline_depth=0, **kw), TABLES,
                             FEATURE_MAP, MODEL, mesh=mesh)
    tp = ShardedGroupTrainer(RunConfig(pipeline_depth=2, **kw), TABLES,
                             FEATURE_MAP, MODEL, mesh=mesh)
    rng = np.random.default_rng(1)
    sync, pipe = [], []
    for _ in range(6):
        b = _batch(rng)
        out_s = ts.train_step(b)
        sync.append((out_s["retired_step"], out_s["loss"]))
        out = tp.train_step(b)
        if out["loss"] is not None:
            pipe.append((out["retired_step"], out["loss"]))
    pipe += tp.flush()
    assert [s for s, _ in pipe] == [s for s, _ in sync]
    np.testing.assert_allclose([l for _, l in pipe], [l for _, l in sync],
                               rtol=1e-6)
    assert tp.auc.compute() == pytest.approx(ts.auc.compute(), abs=1e-9)


def test_sharded_group_checkpoint_roundtrip(mesh, tmp_path):
    """8-shard save -> 2-shard elastic restore: logits identical."""
    run = RunConfig(batch_size=128, steps=3, pipeline_depth=2)
    tr = ShardedGroupTrainer(run, TABLES, FEATURE_MAP, MODEL, mesh=mesh)
    rng = np.random.default_rng(3)
    for _ in range(3):
        tr.train_step(_batch(rng))
    path = str(tmp_path / "gck")
    tr.save_checkpoint(path)
    tr2 = ShardedGroupTrainer(run, TABLES, FEATURE_MAP, MODEL,
                              mesh=make_mesh(2))
    m = tr2.load_checkpoint(path)
    assert m["step"] == 3 and tr2.step == 3
    hold = _batch(rng)
    e1 = tr.eval_step(hold)
    e2 = tr2.eval_step(hold)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(e1["logits"])),
        np.asarray(jax.device_get(e2["logits"])), rtol=1e-5, atol=1e-6,
    )
    # training continues after elastic restore
    tr2.train_step(_batch(rng))
    assert all(np.isfinite(l) for _, l in tr2.flush())


def test_single_device_group_ckpt_restores_sharded(mesh, tmp_path):
    """A single-device GroupTrainer checkpoint loads into the sharded
    trainer (and vice versa) — same per-table elastic format."""
    run = RunConfig(batch_size=128, steps=2, pipeline_depth=0)
    t1 = GroupTrainer(run, TABLES, FEATURE_MAP, MODEL)
    rng = np.random.default_rng(5)
    hold = _batch(rng)
    for _ in range(2):
        t1.train_step(_batch(rng))
    path = str(tmp_path / "g1")
    t1.save_checkpoint(path)
    t8 = ShardedGroupTrainer(run, TABLES, FEATURE_MAP, MODEL, mesh=mesh)
    t8.load_checkpoint(path)
    e1 = t1.eval_step(hold)
    e8 = t8.eval_step(hold)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(e1["logits"])),
        np.asarray(jax.device_get(e8["logits"])), rtol=1e-5, atol=1e-6,
    )
    # reverse direction: sharded save -> single-device restore
    path2 = str(tmp_path / "g8")
    t8.save_checkpoint(path2)
    t1b = GroupTrainer(run, TABLES, FEATURE_MAP, MODEL)
    t1b.load_checkpoint(path2)
    e1b = t1b.eval_step(hold)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(e1b["logits"])),
        np.asarray(jax.device_get(e1["logits"])), rtol=1e-5, atol=1e-6,
    )


def test_sharded_group_dlrm_matches_single_device(mesh):
    """model.kind=dlrm over an EQUAL-dim group: the dot-interaction head
    (group_head_apply) must track the single-device group trainer
    step-for-step on the 8-vdev mesh (VERDICT r4 next-#7, sharded variant)."""
    from meepoembedding_tpu.config import OptimizerConfig, TableConfig

    dim = 16
    tables = {
        "user": TableConfig(
            dim=dim, capacity=1 << 13, initializer_scale=0.02,
            optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.1),
        ),
        "item": TableConfig(
            dim=dim, capacity=1 << 12, initializer_scale=0.02,
            optimizer=OptimizerConfig(kind="ftrl", learning_rate=0.05),
        ),
    }
    model = ModelConfig(
        kind="dlrm", num_dense_features=4, num_sparse_features=3,
        embedding_dim=dim, bottom_mlp=(32, dim), top_mlp=(32, 1),
    )
    run = RunConfig(batch_size=128, steps=8, dense_learning_rate=3e-3, seed=2,
                    pipeline_depth=0)
    t1 = GroupTrainer(run, tables, FEATURE_MAP, model)
    t8 = ShardedGroupTrainer(run, tables, FEATURE_MAP, model, mesh=mesh)
    assert "bottom" in t1.params and "bottom" in t8.params  # dot head active
    rng = np.random.default_rng(0)
    l1, l8 = [], []
    for _ in range(8):
        b = _batch(rng)
        l1.append(t1.train_step(b)["loss"])
        l8.append(t8.train_step(b)["loss"])
    np.testing.assert_allclose(l1, l8, rtol=2e-3, atol=2e-4)
    c1, c8 = t1.counters(), t8.counters()
    for n in ("user", "item"):
        assert c1[n]["rows"] == c8[n]["rows"], (n, c1[n], c8[n])
