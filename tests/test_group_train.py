"""GroupTrainer (group_train.py): one fused step over heterogeneous tables —
different dims and optimizers per feature family, shared-embedding columns
deduping together, TableGroup-layout checkpoints restoring bit-stable."""

import numpy as np
import pytest

from meepoembedding_tpu.config import (
    ModelConfig,
    OptimizerConfig,
    RunConfig,
    TableConfig,
)
from meepoembedding_tpu.group_train import GroupTrainer
from meepoembedding_tpu.metrics import StreamingAUC

B, ND = 128, 3
TABLES = {
    "user": TableConfig(
        dim=8, capacity=1 << 12, initializer_scale=0.05,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.1),
    ),
    "item": TableConfig(
        dim=32, capacity=1 << 12, initializer_scale=0.05,
        optimizer=OptimizerConfig(kind="ftrl", learning_rate=0.05),
    ),
}
FEATURES = ["user", "item", "item"]  # candidate + history item share a table
MODEL = ModelConfig(num_dense_features=ND, num_sparse_features=3,
                    top_mlp=(32, 1))


def _batch(rng):
    user = rng.integers(0, 500, size=B)
    item = rng.integers(0, 200, size=B)
    hist = rng.integers(0, 200, size=B)
    label = ((item % 2) == 0).astype(np.float32)  # item-table signal
    return {
        "ids": np.stack([user, item, hist], axis=1).astype(np.int64),
        "dense": rng.normal(size=(B, ND)).astype(np.float32) * 0.1,
        "label": label,
    }


def test_group_trainer_learns_heterogeneous():
    tr = GroupTrainer(RunConfig(batch_size=B, steps=200,
                                dense_learning_rate=5e-3),
                      TABLES, FEATURES, MODEL)
    rng = np.random.default_rng(0)
    for _ in range(200):
        tr.train_step(_batch(rng))
    auc = StreamingAUC()
    for _ in range(8):
        b = _batch(rng)
        auc.update(np.asarray(tr.eval_step(b)["logits"]), b["label"])
    assert auc.compute() > 0.9
    c = tr.counters()
    assert 0 < c["user"]["rows"] <= 500
    assert 0 < c["item"]["rows"] <= 200  # both columns share one table


def test_group_shared_columns_dedup_once():
    """An id appearing in BOTH item columns of one batch must insert exactly
    once (shared-embedding columns dedup together within the step)."""
    tr = GroupTrainer(RunConfig(batch_size=B, steps=2), TABLES, FEATURES, MODEL)
    ids = np.zeros((B, 3), np.int64)
    ids[:, 0] = np.arange(B)  # users
    ids[:, 1] = 7  # same item everywhere,
    ids[:, 2] = 7  # in both columns
    tr.train_step({
        "ids": ids,
        "dense": np.zeros((B, ND), np.float32),
        "label": np.ones(B, np.float32),
    })
    c = tr.counters()
    assert c["item"]["rows"] == 1
    assert c["item"]["inserts"] == 1
    assert c["user"]["rows"] == B


def test_group_checkpoint_roundtrip(tmp_path):
    tr = GroupTrainer(RunConfig(batch_size=B, steps=10), TABLES, FEATURES, MODEL)
    rng = np.random.default_rng(1)
    for _ in range(5):
        tr.train_step(_batch(rng))
    hold = _batch(rng)
    before = np.asarray(tr.eval_step(hold)["logits"])
    tr.save_checkpoint(str(tmp_path / "gck"))

    tr2 = GroupTrainer(RunConfig(batch_size=B, steps=10), TABLES, FEATURES, MODEL)
    m = tr2.load_checkpoint(str(tmp_path / "gck"))
    assert m["step"] == 5 and m["feature_map"] == FEATURES
    after = np.asarray(tr2.eval_step(hold)["logits"])
    np.testing.assert_array_equal(before, after)
    # training continues from the restored state
    assert np.isfinite(tr2.train_step(_batch(rng))["loss"])


def test_group_rejects_bad_wiring():
    with pytest.raises(AssertionError):
        GroupTrainer(RunConfig(), TABLES, ["user", "nope"], MODEL)
    with pytest.raises(AssertionError):
        GroupTrainer(RunConfig(), TABLES, ["user", "user"], MODEL)  # item unused
    wide = dict(TABLES)
    wide["wide"] = TableConfig(dim=256, capacity=1 << 12)
    with pytest.raises(AssertionError):
        GroupTrainer(RunConfig(), wide, ["user", "item", "wide"], MODEL)


def test_group_multihot_bags():
    """[B, S, L] bags pool per feature with the configured combiner."""
    from meepoembedding_tpu.table.hashing import EMPTY_ID

    tr = GroupTrainer(RunConfig(batch_size=B, steps=3), TABLES, FEATURES, MODEL)
    rng = np.random.default_rng(2)
    L = 4
    ids = rng.integers(0, 300, size=(B, 3, L)).astype(np.int64)
    ids[:, :, L - 1] = EMPTY_ID  # ragged bags
    for _ in range(3):
        out = tr.train_step({
            "ids": ids,
            "dense": rng.normal(size=(B, ND)).astype(np.float32),
            "label": rng.integers(0, 2, size=B).astype(np.float32),
        })
        assert np.isfinite(out["loss"])
    assert np.isfinite(
        np.asarray(tr.eval_step({
            "ids": ids,
            "dense": np.zeros((B, ND), np.float32),
            "label": np.zeros(B, np.float32),
        })["logits"])
    ).all()
