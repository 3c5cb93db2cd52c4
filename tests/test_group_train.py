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


def test_group_dlrm_parity_with_single_table_dlrm():
    """model.kind=dlrm on an equal-dim group computes the SAME function as
    the single-table DLRM trainer (VERDICT r4 next-#7): same seeds, same
    stream, one table serving every feature -> identical losses/logits."""
    from meepoembedding_tpu.train import Trainer

    dim = 16
    table = TableConfig(
        dim=dim, capacity=1 << 12, initializer_scale=0.05,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.05),
    )
    model = ModelConfig(
        kind="dlrm", num_dense_features=ND, num_sparse_features=3,
        embedding_dim=dim, bottom_mlp=(32, dim), top_mlp=(32, 1),
    )
    run = RunConfig(batch_size=B, steps=10, seed=0, dense_learning_rate=1e-3)

    single = Trainer(run, table, model)
    group = GroupTrainer(run, {"t": table}, ["t", "t", "t"], model)
    assert "bottom" in group.params and "top" in group.params  # DLRM head on

    rng = np.random.default_rng(7)
    for i in range(10):
        b = _batch(rng)
        l1 = single.train_step(b)["loss"]
        l2 = group.train_step(b)["loss"]
        np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-6)
    b = _batch(rng)
    o1 = single.eval_step(b)
    o2 = group.eval_step(b)
    np.testing.assert_allclose(
        np.asarray(o1["logits"]), np.asarray(o2["logits"]), rtol=1e-4, atol=1e-5
    )


def test_group_dlrm_two_tables_learns():
    """DLRM head over a genuinely multi-table equal-dim group trains."""
    dim = 16
    tables = {
        "user": TableConfig(
            dim=dim, capacity=1 << 12, initializer_scale=0.05,
            optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.1),
        ),
        "item": TableConfig(
            dim=dim, capacity=1 << 12, initializer_scale=0.05,
            optimizer=OptimizerConfig(kind="ftrl", learning_rate=0.05),
        ),
    }
    model = ModelConfig(
        kind="dlrm", num_dense_features=ND, num_sparse_features=3,
        embedding_dim=dim, bottom_mlp=(32, dim), top_mlp=(32, 1),
    )
    tr = GroupTrainer(
        RunConfig(batch_size=B, steps=400, dense_learning_rate=1e-2),
        tables, ["user", "item", "item"], model,
    )
    assert "bottom" in tr.params  # equal dims: dot interaction active
    rng = np.random.default_rng(0)
    for _ in range(400):
        tr.train_step(_batch(rng))
    auc = StreamingAUC()
    for _ in range(8):
        b = _batch(rng)
        auc.update(np.asarray(tr.eval_step(b)["logits"]), b["label"])
    assert auc.compute() > 0.8


def test_group_heterodim_dlrm_falls_back_to_wide_mlp():
    """kind=dlrm (the ModelConfig default) over a dim-heterogeneous group
    keeps the historical wide-MLP head (with a warning) instead of breaking."""
    tr = GroupTrainer(RunConfig(batch_size=B, steps=2), TABLES, FEATURES, MODEL)
    assert "mlp" in tr.params and "bottom" not in tr.params


def test_group_rejects_sequence_model_kinds():
    model = ModelConfig(kind="din", num_dense_features=ND,
                        num_sparse_features=3, top_mlp=(32, 1))
    with pytest.raises(AssertionError, match="single table"):
        GroupTrainer(RunConfig(batch_size=B, steps=2), TABLES, FEATURES, model)
