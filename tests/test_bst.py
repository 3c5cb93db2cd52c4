"""BST behavior-sequence transformer (models/bst.py): must learn an
ORDER-dependent signal that permutation-invariant pooling (combiners, DIN's
bag attention) cannot express, and must be exactly invariant to bag padding."""

import numpy as np
import pytest

from meepoembedding_tpu.config import (
    ModelConfig,
    OptimizerConfig,
    RunConfig,
    TableConfig,
)
from meepoembedding_tpu.metrics import StreamingAUC
from meepoembedding_tpu.table.hashing import EMPTY_ID
from meepoembedding_tpu.train import Trainer

V, B, ND, D, L = 64, 128, 2, 16, 6


def _model_cfg():
    return ModelConfig(
        kind="bst", num_dense_features=ND, num_sparse_features=2,
        embedding_dim=D, attention_heads=2, transformer_blocks=1,
        max_seq_len=16, top_mlp=(32, 1),
    )


def _make_batch(rng, pad_to=L, reverse=False):
    """Feature 0 = target id; feature 1 = ordered behavior sequence of
    uniform ids. label = 1 iff the LAST element's id < V/2 — determined by
    one POSITION, so order-blind pooling tops out near chance while a
    position-aware encoder can hit it exactly. `reverse=True` flips each
    sequence AFTER labeling: a model keying on the last position must drop
    to chance (the control that it reads order, not content)."""
    tgt = rng.integers(0, V, size=B)
    bag = rng.integers(0, V, size=(B, L))
    label = (bag[:, L - 1] < V // 2).astype(np.float32)
    if reverse:
        bag = bag[:, ::-1]
    f0 = np.full((B, 1, pad_to), EMPTY_ID, np.int64)
    f0[:, 0, 0] = tgt
    f1 = np.full((B, 1, pad_to), EMPTY_ID, np.int64)
    f1[:, 0, :L] = bag
    ids = np.concatenate([f0, f1], axis=1)
    return {
        "ids": ids,
        "dense": rng.normal(size=(B, ND)).astype(np.float32) * 0.1,
        "label": label,
    }


def _trainer(steps):
    tc = TableConfig(
        dim=D, capacity=1 << 12, initializer_scale=0.1,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.1),
    )
    rc = RunConfig(batch_size=B, steps=steps, dense_learning_rate=3e-3)
    return Trainer(rc, tc, _model_cfg())


def test_bst_learns_order():
    tr = _trainer(300)
    rng = np.random.default_rng(0)
    for _ in range(300):
        tr.train_step(_make_batch(rng))
    auc, auc_rev = StreamingAUC(), StreamingAUC()
    for _ in range(8):
        b = _make_batch(rng)
        auc.update(np.asarray(tr.eval_step(b)["logits"]), b["label"])
        br = _make_batch(rng, reverse=True)
        auc_rev.update(np.asarray(tr.eval_step(br)["logits"]), br["label"])
    assert auc.compute() > 0.95
    # reversed sequences carry the labeled element at position 0: a model
    # that truly reads order collapses toward chance
    assert auc_rev.compute() < 0.7


def test_bst_padding_invariance():
    """Extra padding lanes at the END must not change the logits: pads are
    additive-masked out of every attention softmax and excluded from the
    pooled mean, and real elements keep their positions."""
    tr = _trainer(1)
    rng = np.random.default_rng(1)
    b1 = _make_batch(rng, pad_to=L)
    b2 = {
        "ids": np.full((B, 2, L + 4), EMPTY_ID, np.int64),
        "dense": b1["dense"],
        "label": b1["label"],
    }
    b2["ids"][:, :, :L] = b1["ids"]
    l1 = np.asarray(tr.eval_step(b1)["logits"])
    l2 = np.asarray(tr.eval_step(b2)["logits"])
    np.testing.assert_allclose(l1, l2, atol=1e-5)


def test_bst_empty_sequence_scores_finite():
    """All-padding behavior sequences must score finite (the target token is
    still valid; padded keys never win the softmax)."""
    tr = _trainer(1)
    ids = np.full((B, 2, L), EMPTY_ID, np.int64)
    ids[:, 0, 0] = 3
    out = tr.eval_step({
        "ids": ids,
        "dense": np.zeros((B, ND), np.float32),
        "label": np.zeros(B, np.float32),
    })
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_bst_onehot_batch_runs():
    tr = _trainer(2)
    rng = np.random.default_rng(2)
    ids = np.stack(
        [rng.integers(0, V, size=B), rng.integers(0, V, size=B)], axis=1
    ).astype(np.int64)
    batch = {
        "ids": ids,
        "dense": np.zeros((B, ND), np.float32),
        "label": rng.integers(0, 2, size=B).astype(np.float32),
    }
    loss = tr.train_step(batch)["loss"]
    assert np.isfinite(loss)
    assert np.isfinite(np.asarray(tr.eval_step(batch)["logits"])).all()


def test_bst_context_features_and_sharded():
    """Features 2.. are mean-pooled context; the sharded trainer runs BST
    end to end on a multi-device mesh."""
    from meepoembedding_tpu.parallel.trainer import ShardedTrainer

    mc = ModelConfig(
        kind="bst", num_dense_features=ND, num_sparse_features=4,
        embedding_dim=D, attention_heads=2, transformer_blocks=2,
        max_seq_len=16, top_mlp=(32, 1),
    )
    tc = TableConfig(dim=D, capacity=1 << 12)
    rc = RunConfig(batch_size=B, steps=3)
    tr = ShardedTrainer(rc, tc, mc)
    rng = np.random.default_rng(3)
    for _ in range(3):
        ids = rng.integers(0, V, size=(B, 4, L)).astype(np.int64)
        ids[:, :, L - 2:] = EMPTY_ID  # ragged bags
        out = tr.train_step({
            "ids": ids,
            "dense": rng.normal(size=(B, ND)).astype(np.float32),
            "label": rng.integers(0, 2, size=B).astype(np.float32),
        })
        # pipelined trainer: loss lags pipeline_depth steps (None while filling)
        assert out["loss"] is None or np.isfinite(out["loss"])
    assert all(np.isfinite(l) for _, l in tr.flush())
