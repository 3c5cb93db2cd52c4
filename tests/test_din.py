"""DIN attention pooling (models/din.py): the target-conditioned bag
attention must learn a signal that param-free combiners cannot cleanly
express — "is the candidate item in the user's behavior bag" — and must be
exactly invariant to bag padding."""

import numpy as np
import pytest

from meepoembedding_tpu.config import (
    ModelConfig,
    OptimizerConfig,
    RunConfig,
    TableConfig,
)
from meepoembedding_tpu.metrics import StreamingAUC
from meepoembedding_tpu.models import build_model
from meepoembedding_tpu.table.hashing import EMPTY_ID
from meepoembedding_tpu.train import Trainer

V, B, ND, D, L = 64, 128, 2, 16, 8


def _model_cfg():
    return ModelConfig(
        kind="din", num_dense_features=ND, num_sparse_features=2,
        embedding_dim=D, attention_mlp=(32,), top_mlp=(32, 1),
    )


def _make_batch(rng, pad_to=L):
    """Feature 0 = the target id (bag of one); feature 1 = behavior bag.
    Label: target present in the bag (planted on half the rows)."""
    tgt = rng.integers(0, V, size=B)
    bag = rng.integers(0, V, size=(B, L))
    hit = rng.random(B) < 0.5
    pos = rng.integers(0, L, size=B)
    bag[np.arange(B)[hit], pos[hit]] = tgt[hit]
    label = (bag == tgt[:, None]).any(1).astype(np.float32)
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


def test_din_learns_target_in_bag():
    tr = _trainer(400)
    rng = np.random.default_rng(0)
    for _ in range(400):
        tr.train_step(_make_batch(rng))
    auc = StreamingAUC()
    for _ in range(8):
        b = _make_batch(rng)
        ev = tr.eval_step(b)
        auc.update(np.asarray(ev["logits"]), b["label"])
    assert auc.compute() > 0.9


def test_din_padding_invariance():
    """Extra padding lanes must not change the logits at all: pads gather
    zero rows and are softmax-masked, so [B,S,L] and [B,S,L+4] batches of
    the same real ids score identically (untrained params, eval path)."""
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


def test_din_all_padding_bag_scores_finite():
    """A row whose behavior bag is entirely padding must produce a finite
    logit with a zero pooled vector (the masked softmax is renormalized)."""
    tr = _trainer(1)
    ids = np.full((B, 2, L), EMPTY_ID, np.int64)
    ids[:, 0, 0] = 3  # target present, bag empty
    out = tr.eval_step({
        "ids": ids,
        "dense": np.zeros((B, ND), np.float32),
        "label": np.zeros(B, np.float32),
    })
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_din_onehot_batch_runs():
    """One-hot [B, S] ids degenerate to bags of one; apply must still work
    through the trainer (train + eval paths)."""
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
