"""Sampling-bias correction: the streaming item-frequency estimator
(ops/itemfreq.py) and its effect on the two-tower in-batch softmax."""

import jax
import numpy as np

from meepoembedding_tpu.config import ModelConfig, OptimizerConfig, RunConfig, TableConfig
from meepoembedding_tpu.models import build_model
from meepoembedding_tpu.ops.itemfreq import ItemFrequencyEstimator, item_keys_np
from meepoembedding_tpu.table.hashing import EMPTY_ID, split_ids


def test_estimator_tracks_batch_frequency():
    """Items planted in every batch must estimate q ~= 1; items in 10% of
    batches q ~= 0.1 (count-min only ever overcounts, so >= holds)."""
    est = ItemFrequencyEstimator(width=1 << 12)
    rng = np.random.default_rng(0)
    hot, cold = np.uint64(7), np.uint64(12345)
    for b in range(200):
        keys = rng.integers(1 << 20, 1 << 30, size=64).astype(np.uint64)
        keys[0] = hot
        if b % 10 == 0:
            keys[1] = cold
        est.update_and_logq(keys)
    lq = est.update_and_logq(np.array([hot, cold], np.uint64))
    q_hot, q_cold = np.exp(lq)
    assert 0.9 <= q_hot <= 1.0, q_hot
    assert 0.08 <= q_cold <= 0.2, q_cold  # >= true 0.1 minus edge effects


def test_estimator_counts_distinct_items_once_per_batch():
    """q is 'appears in a batch': an item duplicated 50x inside one batch
    counts once."""
    est = ItemFrequencyEstimator()
    for _ in range(4):
        est.update_and_logq(np.full(50, 99, np.uint64))
    lq = est.update_and_logq(np.array([99], np.uint64))
    assert abs(float(np.exp(lq[0])) - 1.0) < 1e-6


def test_item_keys_np_semantics():
    """Keys ignore query-side columns and bag padding; depend on the item
    ids and their feature column."""
    a = np.array([[1, 10, 20]], np.int64)  # qf=1 -> item cols (10, 20)
    b = np.array([[999, 10, 20]], np.int64)  # different query, same item
    c = np.array([[1, 20, 10]], np.int64)  # item features swapped
    ka, kb, kc = (item_keys_np(x, 1)[0] for x in (a, b, c))
    assert ka == kb and ka != kc
    # bags: padding position must not matter
    E = EMPTY_ID
    b1 = np.array([[[1, E], [10, 11]]], np.int64)
    b2 = np.array([[[1, E], [11, 10]]], np.int64)  # same set, lanes swapped
    b3 = np.array([[[1, E], [10, E]]], np.int64)
    k1, k2, k3 = (item_keys_np(x, 1)[0] for x in (b1, b2, b3))
    assert k1 == k2 and k1 != k3


def test_logq_matches_manual_softmax():
    """loss_and_logits(logq=...) must equal a numpy recomputation of the
    corrected softmax cross-entropy."""
    mc = ModelConfig(kind="two_tower", num_dense_features=2,
                     num_sparse_features=2, num_query_features=1,
                     embedding_dim=8, bottom_mlp=(16, 8), top_mlp=(4, 1))
    model = build_model(mc)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    b = 8
    emb = rng.normal(size=(b, 2, 8)).astype(np.float32)
    dense = rng.normal(size=(b, 2)).astype(np.float32)
    label = np.ones(b, np.float32)
    logq = rng.uniform(-3, 0, size=b).astype(np.float32)
    loss_c, _ = model.loss_and_logits(params, dense, emb, label, None, logq=logq)
    # manual: raw scores from the uncorrected call's margin path
    q = np.asarray(model.embed_query(params, dense, emb[:, :1]))
    v = np.asarray(model.embed_item(params, emb[:, 1:]))
    tau = float(np.exp(np.asarray(params["log_tau"])))
    s = tau * (q @ v.T) - logq[None, :]
    logp = s - np.log(np.exp(s - s.max(1, keepdims=True)).sum(1, keepdims=True)) - s.max(1, keepdims=True)
    np.testing.assert_allclose(float(loss_c), -np.mean(np.diag(logp)), rtol=1e-5)


def test_two_tower_logq_end_to_end():
    """logq_correction=True must still learn the planted pairing on a
    zipf-skewed item stream (popular items are heavily over-sampled as
    negatives — precisely the case the correction exists for)."""
    from meepoembedding_tpu.train import Trainer

    mc = ModelConfig(kind="two_tower", num_dense_features=2,
                     num_sparse_features=2, num_query_features=1,
                     embedding_dim=16, bottom_mlp=(32, 16), top_mlp=(4, 1),
                     logq_correction=True)
    tc = TableConfig(dim=16, capacity=1 << 12,
                     optimizer=OptimizerConfig(kind="rowwise_adagrad",
                                               learning_rate=0.1))
    tr = Trainer(RunConfig(batch_size=64, steps=250, dense_learning_rate=3e-3),
                 tc, mc)
    assert tr._freq_est is not None
    rng = np.random.default_rng(0)
    first = last = None
    for _ in range(250):
        q = (rng.zipf(1.3, size=64) - 1) % 32
        ids = np.stack([q, (1 << 44) | q], axis=1).astype(np.int64)
        loss = tr.train_step({
            "ids": ids,
            "dense": rng.normal(size=(64, 2)).astype(np.float32) * 0.1,
            "label": np.ones(64, np.float32),
        })["loss"]
        first = loss if first is None else first
        last = loss
    assert last < first * 0.35, (first, last)
