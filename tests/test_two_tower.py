"""Two-tower retrieval: model, in-batch softmax objective, item index, and
the retrieval service (README.md:2 "recommendation, search" — SURVEY.md C16's
retrieval sibling). Oracle here is planted structure: query q pairs with item
q, so a correct trainer must push hit@1 toward 1 and the service must return
the paired item at top-1."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from meepoembedding_tpu.config import (
    ModelConfig,
    OptimizerConfig,
    RunConfig,
    TableConfig,
)
from meepoembedding_tpu.models import build_model
from meepoembedding_tpu.retrieval import ItemIndex, RetrievalService
from meepoembedding_tpu.table import hashing
from meepoembedding_tpu.train import Trainer

ITEM_NS = np.int64(1) << 44  # item feature namespace (data/synthetic.py)


def _model_cfg(**kw):
    base = dict(
        kind="two_tower", num_dense_features=2, num_sparse_features=2,
        num_query_features=1, embedding_dim=16, bottom_mlp=(32, 16),
        top_mlp=(8, 1),
    )
    base.update(kw)
    return ModelConfig(**base)


def _pair_batch(rng, vocab, batch, num_dense=2):
    """Planted retrieval structure: query id q (ns 0) pairs with item id q
    (ns 1), all positives."""
    q = rng.integers(0, vocab, size=batch)
    ids = np.stack([q, ITEM_NS | q], axis=1).astype(np.int64)
    return {
        "ids": ids,
        "dense": rng.normal(size=(batch, num_dense)).astype(np.float32) * 0.1,
        "label": np.ones(batch, np.float32),
    }, q


def _train_pairs(steps=250, vocab=32, batch=64, seed=0):
    mc = _model_cfg()
    tc = TableConfig(
        dim=16, capacity=1 << 12,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.1),
    )
    rc = RunConfig(batch_size=batch, steps=steps, dense_learning_rate=3e-3)
    tr = Trainer(rc, tc, mc)
    rng = np.random.default_rng(seed)
    first = last = None
    for _ in range(steps):
        batch_d, _ = _pair_batch(rng, vocab, batch)
        loss = tr.train_step(batch_d)["loss"]
        first = loss if first is None else first
        last = loss
    return tr, tc, mc, first, last


# --- ItemIndex ----------------------------------------------------------------


def test_item_index_matches_numpy(rng):
    v = rng.normal(size=(1000, 24)).astype(np.float32)
    q = rng.normal(size=(7, 24)).astype(np.float32)
    keys = np.arange(1000, dtype=np.int64) * 7 + 3
    idx = ItemIndex(v, keys=keys, chunk=128)  # forces an 8-chunk scan merge
    got_keys, got_scores = idx.topk(q, 5)
    ref = q @ v.T
    ref_top = np.argsort(-ref, axis=1)[:, :5]
    np.testing.assert_array_equal(got_keys, keys[ref_top])
    np.testing.assert_allclose(
        got_scores, np.take_along_axis(ref, ref_top, 1), atol=1e-4
    )


def test_item_index_k_exceeding_corpus(rng):
    v = rng.normal(size=(5, 8)).astype(np.float32)
    idx = ItemIndex(v)
    keys, scores = idx.topk(rng.normal(size=(2, 8)).astype(np.float32), 64)
    assert keys.shape == (2, 5)  # clamped to corpus size; padding never leaks
    assert np.isfinite(scores).all() and set(keys[0]) == set(range(5))


# --- objective ------------------------------------------------------------------


def test_accidental_hit_masking():
    """A batch where every row carries the SAME item must not treat the
    clones as negatives: with masking, softmax reduces to the diagonal and
    the loss is exactly 0 even untrained."""
    mc = _model_cfg()
    model = build_model(mc)
    params = model.init(jax.random.PRNGKey(0))
    b, d = 16, mc.embedding_dim
    ids = np.stack(
        [np.arange(b, dtype=np.int64), np.full(b, ITEM_NS | 5)], axis=1
    )
    hi, lo = hashing.split_ids(ids)
    emb = np.random.default_rng(0).normal(size=(b, 2, d)).astype(np.float32)
    dense = np.zeros((b, mc.num_dense_features), np.float32)
    label = np.ones(b, np.float32)
    key = model.item_key(jax.numpy.asarray(hi), jax.numpy.asarray(lo))
    loss, _ = model.loss_and_logits(params, dense, emb, label, key)
    assert float(loss) < 1e-5
    # without the key the same batch pays ~log(B) of false-negative loss
    loss_unmasked, _ = model.loss_and_logits(params, dense, emb, label, None)
    assert float(loss_unmasked) > 1.0


def test_item_key_bag_invariance():
    """Multi-hot item bags: the key depends on the SET of valid ids, not on
    lane order or where the padding sits; different items get different keys."""
    mc = _model_cfg()
    model = build_model(mc)
    E = hashing.EMPTY_ID
    bag_a = np.array([[[3, E, E, E], [10, 11, E, E]]], dtype=np.int64)
    bag_b = np.array([[[3, E, E, E], [E, 11, E, 10]]], dtype=np.int64)
    bag_c = np.array([[[3, E, E, E], [10, 12, E, E]]], dtype=np.int64)
    keys = []
    for bag in (bag_a, bag_b, bag_c):
        hi, lo = hashing.split_ids(bag)
        keys.append(int(model.item_key(jax.numpy.asarray(hi), jax.numpy.asarray(lo))[0]))
    assert keys[0] == keys[1]
    assert keys[0] != keys[2]


# --- end-to-end -----------------------------------------------------------------


def test_two_tower_learns_and_retrieves(tmp_path):
    tr, tc, mc, first, last = _train_pairs()
    assert last < first * 0.2, (first, last)
    # hit@1 from the eval margin logits
    rng = np.random.default_rng(99)
    batch, _ = _pair_batch(rng, 32, 64)
    margin = np.asarray(tr.eval_step(batch)["logits"])
    assert (margin > 0).mean() >= 0.9

    # checkpoint -> scoring service -> retrieval service
    from meepoembedding_tpu.serving import ScoringService, make_http_server

    tr.save_checkpoint(str(tmp_path / "ck"))
    svc = ScoringService(str(tmp_path / "ck"), tc, mc)
    ret = RetrievalService(svc)
    item_ids = (ITEM_NS | np.arange(32, dtype=np.int64))[:, None]
    ret.build_index(item_ids, keys=np.arange(32, dtype=np.int64))
    qids = np.arange(32, dtype=np.int64)[:, None]
    keys, scores = ret.retrieve(np.zeros((32, 2), np.float32), qids, k=3)
    assert (keys[:, 0] == np.arange(32)).mean() >= 0.9
    assert (scores[:, 0] >= scores[:, 1]).all()

    # ranking-compatible apply(): paired (q, item) scores above mismatched
    p_match = svc.score(np.zeros((32, 2), np.float32),
                        np.concatenate([qids, item_ids], axis=1))
    mism = np.concatenate([qids, np.roll(item_ids, 1, axis=0)], axis=1)
    p_mism = svc.score(np.zeros((32, 2), np.float32), mism)
    assert p_match.mean() > p_mism.mean() + 0.2

    # HTTP /retrieve round-trip on the same service
    srv = make_http_server(svc, 0, retrieval=ret)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        req = json.dumps({
            "dense": [[0.0, 0.0]], "ids": [[4]], "k": 2,
        }).encode()
        r = json.loads(urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/retrieve", data=req,
                headers={"Content-Type": "application/json"},
            ),
            timeout=60,
        ).read())
        assert r["keys"][0][0] == 4, r
        assert len(r["keys"][0]) == 2
    finally:
        srv.shutdown()
        srv.server_close()


def test_retrieval_recall_at_k(tmp_path):
    """recall@k eval: trained pairs must be recalled at k=1 nearly always,
    and at k=corpus trivially; items missing from the corpus count as
    misses (not crashes)."""
    tr, tc, mc, _, _ = _train_pairs()
    from meepoembedding_tpu.serving import ScoringService

    tr.save_checkpoint(str(tmp_path / "ck"))
    svc = ScoringService(str(tmp_path / "ck"), tc, mc)
    ret = RetrievalService(svc)
    item_ids = (ITEM_NS | np.arange(32, dtype=np.int64))[:, None]
    ret.build_index(item_ids, keys=np.arange(32, dtype=np.int64))
    rng = np.random.default_rng(11)
    batches = [_pair_batch(rng, 32, 64)[0] for _ in range(4)]
    out = ret.evaluate(batches, ks=(1, 32))
    assert out["positives"] == 256 and out["corpus"] == 32
    assert out["recall@1"] >= 0.9
    assert out["recall@32"] == 1.0
    # corpus missing half the items: recall can't exceed the coverage
    ret2 = RetrievalService(svc)
    ret2.build_index(item_ids[:16], keys=np.arange(16, dtype=np.int64))
    out2 = ret2.evaluate(batches, ks=(32,))
    covered = sum(
        (np.asarray(b["ids"])[:, 1] < (ITEM_NS | 16)).sum() for b in batches
    )
    assert out2["recall@32"] == covered / out["positives"]


def test_sharded_two_tower_learns():
    """8-virtual-device mesh: row-sharded table + DP towers + local in-batch
    negatives still learn the planted pairing."""
    from meepoembedding_tpu.parallel.trainer import ShardedTrainer

    assert jax.device_count() >= 8
    mc = _model_cfg()
    tc = TableConfig(
        dim=16, capacity=1 << 13,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.1),
    )
    rc = RunConfig(batch_size=128, steps=120, dense_learning_rate=3e-3,
                   unique_cap=256)
    tr = ShardedTrainer(rc, tc, mc)
    rng = np.random.default_rng(3)
    losses = []
    for _ in range(120):
        batch, _ = _pair_batch(rng, 32, 128)
        out = tr.train_step(batch)
        if out["loss"] is not None:  # pipelined: lags pipeline_depth steps
            losses.append(out["loss"])
    losses += [l for _, l in tr.flush()]
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.35, (
        np.mean(losses[:10]), np.mean(losses[-10:])
    )
