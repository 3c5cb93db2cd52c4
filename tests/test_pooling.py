"""Multi-hot bag pooling (SURVEY.md C16/C17): combiner math vs a numpy
oracle, padding-id neutrality end to end, and one-hot/multi-hot parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from meepoembedding_tpu.config import ModelConfig, OptimizerConfig, RunConfig, TableConfig
from meepoembedding_tpu.data.synthetic import SyntheticConfig, SyntheticStream
from meepoembedding_tpu.metrics import JsonlLogger
from meepoembedding_tpu.ops import pooling
from meepoembedding_tpu.table.hashing import EMPTY_ID
from meepoembedding_tpu.train import Trainer, train


def _np_pool(emb, valid, combiner):
    s = (emb * valid[..., None]).sum(axis=2)
    cnt = np.maximum(valid.sum(axis=-1), 1.0)
    if combiner == "sum":
        return s
    if combiner == "mean":
        return s / cnt[..., None]
    return s / np.sqrt(cnt)[..., None]


@pytest.mark.parametrize("combiner", pooling.COMBINERS)
def test_pool_bags_matches_oracle(rng, combiner):
    B, S, L, D = 5, 3, 4, 8
    valid = rng.random((B, S, L)) < 0.6
    valid[0, 0, :] = False  # empty bag
    valid[1, 1, :] = True  # full bag
    emb = rng.normal(size=(B, S, L, D)).astype(np.float32)
    emb = emb * valid[..., None]  # lookup guarantees zero rows on pad lanes
    got = np.asarray(pooling.pool_bags(jnp.asarray(emb), jnp.asarray(valid), combiner))
    np.testing.assert_allclose(got, _np_pool(emb, valid, combiner), rtol=1e-6)
    assert np.all(got[0, 0] == 0)  # empty bag pools to zeros


def test_pool_or_reshape_onehot_passthrough(rng):
    B, S, D = 4, 3, 8
    flat = rng.normal(size=(B * S, D)).astype(np.float32)
    hi = np.zeros((B, S), np.int32)
    out = pooling.pool_or_reshape(jnp.asarray(flat), jnp.asarray(hi), None, D, "mean")
    np.testing.assert_array_equal(np.asarray(out), flat.reshape(B, S, D))


def test_bad_combiner_raises(rng):
    with pytest.raises(ValueError):
        pooling.pool_bags(jnp.zeros((1, 1, 2, 4)), jnp.ones((1, 1, 2), bool), "max")


def _cfgs(batch=256, dim=8, combiner="mean", bag_len=3, steps=60):
    run = RunConfig(batch_size=batch, steps=steps, log_every=100,
                    dense_learning_rate=3e-3)
    table = TableConfig(
        dim=dim, capacity=1 << 14,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.1),
    )
    model = ModelConfig(
        kind="ctr_mlp", num_dense_features=4, num_sparse_features=4,
        embedding_dim=dim, bottom_mlp=(16, dim), top_mlp=(32, 1),
        combiner=combiner,
    )
    data = SyntheticConfig(
        num_dense=4, num_sparse=4, batch_size=batch, vocab_per_feature=500,
        zipf_a=1.3, bag_len=bag_len,
    )
    return run, table, model, data


def test_multihot_trainer_learns():
    """Mean-combiner model on a bag-mean planted signal must lift AUC."""
    run, table, model, data = _cfgs()
    tr = train(run, table, model, SyntheticStream(data), logger=JsonlLogger(echo=False))
    auc = tr.auc.compute()
    assert auc > 0.6, f"multi-hot AUC did not lift above chance: {auc}"


def test_multihot_wide_dim_smoke():
    """Bags through the dim>128 (rows_per_slot>1) branch."""
    run, table, model, data = _cfgs(batch=64, dim=256, steps=5)
    table = TableConfig(dim=256, capacity=1 << 12)
    model = ModelConfig(
        kind="ctr_mlp", num_dense_features=4, num_sparse_features=4,
        embedding_dim=256, bottom_mlp=(32, 256), top_mlp=(16, 1),
        combiner="sqrtn",
    )
    tr = train(run, table, model, SyntheticStream(data), logger=JsonlLogger(echo=False))
    assert np.isfinite(tr.auc.compute())


def test_bag_of_one_sum_equals_onehot():
    """[B, S, 1] bags with sum combiner must be bit-identical to the one-hot
    [B, S] path — same ids, same gathers, pooling is an exact no-op sum."""
    run, table, model, data = _cfgs(batch=64, combiner="sum", bag_len=1, steps=8)
    losses = {}
    for shape3d in (False, True):
        tr = Trainer(run, table, model)
        ls = []
        for batch in SyntheticStream(data).batches(run.steps):
            if shape3d:
                batch = dict(batch, ids=batch["ids"][:, :, None])
            ls.append(tr.train_step(batch)["loss"])
        losses[shape3d] = ls
    assert losses[False] == losses[True]


def test_padding_ids_are_inert():
    """Extending every bag with sentinel padding must not change anything:
    losses bit-identical and table insert/hit counters identical."""
    run, table, model, data = _cfgs(batch=64, combiner="mean", bag_len=2, steps=8)
    results = {}
    for extra_pad in (0, 3):
        tr = Trainer(run, table, model)
        ls = []
        for batch in SyntheticStream(data).batches(run.steps):
            ids = batch["ids"]
            if extra_pad:
                pad = np.full(ids.shape[:2] + (extra_pad,), EMPTY_ID, np.int64)
                ids = np.concatenate([ids, pad], axis=2)
            ls.append(tr.train_step(dict(batch, ids=ids))["loss"])
        results[extra_pad] = (ls, np.asarray(tr.shard.counters).tolist())
    assert results[0] == results[3]


def test_multihot_eval_matches_combiner():
    """Eval path pools too; logits finite and shaped [B]."""
    run, table, model, data = _cfgs(batch=64, steps=5)
    tr = train(run, table, model, SyntheticStream(data), logger=JsonlLogger(echo=False))
    batch = next(SyntheticStream(data).batches(1))
    out = tr.eval_step(batch)
    logits = np.asarray(out["logits"])
    assert logits.shape == (64,) and np.all(np.isfinite(logits))


def test_sharded_multihot_learns():
    """ShardedTrainer over the 8-device mesh with multi-hot bags: the ucap
    auto-rescale must kick in (L=3 bags) and AUC must lift."""
    import jax

    from meepoembedding_tpu.parallel.mesh import make_mesh
    from meepoembedding_tpu.parallel.trainer import ShardedTrainer

    assert jax.device_count() >= 8
    run, table, model, data = _cfgs(batch=512, steps=60)
    table = TableConfig(
        dim=8, capacity=1 << 15,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.1),
    )
    tr = ShardedTrainer(run, table, model, mesh=make_mesh(8))
    for batch in SyntheticStream(data).batches(run.steps):
        tr.train_step(batch)
    assert tr.unique_cap == 512 // 8 * 4 * 3  # grew for L=3 bags
    assert tr.counters()["route_drops"] == 0
    auc = tr.auc.compute()
    assert auc > 0.6, f"sharded multi-hot AUC did not lift: {auc}"
