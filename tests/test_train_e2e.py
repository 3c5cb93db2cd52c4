"""Integration: config-1 in miniature (SURVEY.md §4.6) — train the CTR model
on a synthetic stream with a planted signal and assert learning happens."""

import numpy as np

from meepoembedding_tpu.config import ModelConfig, OptimizerConfig, RunConfig, TableConfig
from meepoembedding_tpu.data.synthetic import SyntheticConfig, SyntheticStream
from meepoembedding_tpu.metrics import JsonlLogger
from meepoembedding_tpu.train import Trainer, train


def _cfgs(batch=256, dim=8, opt="rowwise_adagrad"):
    run = RunConfig(batch_size=batch, steps=60, log_every=100, dense_learning_rate=3e-3)
    table = TableConfig(
        dim=dim, capacity=1 << 14, optimizer=OptimizerConfig(kind=opt, learning_rate=0.1)
    )
    model = ModelConfig(
        kind="ctr_mlp",
        num_dense_features=4,
        num_sparse_features=4,
        embedding_dim=dim,
        bottom_mlp=(16, dim),
        top_mlp=(32, 1),
    )
    data = SyntheticConfig(
        num_dense=4, num_sparse=4, batch_size=batch, vocab_per_feature=500, zipf_a=1.3
    )
    return run, table, model, data


def test_ctr_mlp_learns_synthetic_signal():
    run, table, model, data = _cfgs()
    tr = train(run, table, model, SyntheticStream(data), logger=JsonlLogger(echo=False))
    auc = tr.auc.compute()
    assert auc > 0.6, f"AUC did not lift above chance: {auc}"
    c = np.asarray(tr.shard.counters)
    assert c[0] > 0 and c[2] > 0  # hits and inserts happened


def test_dlrm_smoke():
    run, table, model, data = _cfgs(batch=64)
    model = ModelConfig(
        kind="dlrm",
        num_dense_features=4,
        num_sparse_features=4,
        embedding_dim=8,
        bottom_mlp=(16, 8),
        top_mlp=(32, 1),
    )
    run = RunConfig(batch_size=64, steps=5, log_every=100)
    tr = train(run, table, model, SyntheticStream(data), logger=JsonlLogger(echo=False))
    assert np.isfinite(tr.auc.compute())


def test_fused_path_adam_and_adagrad_small_dim():
    """ADVICE r1: the fused lookup_train fallback for adam/adagrad passed
    window-space [U,128] rows where [U,dim] was expected, crashing every
    dim<128 train step with those optimizers. Must train cleanly now."""
    for opt in ("adam", "adagrad"):
        run, table, model, data = _cfgs(batch=64, opt=opt)
        run = RunConfig(batch_size=64, steps=5, log_every=100)
        tr = train(
            run, table, model, SyntheticStream(data), logger=JsonlLogger(echo=False)
        )
        assert np.isfinite(tr.auc.compute())
        c = np.asarray(tr.shard.counters)
        assert c[2] > 0  # inserts happened


def test_wide_dim_trainer_e2e():
    """dim > 128 (rows_per_slot > 1) through the full train step
    (VERDICT r1 weak-#5)."""
    run = RunConfig(batch_size=64, steps=5, log_every=100)
    table = TableConfig(dim=256, capacity=1 << 12)
    model = ModelConfig(
        kind="ctr_mlp", num_dense_features=4, num_sparse_features=3,
        embedding_dim=256, bottom_mlp=(32, 16), top_mlp=(16, 1),
    )
    data = SyntheticConfig(
        num_dense=4, num_sparse=3, batch_size=64, vocab_per_feature=500
    )
    tr = train(run, table, model, SyntheticStream(data), logger=JsonlLogger(echo=False))
    assert np.isfinite(tr.auc.compute())
    c = np.asarray(tr.shard.counters)
    assert c[2] > 0


def test_bf16_trainer_e2e():
    """bf16 value planes through the full train step (VERDICT r1 weak-#4)."""
    run, table, model, data = _cfgs(batch=64)
    import dataclasses

    table = dataclasses.replace(table, value_dtype="bfloat16")
    run = RunConfig(batch_size=64, steps=5, log_every=100)
    tr = train(run, table, model, SyntheticStream(data), logger=JsonlLogger(echo=False))
    assert np.isfinite(tr.auc.compute())


def test_eval_does_not_mutate():
    run, table, model, data = _cfgs(batch=64)
    run = RunConfig(batch_size=64, steps=3, log_every=100)
    tr = train(run, table, model, SyntheticStream(data), logger=JsonlLogger(echo=False))
    n_before = int(np.asarray(tr.shard.cnt).sum())
    batch = next(SyntheticStream(data).batches(1))
    tr.eval_step(batch)
    assert int(np.asarray(tr.shard.cnt).sum()) == n_before


def test_ftrl_trains_and_l1_sparsifies():
    """FTRL-Proximal through the fused train step: learns, and with l1 > 0
    a meaningful fraction of trained weight coordinates are EXACTLY zero
    (the closed-form prox snaps |z| <= l1 coordinates to 0)."""
    from meepoembedding_tpu.table import xla_ops

    run, table, model, data = _cfgs(batch=256)
    table = TableConfig(
        dim=8, capacity=1 << 14,
        optimizer=OptimizerConfig(kind="ftrl", learning_rate=0.1, l1=0.02, l2=0.1),
    )
    tr = train(run, table, model, SyntheticStream(data), logger=JsonlLogger(echo=False))
    auc = tr.auc.compute()
    assert auc > 0.55, f"ftrl failed to learn: {auc}"
    spec, shard = tr.spec, tr.shard
    live = np.asarray(xla_ops.live_mask(shard))
    slots = np.nonzero(live.reshape(-1))[0][:512].astype(np.int32)
    import jax.numpy as jnp

    rows = np.asarray(xla_ops.lookup_rows(spec, shard, jnp.asarray(slots)))
    frac_zero = float((rows == 0.0).mean())
    assert frac_zero > 0.05, f"l1 produced no exact zeros: {frac_zero}"


def test_eval_every_logs_holdout_metrics():
    """run_cfg.eval_every > 0 + an eval stream emits eval_loss/eval_auc via
    the logger at the configured cadence (probe-only holdout scoring)."""
    run, table, model, data = _cfgs(batch=64)
    run = RunConfig(batch_size=64, steps=9, log_every=100, eval_every=3)
    records = []

    class Capture:
        def log(self, **kw):
            records.append(kw)

    ev = SyntheticStream(SyntheticConfig(
        num_dense=4, num_sparse=4, batch_size=64, vocab_per_feature=500, seed=99,
    ))
    train(run, table, model, SyntheticStream(data), logger=Capture(),
          eval_stream=ev)
    evals = [r for r in records if "eval_auc" in r]
    assert len(evals) == 3
    assert all(np.isfinite(r["eval_loss"]) for r in evals)
