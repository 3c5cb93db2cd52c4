"""Training loop with sparse/dense split (SURVEY.md C18, §3.2-3.3).

One jitted step fuses the whole pipeline: dedup -> find_or_insert ->
gather -> dense fwd/bwd -> sparse scatter-update -> dense optimizer. The
shard pytree is donated, so table updates happen in place in HBM. The
gradient w.r.t. the *unique* gathered rows is produced directly by autodiff
through the inverse-index gather (XLA emits the segment-sum), which is the
dedup'd backward of SURVEY.md §3.3.

Distributed variant (row-sharded table + DP dense) lives in
`meepoembedding_tpu.parallel.trainer` and shares this module's loss plumbing.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from meepoembedding_tpu.config import ModelConfig, RunConfig, TableConfig
from meepoembedding_tpu.metrics import JsonlLogger, Meter, StreamingAUC
from meepoembedding_tpu.models import build_model
from meepoembedding_tpu.models.common import batch_item_key, model_inputs, model_loss
from meepoembedding_tpu.ops import dedup, optim
from meepoembedding_tpu.table import hashing, xla_ops
from meepoembedding_tpu.table.layout import TableSpec, alloc_shard


class Trainer:
    """Single-device trainer (BASELINE configs 1-2)."""

    def __init__(
        self,
        run_cfg: RunConfig,
        table_cfg: TableConfig,
        model_cfg: ModelConfig,
        spill=None,
    ):
        assert model_cfg.embedding_dim == table_cfg.dim
        self.run_cfg = run_cfg
        self.table_cfg = table_cfg
        self.model_cfg = model_cfg
        self.spec = TableSpec.from_config(table_cfg, num_shards=1)
        self.model = build_model(model_cfg)
        self.shard = alloc_shard(self.spec)
        key = jax.random.PRNGKey(run_cfg.seed)
        self.params = self.model.init(key)
        self.opt_state = optim.dense_adam_init(self.params)
        self.step = 0
        self.spill = spill
        self.auc = StreamingAUC()
        self._freq_est = None
        if model_cfg.logq_correction:
            from meepoembedding_tpu.ops.itemfreq import ItemFrequencyEstimator

            assert hasattr(self.model, "loss_and_logits"), (
                "model.logq_correction needs a retrieval model (two_tower)"
            )
            self._freq_est = ItemFrequencyEstimator()
        self._step_fn = self._build_step()
        self._eval_fn = self._build_eval()

    def _unique_cap(self, batch_ids_shape) -> int:
        return self.run_cfg.unique_cap or int(np.prod(batch_ids_shape))

    def _build_step(self):
        spec, model = self.spec, self.model
        rc = self.run_cfg
        combiner = self.model_cfg.combiner

        @partial(jax.jit, donate_argnums=(0,))
        def step_fn(shard, params, opt_state, dense, hi, lo, label, step, logq):
            cap = self._unique_cap(hi.shape)
            uniq = dedup.unique_pairs(hi.reshape(-1), lo.reshape(-1), cap)
            # multi-hot bags ([B, S, L] ids, sentinel-padded) pool per feature
            # after the gather; one-hot [B, S] batches pass through unchanged
            bag_valid = hashing.is_valid(hi, lo) if hi.ndim == 3 else None
            ikey = batch_item_key(model, hi, lo)
            if spec.dim <= 128:
                shard, ctx = xla_ops.lookup_train(
                    spec, shard, uniq.hi, uniq.lo, uniq.valid, step
                )
                # differentiate w.r.t. the [U, 128] window-space rows: the
                # backward pass then emits window-space grads directly and
                # every gather/scatter stays at 128 lanes (xla_ops note);
                # rows_for_batch keeps the window matmuls at U, not n

                def loss_fn(params, g128):
                    flat = xla_ops.rows_for_batch(spec, g128, ctx.sub, uniq.inverse)
                    emb = model_inputs(model, flat, hi, bag_valid, spec.dim, combiner)
                    return model_loss(model, params, dense, emb, bag_valid, label,
                                      ikey, logq=logq)

                (loss, logits), (g_dense, g_win) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(params, ctx.g128)
                shard = optim.apply_sparse_grads_ctx(spec, shard, ctx, g_win)
            else:
                shard, slot, _found = xla_ops.find_or_insert(
                    spec, shard, uniq.hi, uniq.lo, uniq.valid, step
                )
                rows_u = xla_ops.lookup_rows(spec, shard, slot)

                def loss_fn(params, rows_u):
                    emb = model_inputs(
                        model, rows_u[uniq.inverse], hi, bag_valid, spec.dim, combiner
                    )
                    return model_loss(model, params, dense, emb, bag_valid, label,
                                      ikey, logq=logq)

                (loss, logits), (g_dense, g_rows) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(params, rows_u)
                shard = optim.apply_sparse_grads(spec, shard, slot, g_rows)
            if rc.grad_clip_norm is not None:
                g_dense = optim.clip_by_global_norm(g_dense, rc.grad_clip_norm)
            lr = optim.schedule_lr(rc.lr_schedule, rc.dense_learning_rate,
                                   step, rc.steps, rc.warmup_steps)
            params, opt_state = optim.dense_adam_update(params, g_dense, opt_state, lr)
            return shard, params, opt_state, loss, logits

        return step_fn

    def _build_eval(self):
        spec, model = self.spec, self.model
        combiner = self.model_cfg.combiner

        @jax.jit
        def eval_fn(shard, params, dense, hi, lo, label):
            cap = self._unique_cap(hi.shape)
            uniq = dedup.unique_pairs(hi.reshape(-1), lo.reshape(-1), cap)
            bag_valid = hashing.is_valid(hi, lo) if hi.ndim == 3 else None
            pr = xla_ops.probe(spec, shard, uniq.hi, uniq.lo, uniq.valid)
            rows = xla_ops.lookup_rows(spec, shard, jnp.where(pr.found, pr.slot, -1))
            emb = model_inputs(
                model, rows[uniq.inverse], hi, bag_valid, spec.dim, combiner
            )
            return model_loss(model, params, dense, emb, bag_valid, label,
                              batch_item_key(model, hi, lo))

        return eval_fn

    # --- public API ----------------------------------------------------------
    def train_step(self, batch: dict) -> dict:
        hi, lo = hashing.split_ids(batch["ids"])
        logq = None
        if self._freq_est is not None:
            from meepoembedding_tpu.ops.itemfreq import item_keys_np

            logq = jnp.asarray(self._freq_est.update_and_logq(
                item_keys_np(np.asarray(batch["ids"]), self.model.qf)
            ))
        self.shard, self.params, self.opt_state, loss, logits = self._step_fn(
            self.shard,
            self.params,
            self.opt_state,
            jnp.asarray(batch["dense"]),
            jnp.asarray(hi),
            jnp.asarray(lo),
            jnp.asarray(batch["label"]),
            jnp.int32(self.step),
            logq,
        )
        self.step += 1
        self.auc.update(logits, jnp.asarray(batch["label"]))
        return {"loss": float(loss)}

    def eval_step(self, batch: dict) -> dict:
        hi, lo = hashing.split_ids(batch["ids"])
        loss, logits = self._eval_fn(
            self.shard,
            self.params,
            jnp.asarray(batch["dense"]),
            jnp.asarray(hi),
            jnp.asarray(lo),
            jnp.asarray(batch["label"]),
        )
        return {"loss": float(loss), "logits": logits}

    # --- checkpoint/restore (SURVEY.md C19) ----------------------------------
    def save_checkpoint(self, path: str, extras=None, async_: bool = False) -> dict:
        """async_=True pays only the device->host snapshot here; file writes
        commit on a background thread (checkpoint.AsyncCheckpointer). Any
        in-flight async save is always joined first, so async and sync saves
        to the same directory serialize safely."""
        from meepoembedding_tpu import checkpoint

        dense = {"params": self.params, "opt_state": self.opt_state}
        if async_:
            if getattr(self, "_async_ckpt", None) is None:
                self._async_ckpt = checkpoint.AsyncCheckpointer()
            self._async_ckpt.save(
                path, self.spec, [self.shard], self.step,
                extras=extras, dense=dense,
            )
            return {"async": True, "step": self.step}
        self.finish_saves()
        return checkpoint.save(
            path, self.spec, [self.shard], self.step, extras=extras,
            dense=dense,
        )

    def finish_saves(self) -> None:
        """Join any in-flight async checkpoint; re-raises its failure."""
        ac = getattr(self, "_async_ckpt", None)
        if ac is not None:
            ac.wait()

    def load_checkpoint(self, path: str) -> dict:
        from meepoembedding_tpu import checkpoint

        shards, manifest = checkpoint.restore_shards(self.spec, path, 1)
        self.shard = shards[0]
        if "params" in manifest.get("dense", []):
            self.params = checkpoint.load_dense(path, "params", self.params)
            self.opt_state = checkpoint.load_dense(path, "opt_state", self.opt_state)
        self.step = manifest["step"]
        return manifest

    def maintenance(self) -> dict:
        """Eviction/spill tick (SURVEY.md §3.4), off the step critical path.
        Spilled payloads carry the full row state (value+freq+optimizer)."""
        if self.spec.policy.evict_policy == "none":
            return {"evicted": 0}
        off = getattr(self, "_evict_cursor", 0)
        self._evict_cursor = xla_ops.next_evict_cursor(self.spec, off)
        self.shard, export = jax.jit(
            xla_ops.evict_pass, static_argnums=(0,), donate_argnums=(1,)
        )(self.spec, self.shard, jnp.int32(self.step), jnp.int32(off))
        n = int(export.count)
        if n and self.spill is not None:
            from meepoembedding_tpu.tiering import SpillCodec, spill_export

            spill_export(SpillCodec(self.spec), self.spill, export)
            self.spilled_rows = getattr(self, "spilled_rows", 0) + n
        return {"evicted": n}


def train(
    run_cfg: RunConfig,
    table_cfg: TableConfig,
    model_cfg: ModelConfig,
    stream,
    logger: Optional[JsonlLogger] = None,
    maintenance_every: int = 50,
    spill=None,
    eval_stream=None,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 0,
) -> Trainer:
    """Run `run_cfg.steps` training steps from a batch iterator. With
    run_cfg.eval_every > 0 and an `eval_stream`, a held-out batch is scored
    (probe-only, no inserts) every eval_every steps and logged as
    eval_loss/eval_auc."""
    logger = logger or JsonlLogger(echo=True)
    tr = Trainer(run_cfg, table_cfg, model_cfg, spill=spill)
    loss_m = Meter()
    t0 = time.perf_counter()
    examples = 0
    eval_iter = None
    if run_cfg.eval_every and eval_stream is not None:
        # at most one eval batch per train step can ever be consumed
        eval_iter = eval_stream.batches(run_cfg.steps) if hasattr(
            eval_stream, "batches"
        ) else iter(eval_stream)
    for i, batch in enumerate(stream.batches(run_cfg.steps)):
        out = tr.train_step(batch)
        loss_m.update(out["loss"])
        examples += len(batch["label"])
        if maintenance_every and (i + 1) % maintenance_every == 0:
            tr.maintenance()
        if ckpt_dir and ckpt_every and (i + 1) % ckpt_every == 0:
            # periodic saves ride the background thread; the step loop pays
            # only the device->host snapshot
            tr.save_checkpoint(ckpt_dir, async_=True)
        if eval_iter is not None and (i + 1) % run_cfg.eval_every == 0:
            try:
                eb = next(eval_iter)
            except StopIteration:
                eval_iter = None
            else:
                ev = tr.eval_step(eb)
                ea = StreamingAUC()
                ea.update(np.asarray(ev["logits"]), np.asarray(eb["label"]))
                logger.log(step=tr.step, eval_loss=ev["loss"],
                           eval_auc=ea.compute())
        if (i + 1) % run_cfg.log_every == 0:
            jax.block_until_ready(tr.shard.counters)
            dt = time.perf_counter() - t0
            logger.log(
                step=tr.step,
                loss=loss_m.mean,
                auc=tr.auc.compute(),
                examples_per_sec=examples / dt,
                **{f"ctr_{k}": v for k, v in _counters(tr).items()},
            )
    tr.finish_saves()
    return tr


def _counters(tr: Trainer) -> dict:
    c = np.asarray(tr.shard.counters)
    names = ["hits", "misses", "inserts", "drops", "evictions", "spills", "promotes", "denied"]
    out = {n: int(c[i]) for i, n in enumerate(names)}
    # spill runs host-side; surface the host count (device counter unused)
    out["spills"] = max(out["spills"], getattr(tr, "spilled_rows", 0))
    return out
