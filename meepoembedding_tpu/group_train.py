"""Fused training over a group of HETEROGENEOUS tables (SURVEY.md C11/C16;
README.md:2 "lookuptable-style ... Embedding").

The reference class of systems lets one model own several logical embedding
tables with different dims/optimizers/policies — user ids at dim 64 with
rowwise-AdaGrad, item ids at dim 32 with FTRL, and so on. `table/group.py`'s
TableGroup gives that to library users eagerly (one host call per table);
`GroupTrainer` gives it to TRAINING with the same single-jitted-step fusion
as `train.Trainer`: every table's dedup -> lookup_train -> window-space
backward -> in-place scatter-update runs inside ONE compiled program, so
multi-table steps pay one dispatch, not one per table.

Shape contract (matches the single-table trainers): batch["ids"] is
[B, S] or [B, S, L] int64, where sparse feature column s reads from table
`feature_map[s]`. Several columns may name the SAME table — the classic
shared-embedding pattern (e.g. "candidate item" and "behavior item ids"
sharing the item table); their ids dedup TOGETHER, so a shared id is
gathered and updated exactly once per step.

The model is the wide concat MLP (CTR-MLP shape): logits = MLP(dense ++
pooled per-feature embeddings), the one model family whose input
concatenation is dim-heterogeneous by construction. Tables must have
dim <= 128 (the window-space hot path); eviction/growth maintenance is the
single-table trainers' domain.

Checkpoint layout mirrors TableGroup: <path>/group.json + one elastic
checkpoint subdir per table, plus the dense tower — every member remains
individually restorable/reshardable with the normal machinery.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from meepoembedding_tpu.config import ModelConfig, RunConfig, TableConfig
from meepoembedding_tpu.metrics import StreamingAUC
from meepoembedding_tpu.models.common import bce_with_logits, mlp_apply, mlp_init
from meepoembedding_tpu.ops import dedup, optim, pooling
from meepoembedding_tpu.table import hashing, xla_ops
from meepoembedding_tpu.table.layout import TableSpec, alloc_shard


class GroupTrainer:
    def __init__(
        self,
        run_cfg: RunConfig,
        table_cfgs: Dict[str, TableConfig],
        feature_map: Sequence[str],
        model_cfg: ModelConfig,
    ):
        assert table_cfgs and feature_map, "need tables and a feature map"
        unknown = set(feature_map) - set(table_cfgs)
        assert not unknown, f"feature_map names unknown tables: {sorted(unknown)}"
        unused = set(table_cfgs) - set(feature_map)
        assert not unused, f"tables never referenced by feature_map: {sorted(unused)}"
        for name, cfg in table_cfgs.items():
            assert cfg.dim <= 128, (
                f"table {name!r}: GroupTrainer uses the 128-lane window hot "
                f"path; dim {cfg.dim} > 128 is single-table-trainer territory"
            )
        self.run_cfg = run_cfg
        self.model_cfg = model_cfg
        self.names = sorted(table_cfgs)  # stable order for pytree positions
        self.feature_map = list(feature_map)
        self.specs = {
            n: TableSpec.from_config(table_cfgs[n], num_shards=1) for n in self.names
        }
        self.shards = {n: alloc_shard(self.specs[n]) for n in self.names}
        # features each table serves, in batch-column order
        self.table_features = {
            n: [s for s, fn in enumerate(self.feature_map) if fn == n]
            for n in self.names
        }
        in_dim = model_cfg.num_dense_features + sum(
            self.specs[fn].dim for fn in self.feature_map
        )
        key = jax.random.PRNGKey(run_cfg.seed)
        self.params = {
            "mlp": mlp_init(key, model_cfg.top_mlp, in_dim, jnp.dtype(model_cfg.dtype))
        }
        self.opt_state = optim.dense_adam_init(self.params)
        self.step = 0
        self.auc = StreamingAUC()
        self._step_fn = self._build_step()
        self._eval_fn = self._build_eval()

    # --- step construction ---------------------------------------------------
    def _caps(self, ids_shape) -> Dict[str, int]:
        """Static dedup capacity per table: its columns' id count."""
        per_col = int(np.prod(ids_shape)) // ids_shape[1]
        return {
            n: max(per_col * len(cols), 1)
            for n, cols in self.table_features.items()
        }

    def _pooled_feats(self, name, flat, hi_cols, bag_valid_cols):
        """[n, dim] gathered rows for a table's columns -> [B, k, dim]."""
        spec = self.specs[name]
        return pooling.pool_or_reshape(
            flat, hi_cols, bag_valid_cols, spec.dim, self.model_cfg.combiner
        )

    def _build_step(self):
        names, specs = self.names, self.specs
        rc, mc = self.run_cfg, self.model_cfg

        @partial(jax.jit, donate_argnums=(0,))
        def step_fn(shards, params, opt_state, dense, hi, lo, label, step):
            caps = self._caps(hi.shape)
            uniqs, ctxs = {}, {}
            for n in names:
                cols = jnp.asarray(self.table_features[n])
                h = jnp.take(hi, cols, axis=1)
                l = jnp.take(lo, cols, axis=1)
                uniq = dedup.unique_pairs(h.reshape(-1), l.reshape(-1), caps[n])
                shard, ctx = xla_ops.lookup_train(
                    specs[n], shards[n], uniq.hi, uniq.lo, uniq.valid, step
                )
                shards[n] = shard
                uniqs[n], ctxs[n] = uniq, ctx

            def loss_fn(params, g128s):
                feats = []  # per-feature [B, dim_s], batch-column order
                per_table = {}
                for n in names:
                    cols = self.table_features[n]
                    h = jnp.take(hi, jnp.asarray(cols), axis=1)
                    bag_valid = hashing.is_valid(
                        h, jnp.take(lo, jnp.asarray(cols), axis=1)
                    ) if hi.ndim == 3 else None
                    flat = xla_ops.rows_for_batch(
                        specs[n], g128s[n], ctxs[n].sub, uniqs[n].inverse
                    )
                    per_table[n] = self._pooled_feats(n, flat, h, bag_valid)
                for s, fn in enumerate(self.feature_map):
                    k = self.table_features[fn].index(s)
                    feats.append(per_table[fn][:, k])
                z = jnp.concatenate(
                    [dense.astype(mc.dtype)] + [f.astype(mc.dtype) for f in feats],
                    axis=1,
                )
                logits = mlp_apply(params["mlp"], z).reshape(-1).astype(jnp.float32)
                return bce_with_logits(logits, label), logits

            g128s = {n: ctxs[n].g128 for n in names}
            (loss, logits), (g_dense, g_wins) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, g128s)
            for n in names:
                shards[n] = optim.apply_sparse_grads_ctx(
                    specs[n], shards[n], ctxs[n], g_wins[n]
                )
            if rc.grad_clip_norm is not None:
                g_dense = optim.clip_by_global_norm(g_dense, rc.grad_clip_norm)
            lr = optim.schedule_lr(rc.lr_schedule, rc.dense_learning_rate,
                                   step, rc.steps, rc.warmup_steps)
            params, opt_state = optim.dense_adam_update(params, g_dense, opt_state, lr)
            return shards, params, opt_state, loss, logits

        return step_fn

    def _build_eval(self):
        names, specs, mc = self.names, self.specs, self.model_cfg

        @jax.jit
        def eval_fn(shards, params, dense, hi, lo, label):
            caps = self._caps(hi.shape)
            feats = []
            per_table = {}
            for n in names:
                cols = jnp.asarray(self.table_features[n])
                h = jnp.take(hi, cols, axis=1)
                l = jnp.take(lo, cols, axis=1)
                uniq = dedup.unique_pairs(h.reshape(-1), l.reshape(-1), caps[n])
                bag_valid = hashing.is_valid(h, l) if hi.ndim == 3 else None
                pr = xla_ops.probe(specs[n], shards[n], uniq.hi, uniq.lo, uniq.valid)
                rows = xla_ops.lookup_rows(
                    specs[n], shards[n], jnp.where(pr.found, pr.slot, -1)
                )
                per_table[n] = self._pooled_feats(n, rows[uniq.inverse], h, bag_valid)
            for s, fn in enumerate(self.feature_map):
                k = self.table_features[fn].index(s)
                feats.append(per_table[fn][:, k])
            z = jnp.concatenate(
                [dense.astype(mc.dtype)] + [f.astype(mc.dtype) for f in feats],
                axis=1,
            )
            logits = mlp_apply(params["mlp"], z).reshape(-1).astype(jnp.float32)
            return bce_with_logits(logits, label), logits

        return eval_fn

    # --- public API ------------------------------------------------------------
    def train_step(self, batch: dict) -> dict:
        hi, lo = hashing.split_ids(batch["ids"])
        self.shards, self.params, self.opt_state, loss, logits = self._step_fn(
            self.shards, self.params, self.opt_state,
            jnp.asarray(batch["dense"]), jnp.asarray(hi), jnp.asarray(lo),
            jnp.asarray(batch["label"]), jnp.int32(self.step),
        )
        self.step += 1
        self.auc.update(logits, jnp.asarray(batch["label"]))
        return {"loss": float(loss)}

    def eval_step(self, batch: dict) -> dict:
        hi, lo = hashing.split_ids(batch["ids"])
        loss, logits = self._eval_fn(
            self.shards, self.params,
            jnp.asarray(batch["dense"]), jnp.asarray(hi), jnp.asarray(lo),
            jnp.asarray(batch["label"]),
        )
        return {"loss": float(loss), "logits": logits}

    def counters(self) -> Dict[str, dict]:
        from meepoembedding_tpu.table import layout

        out = {}
        for n in self.names:
            c = np.asarray(self.shards[n].counters)
            out[n] = {
                "hits": int(c[layout.HITS]), "misses": int(c[layout.MISSES]),
                "inserts": int(c[layout.INSERTS]), "rows": int(jnp.sum(self.shards[n].cnt)),
            }
        return out

    # --- checkpoint (TableGroup-compatible layout + dense tower) ---------------
    def save_checkpoint(self, path: str) -> dict:
        from meepoembedding_tpu import checkpoint

        os.makedirs(path, exist_ok=True)
        manifest = {"tables": {}, "feature_map": self.feature_map,
                    "step": self.step}
        for i, n in enumerate(self.names):
            sub = os.path.join(path, f"table-{n}")
            dense = (
                {"params": self.params, "opt_state": self.opt_state}
                if i == 0 else None  # dense tower rides the first member
            )
            checkpoint.save(sub, self.specs[n], [self.shards[n]], self.step,
                            dense=dense)
            manifest["tables"][n] = f"table-{n}"
        tmp = os.path.join(path, ".group.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(path, "group.json"))
        return manifest

    def load_checkpoint(self, path: str) -> dict:
        from meepoembedding_tpu import checkpoint

        with open(os.path.join(path, "group.json")) as f:
            manifest = json.load(f)
        assert set(manifest["tables"]) == set(self.names), (
            f"group mismatch: checkpoint has {sorted(manifest['tables'])}, "
            f"trainer has {self.names}"
        )
        for i, n in enumerate(self.names):
            sub = os.path.join(path, manifest["tables"][n])
            shards, m = checkpoint.restore_shards(self.specs[n], sub, 1)
            self.shards[n] = shards[0]
            if i == 0 and "params" in m.get("dense", []):
                self.params = checkpoint.load_dense(sub, "params", self.params)
                self.opt_state = checkpoint.load_dense(
                    sub, "opt_state", self.opt_state
                )
        self.step = manifest["step"]
        return manifest
