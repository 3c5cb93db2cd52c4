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

Two model heads (model.kind, group_head_init/apply):
  ctr_mlp  wide concat MLP — logits = MLP(dense ++ pooled per-feature
           embeddings); the family whose input concatenation is
           dim-heterogeneous by construction. The default.
  dlrm     bottom MLP + pairwise dot interaction + top MLP, when every
           referenced table shares model.embedding_dim (dot products need
           equal dims); the math mirrors models/dlrm.py exactly, so a group
           DLRM on an equal-dim group computes the same function as the
           single-table DLRM (parity-tested).
Multi-hot [B, S, L] behavior bags pool per feature with model.combiner
before either head. Other kinds fail loudly (DIN/BST sequences and
two-tower retrieval remain single-table). Tables must have dim <= 128 (the
window-space hot path).

Maintenance is per member table: each table keeps its own rotating eviction
cursor, optional spill backend, and online-growth gate (grow_at_load), so a
small hot table can run LFU/TTL eviction while a large growable one doubles
by rehash — independently, under one trainer. Promotion (cold->hot
re-insert from the spill tier) runs per member too: the fused group step
exports each spill-backed table's miss set, an async PromotionEngine per
table queries its cold tier off the critical path, and maintenance() drains
the staged rows back into the owner shards.

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


def group_head_init(model_cfg: ModelConfig, specs: Dict[str, TableSpec],
                    feature_map: Sequence[str], key) -> dict:
    """Dense-tower params for the group trainers' model head.

    kind="ctr_mlp" (default): the wide concat MLP — the one family whose
    input concatenation is dim-heterogeneous by construction.
    kind="dlrm": bottom MLP + pairwise dot interaction + top MLP — REQUIRES
    every referenced table to share model.embedding_dim (dot products need
    equal dims) and bottom_mlp to end at it. Mirrors models/dlrm.py exactly,
    so a single-table DLRM and an equal-dim group DLRM compute the same
    function (tests assert this parity).
    Anything else fails loudly: behavior-sequence models (DIN/BST) and
    retrieval (two_tower) remain single-table-trainer territory."""
    kind = model_cfg.kind or "ctr_mlp"
    dt = jnp.dtype(model_cfg.dtype)
    assert kind in ("ctr_mlp", "dlrm"), (
        f"group trainers support model.kind ctr_mlp|dlrm, got {kind!r} — "
        "DIN/BST behavior sequences and two_tower retrieval train against "
        "a single table (train.Trainer / parallel.ShardedTrainer)"
    )
    if kind == "dlrm":
        # dot interaction needs every referenced table at ONE dim and the
        # bottom MLP ending there. kind="dlrm" is ModelConfig's default and
        # group configs historically ignored it (the head was always the
        # wide MLP), so a dim-heterogeneous group falls back to the wide
        # concat head with a warning instead of breaking existing configs.
        dims = {n: specs[n].dim for n in set(feature_map)}
        dot_ok = (
            len(set(dims.values())) == 1
            and next(iter(dims.values())) == model_cfg.embedding_dim
            and model_cfg.bottom_mlp
            and model_cfg.bottom_mlp[-1] == model_cfg.embedding_dim
        )
        if dot_ok:
            f = len(feature_map) + 1  # + bottom-MLP output as a feature
            top_in = model_cfg.embedding_dim + (f * (f - 1)) // 2
            k1, k2 = jax.random.split(key)
            return {
                "bottom": mlp_init(k1, model_cfg.bottom_mlp,
                                   model_cfg.num_dense_features, dt),
                "top": mlp_init(k2, model_cfg.top_mlp, top_in, dt),
            }
        import logging

        logging.getLogger(__name__).warning(
            "group model.kind=dlrm but the group is not dot-compatible "
            "(dims %s vs embedding_dim %d, bottom_mlp %s); using the wide "
            "concat MLP head", dims, model_cfg.embedding_dim,
            model_cfg.bottom_mlp,
        )
    in_dim = model_cfg.num_dense_features + sum(
        specs[fn].dim for fn in feature_map
    )
    return {"mlp": mlp_init(key, model_cfg.top_mlp, in_dim, dt)}


def group_head_apply(model_cfg: ModelConfig, params: dict, dense, feats) -> jax.Array:
    """feats: per-feature pooled embeddings [B, dim_s] in batch-column order
    -> logits [B]. Differentiable w.r.t. params and feats."""
    mc = model_cfg
    if "mlp" in params:  # wide concat
        z = jnp.concatenate(
            [dense.astype(mc.dtype)] + [f.astype(mc.dtype) for f in feats],
            axis=1,
        )
        return mlp_apply(params["mlp"], z).reshape(-1).astype(jnp.float32)
    # DLRM dot interaction (models/dlrm.py's math on the group's features)
    x = mlp_apply(params["bottom"], dense.astype(mc.dtype),
                  final_activation=True)  # [B, D]
    emb = jnp.stack(feats, axis=1)  # [B, S, D] — equal dims by group_head_init
    fs = jnp.concatenate([x[:, None, :], emb.astype(x.dtype)], axis=1)
    inter = jnp.einsum(
        "bfd,bgd->bfg", fs, fs, preferred_element_type=jnp.float32
    )
    f = len(feats) + 1
    iu, ju = np.triu_indices(f, k=1)
    flat = inter[:, jnp.asarray(iu), jnp.asarray(ju)]
    z = jnp.concatenate([x, flat.astype(x.dtype)], axis=1)
    return mlp_apply(params["top"], z).reshape(-1).astype(jnp.float32)


class GroupTrainer:
    def __init__(
        self,
        run_cfg: RunConfig,
        table_cfgs: Dict[str, TableConfig],
        feature_map: Sequence[str],
        model_cfg: ModelConfig,
        spill: Dict[str, object] = None,
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
        self.table_cfgs = dict(table_cfgs)  # growth rebuilds specs from these
        self.specs = {
            n: TableSpec.from_config(table_cfgs[n], num_shards=1) for n in self.names
        }
        self.shards = {n: alloc_shard(self.specs[n]) for n in self.names}
        self.spill = dict(spill or {})
        self._promoters: Dict[str, object] = {}
        if self.spill:
            from meepoembedding_tpu.tiering import PromotionEngine, SpillCodec

            unknown_spill = set(self.spill) - set(self.names)
            assert not unknown_spill, (
                f"spill backends for unknown tables: {sorted(unknown_spill)}"
            )
            for n, be in self.spill.items():
                codec = SpillCodec(self.specs[n])
                assert be.width == codec.width, (
                    f"table {n!r}: spill backend width {be.width} != codec "
                    f"{codec.width}"
                )
                self._promoters[n] = PromotionEngine(codec, be)
        self._evict_cursors: Dict[str, int] = {}
        self._live_upper = {n: 0 for n in self.names}
        self.spilled_rows = {n: 0 for n in self.names}
        # features each table serves, in batch-column order
        self.table_features = {
            n: [s for s, fn in enumerate(self.feature_map) if fn == n]
            for n in self.names
        }
        key = jax.random.PRNGKey(run_cfg.seed)
        self.params = group_head_init(
            model_cfg, self.specs, self.feature_map, key
        )
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
        prom_names = tuple(sorted(self._promoters))

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
            # per-table miss sets feed the async cold-tier promoters
            miss = {
                n: (uniqs[n].hi, uniqs[n].lo, uniqs[n].valid & ~ctxs[n].found)
                for n in prom_names
            }

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
                logits = group_head_apply(mc, params, dense, feats)
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
            return shards, params, opt_state, loss, logits, miss

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
            logits = group_head_apply(mc, params, dense, feats)
            return bce_with_logits(logits, label), logits

        return eval_fn

    # --- growth / maintenance (SURVEY.md C10/C11, per member table) -----------
    def _maybe_grow(self, ids: np.ndarray) -> None:
        """Per-table online growth: a table's live count can grow by at most
        its columns' id count per step, so a host-side upper bound gates the
        device fetch exactly like the single-table trainers (zero fetches on
        steps far from the growth point)."""
        L = ids.shape[2] if ids.ndim == 3 else 1
        b = ids.shape[0]
        for n in self.names:
            cfg = self.table_cfgs[n]
            if cfg.grow_at_load is None:
                continue
            incoming = b * L * len(self.table_features[n])
            self._live_upper[n] += incoming
            if self._live_upper[n] <= cfg.grow_at_load * self.specs[n].capacity:
                continue
            while True:
                live = int(jnp.sum(self.shards[n].cnt))
                cfg = self.table_cfgs[n]
                if (live + incoming) <= cfg.grow_at_load * self.specs[n].capacity:
                    self._live_upper[n] = live + incoming
                    break
                self._grow_table(n)

    def _grow_table(self, name: str) -> None:
        """Double one member's capacity by local rehash; every jitted fn
        binds the old spec geometry, so the step/eval fns rebuild."""
        import dataclasses

        from meepoembedding_tpu.table.runtime import regrow_shard

        old_spec = self.specs[name]
        self.table_cfgs[name] = dataclasses.replace(
            self.table_cfgs[name], capacity=self.table_cfgs[name].capacity * 2
        )
        self.specs[name] = TableSpec.from_config(
            self.table_cfgs[name], num_shards=1
        )
        self.shards[name] = regrow_shard(
            old_spec, self.specs[name], self.shards[name], self.step
        )
        self._step_fn = self._build_step()
        self._eval_fn = self._build_eval()

    def _apply_promotions(self) -> Dict[str, int]:
        """Drain each member's staged cold->hot promotions into its device
        table (SURVEY.md §3.4 reverse path), exactly as
        DynamicEmbeddingTable._apply_promotions does for one table."""
        from meepoembedding_tpu.table.runtime import _insert

        out = {}
        from meepoembedding_tpu.tiering import respill_failed

        for n, prm in self._promoters.items():
            res = prm.drain()
            if res is None:
                out[n] = 0
                continue
            keys, state = res
            hi, lo = hashing.split_ids(keys)
            self.shards[n], ok = _insert(
                self.specs[n], self.shards[n], jnp.asarray(hi), jnp.asarray(lo),
                jnp.asarray(state["values"]), jnp.ones((len(keys),), bool),
                jnp.int32(self.step), jnp.asarray(state["freq"]),
                jnp.asarray(state["accum"]) if "accum" in state else None,
                tuple(jnp.asarray(f) for f in state["fulldim"]),
            )
            # slot-race losers go back to the cold tier (VERDICT r4 weak #3)
            resp = respill_failed(prm, keys, state, np.asarray(ok))
            # promoted rows are live rows _maybe_grow's incoming accounting
            # never saw — bump the bound so the growth gate can't undercount
            self._live_upper[n] += len(keys) - resp
            out[n] = len(keys) - resp
        return out

    def maintenance(self) -> dict:
        """Eviction/spill/promotion tick per member table (SURVEY.md §3.4):
        the same rotating-window evict_pass as train.Trainer.maintenance,
        with an independent cursor, optional spill backend, and async
        promotion drain per table."""
        promoted = self._apply_promotions()
        out = {}
        for n in self.names:
            spec = self.specs[n]
            if spec.policy.evict_policy == "none":
                out[n] = {"evicted": 0, "promoted": promoted.get(n, 0)}
                continue
            off = self._evict_cursors.get(n, 0)
            self._evict_cursors[n] = xla_ops.next_evict_cursor(spec, off)
            self.shards[n], export = jax.jit(
                xla_ops.evict_pass, static_argnums=(0,), donate_argnums=(1,)
            )(spec, self.shards[n], jnp.int32(self.step), jnp.int32(off))
            cnt = int(export.count)
            if cnt and n in self.spill:
                from meepoembedding_tpu.tiering import SpillCodec, spill_export

                spill_export(SpillCodec(spec), self.spill[n], export)
                self.spilled_rows[n] += cnt
            out[n] = {"evicted": cnt, "promoted": promoted.get(n, 0)}
        return out

    def remove(self, name: str, ids64: np.ndarray) -> int:
        """Explicit key removal from one member table (TF lookuptable
        `remove` semantics, per member — runtime.remove's group analog).
        Absent keys are a no-op; returns how many were actually removed."""
        from meepoembedding_tpu.table.runtime import _erase

        uniq = np.unique(np.asarray(ids64, np.int64))
        hi, lo = hashing.split_ids(uniq)
        valid = jnp.asarray(hashing.is_valid(hi, lo))
        self.shards[name], found = _erase(
            self.specs[name], self.shards[name], jnp.asarray(hi),
            jnp.asarray(lo), valid,
        )
        return int(jnp.sum(found))

    # --- public API ------------------------------------------------------------
    def train_step(self, batch: dict) -> dict:
        self._maybe_grow(np.asarray(batch["ids"]))
        hi, lo = hashing.split_ids(batch["ids"])
        self.shards, self.params, self.opt_state, loss, logits, miss = self._step_fn(
            self.shards, self.params, self.opt_state,
            jnp.asarray(batch["dense"]), jnp.asarray(hi), jnp.asarray(lo),
            jnp.asarray(batch["label"]), jnp.int32(self.step),
        )
        self.step += 1
        for n, prm in self._promoters.items():
            prm.feed(*miss[n])
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
                "inserts": int(c[layout.INSERTS]),
                "evictions": int(c[layout.EVICTIONS]),
                "denied": int(c[layout.DENIED]),
                "spills": self.spilled_rows[n],
                "promotes": (
                    self._promoters[n].promoted if n in self._promoters else 0
                ),
                "promote_respills": (
                    self._promoters[n].respilled if n in self._promoters else 0
                ),
                "rows": int(jnp.sum(self.shards[n].cnt)),
                "capacity": self.specs[n].capacity,
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
        import dataclasses

        rebuilt = False
        for i, n in enumerate(self.names):
            sub = os.path.join(path, manifest["tables"][n])
            # growable members pre-grow to fit the checkpoint's live set
            # (and seed the growth gate with the restored live count —
            # advisor r3 high: a near-threshold restore must not undercount)
            total = sum(checkpoint.read_manifest(sub).get("counts", [0]))
            cfg = self.table_cfgs[n]
            while (
                cfg.grow_at_load is not None
                and total > cfg.grow_at_load * self.specs[n].capacity
            ):
                cfg = dataclasses.replace(cfg, capacity=cfg.capacity * 2)
                self.table_cfgs[n] = cfg
                self.specs[n] = TableSpec.from_config(cfg, num_shards=1)
                self.shards[n] = alloc_shard(self.specs[n])
                rebuilt = True
            shards, m = checkpoint.restore_shards(self.specs[n], sub, 1)
            self.shards[n] = shards[0]
            self._live_upper[n] = total
            if i == 0 and "params" in m.get("dense", []):
                self.params = checkpoint.load_dense(sub, "params", self.params)
                self.opt_state = checkpoint.load_dense(
                    sub, "opt_state", self.opt_state
                )
        if rebuilt:
            self._step_fn = self._build_step()
            self._eval_fn = self._build_eval()
        self.step = manifest["step"]
        return manifest


class ShardedGroupTrainer:
    """Distributed heterogeneous multi-table training (VERDICT r2 #4).

    Every member table is row-sharded over the SAME 1-D mesh axis as
    `parallel.trainer.ShardedTrainer`, and one jitted `shard_map` step runs,
    per table: local (per-device) dedup of that table's batch columns ->
    owner-routed a2a `exchange_lookup` -> wide-concat MLP fwd/bwd ->
    `exchange_apply_grads` back to the owners — tables are independent, so
    the step pays one id a2a + one row a2a + one grad a2a PER TABLE, all
    inside a single compiled program. The dense tower is data-parallel
    (grads psum'd over the axis), exactly like the single-table trainer.

    Shared-embedding dedup is preserved per device (columns mapping to the
    same table dedup together before routing) and per owner (the owner-side
    re-dedup collapses cross-device duplicates), so a shared id is still
    gathered and updated exactly once per step per shard.

    Host-sync discipline matches ShardedTrainer: loss/logits/drops are
    fetched run_cfg.pipeline_depth steps late; flush() drains.

    Maintenance is per member table over the mesh: rotating-cursor eviction,
    spill to each table's cold tier, growth-by-rehash, and async cold->hot
    promotion (the step exports spill-backed tables' owner-side miss sets;
    maintenance() drains the staged promotions into the owner shards).
    Excluded (same as single-device GroupTrainer): dim > 128 tables.
    """

    def __init__(
        self,
        run_cfg: RunConfig,
        table_cfgs: Dict[str, TableConfig],
        feature_map: Sequence[str],
        model_cfg: ModelConfig,
        mesh=None,
        spill: Dict[str, object] = None,
    ):
        from collections import deque

        from meepoembedding_tpu.parallel.mesh import SHARD_AXIS, make_mesh
        from meepoembedding_tpu.parallel.trainer import alloc_stacked_shards

        assert table_cfgs and feature_map, "need tables and a feature map"
        unknown = set(feature_map) - set(table_cfgs)
        assert not unknown, f"feature_map names unknown tables: {sorted(unknown)}"
        for name, cfg in table_cfgs.items():
            assert cfg.dim <= 128, (
                f"table {name!r}: dim {cfg.dim} > 128 is single-table territory"
            )
        self.mesh = mesh or make_mesh()
        self.S = self.mesh.shape[SHARD_AXIS]
        assert run_cfg.batch_size % self.S == 0, "global batch must divide the mesh"
        self.run_cfg = run_cfg
        self.model_cfg = model_cfg
        self.names = sorted(table_cfgs)
        self.feature_map = list(feature_map)
        self.table_cfgs = dict(table_cfgs)  # growth rebuilds specs from these
        self.specs = {
            n: TableSpec.from_config(table_cfgs[n], num_shards=self.S)
            for n in self.names
        }
        self.stacked = {
            n: alloc_stacked_shards(self.specs[n], self.mesh) for n in self.names
        }
        self.table_features = {
            n: [s for s, fn in enumerate(self.feature_map) if fn == n]
            for n in self.names
        }
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        key = jax.random.PRNGKey(run_cfg.seed)
        self.params = jax.device_put(
            group_head_init(model_cfg, self.specs, self.feature_map, key), rep
        )
        self.opt_state = jax.device_put(optim.dense_adam_init(self.params), rep)
        self.step = 0
        self.auc = StreamingAUC()
        self.a2a_factor = run_cfg.a2a_factor
        self.pipeline_depth = max(0, run_cfg.pipeline_depth)
        self._pending = deque()
        self._last_loss = None
        self._last_step = None
        self._resized_at = -1
        self.eval_route_drops = 0
        self._bag_len = 1
        self._step_fn = None
        self._eval_fn = None
        self.spill = dict(spill or {})
        self._promoters: Dict[str, object] = {}
        self._promote_fns: Dict[str, object] = {}
        self._promote_chunk = 1024
        if self.spill:
            from meepoembedding_tpu.tiering import PromotionEngine, SpillCodec

            unknown_spill = set(self.spill) - set(self.names)
            assert not unknown_spill, (
                f"spill backends for unknown tables: {sorted(unknown_spill)}"
            )
            for n, be in self.spill.items():
                codec = SpillCodec(self.specs[n])
                assert be.width == codec.width, (
                    f"table {n!r}: spill backend width {be.width} != codec "
                    f"{codec.width}"
                )
                self._promoters[n] = PromotionEngine(codec, be)
        self._evict_cursors: Dict[str, int] = {}
        self._erase_fns: Dict[tuple, object] = {}
        self._live_upper = {n: 0 for n in self.names}
        self.spilled_rows = {n: 0 for n in self.names}
        self.promote_respills = {n: 0 for n in self.names}
        self._promoted_rows = {n: 0 for n in self.names}

    # --- step construction -----------------------------------------------------
    def _caps(self) -> Dict[str, int]:
        """Per-device dedup capacity per table: its columns' local id count."""
        per_col = (self.run_cfg.batch_size // self.S) * self._bag_len
        return {
            n: max(per_col * len(cols), 1)
            for n, cols in self.table_features.items()
        }

    def _build_step_fns(self):
        from jax.sharding import PartitionSpec as P

        from meepoembedding_tpu.parallel import sharded_table as st
        from meepoembedding_tpu.parallel.mesh import SHARD_AXIS

        names, specs, mc, rc = self.names, self.specs, self.model_cfg, self.run_cfg
        S = self.S
        ucaps = self._caps()
        ragged = self.run_cfg.a2a_ragged
        if ragged:
            from meepoembedding_tpu.parallel import ragged as rg

            a2a_caps = {
                n: rg.ragged_recv_cap(ucaps[n], S, self.a2a_factor) for n in names
            }
        else:
            a2a_caps = {
                n: st.a2a_capacity(ucaps[n], S, self.a2a_factor) for n in names
            }

        omaj = S if (ragged and (S > 1 or st.FORCE_EXCHANGE)) else 0

        def lookup_all(shards, hi, lo, step, train):
            """Per-table dedup + exchange. Returns (shards', per-table
            (uniq, emb_u, ctx), summed drop delta)."""
            out = {}
            drops = jnp.int32(0)
            for n in names:
                cols = jnp.asarray(self.table_features[n])
                h = jnp.take(hi, cols, axis=1)
                l = jnp.take(lo, cols, axis=1)
                uniq = dedup.unique_pairs(h.reshape(-1), l.reshape(-1),
                                          ucaps[n], owner_major=omaj)
                d0 = shards[n].counters[st.ROUTE_DROPS]
                shard, emb_u, ctx = st.exchange_lookup(
                    specs[n], shards[n], uniq.hi, uniq.lo, uniq.valid, step,
                    SHARD_AXIS, a2a_caps[n], train=train, ragged=ragged,
                    owner_sorted=bool(omaj),
                )
                drops = drops + (shard.counters[st.ROUTE_DROPS] - d0)
                shards[n] = shard
                out[n] = (uniq, emb_u, ctx)
            return shards, out, drops

        def features(emb_us, lookups, hi, lo):
            """Per-feature pooled embeddings in batch-column order."""
            feats, per_table = [], {}
            for n in names:
                cols = jnp.asarray(self.table_features[n])
                h = jnp.take(hi, cols, axis=1)
                bag_valid = hashing.is_valid(
                    h, jnp.take(lo, cols, axis=1)
                ) if hi.ndim == 3 else None
                uniq = lookups[n][0]
                flat = emb_us[n][uniq.inverse]
                per_table[n] = pooling.pool_or_reshape(
                    flat, h, bag_valid, specs[n].dim, mc.combiner
                )
            for s, fn in enumerate(self.feature_map):
                k = self.table_features[fn].index(s)
                feats.append(per_table[fn][:, k])
            return feats

        prom_names = tuple(sorted(self._promoters))

        def step_impl(stackeds, params, opt_state, dense, hi, lo, label, step):
            from jax import lax

            shards = {n: st.squeeze_shard(stackeds[n]) for n in names}
            shards, lookups, drops = lookup_all(shards, hi, lo, step, True)
            drops = lax.psum(drops, SHARD_AXIS)
            # owner-side miss info per spill-backed table (promotion feed)
            miss_outs = {
                n: tuple(
                    a[None]
                    for a in (
                        lookups[n][2].miss_hi,
                        lookups[n][2].miss_lo,
                        lookups[n][2].miss,
                    )
                )
                for n in prom_names
            }

            def loss_fn(params, emb_us):
                feats = features(emb_us, lookups, hi, lo)
                logits = group_head_apply(mc, params, dense, feats)
                # 1/S: grads carry GLOBAL-batch-mean scale (see ShardedTrainer)
                return bce_with_logits(logits, label) / S, logits

            emb_us = {n: lookups[n][1] for n in names}
            (loss, logits), (g_dense, g_us) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, emb_us)
            for n in names:
                shards[n] = st.exchange_apply_grads(
                    specs[n], shards[n], lookups[n][2], g_us[n], SHARD_AXIS,
                    a2a_caps[n],
                )
            g_dense = lax.psum(g_dense, SHARD_AXIS)
            if rc.grad_clip_norm is not None:
                g_dense = optim.clip_by_global_norm(g_dense, rc.grad_clip_norm)
            lr = optim.schedule_lr(rc.lr_schedule, rc.dense_learning_rate,
                                   step, max(rc.steps, 1), rc.warmup_steps)
            params, opt_state = optim.dense_adam_update(params, g_dense, opt_state, lr)
            loss = lax.psum(loss, SHARD_AXIS)
            stackeds = {n: st.unsqueeze_shard(shards[n]) for n in names}
            return stackeds, params, opt_state, loss, logits, drops, miss_outs

        def eval_impl(stackeds, params, dense, hi, lo, label):
            from jax import lax

            shards = {n: st.squeeze_shard(stackeds[n]) for n in names}
            _, lookups, drops = lookup_all(shards, hi, lo, jnp.int32(0), False)
            drops = lax.psum(drops, SHARD_AXIS)
            emb_us = {n: lookups[n][1] for n in names}
            feats = features(emb_us, lookups, hi, lo)
            logits = group_head_apply(mc, params, dense, feats)
            loss = lax.pmean(bce_with_logits(logits, label), SHARD_AXIS)
            return loss, logits, drops

        sp, rp = P(SHARD_AXIS), P()
        self._step_fn = jax.jit(
            jax.shard_map(
                step_impl, mesh=self.mesh,
                in_specs=(sp, rp, rp, sp, sp, sp, sp, rp),
                out_specs=(sp, rp, rp, rp, sp, rp, sp),
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
        self._eval_fn = jax.jit(
            jax.shard_map(
                eval_impl, mesh=self.mesh,
                in_specs=(sp, rp, sp, sp, sp, sp),
                out_specs=(rp, sp, rp),
                check_vma=False,
            )
        )

    def _maybe_build(self, ids: np.ndarray):
        L = ids.shape[2] if ids.ndim == 3 else 1
        if self._step_fn is None or L != self._bag_len:
            self._bag_len = L
            self._build_step_fns()

    def _device_batch(self, batch):
        from jax.sharding import PartitionSpec as P

        from meepoembedding_tpu.parallel import multihost
        from meepoembedding_tpu.parallel.mesh import SHARD_AXIS

        hi, lo = hashing.split_ids(batch["ids"])
        ps = P(SHARD_AXIS)
        return (
            multihost.shard_batch(np.asarray(batch["dense"], np.float32), self.mesh, ps),
            multihost.shard_batch(hi, self.mesh, ps),
            multihost.shard_batch(lo, self.mesh, ps),
            multihost.shard_batch(np.asarray(batch["label"], np.float32), self.mesh, ps),
        )

    # --- growth / maintenance (per member table, sharded) ----------------------
    def _replicated_sum(self, arr):
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        return int(jax.jit(jnp.sum, out_shardings=rep)(arr))

    def _maybe_grow(self, ids: np.ndarray) -> None:
        """Per-table distributed growth gate: host-side upper bound first,
        replicated live-count fetch only near the threshold (the same
        discipline as ShardedTrainer._maybe_grow)."""
        L = ids.shape[2] if ids.ndim == 3 else 1
        b = ids.shape[0] * max(1, jax.process_count())
        for n in self.names:
            cfg = self.table_cfgs[n]
            if cfg.grow_at_load is None:
                continue
            incoming = b * L * len(self.table_features[n])
            self._live_upper[n] += incoming
            limit = cfg.grow_at_load * self.specs[n].capacity * self.S
            if self._live_upper[n] <= limit:
                continue
            while True:
                live = self._replicated_sum(self.stacked[n].cnt)
                cfg = self.table_cfgs[n]
                limit = cfg.grow_at_load * self.specs[n].capacity * self.S
                if (live + incoming) <= limit:
                    self._live_upper[n] = live + incoming
                    break
                self._grow_table(n)

    def _grow_table(self, name: str) -> None:
        """Double one member's per-shard capacity by S independent local
        rehashes (owner routing is hash % S — capacity-independent — so rows
        stay on their shard; zero collectives). Drains the pipeline first:
        in-flight steps bind the old geometry."""
        import dataclasses

        from meepoembedding_tpu.parallel.trainer import (
            addressable_shard_trees, alloc_stacked_shards, stacked_from_shards,
        )
        from meepoembedding_tpu.table.runtime import regrow_shard

        self.flush()
        old_spec = self.specs[name]
        self.table_cfgs[name] = dataclasses.replace(
            self.table_cfgs[name], capacity=self.table_cfgs[name].capacity * 2
        )
        self.specs[name] = TableSpec.from_config(
            self.table_cfgs[name], num_shards=self.S
        )
        mine = addressable_shard_trees(self.stacked[name])
        new_by_id = {
            i: regrow_shard(old_spec, self.specs[name], sh, self.step)
            for i, sh in mine.items()
        }
        self.stacked[name] = stacked_from_shards(
            new_by_id, self.mesh, alloc_stacked_shards(self.specs[name], self.mesh)
        )
        self._promote_fns.pop(name, None)  # jit binds the old capacity
        self._erase_fns = {
            k: v for k, v in self._erase_fns.items() if k[0] != name
        }
        self._build_step_fns()

    def _apply_promotions(self) -> Dict[str, int]:
        """Drain each member's staged cold->hot promotions into its owner
        shards, via the same multi-process-safe padded-round insert as
        ShardedTrainer._apply_promotions."""
        from meepoembedding_tpu.parallel import multihost
        from meepoembedding_tpu.parallel.trainer import (
            drain_promotions, make_promote_insert,
        )

        out = {}
        for n, prm in self._promoters.items():
            fn = self._promote_fns.get(n)
            if fn is None:
                fn = self._promote_fns[n] = make_promote_insert(
                    self.specs[n], self.mesh, self._promote_chunk
                )
            self.stacked[n], pst = drain_promotions(
                self.mesh, self.specs[n], self.stacked[n], prm, fn,
                self._promote_chunk, self.step,
            )
            # promoted rows are live rows the growth gate never counted —
            # bump the bound by the GLOBAL INSERTED count so it can't
            # undercount (slot-race losers re-spilled to the cold tier)
            g = int(multihost.all_processes_sum(pst.inserted))
            self._live_upper[n] += g
            self.promote_respills[n] = (
                self.promote_respills.get(n, 0) + pst.respilled
            )
            self._promoted_rows[n] = self._promoted_rows.get(n, 0) + g
            out[n] = g
        return out

    def maintenance(self) -> dict:
        """Eviction/spill/promotion tick per member table over the mesh: one
        shard_map evict_pass per policied table (independent rotating
        cursors), spill of THIS process's shards' exports, then the async
        promotion drain back into the owner shards."""
        from jax.sharding import PartitionSpec as P

        from meepoembedding_tpu.parallel import multihost
        from meepoembedding_tpu.parallel import sharded_table as st
        from meepoembedding_tpu.parallel.mesh import SHARD_AXIS
        from meepoembedding_tpu.parallel.trainer import addressable_shard_trees

        self.flush()
        promoted = self._apply_promotions()
        out = {}
        for n in self.names:
            spec = self.specs[n]
            if spec.policy.evict_policy == "none":
                out[n] = {"evicted": 0, "promoted": promoted.get(n, 0)}
                continue
            evict = jax.shard_map(
                lambda stacked, step, off, spec=spec: jax.tree.map(
                    lambda a: a[None],
                    xla_ops.evict_pass(
                        spec, st.squeeze_shard(stacked), step, off
                    ),
                ),
                mesh=self.mesh,
                in_specs=(P(SHARD_AXIS), P(), P()),
                out_specs=P(SHARD_AXIS),
                check_vma=False,
            )
            off = self._evict_cursors.get(n, 0)
            self._evict_cursors[n] = xla_ops.next_evict_cursor(spec, off)
            self.stacked[n], export = jax.jit(evict, donate_argnums=(0,))(
                self.stacked[n], jnp.int32(self.step), jnp.int32(off)
            )
            local = addressable_shard_trees(export)
            total = sum(int(e.count) for e in local.values())
            if total and n in self.spill:
                from meepoembedding_tpu.tiering import SpillCodec, spill_export

                codec = SpillCodec(spec)
                for e in local.values():
                    spill_export(codec, self.spill[n], e)
                self.spilled_rows[n] += total
            out[n] = {
                "evicted": int(multihost.all_processes_sum(total)),
                "promoted": promoted.get(n, 0),
            }
        return out

    def remove(self, name: str, ids64: np.ndarray) -> int:
        """Distributed explicit key removal from one member table: ids route
        to their owner shards over the a2a and each key is erased on exactly
        one owner (ShardedTrainer.remove's group analog). Returns the global
        removed count; any process may call this with any id set."""
        from meepoembedding_tpu.parallel import sharded_table as st
        from meepoembedding_tpu.parallel.mesh import SHARD_AXIS
        from meepoembedding_tpu.table.layout import LANES

        self.flush()  # in-flight steps bind (and donate) the current planes
        uniq = np.unique(np.asarray(ids64, np.int64))
        n = max(LANES, 1 << max(0, (len(uniq) - 1).bit_length()))
        ids = np.full((n,), hashing.EMPTY_ID, np.int64)
        ids[: len(uniq)] = uniq
        hi, lo = hashing.split_ids(ids)
        fn = self._erase_fns.get((name, n))
        if fn is None:
            from jax.sharding import PartitionSpec as P

            spec = self.specs[name]
            cap = st.a2a_capacity(n, self.S, self.a2a_factor)

            def impl(stacked, hi, lo):
                shard = st.squeeze_shard(stacked)
                valid = hashing.is_valid(hi, lo)
                shard, removed = st.exchange_erase(
                    spec, shard, hi, lo, valid, SHARD_AXIS, cap
                )
                return st.unsqueeze_shard(shard), removed

            fn = jax.jit(jax.shard_map(
                impl, mesh=self.mesh,
                in_specs=(P(SHARD_AXIS), P(), P()),
                out_specs=(P(SHARD_AXIS), P()),
                check_vma=False,
            ), donate_argnums=(0,))
            self._erase_fns[(name, n)] = fn
        self.stacked[name], removed = fn(
            self.stacked[name], jnp.asarray(hi), jnp.asarray(lo)
        )
        return int(removed)

    # --- public API --------------------------------------------------------------
    def train_step(self, batch: dict) -> dict:
        self._maybe_build(np.asarray(batch["ids"]))
        self._maybe_grow(np.asarray(batch["ids"]))
        dense, hi, lo, label = self._device_batch(batch)
        (
            self.stacked, self.params, self.opt_state, loss, logits, drops,
            miss,
        ) = self._step_fn(
            self.stacked, self.params, self.opt_state, dense, hi, lo, label,
            jnp.int32(self.step),
        )
        self.step += 1
        self._pending.append({
            "step": self.step - 1, "loss": loss, "drops": drops,
            "logits": logits, "labels": np.asarray(batch["label"]),
            "miss": miss,
        })
        while len(self._pending) > self.pipeline_depth:
            self._retire(self._pending.popleft())
        return {"loss": self._last_loss, "retired_step": self._last_step,
                "in_flight": len(self._pending)}

    def _retire(self, ent: dict) -> None:
        # feed THIS process's shards' misses to each member's promoter; the
        # worker thread fetches and queries the cold tier off the step path
        for n, prm in self._promoters.items():
            mh, ml, mm = ent["miss"][n]
            for shh, shl, shm in zip(
                mh.addressable_shards, ml.addressable_shards,
                mm.addressable_shards,
            ):
                prm.feed(shh.data[0], shl.data[0], shm.data[0])
        if int(ent["drops"]) and ent["step"] >= self._resized_at:
            import logging

            old = self.a2a_factor
            self.a2a_factor = min(self.a2a_factor * 2.0, float(self.S))
            logging.getLogger(__name__).warning(
                "group a2a exchange overflowed at step %d (%d ids); "
                "a2a_factor %g -> %g", ent["step"], int(ent["drops"]), old,
                self.a2a_factor,
            )
            if self.a2a_factor != old:
                self._resized_at = self.step
                self._build_step_fns()
        logits = ent["logits"]
        shards = sorted(
            logits.addressable_shards,
            key=lambda s: s.index[0].start if s.index[0].start is not None else 0,
        )
        self.auc.update(
            np.concatenate([np.asarray(s.data) for s in shards]), ent["labels"]
        )
        self._last_loss = float(ent["loss"])
        self._last_step = ent["step"]

    def flush(self) -> list:
        out = []
        while self._pending:
            self._retire(self._pending.popleft())
            out.append((self._last_step, self._last_loss))
        return out

    def eval_step(self, batch: dict) -> dict:
        self._maybe_build(np.asarray(batch["ids"]))
        dense, hi, lo, label = self._device_batch(batch)
        loss, logits, drops = self._eval_fn(
            self.stacked, self.params, dense, hi, lo, label
        )
        drops = int(drops)
        self.eval_route_drops += drops
        return {"loss": float(loss), "logits": logits, "route_drops": drops}

    def counters(self) -> Dict[str, dict]:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from meepoembedding_tpu.table import layout

        self.flush()
        out = {}
        rep = NamedSharding(self.mesh, P())
        for n in self.names:
            c = np.asarray(jax.jit(
                lambda a: jnp.sum(a, axis=0), out_shardings=rep
            )(self.stacked[n].counters))
            rows = int(jax.jit(jnp.sum, out_shardings=rep)(self.stacked[n].cnt))
            out[n] = {
                "hits": int(c[layout.HITS]), "misses": int(c[layout.MISSES]),
                "inserts": int(c[layout.INSERTS]),
                "evictions": int(c[layout.EVICTIONS]),
                "denied": int(c[layout.DENIED]),
                "spills": self.spilled_rows[n],
                # rows that LANDED in the hot tier (device PROMOTES counter
                # agrees); slot-race losers re-spilled, counted separately
                "promotes": int(c[layout.PROMOTES]),
                "promote_respills": self.promote_respills.get(n, 0),
                "rows": rows,
                "capacity": self.specs[n].capacity * self.S,
            }
        return out

    # --- checkpoint (group.json + one SHARDED elastic checkpoint per table) -----
    def save_checkpoint(self, path: str) -> dict:
        from meepoembedding_tpu import checkpoint
        from meepoembedding_tpu.parallel import multihost
        from meepoembedding_tpu.parallel.trainer import addressable_shard_trees

        self.flush()
        os.makedirs(path, exist_ok=True)
        manifest = {"tables": {}, "feature_map": self.feature_map,
                    "step": self.step, "num_shards": self.S}
        coord = jax.process_index() == 0
        for i, n in enumerate(self.names):
            sub = os.path.join(path, f"table-{n}")
            dense = (
                {"params": self.params, "opt_state": self.opt_state}
                if i == 0 else None  # dense tower rides the first member
            )
            checkpoint.save_sharded(
                sub, self.specs[n], addressable_shard_trees(self.stacked[n]),
                self.S, self.step, dense=dense, is_coordinator=coord,
                barrier=multihost.barrier,
            )
            manifest["tables"][n] = f"table-{n}"
        if coord:
            tmp = os.path.join(path, ".group.json.tmp")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, os.path.join(path, "group.json"))
        multihost.barrier("group-ckpt-committed")
        return manifest

    def load_checkpoint(self, path: str) -> dict:
        """Elastic: each member table rehash-restores onto this mesh size,
        whatever shard count (or single-device GroupTrainer layout) wrote it."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from meepoembedding_tpu import checkpoint
        from meepoembedding_tpu.parallel.trainer import stacked_from_shards

        with open(os.path.join(path, "group.json")) as f:
            manifest = json.load(f)
        assert set(manifest["tables"]) == set(self.names), (
            f"group mismatch: checkpoint has {sorted(manifest['tables'])}, "
            f"trainer has {self.names}"
        )
        sharding = NamedSharding(self.mesh, P("d"))
        my_ids = sorted(
            {
                (idx[0].start if idx[0].start is not None else 0)
                for idx in sharding.addressable_devices_indices_map(
                    (self.S,)
                ).values()
            }
        )
        rep = NamedSharding(self.mesh, P())
        import dataclasses

        from meepoembedding_tpu.parallel.trainer import alloc_stacked_shards

        rebuilt = False
        for i, n in enumerate(self.names):
            sub = os.path.join(path, manifest["tables"][n])
            # growable members pre-grow to fit the checkpoint's live set and
            # seed the growth gate with the restored live count (advisor r3)
            total = sum(checkpoint.read_manifest(sub).get("counts", [0]))
            cfg = self.table_cfgs[n]
            while (
                cfg.grow_at_load is not None
                and total > cfg.grow_at_load * self.specs[n].capacity * self.S
            ):
                cfg = dataclasses.replace(cfg, capacity=cfg.capacity * 2)
                self.table_cfgs[n] = cfg
                self.specs[n] = TableSpec.from_config(cfg, num_shards=self.S)
                self.stacked[n] = alloc_stacked_shards(self.specs[n], self.mesh)
                rebuilt = True
            self._live_upper[n] = total
            shards, m = checkpoint.restore_shards(
                self.specs[n], sub, self.S, only_ids=set(my_ids)
            )
            self.stacked[n] = stacked_from_shards(
                {j: shards[j] for j in my_ids}, self.mesh, self.stacked[n]
            )
            if i == 0 and "params" in m.get("dense", []):
                self.params = jax.device_put(
                    checkpoint.load_dense(sub, "params", self.params), rep
                )
                self.opt_state = jax.device_put(
                    checkpoint.load_dense(sub, "opt_state", self.opt_state), rep
                )
        if rebuilt:
            self._promote_fns.clear()  # jits bind pre-restore capacities
            self._erase_fns.clear()
            if self._step_fn is not None:
                self._build_step_fns()
        self.step = manifest["step"]
        return manifest
