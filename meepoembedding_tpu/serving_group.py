"""Online scoring for heterogeneous `tables:` GROUP checkpoints (SURVEY.md
L7 + C11): the multi-table complement of serving.ScoringService /
serving_sharded.ShardedScoringService.

`GroupScoringService` restores a group checkpoint (group.json + one elastic
checkpoint per member + the dense tower) through the group trainers'
restore machinery and scores request batches with PROBE-ONLY lookups (the
group eval step: no insert-on-miss, unknown ids contribute zero
embeddings, multi-hot bags pool with model.combiner). `distributed=True`
restores every member row-sharded over the mesh and scores via the
per-table all-to-all — route drops are counted and surfaced, exactly like
the single-table sharded service.

Drop-in behind `serving.make_http_server` (same score/reload/stats/
metrics_text surface): `meepo serve --config group.yaml --http PORT
[--distributed]` wires it up. Request batches pad to a power of two (and a
multiple of the mesh size when distributed), so ragged traffic compiles a
bounded set of programs.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, Optional, Sequence

import numpy as np


class GroupScoringService:
    def __init__(self, ckpt_path: str, run_cfg, table_cfgs: Dict[str, object],
                 feature_map: Sequence[str], model_cfg,
                 distributed: bool = False, mesh=None):
        self._args = (run_cfg, dict(table_cfgs), list(feature_map), model_cfg)
        self.distributed = distributed
        self._mesh = mesh
        self._ckpt_path = ckpt_path
        self._lock = threading.Lock()
        self._lat_ms: list = []
        self._requests = 0
        self.route_drops = 0
        self.trainer, self.manifest = self._restore(ckpt_path)
        self.S = getattr(self.trainer, "S", 1)

    def _restore(self, path: str):
        """Fresh trainer + checkpoint restore; the caller swaps atomically
        (hot reload keeps serving the old state until the new one is up)."""
        run_cfg, tables, fmap, model_cfg = self._args
        if self.distributed:
            import dataclasses

            import jax

            from meepoembedding_tpu.group_train import ShardedGroupTrainer

            S = (self._mesh.shape["d"] if self._mesh is not None
                 else jax.device_count())
            if run_cfg.batch_size % S:
                # the trainer asserts batch % mesh; serving pads requests
                # itself, so the configured batch size only needs to divide
                run_cfg = dataclasses.replace(
                    run_cfg, batch_size=max(S, run_cfg.batch_size // S * S)
                )
            tr = ShardedGroupTrainer(run_cfg, tables, fmap, model_cfg,
                                     mesh=self._mesh)
        else:
            from meepoembedding_tpu.group_train import GroupTrainer

            tr = GroupTrainer(run_cfg, tables, fmap, model_cfg)
        manifest = tr.load_checkpoint(path)
        return tr, manifest

    def _pad_batch(self, dense: np.ndarray, ids: np.ndarray):
        from meepoembedding_tpu.table.hashing import EMPTY_ID

        b = len(dense)
        S = getattr(self.trainer, "S", 1)
        per = -(-b // S)
        per = 1 << max(0, (per - 1).bit_length())
        bp = per * S
        if bp != b:
            dense = np.concatenate(
                [dense, np.zeros((bp - b,) + dense.shape[1:], np.float32)]
            )
            ids = np.concatenate(
                [ids, np.full((bp - b,) + ids.shape[1:], EMPTY_ID, np.int64)]
            )
        return dense, ids, b

    def score(self, dense: np.ndarray, ids: np.ndarray) -> np.ndarray:
        """[B, ND] f32 + [B, S] or [B, S, L] int64 -> [B] probabilities."""
        dense = np.asarray(dense, np.float32)
        ids = np.asarray(ids, np.int64)
        t0 = time.perf_counter()
        with self._lock:
            dense, ids, b = self._pad_batch(dense, ids)
            out = self.trainer.eval_step({
                "dense": dense, "ids": ids,
                "label": np.zeros((len(dense),), np.float32),  # logits only
            })
            logits = out["logits"]
            if hasattr(logits, "addressable_shards") and self.distributed:
                logits = np.concatenate([
                    np.asarray(s.data) for s in sorted(
                        logits.addressable_shards,
                        key=lambda s: s.index[0].start or 0,
                    )
                ])
            self.route_drops += int(out.get("route_drops", 0))
            p = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64)))
            self._requests += 1
            self._lat_ms.append((time.perf_counter() - t0) * 1e3)
            if len(self._lat_ms) > 1024:
                del self._lat_ms[:512]
            return p[:b].astype(np.float32)

    def reload(self, ckpt_path: Optional[str] = None) -> dict:
        path = ckpt_path or self._ckpt_path
        trainer, manifest = self._restore(path)
        with self._lock:
            self.trainer, self.manifest = trainer, manifest
            self._ckpt_path = path
        return self.stats()

    def metrics_text(self) -> str:
        lines = [
            "# TYPE meepo_requests_total counter",
            f"meepo_requests_total {self._requests}",
            "# TYPE meepo_route_drops_total counter",
            f"meepo_route_drops_total {self.route_drops}",
            "# TYPE meepo_mesh_devices gauge",
            f"meepo_mesh_devices {self.S}",
        ]
        for tname, c in self.trainer.counters().items():
            for name, v in c.items():
                if isinstance(v, (int, float)):
                    lines.append(
                        f"# TYPE meepo_table_{name}_total counter"
                    )
                    lines.append(
                        f'meepo_table_{name}_total{{table="{tname}"}} {v}'
                    )
        if self._lat_ms:
            a = np.asarray(self._lat_ms)
            lines.append("# TYPE meepo_score_latency_ms summary")
            for q in (0.5, 0.95, 0.99):
                lines.append(
                    f'meepo_score_latency_ms{{quantile="{q}"}} '
                    f"{float(np.quantile(a, q)):.3f}"
                )
        return "\n".join(lines) + "\n"

    def stats(self) -> dict:
        c = self.trainer.counters()
        return {
            "ok": True,
            "rows": int(sum(t["rows"] for t in c.values())),
            "tables": {n: t["rows"] for n, t in c.items()},
            "step": int(self.manifest.get("step", getattr(self.trainer, "step", 0))),
            "devices": self.S,
            "route_drops": self.route_drops,
        }
