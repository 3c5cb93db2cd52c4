"""Online scoring service (SURVEY.md L7; README.md:2 "recommendation,
search, CTR and advertising systems" — the serving half).

`ScoringService` restores a checkpoint once (table + dense tower) and scores
request batches with probe-only lookups: no insert-on-miss, unknown ids
contribute zero embeddings, multi-hot bags pool with the configured
combiner. `serve_http` exposes it over a dependency-free stdlib HTTP server:

  POST /score   {"dense": [[...]], "ids": [[...]]}  ->  {"scores": [...]}
  POST /reload  {"ckpt": "/path"} (both optional) -> hot-swap to a newer
                checkpoint without dropping traffic; default: re-read the
                ckpt path the service was started with
  GET  /healthz ->  {"ok": true, "rows": N, "step": k, "dim": d}
  GET  /metrics ->  Prometheus text format: table counters, live rows,
                    request count and latency quantiles

Scoring is jitted per input shape (static shapes under jit): production
traffic with a fixed batch geometry compiles once; the handler pads ragged
request batches up to the next power of two to bound recompiles.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class ScoringService:
    def __init__(self, ckpt_path: str, table_cfg, model_cfg,
                 quantize: str = "none"):
        import jax

        from meepoembedding_tpu import checkpoint
        from meepoembedding_tpu.models import build_model
        from meepoembedding_tpu.table.runtime import DynamicEmbeddingTable

        self.table_cfg, self.model_cfg = table_cfg, model_cfg
        self.quantize = quantize
        self._ckpt_path = ckpt_path
        if quantize == "int8":
            # read-only int8 serving table (serving_quant.py): ~3x smaller
            from meepoembedding_tpu.serving_quant import QuantizedTable

            self.manifest = checkpoint.read_manifest(ckpt_path)
            assert self.manifest["dim"] == table_cfg.dim, (
                f"dim mismatch: ckpt {self.manifest['dim']} vs "
                f"table config {table_cfg.dim}"
            )
            self.table = QuantizedTable.from_checkpoint(ckpt_path)
        elif quantize == "none":
            self.table = DynamicEmbeddingTable(table_cfg)
            self.manifest = self.table.load(ckpt_path)
        else:
            raise ValueError(f"quantize must be none|int8, got {quantize!r}")
        self.model = build_model(model_cfg)
        params = self.model.init(jax.random.PRNGKey(0))
        if "params" in self.manifest.get("dense", []):
            params = checkpoint.load_dense(ckpt_path, "params", params)
        self.params = params
        self._score_fns = {}
        self._lock = threading.Lock()  # single device; serialize steps
        self._lat_ms: list = []  # ring of recent scoring latencies
        self._requests = 0

    def _score_fn(self, ids_shape):
        import jax
        import jax.numpy as jnp

        from meepoembedding_tpu.models.common import model_apply, model_inputs
        from meepoembedding_tpu.table import hashing

        fn = self._score_fns.get(ids_shape)
        if fn is not None:
            return fn
        model_cfg, dim = self.model_cfg, self.table_cfg.dim

        @jax.jit
        def score(params, dense, rows, hi, lo):
            bag_valid = hashing.is_valid(hi, lo) if hi.ndim == 3 else None
            emb = model_inputs(
                self.model, rows, hi, bag_valid, dim, model_cfg.combiner
            )
            return jax.nn.sigmoid(
                model_apply(self.model, params, dense, emb, bag_valid)
            )

        self._score_fns[ids_shape] = score
        return score

    def score(self, dense: np.ndarray, ids: np.ndarray) -> np.ndarray:
        """[B, ND] f32 + [B, S] or [B, S, L] int64 -> [B] probabilities."""
        import time

        import jax.numpy as jnp

        from meepoembedding_tpu.table import hashing

        dense = np.asarray(dense, np.float32)
        ids = np.asarray(ids, np.int64)
        t0 = time.perf_counter()
        with self._lock:
            rows = self.table.lookup(ids.reshape(-1), train=False)
            hi, lo = hashing.split_ids(ids)
            fn = self._score_fn(ids.shape)
            p = np.asarray(
                fn(self.params, jnp.asarray(dense), rows,
                   jnp.asarray(hi), jnp.asarray(lo))
            )
            self._requests += 1
            self._lat_ms.append((time.perf_counter() - t0) * 1e3)
            if len(self._lat_ms) > 1024:
                del self._lat_ms[:512]
            return p

    def reload(self, ckpt_path: str | None = None) -> dict:
        """Hot-swap to a (usually newer) checkpoint without dropping
        traffic: the replacement table + dense params are fully restored
        OFF the serving lock — in-flight and queued /score requests keep
        answering from the old state — then swapped in atomically. The
        compiled score functions are keyed only on input shape and model
        (not on table/params identity), so no recompiles after a swap.
        Raises on a bad/missing checkpoint, leaving the old state serving."""
        import jax

        from meepoembedding_tpu import checkpoint
        from meepoembedding_tpu.table.runtime import DynamicEmbeddingTable

        path = ckpt_path or self._ckpt_path
        if self.quantize == "int8":
            from meepoembedding_tpu.serving_quant import QuantizedTable

            manifest = checkpoint.read_manifest(path)
            assert manifest["dim"] == self.table_cfg.dim, (
                f"dim mismatch: ckpt {manifest['dim']} vs {self.table_cfg.dim}"
            )
            table = QuantizedTable.from_checkpoint(path)
        else:
            table = DynamicEmbeddingTable(self.table_cfg)
            manifest = table.load(path)
        params = self.model.init(jax.random.PRNGKey(0))
        if "params" in manifest.get("dense", []):
            params = checkpoint.load_dense(path, "params", params)
        with self._lock:
            self.table, self.params, self.manifest = table, params, manifest
            self._ckpt_path = path
        return self.stats()

    def metrics_text(self) -> str:
        """Prometheus exposition format: counters + latency quantiles."""
        lines = [
            "# TYPE meepo_table_rows gauge",
            f"meepo_table_rows {len(self.table)}",
            "# TYPE meepo_requests_total counter",
            f"meepo_requests_total {self._requests}",
        ]
        for name, v in getattr(self.table, "counters", dict)().items():
            if isinstance(v, (int, float)):
                lines.append(f"# TYPE meepo_table_{name}_total counter")
                lines.append(f"meepo_table_{name}_total {v}")
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
        return {
            "ok": True,
            "rows": len(self.table),
            "step": int(self.manifest.get("step", 0)),
            "dim": self.table_cfg.dim,
        }


def make_http_server(service: ScoringService, port: int,
                     retrieval=None) -> ThreadingHTTPServer:
    """HTTP endpoint. With `retrieval` (a RetrievalService with a built
    index), POST /retrieve {"dense": [[..]], "ids": [[..]], "k": 10}
    answers top-k item keys + scores through the two-tower index."""
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: stdout is the service's JSON log
            pass

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, service.stats())
            elif self.path == "/metrics":
                body = service.metrics_text().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path == "/reload":
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n)) if n else {}
                    out = service.reload(req.get("ckpt"))
                    self._reply(200, out)
                except Exception as e:  # old state keeps serving
                    self._reply(400, {"error": str(e)})
                return
            if self.path == "/retrieve":
                if retrieval is None:
                    self._reply(404, {"error": "retrieval not enabled"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n))
                    dense = np.asarray(req["dense"], np.float32)
                    ids = np.asarray(req["ids"], np.int64)
                    k = int(req.get("k", 10))
                    if dense.ndim != 2 or ids.ndim != 2 or len(dense) != len(ids):
                        raise ValueError(
                            f"dense {dense.shape} / ids {ids.shape} mismatch"
                        )
                    keys, scores = retrieval.retrieve(dense, ids, k=k)
                    self._reply(200, {
                        "keys": keys.tolist(),
                        "scores": np.round(scores, 6).tolist(),
                    })
                except Exception as e:
                    self._reply(400, {"error": str(e)})
                return
            if self.path != "/score":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                dense = np.asarray(req["dense"], np.float32)
                ids = np.asarray(req["ids"], np.int64)
                if dense.ndim != 2 or ids.ndim not in (2, 3) or (
                    len(dense) != len(ids)
                ):
                    raise ValueError(
                        f"dense {dense.shape} / ids {ids.shape} mismatch"
                    )
                # pad the batch to the next power of two: bounds the set of
                # compiled shapes for ragged request sizes
                b = len(dense)
                bp = 1 << max(0, (b - 1).bit_length())
                if bp != b:
                    dense = np.concatenate(
                        [dense, np.zeros((bp - b,) + dense.shape[1:], np.float32)]
                    )
                    from meepoembedding_tpu.table.hashing import EMPTY_ID

                    pad = np.full((bp - b,) + ids.shape[1:], EMPTY_ID, np.int64)
                    ids = np.concatenate([ids, pad])
                scores = service.score(dense, ids)[:b]
                self._reply(200, {"scores": np.round(scores, 6).tolist()})
            except Exception as e:  # malformed request must not kill serving
                self._reply(400, {"error": str(e)})

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)
