"""Static fixed-vocab embedding baseline (the AUC-parity reference).

BASELINE.json's headline metric is "Criteo DLRM AUC [parity with a]
hash-table-embedding DLRM baseline": the reference point is the CLASSIC
fixed-vocab hash-trick embedding — a dense [vocab, dim] table addressed by
`hash(id) % vocab` (collisions and all), trained with rowwise-AdaGrad. This
trainer is that baseline, sharing the dynamic trainer's models, dense
optimizer and loss so the ONLY difference is the embedding store.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from meepoembedding_tpu.config import ModelConfig, RunConfig
from meepoembedding_tpu.metrics import StreamingAUC
from meepoembedding_tpu.models import build_model
from meepoembedding_tpu.models.common import bce_with_logits
from meepoembedding_tpu.ops import optim
from meepoembedding_tpu.table import hashing


class StaticEmbeddingTrainer:
    """Fixed-vocab (power-of-two) hash-trick embedding + rowwise-AdaGrad."""

    def __init__(
        self,
        run_cfg: RunConfig,
        model_cfg: ModelConfig,
        vocab_size: int,
        table_lr: float = 0.05,
        initializer_scale: float = 0.01,
        initial_accumulator: float = 0.1,
        eps: float = 1e-8,
    ):
        assert vocab_size & (vocab_size - 1) == 0, "vocab must be a power of two"
        self.run_cfg = run_cfg
        self.model_cfg = model_cfg
        self.vocab = vocab_size
        self.model = build_model(model_cfg)
        key = jax.random.PRNGKey(run_cfg.seed)
        ek, mk = jax.random.split(key)
        dim = model_cfg.embedding_dim
        self.table = jax.random.uniform(
            ek, (vocab_size, dim), jnp.float32,
            -initializer_scale, initializer_scale,
        )
        self.accum = jnp.full((vocab_size,), initial_accumulator, jnp.float32)
        self.params = self.model.init(mk)
        self.opt_state = optim.dense_adam_init(self.params)
        self.auc = StreamingAUC()
        self.step = 0
        lr, dlr = table_lr, run_cfg.dense_learning_rate

        @partial(jax.jit, donate_argnums=(0, 1))
        def step_fn(table, accum, params, opt_state, dense, hi, lo, label):
            b, s = hi.shape
            idx = (
                hashing.hash_pair(hi.reshape(-1), lo.reshape(-1), hashing.SALT_BUCKET)
                % jnp.uint32(vocab_size)
            ).astype(jnp.int32)

            def loss_fn(params, table):
                emb = jnp.take(table, idx, axis=0).reshape(b, s, dim)
                logits = self.model.apply(params, dense, emb)
                return bce_with_logits(logits, label), logits

            (loss, logits), (g_dense, g_tab) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, table)
            # rowwise AdaGrad on the touched rows (g_tab is already the
            # duplicate-summed dense-table gradient from autodiff)
            g2 = jnp.mean(g_tab * g_tab, axis=1)
            accum = accum + g2
            scale = lr * jax.lax.rsqrt(accum + eps)
            table = table - scale[:, None] * g_tab
            params, opt_state = optim.dense_adam_update(params, g_dense, opt_state, dlr)
            return table, accum, params, opt_state, loss, logits

        self._step_fn = step_fn

        @jax.jit
        def eval_fn(table, params, dense, hi, lo, label):
            b, s = hi.shape
            idx = (
                hashing.hash_pair(hi.reshape(-1), lo.reshape(-1), hashing.SALT_BUCKET)
                % jnp.uint32(vocab_size)
            ).astype(jnp.int32)
            emb = jnp.take(table, idx, axis=0).reshape(b, s, dim)
            logits = self.model.apply(params, dense, emb)
            return bce_with_logits(logits, label), logits

        self._eval_fn = eval_fn

    def eval_step(self, batch: dict) -> dict:
        hi, lo = hashing.split_ids(batch["ids"])
        loss, logits = self._eval_fn(
            self.table, self.params, jnp.asarray(batch["dense"]),
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(batch["label"]),
        )
        return {"loss": float(loss), "logits": logits}

    def train_step(self, batch: dict) -> dict:
        hi, lo = hashing.split_ids(batch["ids"])
        (
            self.table, self.accum, self.params, self.opt_state, loss, logits
        ) = self._step_fn(
            self.table, self.accum, self.params, self.opt_state,
            jnp.asarray(batch["dense"]), jnp.asarray(hi), jnp.asarray(lo),
            jnp.asarray(batch["label"]),
        )
        self.step += 1
        self.auc.update(logits, jnp.asarray(batch["label"]))
        return {"loss": float(loss)}
