"""CTR-MLP: the simple wide concat-MLP CTR model (SURVEY.md C16, BASELINE
config 1). Dense features concat pooled sparse embeddings -> MLP -> logit."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meepoembedding_tpu.config import ModelConfig
from meepoembedding_tpu.models.common import mlp_apply, mlp_init


class CtrMlp:
    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg

    def init(self, key):
        cfg = self.cfg
        in_dim = cfg.num_dense_features + cfg.num_sparse_features * cfg.embedding_dim
        return {"mlp": mlp_init(key, cfg.top_mlp, in_dim, jnp.dtype(cfg.dtype))}

    def apply(self, params, dense, emb):
        """dense [B, ND]; emb [B, NS, D] -> logits [B]."""
        assert emb.shape[1] == self.cfg.num_sparse_features, (
            f"emb carries {emb.shape[1]} sparse features, model configured "
            f"for {self.cfg.num_sparse_features}"
        )
        assert dense.shape[1] == self.cfg.num_dense_features, (
            f"dense carries {dense.shape[1]} features, model configured "
            f"for {self.cfg.num_dense_features}"
        )
        b = dense.shape[0]
        z = jnp.concatenate(
            [dense, emb.reshape(b, -1)], axis=1, dtype=self.cfg.dtype
        )
        return mlp_apply(params["mlp"], z).reshape(-1).astype(jnp.float32)
