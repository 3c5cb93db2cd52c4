import jax
import jax.numpy as jnp
import numpy as np

from meepoembedding_tpu.config import ModelConfig
from meepoembedding_tpu.models import build_model
from meepoembedding_tpu.models.common import bce_with_logits


def _cfg(kind):
    return ModelConfig(
        kind=kind,
        num_dense_features=4,
        num_sparse_features=3,
        embedding_dim=8,
        bottom_mlp=(16, 8),
        top_mlp=(16, 1),
    )


def test_shapes_and_grads():
    for kind in ("dlrm", "ctr_mlp"):
        cfg = _cfg(kind)
        m = build_model(cfg)
        params = m.init(jax.random.PRNGKey(0))
        b = 5
        dense = jnp.ones((b, 4))
        emb = jnp.ones((b, 3, 8)) * 0.1
        logits = m.apply(params, dense, emb)
        assert logits.shape == (b,)
        y = jnp.array([0, 1, 0, 1, 1], jnp.float32)
        g = jax.grad(lambda p, e: bce_with_logits(m.apply(p, dense, e), y), argnums=(0, 1))(
            params, emb
        )
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        # embedding grads flow
        assert np.abs(np.asarray(g[1])).sum() > 0


def test_bce_matches_reference():
    z = jnp.array([-2.0, 0.0, 3.0])
    y = jnp.array([0.0, 1.0, 1.0])
    p = 1 / (1 + np.exp(-np.asarray(z)))
    expect = -np.mean(np.asarray(y) * np.log(p) + (1 - np.asarray(y)) * np.log(1 - p))
    np.testing.assert_allclose(float(bce_with_logits(z, y)), expect, rtol=1e-6)


def test_dlrm_interaction_symmetry():
    """Permuting sparse features only permutes interaction terms -> same set."""
    cfg = _cfg("dlrm")
    m = build_model(cfg)
    params = m.init(jax.random.PRNGKey(1))
    dense = jnp.zeros((1, 4))
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 8)).astype(np.float32))
    l1 = m.apply(params, dense, emb)
    assert np.isfinite(np.asarray(l1)).all()
