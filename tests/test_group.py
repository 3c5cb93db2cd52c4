"""TableGroup: heterogeneous named tables under one checkpoint surface."""

import jax.numpy as jnp
import numpy as np

from meepoembedding_tpu.config import OptimizerConfig, TableConfig
from meepoembedding_tpu.table.group import TableGroup


def _group():
    return TableGroup({
        "user": TableConfig(dim=16, capacity=1 << 11,
                            optimizer=OptimizerConfig(kind="rowwise_adagrad")),
        "item": TableConfig(dim=8, capacity=1 << 10,
                            optimizer=OptimizerConfig(kind="ftrl", l1=0.01)),
    })


def test_group_heterogeneous_dims_and_optimizers(rng):
    g = _group()
    uid = rng.integers(1, 10**9, size=100, dtype=np.int64)
    iid = rng.integers(1, 10**9, size=80, dtype=np.int64)
    ru = np.asarray(g.lookup("user", uid))
    ri = np.asarray(g.lookup("item", iid))
    assert ru.shape == (100, 16) and ri.shape == (80, 8)
    g.apply_grads("user", jnp.asarray(rng.normal(size=(100, 16)), jnp.float32))
    g.apply_grads("item", jnp.asarray(rng.normal(size=(80, 8)), jnp.float32))
    assert len(g) == len(np.unique(uid)) + len(np.unique(iid))
    assert g.remove("item", iid[:10]) == len(np.unique(iid[:10]))
    c = g.counters()
    assert c["item"]["erases"] == len(np.unique(iid[:10]))


def test_group_checkpoint_roundtrip(tmp_path, rng):
    g = _group()
    uid = rng.integers(1, 10**9, size=50, dtype=np.int64)
    iid = rng.integers(1, 10**9, size=50, dtype=np.int64)
    g.lookup("user", uid)
    g.lookup("item", iid)
    g.apply_grads("user", jnp.ones((50, 16)) * 0.1)
    g.apply_grads("item", jnp.ones((50, 8)) * 0.1)
    g.save(str(tmp_path / "grp"))

    g2 = _group()
    g2.load(str(tmp_path / "grp"))
    assert len(g2) == len(g)
    np.testing.assert_array_equal(
        np.asarray(g.lookup("user", uid, train=False)),
        np.asarray(g2.lookup("user", uid, train=False)),
    )
    np.testing.assert_array_equal(
        np.asarray(g.lookup("item", iid, train=False)),
        np.asarray(g2.lookup("item", iid, train=False)),
    )


def test_group_mismatch_rejected(tmp_path):
    g = _group()
    g.save(str(tmp_path / "grp"))
    other = TableGroup({"user": TableConfig(dim=16, capacity=1 << 10)})
    import pytest
    with pytest.raises(AssertionError, match="group mismatch"):
        other.load(str(tmp_path / "grp"))
