"""Per-member-table maintenance for the group trainers (VERDICT r2 weak #7):
online growth, LFU/TTL eviction with per-table rotating cursors, per-table
spill backends, and growable restore — single-device and on the 8-vdev mesh."""

import jax
import numpy as np
import pytest

from meepoembedding_tpu.backends import make_backend
from meepoembedding_tpu.config import (
    ModelConfig,
    OptimizerConfig,
    PolicyConfig,
    RunConfig,
    TableConfig,
)
from meepoembedding_tpu.group_train import GroupTrainer, ShardedGroupTrainer
from meepoembedding_tpu.parallel.mesh import make_mesh
from meepoembedding_tpu.table.layout import TableSpec
from meepoembedding_tpu.tiering import SpillCodec

MODEL = ModelConfig(
    kind="ctr_mlp", num_dense_features=4, num_sparse_features=3,
    embedding_dim=16, top_mlp=(32, 1),
)
FEATURE_MAP = ["user", "item", "item"]


def _tables():
    return {
        # small growable table: starts at 2^10, must double under the stream
        "user": TableConfig(
            dim=16, capacity=1 << 10, grow_at_load=0.6, initializer_scale=0.02,
            optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.05),
        ),
        # evicting table with a short TTL
        "item": TableConfig(
            dim=8, capacity=1 << 12, initializer_scale=0.02,
            policy=PolicyConfig(evict_policy="lfu_ttl", ttl_steps=5),
        ),
    }


def _batch(rng, b=128):
    return {
        "ids": np.stack(
            [
                rng.integers(0, 5000, size=b),
                rng.integers(0, 900, size=b),
                rng.integers(0, 900, size=b),
            ],
            axis=1,
        ).astype(np.int64),
        "dense": rng.normal(size=(b, 4)).astype(np.float32),
        "label": rng.integers(0, 2, size=b).astype(np.float32),
    }


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(8)


def _spill_for(tables, names):
    return {
        n: make_backend("host", width=SpillCodec(
            TableSpec.from_config(tables[n])
        ).width)
        for n in names
    }


def test_group_growth_eviction_spill_single_device():
    tables = _tables()
    spill = _spill_for(tables, ["item"])
    run = RunConfig(batch_size=128, steps=30, dense_learning_rate=3e-3)
    tr = GroupTrainer(run, tables, FEATURE_MAP, MODEL, spill=spill)
    rng = np.random.default_rng(0)
    for i in range(run.steps):
        tr.train_step(_batch(rng))
        if (i + 1) % 10 == 0:
            tr.maintenance()
    c = tr.counters()
    assert c["user"]["capacity"] > 1 << 10, "growable member must have doubled"
    assert c["user"]["rows"] <= 0.6 * c["user"]["capacity"] + 128 * 1
    assert c["item"]["evictions"] > 0, "TTL member must have evicted"
    assert c["item"]["capacity"] == 1 << 12, "fixed member must not grow"
    assert c["user"]["evictions"] == 0, "no-policy member must not evict"
    assert c["item"]["spills"] > 0 and len(spill["item"]) > 0, (
        "evicted rows must land in the item spill tier"
    )
    # spilled payloads decode to full row state (value + freq + slots)
    keys, rows = next(spill["item"].export())
    assert rows.shape[1] == SpillCodec(
        TableSpec.from_config(tables["item"])
    ).width


def test_group_restore_pregrows_and_seeds_gate(tmp_path):
    """A group checkpoint whose growable member outgrew its config must
    restore into a FRESH trainer built from the ORIGINAL config: the member
    pre-grows to fit and the growth gate is seeded (advisor r3 high)."""
    tables = _tables()
    run = RunConfig(batch_size=128, steps=20, dense_learning_rate=3e-3)
    tr = GroupTrainer(run, tables, FEATURE_MAP, MODEL)
    rng = np.random.default_rng(1)
    for _ in range(run.steps):
        tr.train_step(_batch(rng))
    grown_cap = tr.counters()["user"]["capacity"]
    assert grown_cap > 1 << 10
    path = str(tmp_path / "grp")
    tr.save_checkpoint(path)

    tr2 = GroupTrainer(run, _tables(), FEATURE_MAP, MODEL)
    tr2.load_checkpoint(path)
    c2 = tr2.counters()
    assert c2["user"]["capacity"] >= grown_cap
    assert c2["user"]["rows"] == tr.counters()["user"]["rows"]
    assert tr2._live_upper["user"] == c2["user"]["rows"], (
        "growth gate must be seeded with the restored live count"
    )
    # training continues without denying inserts
    for _ in range(5):
        tr2.train_step(_batch(rng))
    assert tr2.counters()["user"]["denied"] == 0


def test_sharded_group_growth_eviction_spill(mesh):
    tables = _tables()
    spill = _spill_for(tables, ["item"])
    run = RunConfig(batch_size=128, steps=30, dense_learning_rate=3e-3,
                    pipeline_depth=2)
    tr = ShardedGroupTrainer(run, tables, FEATURE_MAP, MODEL, mesh=mesh,
                             spill=spill)
    rng = np.random.default_rng(2)
    for i in range(run.steps):
        tr.train_step(_batch(rng))
        if (i + 1) % 10 == 0:
            out = tr.maintenance()
            assert set(out) == {"user", "item"}
    tr.flush()
    c = tr.counters()
    assert c["user"]["capacity"] > 1 << 10, "growable member must have doubled"
    assert c["item"]["evictions"] > 0
    assert c["item"]["spills"] > 0 and len(spill["item"]) > 0
    assert tr.auc.compute() >= 0.0 and np.isfinite(tr._last_loss)
    # elastic round-trip AFTER growth: sharded -> single-device
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tr.save_checkpoint(d)
        tr1 = GroupTrainer(run, _tables(), FEATURE_MAP, MODEL)
        tr1.load_checkpoint(d)
        c1 = tr1.counters()
        assert c1["user"]["rows"] == c["user"]["rows"]
        assert c1["item"]["rows"] == c["item"]["rows"]


def test_sharded_group_counters_include_capacity(mesh):
    run = RunConfig(batch_size=128, steps=2, dense_learning_rate=3e-3)
    tr = ShardedGroupTrainer(run, _tables(), FEATURE_MAP, MODEL, mesh=mesh)
    rng = np.random.default_rng(3)
    tr.train_step(_batch(rng))
    tr.flush()
    c = tr.counters()
    for n in ("user", "item"):
        assert "evictions" in c[n] and "capacity" in c[n]

def _promote_tables():
    return {
        "user": TableConfig(
            dim=16, capacity=1 << 12, initializer_scale=0.02,
            optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.05),
        ),
        "item": TableConfig(
            dim=8, capacity=1 << 12, initializer_scale=0.02,
            policy=PolicyConfig(evict_policy="ttl", ttl_steps=3,
                                max_evict_per_pass=1 << 10),
        ),
    }


def _cold_batch(rng, item_ids, b=64):
    """Both item columns carry the given ids (shared-table dedup)."""
    return {
        "ids": np.stack(
            [rng.integers(0, 500, size=b), item_ids[:b], item_ids[:b]], axis=1
        ).astype(np.int64),
        "dense": rng.normal(size=(b, 4)).astype(np.float32),
        "label": rng.integers(0, 2, size=b).astype(np.float32),
    }


def test_group_evict_spill_promote_roundtrip():
    """A group member's cold tier must be bidirectional: evict -> spill ->
    re-touch -> promoted state bit-equal (value + freq), per member table."""
    from meepoembedding_tpu import checkpoint

    tables = _promote_tables()
    spill = _spill_for(tables, ["item"])
    run = RunConfig(batch_size=64, steps=2, dense_learning_rate=3e-3)
    tr = GroupTrainer(run, tables, FEATURE_MAP, MODEL, spill=spill)
    rng = np.random.default_rng(7)
    cold = np.arange(1, 65, dtype=np.int64) * 7919

    def state():
        arrs = checkpoint.export_shard_arrays(tr.specs["item"], tr.shards["item"])
        return {
            int(k): (arrs["values"][j].copy(), int(arrs["freq"][j]))
            for j, k in enumerate(arrs["ids"])
        }

    for _ in range(2):
        tr.train_step(_cold_batch(rng, cold))
    before = state()
    assert set(before) == set(map(int, cold))

    hot = np.arange(1, 65, dtype=np.int64) * 104729 + 10**12
    for _ in range(5):
        tr.train_step(_cold_batch(rng, hot))
    out = tr.maintenance()
    assert out["item"]["evicted"] >= len(cold)
    _, found = spill["item"].lookup_batch(cold)
    assert found.all()

    tr.train_step(_cold_batch(rng, cold))  # misses feed the item promoter
    tr._promoters["item"].flush()
    out = tr.maintenance()
    assert out["item"]["promoted"] >= len(cold)
    assert out["user"]["promoted"] == 0
    after = state()
    for k in map(int, cold):
        np.testing.assert_array_equal(after[k][0], before[k][0])
        assert after[k][1] == before[k][1]
    assert tr.counters()["item"]["promotes"] >= len(cold)
    _, found = spill["item"].lookup_batch(cold)
    assert not found.any()  # promoted rows were erased from the cold tier


def test_sharded_group_evict_spill_promote_roundtrip(mesh):
    """Same roundtrip with the member sharded over the mesh: the step exports
    owner-side miss sets, maintenance drains promotions into owner shards."""
    from meepoembedding_tpu import checkpoint
    from meepoembedding_tpu.parallel.trainer import addressable_shard_trees

    tables = _promote_tables()
    spec_probe = TableSpec.from_config(tables["item"], num_shards=8)
    spill = {"item": make_backend("host", width=SpillCodec(spec_probe).width)}
    run = RunConfig(batch_size=64, steps=2, dense_learning_rate=3e-3,
                    pipeline_depth=2)
    tr = ShardedGroupTrainer(run, tables, FEATURE_MAP, MODEL, mesh=mesh,
                             spill=spill)
    rng = np.random.default_rng(8)
    cold = np.arange(1, 65, dtype=np.int64) * 7919

    def state():
        out = {}
        for sh in addressable_shard_trees(tr.stacked["item"]).values():
            arrs = checkpoint.export_shard_arrays(tr.specs["item"], sh)
            for j, k in enumerate(arrs["ids"]):
                out[int(k)] = (arrs["values"][j].copy(), int(arrs["freq"][j]))
        return out

    for _ in range(2):
        tr.train_step(_cold_batch(rng, cold))
    tr.flush()
    before = state()
    assert set(before) == set(map(int, cold))

    hot = np.arange(1, 65, dtype=np.int64) * 104729 + 10**12
    for _ in range(5):
        tr.train_step(_cold_batch(rng, hot))
    out = tr.maintenance()
    assert out["item"]["evicted"] >= len(cold)
    _, found = spill["item"].lookup_batch(cold)
    assert found.all()

    tr.train_step(_cold_batch(rng, cold))
    tr.flush()  # retire feeds the promoter
    tr._promoters["item"].flush()
    gate_before = tr._live_upper["item"]
    out = tr.maintenance()
    assert out["item"]["promoted"] >= len(cold)
    assert tr._live_upper["item"] >= gate_before + out["item"]["promoted"]
    after = state()
    for k in map(int, cold):
        np.testing.assert_array_equal(after[k][0], before[k][0])
        assert after[k][1] == before[k][1]
    assert tr.counters()["item"]["promotes"] >= len(cold)
    _, found = spill["item"].lookup_batch(cold)
    assert not found.any()


def test_group_remove_member_keys():
    """remove(name, ids): erased keys free their slots in exactly that
    member; absent keys are a no-op (TF lookuptable remove semantics)."""
    tables = _promote_tables()
    run = RunConfig(batch_size=64, steps=2, dense_learning_rate=3e-3)
    tr = GroupTrainer(run, tables, FEATURE_MAP, MODEL)
    rng = np.random.default_rng(11)
    ids = np.arange(1, 65, dtype=np.int64) * 31
    for _ in range(2):
        tr.train_step(_cold_batch(rng, ids))
    rows0 = tr.counters()["item"]["rows"]
    user_rows0 = tr.counters()["user"]["rows"]
    removed = tr.remove("item", ids[:32])
    assert removed == 32
    assert tr.counters()["item"]["rows"] == rows0 - 32
    assert tr.counters()["user"]["rows"] == user_rows0
    assert tr.remove("item", np.array([10**15], np.int64)) == 0


def test_sharded_group_remove_member_keys(mesh):
    tables = _promote_tables()
    run = RunConfig(batch_size=64, steps=2, dense_learning_rate=3e-3,
                    pipeline_depth=2)
    tr = ShardedGroupTrainer(run, tables, FEATURE_MAP, MODEL, mesh=mesh)
    rng = np.random.default_rng(12)
    ids = np.arange(1, 65, dtype=np.int64) * 31
    for _ in range(2):
        tr.train_step(_cold_batch(rng, ids))
    rows0 = tr.counters()["item"]["rows"]
    removed = tr.remove("item", ids[:32])
    assert removed == 32
    assert tr.counters()["item"]["rows"] == rows0 - 32
    # removed ids re-insert cleanly on next touch
    tr.train_step(_cold_batch(rng, ids))
    tr.flush()
    assert tr.counters()["item"]["rows"] == rows0


@pytest.mark.parametrize("sharded", [False, True])
def test_group_lifecycle_fuzz(sharded, mesh):
    """Randomized interleaving of train / maintenance (evict+spill+promote) /
    remove / growth / save+restore on a heterogeneous group: catches
    cross-feature interactions (remove -> reinsert, evict -> promote ->
    grow, restore -> continue) that the per-feature tests cannot. Structural
    invariants checked after every op; restore must preserve per-table rows
    and scores bit-stably."""
    import tempfile

    rng = np.random.default_rng(31337)
    tables = {
        "user": TableConfig(
            dim=16, capacity=1 << 9, grow_at_load=0.7, initializer_scale=0.02,
            optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.05),
        ),
        "item": TableConfig(
            dim=8, capacity=1 << 10, initializer_scale=0.02,
            policy=PolicyConfig(evict_policy="lfu_ttl", ttl_steps=4,
                                max_evict_per_pass=1 << 9),
        ),
    }
    spill = _spill_for(tables, ["item"])
    run = RunConfig(batch_size=64, steps=40, dense_learning_rate=3e-3,
                    pipeline_depth=2 if sharded else 0)

    def build():
        if sharded:
            return ShardedGroupTrainer(run, dict(tables), FEATURE_MAP, MODEL,
                                       mesh=mesh, spill=dict(spill))
        return GroupTrainer(run, dict(tables), FEATURE_MAP, MODEL,
                            spill=dict(spill))

    tr = build()
    n_ops = 24 if sharded else 48

    def batch():
        return {
            "ids": np.stack([
                rng.integers(0, 3000, size=64),           # growable member
                rng.integers(0, 600, size=64),
                rng.integers(0, 600, size=64),
            ], axis=1).astype(np.int64),
            "dense": rng.normal(size=(64, 4)).astype(np.float32),
            "label": rng.integers(0, 2, size=64).astype(np.float32),
        }

    def check():
        c = tr.counters()
        for n in ("user", "item"):
            assert 0 <= c[n]["rows"] <= c[n]["capacity"], c
            assert c[n]["inserts"] >= c[n]["rows"] - c[n]["promotes"], c
        return c

    with tempfile.TemporaryDirectory() as d:
        for i in range(n_ops):
            op = rng.choice(["train", "train", "train", "maint", "remove",
                             "ckpt"])
            if op == "train":
                tr.train_step(batch())
            elif op == "maint":
                out = tr.maintenance()
                assert set(out) == {"user", "item"}
            elif op == "remove":
                ids = rng.integers(0, 600, size=16).astype(np.int64)
                before = check()["item"]["rows"]
                removed = tr.remove("item", np.unique(ids))
                assert check()["item"]["rows"] == before - removed
            else:
                if hasattr(tr, "flush"):
                    tr.flush()
                tr.save_checkpoint(d)
                rows_before = {n: c["rows"] for n, c in tr.counters().items()}
                tr = build()
                tr.load_checkpoint(d)
                rows_after = {n: c["rows"] for n, c in tr.counters().items()}
                assert rows_after == rows_before
            check()
        # the table still trains after the whole gauntlet
        out = tr.train_step(batch())
        if hasattr(tr, "flush"):
            tr.flush()
            assert np.isfinite(tr._last_loss)
        else:
            assert np.isfinite(out["loss"])
