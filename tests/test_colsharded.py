"""Column-sharded (row x dim) table parallelism (SURVEY.md §2
"Column-sharding of dim"): 2-D sharded training must track single-device
training, column shards must stay in deterministic lockstep, and the
lane-offset initializer must tile the full-dim init bit-exactly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meepoembedding_tpu.config import ModelConfig, OptimizerConfig, RunConfig, TableConfig
from meepoembedding_tpu.data.synthetic import SyntheticConfig, SyntheticStream
from meepoembedding_tpu.parallel.colsharded import (
    ColShardedTrainer,
    col_local_spec,
    make_mesh2d,
)
from meepoembedding_tpu.table import hashing
from meepoembedding_tpu.train import Trainer


@pytest.fixture(scope="module")
def mesh2x2():
    assert jax.device_count() >= 4, "conftest must provide 8 virtual devices"
    return make_mesh2d(2, 2)


def test_lane_offset_init_tiles_full_dim_exactly(rng):
    ids = rng.integers(0, 10**12, size=64, dtype=np.int64)
    hi, lo = hashing.split_ids(ids)
    hi, lo = jnp.asarray(hi), jnp.asarray(lo)
    full = hashing.default_rows(hi, lo, 64, 0.02)
    blocks = [
        hashing.default_rows(hi, lo, 16, 0.02, lane_offset=off)
        for off in (0, 16, 32, 48)
    ]
    np.testing.assert_array_equal(np.asarray(full), np.concatenate(blocks, axis=1))


def _cfgs(dim):
    run = RunConfig(pipeline_depth=0, batch_size=128, steps=6, dense_learning_rate=3e-3, seed=5)
    table = TableConfig(
        dim=dim, capacity=1 << 14, initializer_scale=0.02,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.05),
    )
    model = ModelConfig(
        kind="ctr_mlp", num_dense_features=4, num_sparse_features=4,
        embedding_dim=dim, bottom_mlp=(16, dim), top_mlp=(32, 1),
    )
    data = SyntheticConfig(
        num_dense=4, num_sparse=4, batch_size=128, vocab_per_feature=500
    )
    return run, table, model, data


def test_colsharded_matches_single_device_training(mesh2x2):
    """2x2 (row x dim) training must track single-device full-dim training:
    same ids, same deterministic init (lane-offset), same rowwise-AdaGrad
    semantics (g2 psum over columns)."""
    run, table, model, data = _cfgs(dim=64)
    t1 = Trainer(run, table, model)
    t22 = ColShardedTrainer(run, table, model, mesh2x2)
    losses1, losses22, drops = [], [], 0
    for batch in SyntheticStream(data).batches(run.steps):
        losses1.append(t1.train_step(batch)["loss"])
        out = t22.train_step(batch)
        losses22.append(out["loss"])
        drops += out["route_drops"]
    assert drops == 0
    np.testing.assert_allclose(losses1, losses22, rtol=2e-3, atol=2e-4)
    # eval path too
    batch = next(iter(SyntheticStream(data).batches(1)))
    e1 = t1.eval_step(batch)["loss"]
    e22 = t22.eval_step(batch)["loss"]
    np.testing.assert_allclose(e1, e22, rtol=2e-3, atol=2e-4)


def test_colsharded_column_lockstep(mesh2x2):
    """Key/metadata planes and the rowwise accumulator must be BIT-identical
    across column chips after training (determinism replaces collectives);
    value planes must differ (they hold different lane blocks)."""
    run, table, model, data = _cfgs(dim=64)
    tr = ColShardedTrainer(run, table, model, mesh2x2)
    for batch in SyntheticStream(data).batches(4):
        tr.train_step(batch)
    st = jax.device_get(tr.stacked)
    for s in range(tr.S):
        np.testing.assert_array_equal(st.key_hi[s, 0], st.key_hi[s, 1])
        np.testing.assert_array_equal(st.key_lo[s, 0], st.key_lo[s, 1])
        np.testing.assert_array_equal(st.cnt[s, 0], st.cnt[s, 1])
        np.testing.assert_array_equal(st.freq[s, 0], st.freq[s, 1])
        # full-row accumulator semantics -> identical across columns
        np.testing.assert_allclose(
            st.opt_rowwise[0][s, 0], st.opt_rowwise[0][s, 1], rtol=1e-6
        )
        # live columns hold DIFFERENT lane blocks of the same rows
        if st.cnt[s, 0].sum() > 0:
            assert not np.array_equal(st.values[s, 0], st.values[s, 1])


def test_col_local_spec_geometry():
    table = TableConfig(dim=256, capacity=1 << 14, initializer_scale=0.02)
    from meepoembedding_tpu.table.layout import TableSpec

    spec = TableSpec.from_config(table, num_shards=2)
    spec_l = col_local_spec(spec, 4)
    assert spec_l.dim == 64
    assert spec_l.init_lane_axis == "c"
    # value storage shrinks by C, key planes unchanged
    assert spec_l.value_rows * 4 == spec.value_rows
    assert spec_l.num_buckets == spec.num_buckets


def test_colsharded_checkpoint_roundtrip_and_elastic(mesh2x2, tmp_path):
    """2-D checkpoints are canonical full-dim: (2x2) save restores (a) onto
    the same grid bit-exactly, (b) onto a single full-dim device, (c) a 1-D
    single-device checkpoint restores onto the 2-D grid."""
    run, table, model, data = _cfgs(dim=64)
    tr = ColShardedTrainer(run, table, model, mesh2x2)
    batches = list(SyntheticStream(data).batches(4))
    for b in batches:
        tr.train_step(b)
    ck = str(tmp_path / "ck2d")
    m = tr.save_checkpoint(ck)
    assert m["col_shards"] == 2 and m["dim"] == 64

    # (b) full-dim single-device restore reads the merged rows (compare
    # evals BEFORE any further training mutates tr)
    t1 = Trainer(run, table, model)
    t1.load_checkpoint(ck)
    assert t1.step == m["step"]
    e1 = t1.eval_step(batches[1])["loss"]
    e2 = tr.eval_step(batches[1])["loss"]
    np.testing.assert_allclose(e1, e2, rtol=2e-3, atol=2e-4)

    # (a) same-grid roundtrip: bit-exact resume (losses identical afterwards)
    tr2 = ColShardedTrainer(run, table, model, mesh2x2)
    tr2.load_checkpoint(ck)
    assert tr2.step == tr.step and len(tr2) == len(tr)
    l1 = tr.train_step(batches[0])["loss"]
    l2 = tr2.train_step(batches[0])["loss"]
    np.testing.assert_allclose(l1, l2, rtol=1e-6, atol=1e-7)

    # (c) 1-D checkpoint -> 2-D grid (lane_slice restore path)
    ck1 = str(tmp_path / "ck1d")
    t1.save_checkpoint(ck1)
    tr3 = ColShardedTrainer(run, table, model, mesh2x2)
    tr3.load_checkpoint(ck1)
    assert len(tr3) == int(np.asarray(t1.shard.cnt).sum())  # rows preserved
    e3 = tr3.eval_step(batches[1])["loss"]
    np.testing.assert_allclose(e3, e1, rtol=2e-3, atol=2e-4)


def test_colsharded_restore_pregrows_and_seeds_gate(mesh2x2, tmp_path):
    """A growable 2-D trainer must pre-grow on load to fit the checkpoint's
    live set (advisor r3: it used to raise out of restore_shards) and seed
    the growth gate with the restored live count (advisor r3 high)."""
    run, table, model, data = _cfgs(dim=16)
    tr = ColShardedTrainer(run, table, model, mesh2x2)
    batches = list(SyntheticStream(data).batches(6))
    for b in batches:
        tr.train_step(b)
    live = len(tr)
    assert live > 512
    ck = str(tmp_path / "ck")
    tr.save_checkpoint(ck)

    small = dataclasses.replace(table, capacity=1 << 8, grow_at_load=0.7)
    tr2 = ColShardedTrainer(run, small, model, mesh2x2)
    tr2.load_checkpoint(ck)  # must pre-grow, not raise
    assert tr2.spec.capacity > 1 << 8
    assert len(tr2) == live
    assert tr2._live_upper == live
    e1 = tr.eval_step(batches[1])["loss"]
    e2 = tr2.eval_step(batches[1])["loss"]
    np.testing.assert_allclose(e2, e1, rtol=2e-3, atol=2e-4)


def test_colsharded_eviction_lockstep(mesh2x2):
    """TTL eviction on the 2-D grid: columns evict the same rows in
    lockstep, and every (s, c) shard stays invariant-clean."""
    from meepoembedding_tpu.config import PolicyConfig
    from meepoembedding_tpu.parallel.colsharded import addressable_shard_trees2
    from meepoembedding_tpu.table import xla_ops
    from meepoembedding_tpu.table.layout import TableShard

    run, table, model, data = _cfgs(dim=64)
    table = dataclasses.replace(
        table, policy=PolicyConfig(evict_policy="ttl", ttl_steps=2)
    )
    tr = ColShardedTrainer(run, table, model, mesh2x2)
    batches = list(SyntheticStream(data).batches(6))
    for b in batches[:4]:
        tr.train_step(b)
    rows_before = len(tr)
    tr.step += 10  # age everything past the TTL
    out = tr.maintenance()
    assert out["evicted"] > 0
    assert rows_before - len(tr) == out["evicted"]
    st = jax.device_get(tr.stacked)
    for s in range(tr.S):
        np.testing.assert_array_equal(st.cnt[s, 0], st.cnt[s, 1])
        np.testing.assert_array_equal(st.key_hi[s, 0], st.key_hi[s, 1])
    for (s, c), shard_np in addressable_shard_trees2(tr.stacked).items():
        shard_dev = jax.tree.map(jnp.asarray, TableShard(*shard_np))
        viol = jax.jit(xla_ops.check_invariants, static_argnums=(0,))(
            tr.spec_local, shard_dev
        )
        assert all(int(v) == 0 for v in viol.values()), (s, c, viol)
    # training continues cleanly after eviction (slots get re-inserted)
    tr.train_step(batches[4])


def test_colsharded_multihot(mesh2x2):
    """Multi-hot bags through the 2-D (row x dim) trainer: pooled lookups
    train without drops and logits stay finite."""
    run = RunConfig(pipeline_depth=0, batch_size=256, steps=4, dense_learning_rate=3e-3)
    table = TableConfig(dim=16, capacity=1 << 13)
    model = ModelConfig(
        kind="ctr_mlp", num_dense_features=4, num_sparse_features=4,
        embedding_dim=16, bottom_mlp=(16, 16), top_mlp=(16, 1),
        combiner="mean",
    )
    data = SyntheticConfig(
        num_dense=4, num_sparse=4, batch_size=256, vocab_per_feature=500,
        bag_len=3,
    )
    run = RunConfig(pipeline_depth=0, batch_size=256, steps=4, dense_learning_rate=3e-3,
                    unique_cap=256 // mesh2x2.shape["d"] * 4 * 3)
    tr = ColShardedTrainer(run, table, model, mesh=mesh2x2)
    for batch in SyntheticStream(data).batches(run.steps):
        out = tr.train_step(batch)
    assert out["route_drops"] == 0
    assert np.isfinite(out["loss"])
    assert np.isfinite(tr.auc.compute())


@pytest.mark.slow
def test_colsharded_online_growth(mesh2x2):
    """2-D growth: each (row, col) shard doubles locally; key planes stay
    lockstep across columns (slot planning is deterministic in the keys),
    no id ever drops, training continues after regrowth."""
    run = RunConfig(pipeline_depth=0, batch_size=128, steps=4, dense_learning_rate=3e-3)
    table = TableConfig(dim=16, capacity=1 << 11, grow_at_load=0.7)
    model = ModelConfig(
        kind="ctr_mlp", num_dense_features=4, num_sparse_features=4,
        embedding_dim=16, bottom_mlp=(16, 16), top_mlp=(16, 1),
    )
    data = SyntheticConfig(
        num_dense=4, num_sparse=4, batch_size=128, vocab_per_feature=3000,
        zipf_a=1.01, seed=3,
    )
    tr = ColShardedTrainer(run, table, model, mesh=mesh2x2)
    cap0 = tr.spec.capacity
    seen = set()
    for batch in SyntheticStream(data).batches(run.steps):
        tr.train_step(batch)
        seen.update(np.asarray(batch["ids"]).reshape(-1).tolist())
    assert tr.spec.capacity > cap0
    c = tr.counters()
    assert c["drops"] == 0 and c["route_drops"] == 0
    kh = np.asarray(jax.device_get(tr.stacked.key_hi))  # [S, C, nb, 128]
    np.testing.assert_array_equal(kh[:, 0], kh[:, 1])  # columns lockstep
    live = int(np.asarray(jax.device_get(tr.stacked.cnt)).sum()) // 2
    assert live == len(seen)


def test_colsharded_remove_keys(mesh2x2):
    """remove() on the 2-D layout: keys erase on their owner row shard in
    column lockstep; freed slots re-insert cleanly on the next touch."""
    run, table, model, data = _cfgs(dim=64)
    tr = ColShardedTrainer(run, table, model, mesh2x2)
    stream = SyntheticStream(data)
    batches = list(stream.batches(3))
    for b in batches[:2]:
        tr.train_step(b)
    tr.flush()
    ids = np.unique(np.asarray(batches[0]["ids"]).reshape(-1))[:40]
    removed = tr.remove(ids)
    assert removed == len(ids)
    assert tr.remove(np.array([10**15], np.int64)) == 0
    # column planes remain in lockstep after the erase (key planes identical)
    from meepoembedding_tpu.parallel.colsharded import addressable_shard_trees2

    by_sc = addressable_shard_trees2(tr.stacked)
    for s in range(2):
        k0 = np.asarray(by_sc[(s, 0)].key_hi)
        k1 = np.asarray(by_sc[(s, 1)].key_hi)
        np.testing.assert_array_equal(k0, k1)
    # removed ids re-insert on next touch without drops
    out = tr.train_step(batches[0])
    tr.flush()
    assert tr._last["route_drops"] == 0


def test_colsharded_evict_spill_promote_roundtrip(mesh2x2, rng):
    """2-D cold tier is bidirectional and CANONICAL: evicted rows spill as
    merged full-dim payloads; a re-touch promotes them back with every
    column chip restoring its own lane block — value + freq + accumulator
    bit-equal to the pre-eviction state."""
    from meepoembedding_tpu import checkpoint
    from meepoembedding_tpu.backends import make_backend
    from meepoembedding_tpu.config import PolicyConfig
    from meepoembedding_tpu.parallel.colsharded import addressable_shard_trees2
    from meepoembedding_tpu.table.layout import TableSpec
    from meepoembedding_tpu.tiering import SpillCodec

    run, table, model, data = _cfgs(dim=64)
    table = dataclasses.replace(
        table,
        policy=PolicyConfig(evict_policy="ttl", ttl_steps=3,
                            max_evict_per_pass=1 << 10),
    )
    spill = make_backend(
        "python", width=SpillCodec(TableSpec.from_config(table)).width
    )
    tr = ColShardedTrainer(run, table, model, mesh2x2, spill=spill)

    def batch(ids_pool):
        return {
            "ids": rng.choice(ids_pool, size=(128, 4)).astype(np.int64),
            "dense": rng.normal(size=(128, 4)).astype(np.float32),
            "label": rng.integers(0, 2, size=128).astype(np.float32),
        }

    def state():
        """id -> (full-dim value row, freq, accum) merged across columns."""
        by_sc = addressable_shard_trees2(tr.stacked)
        cols = {}
        for (s, c), sh in sorted(by_sc.items()):
            arrs = checkpoint.export_shard_arrays(tr.spec_local, sh)
            for j, k in enumerate(arrs["ids"]):
                ent = cols.setdefault(int(k), {})
                ent[c] = (arrs["values"][j], int(arrs["freq"][j]),
                          float(arrs["accum"][j]))
        out = {}
        for k, by_c in cols.items():
            assert len(by_c) == 2 and by_c[0][1:] == by_c[1][1:]
            out[k] = (np.concatenate([by_c[0][0], by_c[1][0]]),) + by_c[0][1:]
        return out

    cold = np.arange(1, 97, dtype=np.int64) * 7919
    for _ in range(2):
        tr.train_step(batch(cold))
    tr.flush()
    before = state()
    assert set(before) == set(map(int, cold))

    hot = np.arange(1, 97, dtype=np.int64) * 104729 + 10**12
    for _ in range(5):
        tr.train_step(batch(hot))
    out = tr.maintenance()
    assert out["evicted"] >= len(cold)
    assert out["spilled"] == out["evicted"] and len(spill) == out["spilled"]
    keys, payload = next(iter(spill.export()))
    assert payload.shape[1] == SpillCodec(TableSpec.from_config(table)).width
    _, found = spill.lookup_batch(cold)
    assert found.all()

    tr.train_step(batch(cold))  # misses feed the promoter (column 0)
    tr.flush()
    tr._promoter.flush()
    gate_before = tr._live_upper
    out = tr.maintenance()
    assert out["promoted"] >= len(cold)
    assert tr._live_upper >= gate_before + out["promoted"]
    after = state()
    for k in map(int, cold):
        np.testing.assert_array_equal(after[k][0], before[k][0])
        assert after[k][1] == before[k][1]
        assert after[k][2] == before[k][2]
    assert tr.counters()["promotes"] >= len(cold)
    _, found = spill.lookup_batch(cold)
    assert not found.any()  # promoted rows were erased from the cold tier
