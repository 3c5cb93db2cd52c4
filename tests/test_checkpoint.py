"""Elastic checkpoint/restore tests (SURVEY.md C19, §3.5, §4.4; BASELINE
config 5 "elastic checkpoint/restore")."""

import numpy as np
import pytest

from meepoembedding_tpu import checkpoint
from meepoembedding_tpu.config import (
    ModelConfig,
    OptimizerConfig,
    PolicyConfig,
    RunConfig,
    TableConfig,
)
from meepoembedding_tpu.table import hashing
from meepoembedding_tpu.table.layout import TableSpec
from meepoembedding_tpu.table.runtime import DynamicEmbeddingTable


def _trained_table(opt_kind="rowwise_adagrad", n_ids=500, dim=16, steps=3, seed=0,
                   value_dtype="float32"):
    rng = np.random.default_rng(seed)
    cfg = TableConfig(
        dim=dim,
        capacity=1 << 12,
        optimizer=OptimizerConfig(kind=opt_kind, learning_rate=0.05),
        policy=PolicyConfig(evict_policy="lfu_ttl", ttl_steps=1000),
        value_dtype=value_dtype,
    )
    t = DynamicEmbeddingTable(cfg)
    ids = rng.integers(-(2**62), 2**62, size=n_ids, dtype=np.int64)
    for _ in range(steps):
        batch = rng.choice(ids, size=256)
        rows = t.lookup(batch, train=True)
        t.apply_grads(np.asarray(rows) * 0.01 + 0.001)
    return t, ids


def _table_state(t):
    """(id -> (value row, freq, accum)) of every live row, via export."""
    out = {}
    for ids, rows, freq, accum in t.export_items():
        for i, k in enumerate(ids):
            out[int(k)] = (rows[i].copy(), int(freq[i]), float(accum[i]))
    return out


@pytest.mark.parametrize("opt_kind", ["rowwise_adagrad", "adam"])
def test_save_load_roundtrip(tmp_path, opt_kind):
    t, _ = _trained_table(opt_kind)
    before = _table_state(t)
    assert len(before) > 100
    t.save(str(tmp_path / "ckpt"))

    t2 = DynamicEmbeddingTable(t.cfg)
    manifest = t2.load(str(tmp_path / "ckpt"))
    assert manifest["step"] == t.step
    after = _table_state(t2)
    assert set(after) == set(before)
    for k in before:
        # bit-exact: table writes combine on the exact integer byte-plane path
        np.testing.assert_array_equal(after[k][0], before[k][0])
        assert after[k][1] == before[k][1]  # freq
        np.testing.assert_array_equal(after[k][2], before[k][2])  # accum


@pytest.mark.parametrize("value_dtype,dim", [("bfloat16", 16), ("float32", 256)])
def test_save_load_roundtrip_dtypes_and_widedim(tmp_path, value_dtype, dim):
    """VERDICT r1 #8: bf16 planes and dim>128 (rows_per_slot>1) must survive
    checkpoint save/load with identical state."""
    t, _ = _trained_table(n_ids=200, dim=dim, value_dtype=value_dtype)
    before = _table_state(t)
    assert len(before) > 100
    t.save(str(tmp_path / "ckpt"))
    t2 = DynamicEmbeddingTable(t.cfg)
    t2.load(str(tmp_path / "ckpt"))
    after = _table_state(t2)
    assert set(after) == set(before)
    for k in before:
        np.testing.assert_array_equal(after[k][0], before[k][0])
        assert after[k][1] == before[k][1]
        np.testing.assert_array_equal(after[k][2], before[k][2])


def test_fulldim_slots_roundtrip(tmp_path):
    """Adam moments (full-dim optimizer slots) survive save/load exactly."""
    t, _ = _trained_table("adam")
    arrs = checkpoint.export_shard_arrays(t.spec, t.shard)
    assert "full0" in arrs and "full1" in arrs
    assert np.abs(arrs["full0"]).max() > 0  # moments actually trained
    t.save(str(tmp_path / "c"))
    t2 = DynamicEmbeddingTable(t.cfg)
    t2.load(str(tmp_path / "c"))
    a2 = checkpoint.export_shard_arrays(t2.spec, t2.shard)
    o1 = np.argsort(arrs["ids"])
    o2 = np.argsort(a2["ids"])
    np.testing.assert_array_equal(arrs["ids"][o1], a2["ids"][o2])
    np.testing.assert_array_equal(arrs["full0"][o1], a2["full0"][o2])
    np.testing.assert_array_equal(arrs["full1"][o1], a2["full1"][o2])


def test_training_continues_identically_after_restore(tmp_path):
    """Save/restore is transparent: N more steps after restore produce the
    same rows as N more steps without the round trip."""
    t, ids = _trained_table()
    t.save(str(tmp_path / "c"))
    rng = np.random.default_rng(99)
    batches = [rng.choice(ids, size=256) for _ in range(3)]

    def run_on(table):
        for b in batches:
            rows = table.lookup(b, train=True)
            table.apply_grads(np.asarray(rows) * 0.01)
        return np.asarray(table.lookup(ids[:200], train=False))

    expect = run_on(t)
    t2 = DynamicEmbeddingTable(t.cfg)
    t2.load(str(tmp_path / "c"))
    got = run_on(t2)
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-8)


def test_elastic_reshard_1_to_4_to_1(tmp_path):
    """A checkpoint written with one shard restores onto 4 shards and back,
    preserving every row exactly (rehash-reshard, §3.5)."""
    t, _ = _trained_table(n_ids=800)
    before = _table_state(t)
    t.save(str(tmp_path / "c1"))

    spec4 = TableSpec.from_config(t.cfg, num_shards=4)
    shards, m = checkpoint.restore_shards(spec4, str(tmp_path / "c1"), 4)
    assert m["num_shards"] == 1
    # each key landed on exactly its owner shard
    total = 0
    for s, shard in enumerate(shards):
        arrs = checkpoint.export_shard_arrays(spec4, shard)
        total += len(arrs["ids"])
        if len(arrs["ids"]):
            hi, lo = hashing.split_ids(arrs["ids"])
            import jax.numpy as jnp
            owner = np.asarray(hashing.owner_of(jnp.asarray(hi), jnp.asarray(lo), 4))
            assert (owner == s).all()
    assert total == len(before)
    checkpoint.save(str(tmp_path / "c4"), spec4, shards, step=m["step"])

    t3 = DynamicEmbeddingTable(t.cfg)
    t3.load(str(tmp_path / "c4"))
    after = _table_state(t3)
    assert set(after) == set(before)
    for k in before:
        np.testing.assert_array_equal(after[k][0], before[k][0])
        assert after[k][1] == before[k][1]


def test_sharded_trainer_checkpoint_elastic(tmp_path):
    """ShardedTrainer: save on an 8-device mesh, restore onto a 2-device
    mesh; dense params and every table row carry over; training resumes."""
    import jax

    from meepoembedding_tpu.parallel.mesh import make_mesh
    from meepoembedding_tpu.parallel.trainer import ShardedTrainer

    rng = np.random.default_rng(0)
    run = RunConfig(batch_size=64, steps=2)
    table = TableConfig(dim=8, capacity=1 << 12)
    model = ModelConfig(
        kind="ctr_mlp", num_dense_features=4, num_sparse_features=3,
        embedding_dim=8, top_mlp=(16, 1),
    )

    def batch():
        return {
            "dense": rng.normal(size=(64, 4)).astype(np.float32),
            "ids": rng.integers(0, 4000, size=(64, 3), dtype=np.int64),
            "label": (rng.random(64) < 0.3).astype(np.float32),
        }

    tr = ShardedTrainer(run, table, model, mesh=make_mesh(8))
    for _ in range(3):
        tr.train_step(batch())
    n_before = len(tr)
    c_before = tr.counters()
    tr.save_checkpoint(str(tmp_path / "ck"), extras={"note": "e2e"})

    tr2 = ShardedTrainer(run, table, model, mesh=make_mesh(2))
    m = tr2.load_checkpoint(str(tmp_path / "ck"))
    assert m["extras"]["note"] == "e2e"
    assert tr2.step == tr.step
    assert len(tr2) == n_before
    # dense params identical
    p1 = jax.tree_util.tree_leaves(tr.params)
    p2 = jax.tree_util.tree_leaves(tr2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)
    # identical eval on both meshes for the same batch
    b = batch()
    e1 = tr.eval_step(b)
    e2 = tr2.eval_step(b)
    np.testing.assert_allclose(e1["loss"], e2["loss"], rtol=1e-4)
    # training continues
    tr2.train_step(batch())
    assert all(np.isfinite(l) for _, l in tr2.flush())


def test_corrupt_save_never_clobbers(tmp_path):
    """The manifest is the commit point: a save that dies mid-way leaves the
    previous checkpoint loadable."""
    t, _ = _trained_table(n_ids=100)
    p = str(tmp_path / "c")
    t.save(p)
    before = _table_state(t)
    # simulate a crashed SECOND save: a partial new generation dir appears
    # (garbage shard file) but the manifest is never updated — the committed
    # generation must stay untouched and loadable
    import os

    os.makedirs(os.path.join(p, "step-999"), exist_ok=True)
    with open(os.path.join(p, "step-999", "shard-00000.npz"), "wb") as f:
        f.write(b"garbage")
    with open(os.path.join(p, ".tmp-ckpt-dead"), "wb") as f:
        f.write(b"garbage")
    t2 = DynamicEmbeddingTable(t.cfg)
    t2.load(p)
    after = _table_state(t2)
    assert set(after) == set(before)


def test_resave_same_step_keeps_checkpoint_loadable(tmp_path):
    """Re-saving at the same step lands in a fresh generation (never clobbers
    the live one in place) and the result still restores."""
    t, ids = _trained_table(n_ids=64)
    p = str(tmp_path / "c2")
    t.save(p)
    t.save(p)  # same step again
    import json, os

    with open(os.path.join(p, "manifest.json")) as f:
        m = json.load(f)
    assert m["dir"].startswith("step-")
    t2 = DynamicEmbeddingTable(t.cfg)
    t2.load(p)
    assert set(_table_state(t2)) == set(_table_state(t))


# --- async checkpointing (checkpoint.AsyncCheckpointer) ------------------------


def _async_trainer(steps=5):
    from meepoembedding_tpu.train import Trainer

    rc = RunConfig(batch_size=128, steps=steps, dense_learning_rate=1e-3)
    tc = TableConfig(
        dim=16, capacity=1 << 12,
        optimizer=OptimizerConfig(kind="rowwise_adagrad", learning_rate=0.05),
    )
    mc = ModelConfig(
        kind="ctr_mlp", num_dense_features=4, num_sparse_features=3,
        embedding_dim=16, top_mlp=(16, 1),
    )
    tr = Trainer(rc, tc, mc)
    rng = np.random.default_rng(0)
    for _ in range(steps):
        tr.train_step({
            "ids": rng.integers(0, 5000, size=(128, 3)).astype(np.int64),
            "dense": rng.normal(size=(128, 4)).astype(np.float32),
            "label": rng.integers(0, 2, size=128).astype(np.float32),
        })
    return tr


def test_async_save_matches_sync(tmp_path):
    """An async save (snapshot on the caller thread, writes in background)
    must produce a checkpoint bit-identical in content to a sync save of the
    same state."""
    tr = _async_trainer()
    pa, ps = str(tmp_path / "a"), str(tmp_path / "s")
    tr.save_checkpoint(pa, async_=True)
    tr.save_checkpoint(ps)  # sync; joins the async save first
    tr.finish_saves()
    rows_a = {tuple(d["ids"]): d["values"] for d in checkpoint.iter_rows(pa)}
    rows_s = {tuple(d["ids"]): d["values"] for d in checkpoint.iter_rows(ps)}
    assert rows_a.keys() == rows_s.keys()
    for k in rows_a:
        np.testing.assert_array_equal(rows_a[k], rows_s[k])
    ma, ms = checkpoint.read_manifest(pa), checkpoint.read_manifest(ps)
    assert ma["counts"] == ms["counts"] and ma["step"] == ms["step"]


def test_async_save_snapshot_isolated_from_later_steps(tmp_path):
    """The snapshot is taken at save() time: training steps that run while
    the background write is in flight must not leak into the checkpoint."""
    tr = _async_trainer()
    p = str(tmp_path / "snap")
    step_at_save = tr.step
    tr.save_checkpoint(p, async_=True)
    rng = np.random.default_rng(99)
    for _ in range(3):  # mutate state while the write may still be running
        tr.train_step({
            "ids": rng.integers(6000, 9000, size=(128, 3)).astype(np.int64),
            "dense": rng.normal(size=(128, 4)).astype(np.float32),
            "label": rng.integers(0, 2, size=128).astype(np.float32),
        })
    tr.finish_saves()
    m = checkpoint.read_manifest(p)
    assert m["step"] == step_at_save


def test_async_save_failure_surfaces_on_wait(tmp_path):
    """A background write failure must raise on the next wait()/save(), not
    vanish silently."""
    tr = _async_trainer(steps=2)
    blocker = tmp_path / "blocked"
    blocker.write_text("not a directory")
    tr.save_checkpoint(str(blocker), async_=True)
    with pytest.raises(Exception):
        tr.finish_saves()
    # the checkpointer recovers: a later save to a good path works
    good = str(tmp_path / "good")
    tr.save_checkpoint(good, async_=True)
    tr.finish_saves()
    assert checkpoint.read_manifest(good)["step"] == tr.step


# --- streamed part files (VERDICT r2 #7) ---------------------------------------

def test_streamed_parts_and_resume(tmp_path, monkeypatch):
    """Small chunk_rows forces multiple part files per shard; an interrupted
    save (manifest never committed) resumes by SKIPPING existing parts, and a
    resume against a changed table aborts."""
    import os

    monkeypatch.setenv("MEEPO_CKPT_CHUNK_ROWS", "128")
    t, _ = _trained_table(n_ids=500)
    before = _table_state(t)
    path = str(tmp_path / "ck")
    t.save(path)
    m = checkpoint.read_manifest(path)
    gdir = os.path.join(path, m["dir"])
    parts = [f for f in os.listdir(gdir) if ".part" in f]
    assert len(parts) >= 2, parts  # actually chunked
    assert m["counts"][0] == len(before)

    # roundtrip across the part boundary is still bit-exact
    t2 = DynamicEmbeddingTable(t.cfg)
    t2.load(path)
    after = _table_state(t2)
    assert set(after) == set(before)
    for k in before:
        np.testing.assert_array_equal(after[k][0], before[k][0])

    # simulate an interrupted save of the NEXT step: pre-write two parts,
    # then run the full save — the existing parts must be reused untouched
    t.step += 1
    gen2 = os.path.join(path, f"step-{t.step}")
    os.makedirs(gen2)
    checkpoint.save_shard_streamed(gen2, 0, t.spec, t.shard, 128)
    names = sorted(f for f in os.listdir(gen2) if ".part" in f)
    keep, drop = names[:2], names[2:]
    for f in drop:
        os.unlink(os.path.join(gen2, f))
    mtimes = {f: os.path.getmtime(os.path.join(gen2, f)) for f in keep}
    t.save(path)
    for f, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(gen2, f)) == mt, (
            f"resume rewrote an existing part: {f}"
        )
    t3 = DynamicEmbeddingTable(t.cfg)
    t3.load(path)
    assert _table_state(t3).keys() == before.keys()

    # stale parts from a DIFFERENT table state must abort, not silently mix
    t4, _ = _trained_table(n_ids=300, seed=9)
    gen3 = os.path.join(path, "step-999")
    os.makedirs(gen3)
    checkpoint.save_shard_streamed(gen3, 0, t.spec, t.shard, 128)
    with pytest.raises(RuntimeError, match="resume mismatch"):
        checkpoint.save_shard_streamed(gen3, 0, t4.spec, t4.shard, 128)


def test_streamed_resume_rejects_chunk_size_change(tmp_path):
    """Parts cut at a different chunk_rows cover different row ranges, so a
    resume with a changed MEEPO_CKPT_CHUNK_ROWS must abort (advisor r3
    medium), and a completed save must delete stale higher-index parts a
    smaller-chunk attempt left behind (they would concatenate as extra
    rows)."""
    import os

    t, _ = _trained_table(n_ids=500)
    gen = str(tmp_path / "gen")
    os.makedirs(gen)
    # interrupted save at chunk 64: keep a valid prefix AND a stale tail part
    checkpoint.save_shard_streamed(gen, 0, t.spec, t.shard, 64)
    small_parts = sorted(f for f in os.listdir(gen) if ".part" in f)
    assert len(small_parts) >= 4
    for f in small_parts[1:-1]:
        os.unlink(os.path.join(gen, f))  # parts 0 and last remain

    # resume at a DIFFERENT chunk size sees part 0 and must abort
    with pytest.raises(RuntimeError, match="chunk_rows"):
        checkpoint.save_shard_streamed(gen, 0, t.spec, t.shard, 128)

    # fresh dir: complete a 128-chunk save next to a stale higher-index part
    gen2 = str(tmp_path / "gen2")
    os.makedirs(gen2)
    checkpoint.save_shard_streamed(gen2, 0, t.spec, t.shard, 64)
    n64 = len([f for f in os.listdir(gen2) if ".part" in f])
    for f in sorted(f for f in os.listdir(gen2) if ".part" in f):
        os.unlink(os.path.join(gen2, f))  # simulate only the tail surviving
    # plant a stale tail part beyond what a 128-chunk save writes
    stale = checkpoint._part_name(0, n64 - 1)
    with open(os.path.join(gen2, stale), "wb") as f:
        f.write(b"stale")
    n_live = checkpoint.save_shard_streamed(gen2, 0, t.spec, t.shard, 128)
    names = sorted(f for f in os.listdir(gen2) if ".part" in f)
    assert names == [
        checkpoint._part_name(0, p) for p in range(-(-n_live // 128))
    ], names  # stale tail removed; exactly the expected parts remain
    got = 0
    for f in names:
        with np.load(os.path.join(gen2, f)) as z:
            assert int(z["chunk_rows"]) == 128
            got += z["ids"].shape[0]
    assert got == n_live


def test_bf16_checkpoint_stores_raw_bits(tmp_path):
    """A bf16 table's values part files hold uint16 bit patterns (half the
    bytes), and the decode widens to exactly the on-device values."""
    import os

    t, _ = _trained_table(n_ids=300, value_dtype="bfloat16")
    before = _table_state(t)
    path = str(tmp_path / "ck")
    t.save(path)
    m = checkpoint.read_manifest(path)
    gdir = os.path.join(path, m["dir"])
    f = checkpoint._shard_files(gdir, 0)[0]
    with np.load(f) as z:
        assert "values@bf16" in z.files, z.files
        assert z["values@bf16"].dtype == np.uint16
    t2 = DynamicEmbeddingTable(t.cfg)
    t2.load(path)
    after = _table_state(t2)
    for k in before:
        np.testing.assert_array_equal(after[k][0], before[k][0])


def test_compressed_checkpoint_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("MEEPO_CKPT_COMPRESS", "1")
    t, _ = _trained_table(n_ids=300)
    before = _table_state(t)
    path = str(tmp_path / "ck")
    t.save(path)
    t2 = DynamicEmbeddingTable(t.cfg)
    t2.load(path)
    after = _table_state(t2)
    assert set(after) == set(before)
    for k in before:
        np.testing.assert_array_equal(after[k][0], before[k][0])


def test_counters_survive_save_restore(tmp_path):
    """Lifetime device counters travel with the checkpoint (r5): hits/misses/
    inserts/evictions history is re-seated on restore — including elastic
    N->M — and the restore's own insert churn is NOT counted as history."""
    import jax.numpy as jnp

    from meepoembedding_tpu import checkpoint
    from meepoembedding_tpu.config import OptimizerConfig, TableConfig
    from meepoembedding_tpu.table.layout import TableSpec
    from meepoembedding_tpu.table.runtime import DynamicEmbeddingTable

    cfg = TableConfig(
        dim=8, capacity=4096,
        optimizer=OptimizerConfig(kind="rowwise_adagrad"),
    )
    t = DynamicEmbeddingTable(cfg)
    ids = np.arange(1, 600, dtype=np.int64) * 7919
    for _ in range(3):
        t.lookup(ids, train=True)
        t.apply_grads(np.zeros((len(ids), 8), np.float32))
    before = t.counters()
    assert before["inserts"] > 0 and before["hits"] > 0
    t.save(str(tmp_path / "ck"))
    m = checkpoint.read_manifest(str(tmp_path / "ck"))
    assert "counters" in m and m["counters"][2] == before["inserts"]

    # same-shape restore: counters identical, restore churn invisible
    t2 = DynamicEmbeddingTable(cfg)
    t2.load(str(tmp_path / "ck"))
    after = t2.counters()
    for k in ("hits", "misses", "inserts", "evictions", "denied"):
        assert after[k] == before[k], (k, after, before)

    # elastic 1 -> 4 shards: global sum preserved (seated on shard 0)
    spec4 = TableSpec.from_config(cfg, num_shards=4)
    shards, m2 = checkpoint.restore_shards(spec4, str(tmp_path / "ck"), 4)
    total = np.sum([np.asarray(s.counters) for s in shards], axis=0)
    assert int(total[2]) == before["inserts"]
    assert int(total[0]) == before["hits"]
