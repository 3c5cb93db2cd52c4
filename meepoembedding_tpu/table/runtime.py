"""Table runtime (SURVEY.md C11): the logical `DynamicEmbeddingTable`.

Owns the static spec + device shard state, and exposes the composite ops the
training loop and serving path use. All heavy lifting is jitted and
functional; this object is a thin convenience wrapper holding the current
shard pytree (single-shard path — the distributed path lives in
`meepoembedding_tpu.parallel.sharded_table` and reuses the same primitives).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from meepoembedding_tpu.config import TableConfig
from meepoembedding_tpu.ops import dedup, optim
from meepoembedding_tpu.table import hashing, xla_ops
from meepoembedding_tpu.table.layout import (
    NUM_COUNTERS,
    TableShard,
    TableSpec,
    alloc_shard,
    live_mask,
    load_factor,
)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _lookup_train(spec, shard, hi, lo, step):
    uniq = dedup.unique_pairs(hi, lo, size=hi.shape[0])
    if spec.dim <= 128:  # fused window-space hot path (see xla_ops)
        shard, ctx = xla_ops.lookup_train(
            spec, shard, uniq.hi, uniq.lo, uniq.valid, step
        )
        # The convenience API guarantees "insert materializes the full row at
        # lookup" even if apply_grads is never called: write fresh inits now
        # (train.py/bench fold these into the update scatter instead).
        vrow = jnp.where(
            ctx.fresh, jnp.clip(ctx.slot, 0) // spec.pack, shard.values.shape[0]
        )
        values = shard.values.at[vrow].add(
            jnp.where(ctx.fresh[:, None], ctx.g128, 0).astype(shard.values.dtype),
            mode="drop",
        )
        opt_rowwise = shard.opt_rowwise
        if opt_rowwise:
            acc0 = jnp.full_like(ctx.sub, spec.optimizer.initial_accumulator, jnp.float32)
            opt_rowwise = (
                xla_ops.scatter_add_bucket_plane(
                    opt_rowwise[0], ctx.slot, acc0, ctx.fresh
                ),
            ) + opt_rowwise[1:]
        shard = shard._replace(values=values, opt_rowwise=opt_rowwise)
        sub_n = jnp.take(ctx.sub, uniq.inverse)
        rows = xla_ops.window_extract(spec, ctx.g128[uniq.inverse], sub_n).astype(
            spec.dtype
        )
        miss = uniq.valid & ~ctx.found
        return shard, rows, ctx, uniq.inverse, (uniq.hi, uniq.lo, miss)
    shard, slot, found = xla_ops.find_or_insert(
        spec, shard, uniq.hi, uniq.lo, uniq.valid, step
    )
    rows = xla_ops.lookup_rows_expand(spec, shard, slot, uniq.inverse)
    miss = uniq.valid & ~found
    return shard, rows, slot, uniq.inverse, (uniq.hi, uniq.lo, miss)


@partial(jax.jit, static_argnums=(0,))
def _lookup_infer(spec, shard, hi, lo):
    uniq = dedup.unique_pairs(hi, lo, size=hi.shape[0])
    pr = xla_ops.probe(spec, shard, uniq.hi, uniq.lo, uniq.valid)
    rows = xla_ops.lookup_rows(spec, shard, jnp.where(pr.found, pr.slot, -1))
    return rows[uniq.inverse]


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _apply_grads(spec, shard, ctx_or_slot, inverse, grads):
    if spec.dim <= 128:  # window-space path; fresh inits already written in
        # _lookup_train (convenience-API semantics), so NO ctx init folding
        ctx = ctx_or_slot
        sub_n = jnp.take(ctx.sub, inverse)
        g = xla_ops.segment_sum_grads_window(
            spec, grads, sub_n, inverse, ctx.slot.shape[0]
        )
        return optim.apply_sparse_grads_window(spec, shard, ctx.slot, g)
    slot = ctx_or_slot
    g = dedup.segment_sum_grads(grads, inverse, num_unique=slot.shape[0])
    return optim.apply_sparse_grads(spec, shard, slot, g)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _evict(spec, shard, step, off):
    return xla_ops.evict_pass(spec, shard, step, off)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _erase(spec, shard, hi, lo, valid):
    return xla_ops.erase_keys(spec, shard, hi, lo, valid)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _insert(spec, shard, hi, lo, rows, valid, step, freq, accum, fulldim=(),
            last=None):
    return xla_ops.insert_rows(
        spec, shard, hi, lo, rows, valid, step, freq, accum,
        fulldim=fulldim if fulldim else None, last=last,
    )


def regrow_shard(old_spec, new_spec, old_shard, step):
    """Rehash one shard's live rows (values + freq/last + optimizer slots)
    into a fresh shard of `new_spec` geometry. Host-streamed restore-style
    reinsert; cumulative counters carry over (growth is not an event reset).
    Shared by single-device growth (above) and the distributed lockstep
    growth (parallel/trainer.ShardedTrainer.grow)."""
    from meepoembedding_tpu import checkpoint

    new_shard = alloc_shard(new_spec)
    new_shard = new_shard._replace(counters=jnp.asarray(old_shard.counters))
    arrs = checkpoint.export_shard_arrays(old_spec, old_shard)
    del old_shard
    n = arrs["ids"].shape[0]
    n_full = new_spec.optimizer.num_fulldim_slots()
    b = 1 << 14
    for o in range(0, n, b):
        sl = slice(o, min(n, o + b))
        cnt = sl.stop - sl.start
        pad = b - cnt

        def pick(a, fill=0):
            x = a[sl]
            if pad:
                x = np.concatenate(
                    [x, np.full((pad,) + x.shape[1:], fill, x.dtype)]
                )
            return jnp.asarray(x)

        hi_np, lo_np = hashing.split_ids(arrs["ids"][sl])
        if pad:
            hi_np = np.concatenate([hi_np, np.full(pad, hashing.EMPTY_HI, np.int32)])
            lo_np = np.concatenate([lo_np, np.full(pad, hashing.EMPTY_LO, np.int32)])
        valid = jnp.arange(b) < cnt
        new_shard, _ok = _insert(
            new_spec, new_shard, jnp.asarray(hi_np), jnp.asarray(lo_np),
            pick(arrs["values"]), valid, jnp.int32(step),
            pick(arrs["freq"]),
            pick(arrs["accum"]) if "accum" in arrs else None,
            tuple(pick(arrs[f"full{j}"]) for j in range(n_full)),
            pick(arrs["last"]),
        )
    return new_shard


class DynamicEmbeddingTable:
    """Hash-keyed growable/evictable embedding table (README.md:2
    "dynamic lookuptable-style Embedding"), single-shard convenience API.

    >>> t = DynamicEmbeddingTable(TableConfig(dim=16, capacity=1 << 16))
    >>> rows = t.lookup(np.array([12, 34, 12]))        # trains: insert-on-miss
    >>> t.apply_grads(grads)                           # rowwise-AdaGrad update
    """

    def __init__(self, cfg: TableConfig, spill=None):
        self.cfg = cfg
        self.spec = TableSpec.from_config(cfg, num_shards=1)
        self.shard: TableShard = alloc_shard(self.spec)
        self.step = 0
        self.spill = spill  # optional KVBackend cold tier (SURVEY.md C10/§3.4)
        self._last_slots = None
        self._last_inverse = None
        self._last_n = None
        self._codec = None
        self._promoter = None
        if spill is not None:
            from meepoembedding_tpu.tiering import PromotionEngine, SpillCodec

            self._codec = SpillCodec(self.spec)
            assert spill.width == self._codec.width, (
                f"spill backend width {spill.width} != codec width "
                f"{self._codec.width} (dim + freq + optimizer slots)"
            )
            self._promoter = PromotionEngine(self._codec, spill)

    # --- online growth (SURVEY.md C11/M1: grow by rehash-into-bigger) -------
    def _maybe_grow(self, incoming: int) -> None:
        """Double capacity until the incoming batch fits under the growth
        load threshold. Pessimistic (counts every incoming id as a potential
        insert), so a burst of new ids can never be dropped for capacity."""
        if self.cfg.grow_at_load is None:
            return
        while (len(self) + incoming) > self.cfg.grow_at_load * self.spec.capacity:
            self._grow()

    def _grow(self) -> None:
        """Rehash every live row (values + freq/last + optimizer slots) into
        a table of twice the capacity. Host-streamed restore-style reinsert;
        peak memory is old + new shard for the duration of the copy."""
        import dataclasses

        old_spec, old_shard = self.spec, self.shard
        self.cfg = dataclasses.replace(self.cfg, capacity=old_spec.capacity * 2)
        self.spec = TableSpec.from_config(self.cfg, num_shards=1)
        self.shard = regrow_shard(old_spec, self.spec, old_shard, self.step)

    # --- host-facing API ---------------------------------------------------
    def lookup(self, ids64: np.ndarray, train: bool = True) -> jax.Array:
        """[n] int64 ids -> [n, dim] rows. train=True inserts on miss; with a
        spill tier, cold-tier hits promote back asynchronously (§3.4). With
        cfg.grow_at_load set, the table grows by rehash before a batch that
        could overflow it (SURVEY.md C11).

        Batches pad internally to the next power of two (invalid-sentinel
        lanes are inert end to end), so variable request sizes compile
        O(log n) programs instead of one per distinct n."""
        n = len(np.asarray(ids64).reshape(-1))
        npad = max(1, 1 << max(0, (n - 1).bit_length()))
        ids_p = np.full((npad,), hashing.EMPTY_ID, np.int64)
        ids_p[:n] = np.asarray(ids64, np.int64).reshape(-1)
        hi, lo = hashing.split_ids(ids_p)
        hi, lo = jnp.asarray(hi), jnp.asarray(lo)
        if train:
            self._maybe_grow(n)
            self._apply_promotions()
            self.shard, rows, slot, inverse, miss_info = _lookup_train(
                self.spec, self.shard, hi, lo, jnp.int32(self.step)
            )
            self._last_slots, self._last_inverse = slot, inverse
            self._last_n = n
            if self._promoter is not None:
                self._promoter.feed(*miss_info)
            return rows[:n]
        return _lookup_infer(self.spec, self.shard, hi, lo)[:n]

    def _apply_promotions(self):
        """Drain staged cold->hot promotions into the device table. Rows that
        lose the slot race (table momentarily full) re-spill to the cold tier
        with their payload instead of vanishing (VERDICT r4 weak #3)."""
        if self._promoter is None:
            return
        out = self._promoter.drain()
        if out is None:
            return
        keys, state = out
        hi, lo = hashing.split_ids(keys)
        self.shard, ok = _insert(
            self.spec,
            self.shard,
            jnp.asarray(hi),
            jnp.asarray(lo),
            jnp.asarray(state["values"]),
            jnp.ones((len(keys),), bool),
            jnp.int32(self.step),
            jnp.asarray(state["freq"]),
            jnp.asarray(state["accum"]) if "accum" in state else None,
            tuple(jnp.asarray(f) for f in state["fulldim"]),
        )
        from meepoembedding_tpu.tiering import respill_failed

        respill_failed(self._promoter, keys, state, np.asarray(ok))

    def apply_grads(self, grads: jax.Array):
        """Sparse update for the ids of the last train lookup."""
        assert self._last_slots is not None, "apply_grads requires a prior train lookup"
        grads = jnp.asarray(grads)
        npad = self._last_inverse.shape[0]
        if grads.shape[0] != npad:  # pad to the lookup's padded batch
            assert grads.shape[0] == self._last_n, (
                f"grads rows {grads.shape[0]} != last lookup batch {self._last_n}"
            )
            grads = jnp.concatenate(
                [grads, jnp.zeros((npad - grads.shape[0],) + grads.shape[1:],
                                  grads.dtype)]
            )
        self.shard = _apply_grads(
            self.spec, self.shard, self._last_slots, self._last_inverse, grads
        )
        self.step += 1

    def assign(self, ids64: np.ndarray, rows: np.ndarray):
        """Bulk upsert of explicit rows (serving refresh / tier promotion)."""
        hi, lo = hashing.split_ids(ids64)
        valid = jnp.asarray(hashing.is_valid(np.asarray(hi), np.asarray(lo)))
        self.shard, ok = _insert(
            self.spec,
            self.shard,
            jnp.asarray(hi),
            jnp.asarray(lo),
            jnp.asarray(rows),
            valid,
            jnp.int32(self.step),
            None,
            None,
        )
        return np.asarray(ok)

    def remove(self, ids64: np.ndarray) -> int:
        """Explicit key removal (TF lookuptable `remove` semantics): free the
        listed keys' slots; absent keys are a no-op. Returns how many were
        actually removed. Erased keys do NOT go to the spill tier — use
        evict() for policy-driven demotion; remove() is deletion."""
        uniq = np.unique(np.asarray(ids64, np.int64))
        hi, lo = hashing.split_ids(uniq)
        valid = jnp.asarray(hashing.is_valid(hi, lo))
        self.shard, found = _erase(
            self.spec, self.shard, jnp.asarray(hi), jnp.asarray(lo), valid
        )
        return int(jnp.sum(found))

    def evict(self) -> int:
        """Run one eviction sweep; spilled rows (value + optimizer state) go
        to the cold tier. Returns the number of evicted rows (SURVEY.md §3.4)."""
        off = getattr(self, "_evict_cursor", 0)
        self._evict_cursor = xla_ops.next_evict_cursor(self.spec, off)
        self.shard, export = _evict(
            self.spec, self.shard, jnp.int32(self.step), jnp.int32(off)
        )
        n = int(export.count)
        if n and self.spill is not None:
            from meepoembedding_tpu.tiering import spill_export

            spill_export(self._codec, self.spill, export)
            self.spilled_rows = getattr(self, "spilled_rows", 0) + n
        return n

    # --- introspection -------------------------------------------------------
    def __len__(self) -> int:
        return int(jnp.sum(self.shard.cnt))

    @property
    def load_factor(self) -> float:
        return float(load_factor(self.spec, self.shard))

    def counters(self) -> dict:
        from meepoembedding_tpu.table import layout

        c = np.asarray(self.shard.counters)
        names = ["hits", "misses", "inserts", "drops", "evictions", "spills", "promotes", "denied"]
        out = {n: int(c[i]) for i, n in enumerate(names)}
        out["erases"] = int(c[layout.ERASES])
        if self._promoter is not None:
            out["promotes"] = self._promoter.promoted
            out["promote_respills"] = self._promoter.respilled
            out["spilled_resident"] = len(self.spill)
        # spilling runs host-side (maintenance drains exports to the cold
        # tier), so the device counter never sees it; the host count does
        out["spills"] = max(out["spills"], getattr(self, "spilled_rows", 0))
        return out

    # --- checkpoint (SURVEY.md C19, §3.5) ------------------------------------
    def save(self, path: str, extras: Optional[dict] = None) -> dict:
        """Write this table as a 1-shard elastic checkpoint directory."""
        from meepoembedding_tpu import checkpoint

        return checkpoint.save(
            path, self.spec, [self.shard], self.step, extras=extras
        )

    def load(self, path: str) -> dict:
        """Restore from a checkpoint written with ANY shard count (rows are
        rehashed into this table). Replaces current contents. A growable
        table pre-grows to fit the checkpoint's live set; a fixed-capacity
        table that can't hold it raises in restore_shards (no silent drop)."""
        import dataclasses

        from meepoembedding_tpu import checkpoint

        total = sum(checkpoint.read_manifest(path).get("counts", [0]))
        while (
            self.cfg.grow_at_load is not None
            and total > self.cfg.grow_at_load * self.spec.capacity
        ):
            self.cfg = dataclasses.replace(
                self.cfg, capacity=self.cfg.capacity * 2
            )
            self.spec = TableSpec.from_config(self.cfg, num_shards=1)
            # jitted helpers key on the (static) spec, so caches self-refresh

        shards, manifest = checkpoint.restore_shards(self.spec, path, 1)
        self.shard = shards[0]
        self.step = manifest["step"]
        return manifest

    def export_items(self, chunk_buckets: int = 4096):
        """Stream (ids64, rows, freq, accum) of live rows to host — the
        checkpoint/spill substrate (SURVEY.md §3.5). Yields numpy chunks."""
        nb = self.spec.num_buckets
        for b0 in range(0, nb, chunk_buckets):
            b1 = min(nb, b0 + chunk_buckets)
            kh = np.asarray(self.shard.key_hi[b0:b1])
            kl = np.asarray(self.shard.key_lo[b0:b1])
            live = ~((kh == hashing.EMPTY_HI) & (kl == hashing.EMPTY_LO))
            if not live.any():
                continue
            bidx, lane = np.nonzero(live)
            slots = (b0 + bidx) * 128 + lane
            rows = np.asarray(
                xla_ops.gather_values(self.spec, self.shard.values, jnp.asarray(slots, jnp.int32))
            )
            ids = hashing.join_ids(kh[bidx, lane], kl[bidx, lane])
            fr = np.asarray(self.shard.freq[b0:b1])[bidx, lane]
            if self.shard.opt_rowwise:
                acc = np.asarray(self.shard.opt_rowwise[0][b0:b1])[bidx, lane]
            else:
                acc = np.zeros_like(fr, np.float32)
            yield ids, rows, fr, acc
