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
    shard, slot, _ = xla_ops.find_or_insert(spec, shard, uniq.hi, uniq.lo, uniq.valid, step)
    rows = xla_ops.lookup_rows(spec, shard, slot)
    return shard, rows[uniq.inverse], slot, uniq.inverse


@partial(jax.jit, static_argnums=(0,))
def _lookup_infer(spec, shard, hi, lo):
    uniq = dedup.unique_pairs(hi, lo, size=hi.shape[0])
    pr = xla_ops.probe(spec, shard, uniq.hi, uniq.lo, uniq.valid)
    rows = xla_ops.lookup_rows(spec, shard, jnp.where(pr.found, pr.slot, -1))
    return rows[uniq.inverse]


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _apply_grads(spec, shard, slot, inverse, grads):
    g = dedup.segment_sum_grads(grads, inverse, num_unique=slot.shape[0])
    return optim.apply_sparse_grads(spec, shard, slot, g)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _evict(spec, shard, step):
    return xla_ops.evict_pass(spec, shard, step)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _insert(spec, shard, hi, lo, rows, valid, step, freq, accum):
    return xla_ops.insert_rows(spec, shard, hi, lo, rows, valid, step, freq, accum)


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
        self.spill = spill  # optional KVBackend for evicted rows
        self._last_slots = None
        self._last_inverse = None

    # --- host-facing API ---------------------------------------------------
    def lookup(self, ids64: np.ndarray, train: bool = True) -> jax.Array:
        """[n] int64 ids -> [n, dim] rows. train=True inserts on miss."""
        hi, lo = hashing.split_ids(ids64)
        hi, lo = jnp.asarray(hi), jnp.asarray(lo)
        if train:
            self.shard, rows, slot, inverse = _lookup_train(
                self.spec, self.shard, hi, lo, jnp.int32(self.step)
            )
            self._last_slots, self._last_inverse = slot, inverse
            return rows
        return _lookup_infer(self.spec, self.shard, hi, lo)

    def apply_grads(self, grads: jax.Array):
        """Sparse update for the ids of the last train lookup."""
        assert self._last_slots is not None, "apply_grads requires a prior train lookup"
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

    def evict(self) -> int:
        """Run one eviction sweep; spilled rows go to the spill backend.
        Returns the number of evicted rows (SURVEY.md §3.4)."""
        self.shard, export = _evict(self.spec, self.shard, jnp.int32(self.step))
        n = int(export.count)
        if n and self.spill is not None:
            keys = hashing.join_ids(np.asarray(export.hi[:n]), np.asarray(export.lo[:n]))
            self.spill.insert_batch(keys, np.asarray(export.rows[:n]))
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
        return {n: int(c[i]) for i, n in enumerate(names)}

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
