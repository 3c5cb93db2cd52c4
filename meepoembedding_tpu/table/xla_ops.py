"""Table storage ops as vectorized XLA programs (SURVEY.md C2/C3/C10, L0).

The reference class implements these as CUDA kernels (probe/insert, gather,
scatter-update over a device hash table — README.md:2, .gitignore:4-27).
On TPU there is no per-thread atomics model; instead every op here is a
*batched, fully vectorized* program over the whole lookup batch:

  probe          R unrolled rounds of linear bucket probing; one round ==
                 one row-gather of the key planes + one 128-wide compare.
  plan_insert    assigns free lanes to missed keys without collisions by
                 ranking keys per bucket (sort + segmented rank) against the
                 bucket's actual free-lane order, tracking per-bucket claims
                 across probing rounds. Hole-safe after evictions.
  gather/scatter row-granular value access: logical rows are packed
                 128//dim per storage row, gathered as whole rows and
                 packed/unpacked lane-locally (VPU-only).

Everything is jittable with static shapes; `jax.jit` donation of the shard
gives in-place HBM updates. The Pallas kernels in `pallas_ops.py` replace
the hot gather/scatter paths where XLA's generic gather is slower.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from meepoembedding_tpu.config import LANES
from meepoembedding_tpu.table import hashing
from meepoembedding_tpu.table.layout import (
    DENIED,
    DROPS,
    EVICTIONS,
    HITS,
    INSERTS,
    MISSES,
    TableShard,
    TableSpec,
    live_mask,
)


class ProbeResult(NamedTuple):
    slot: jax.Array  # i32 [n], -1 if not found
    found: jax.Array  # bool [n]


def probe(spec: TableSpec, shard: TableShard, uh, ul, valid) -> ProbeResult:
    """Find slots for (deduped) keys. Linear probing over buckets; a chain
    ends at the first bucket that has free space and was never overflowed
    (the sticky `ovf` flag keeps this sound after evictions punch holes)."""
    nb = spec.num_buckets
    b0 = hashing.bucket_of(uh, ul, nb)
    n = uh.shape[0]
    slot = jnp.full((n,), -1, jnp.int32)
    found = jnp.zeros((n,), bool)
    resolved = ~valid
    for r in range(spec.max_probe_rounds):
        b = (b0 + r) & (nb - 1)
        kh = jnp.take(shard.key_hi, b, axis=0)  # [n, 128]
        kl = jnp.take(shard.key_lo, b, axis=0)
        m = (kh == uh[:, None]) & (kl == ul[:, None])
        hit = m.any(axis=1)
        lane = jnp.argmax(m, axis=1).astype(jnp.int32)
        newly = ~resolved & hit
        slot = jnp.where(newly, b * LANES + lane, slot)
        found = found | newly
        has_space = jnp.take(shard.cnt, b) < LANES
        never_ovf = jnp.take(shard.ovf, b) == 0
        resolved = resolved | hit | (has_space & never_ovf)
        if r == spec.max_probe_rounds - 1:
            break
    return ProbeResult(slot=slot, found=found)


class InsertPlan(NamedTuple):
    slot: jax.Array  # i32 [n], -1 if dropped/not wanted
    ok: jax.Array  # bool [n]
    cnt: jax.Array  # updated [nb]
    ovf: jax.Array  # updated [nb]


def _segmented_rank(sort_key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Given per-item integer keys, return (order, rank-within-equal-key)
    in sorted order. Stable, fully vectorized."""
    n = sort_key.shape[0]
    order = jnp.argsort(sort_key, stable=True)
    ks = jnp.take(sort_key, order)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    seg_first = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - seg_first
    return order, rank


def plan_insert(spec: TableSpec, shard: TableShard, uh, ul, want) -> InsertPlan:
    """Assign a free (bucket, lane) to each wanted key. Collision-free within
    the batch: keys targeting the same bucket get distinct ranks, and ranks
    index into the bucket's deterministic free-lane order; a per-bucket
    `claimed` tally keeps later probing rounds consistent with earlier ones."""
    nb = spec.num_buckets
    n = uh.shape[0]
    b0 = hashing.bucket_of(uh, ul, nb)
    pending = want
    slot = jnp.full((n,), -1, jnp.int32)
    cnt, ovf = shard.cnt, shard.ovf
    claimed = jnp.zeros((nb,), jnp.int32)
    for r in range(spec.max_probe_rounds):
        b = (b0 + r) & (nb - 1)
        sort_key = jnp.where(pending, b, nb)  # nb == "not pending" sentinel
        order, rank_sorted = _segmented_rank(sort_key)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
        # Free lanes of each key's bucket, in ascending-lane order.
        kh = jnp.take(shard.key_hi, b, axis=0)
        kl = jnp.take(shard.key_lo, b, axis=0)
        free = (kh == hashing.EMPTY_HI) & (kl == hashing.EMPTY_LO)  # [n,128]
        lane_order = jnp.argsort(~free, axis=1, stable=True)  # free lanes first
        num_free = free.sum(axis=1).astype(jnp.int32)
        eff_rank = rank + jnp.take(claimed, b)
        lane = jnp.take_along_axis(
            lane_order, jnp.clip(eff_rank, 0, LANES - 1)[:, None], axis=1
        )[:, 0].astype(jnp.int32)
        ok = pending & (eff_rank < num_free)
        fail = pending & ~ok
        slot = jnp.where(ok, b * LANES + lane, slot)
        claimed = claimed.at[jnp.where(ok, b, nb)].add(1, mode="drop")
        cnt = cnt.at[jnp.where(ok, b, nb)].add(1, mode="drop")
        ovf = ovf.at[jnp.where(fail, b, nb)].max(1, mode="drop")
        pending = fail
    return InsertPlan(slot=slot, ok=want & (slot >= 0), cnt=cnt, ovf=ovf)


# --- value storage access (row-granular; pack/unpack is lane-local) ---------

def gather_values(spec: TableSpec, plane: jax.Array, slot: jax.Array) -> jax.Array:
    """[n] slots -> [n, dim] rows from a value-shaped plane. Caller masks
    invalid slots (clip-mode gather reads row 0 for them)."""
    n = slot.shape[0]
    s = jnp.clip(slot, 0)
    if spec.dim <= LANES:
        vrow, sub = s // spec.pack, s % spec.pack
        g = jnp.take(plane, vrow, axis=0)  # [n, 128]
        g = g.reshape(n, spec.pack, spec.dim)
        return jnp.take_along_axis(g, sub[:, None, None], axis=1)[:, 0, :]
    rps = spec.rows_per_slot
    idx = s[:, None] * rps + jnp.arange(rps, dtype=jnp.int32)[None, :]
    g = jnp.take(plane, idx.reshape(-1), axis=0)  # [n*rps, 128]
    return g.reshape(n, spec.dim)


def _expand_row_update(spec: TableSpec, slot, upd):
    """[n, dim] per-slot updates -> ([m] storage rows, [m, 128] row updates)
    with zeros outside each slot's lane window. Safe for `.add` scatters."""
    n = slot.shape[0]
    s = jnp.clip(slot, 0)
    if spec.dim <= LANES:
        vrow, sub = s // spec.pack, s % spec.pack
        onehot = (
            jnp.arange(spec.pack, dtype=jnp.int32)[None, :] == sub[:, None]
        )  # [n, pack]
        rowupd = (onehot[:, :, None] * upd[:, None, :]).reshape(n, LANES)
        return vrow, rowupd
    rps = spec.rows_per_slot
    idx = s[:, None] * rps + jnp.arange(rps, dtype=jnp.int32)[None, :]
    return idx.reshape(-1), upd.reshape(n * rps, LANES)


def scatter_add_values(spec: TableSpec, plane, slot, upd, enabled) -> jax.Array:
    """plane[slot rows] += upd, row-granular (duplicate storage rows OK)."""
    vrow, rowupd = _expand_row_update(spec, slot, upd.astype(plane.dtype))
    if spec.dim <= LANES:
        vrow = jnp.where(enabled, vrow, plane.shape[0])
    else:
        en = jnp.repeat(enabled, spec.rows_per_slot)
        vrow = jnp.where(en, vrow, plane.shape[0])
    return plane.at[vrow].add(rowupd, mode="drop")


def scatter_set_values(spec: TableSpec, plane, slot, rows, enabled) -> jax.Array:
    """plane[slot] = rows (element-granular; used on the rare insert path —
    a row-granular set would clobber sibling packed lanes)."""
    n = slot.shape[0]
    s = jnp.clip(slot, 0)
    if spec.dim <= LANES:
        vrow, sub = s // spec.pack, s % spec.pack
        cols = sub[:, None] * spec.dim + jnp.arange(spec.dim, dtype=jnp.int32)[None, :]
        vrow = jnp.where(enabled, vrow, plane.shape[0])
        return plane.at[vrow[:, None], cols].set(rows.astype(plane.dtype), mode="drop")
    rps = spec.rows_per_slot
    idx = s[:, None] * rps + jnp.arange(rps, dtype=jnp.int32)[None, :]
    idx = jnp.where(enabled[:, None], idx, plane.shape[0]).reshape(-1)
    return plane.at[idx].set(rows.astype(plane.dtype).reshape(n * rps, LANES), mode="drop")


def scatter_bucket_plane(plane, slot, val, enabled):
    """Set a [nb, 128]-shaped plane at slot positions (freq/last/keys/accum)."""
    b, lane = slot // LANES, slot % LANES
    b = jnp.where(enabled, b, plane.shape[0])
    return plane.at[b, lane].set(val, mode="drop")


def gather_bucket_plane(plane, slot):
    b, lane = jnp.clip(slot, 0) // LANES, jnp.clip(slot, 0) % LANES
    return plane[b, lane]


# --- composite ops -----------------------------------------------------------

def touch(shard: TableShard, slot, enabled, step) -> TableShard:
    """Record hits: freq += 1, last = step (SURVEY.md C10 score maintenance)."""
    b, lane = slot // LANES, slot % LANES
    b = jnp.where(enabled, b, shard.freq.shape[0])
    freq = shard.freq.at[b, lane].add(1, mode="drop")
    last = shard.last.at[b, lane].set(step, mode="drop")
    return shard._replace(freq=freq, last=last)


def cms_admit(spec: TableSpec, cms, uh, ul, miss) -> Tuple[jax.Array, jax.Array]:
    """Count-min-sketch frequency admission (SURVEY.md C10). Returns
    (updated cms, admit mask). Threshold <= 1 admits everything."""
    thresh = spec.policy.admit_threshold
    if thresh <= 1 or cms.shape[1] == 0:
        return cms, miss
    w = cms.shape[1]
    ests = []
    for j in range(4):
        col = (hashing.hash_pair(uh, ul, hashing.SALT_CMS[j]) % jnp.uint32(w)).astype(jnp.int32)
        col_upd = jnp.where(miss, col, w)
        cms = cms.at[j, col_upd].add(1, mode="drop")
        ests.append(cms[j, jnp.clip(col, 0, w - 1)])
    est = jnp.minimum(jnp.minimum(ests[0], ests[1]), jnp.minimum(ests[2], ests[3]))
    return cms, miss & (est >= thresh)


def find_or_insert(
    spec: TableSpec, shard: TableShard, uh, ul, valid, step
) -> Tuple[TableShard, jax.Array, jax.Array]:
    """The hot-path composite (SURVEY.md §3.2): probe, admit, claim slots,
    default-init fresh rows, maintain scores/counters. Returns
    (shard', slot[n] (-1 == denied/dropped), found[n])."""
    pr = probe(spec, shard, uh, ul, valid)
    miss = valid & ~pr.found
    cms, admit = cms_admit(spec, shard.cms, uh, ul, miss)
    plan = plan_insert(spec, shard, uh, ul, admit)

    key_hi = scatter_bucket_plane(shard.key_hi, plan.slot, uh, plan.ok)
    key_lo = scatter_bucket_plane(shard.key_lo, plan.slot, ul, plan.ok)
    freq = scatter_bucket_plane(shard.freq, plan.slot, jnp.ones_like(uh), plan.ok)
    last = scatter_bucket_plane(shard.last, plan.slot, jnp.full_like(uh, step), plan.ok)
    init_rows = hashing.default_rows(uh, ul, spec.dim, spec.initializer_scale, spec.dtype)
    values = scatter_set_values(spec, shard.values, plan.slot, init_rows, plan.ok)
    opt_rowwise = tuple(
        scatter_bucket_plane(
            p, plan.slot, jnp.full_like(p[0, 0], spec.optimizer.initial_accumulator), plan.ok
        )
        for p in shard.opt_rowwise
    )
    opt_fulldim = tuple(
        scatter_set_values(spec, p, plan.slot, jnp.zeros_like(init_rows), plan.ok)
        for p in shard.opt_fulldim
    )

    n_hit = jnp.sum(pr.found).astype(jnp.int32)
    n_miss = jnp.sum(miss).astype(jnp.int32)
    n_ins = jnp.sum(plan.ok).astype(jnp.int32)
    n_drop = jnp.sum(admit & ~plan.ok).astype(jnp.int32)
    n_denied = jnp.sum(miss & ~admit).astype(jnp.int32)
    counters = (
        shard.counters.at[HITS].add(n_hit)
        .at[MISSES].add(n_miss)
        .at[INSERTS].add(n_ins)
        .at[DROPS].add(n_drop)
        .at[DENIED].add(n_denied)
    )

    shard = shard._replace(
        key_hi=key_hi,
        key_lo=key_lo,
        cnt=plan.cnt,
        ovf=plan.ovf,
        freq=freq,
        last=last,
        values=values,
        opt_rowwise=opt_rowwise,
        opt_fulldim=opt_fulldim,
        counters=counters,
        cms=cms,
    )
    slot = jnp.where(pr.found, pr.slot, plan.slot)
    shard = touch(shard, jnp.where(pr.found, pr.slot, -1), pr.found, step)
    return shard, slot, pr.found


def lookup_rows(spec: TableSpec, shard: TableShard, slot) -> jax.Array:
    """[n] slots -> [n, dim] embedding rows; denied/dropped slots -> zeros."""
    rows = gather_values(spec, shard.values, slot)
    return jnp.where((slot >= 0)[:, None], rows, 0)


class EvictExport(NamedTuple):
    hi: jax.Array  # i32 [E]
    lo: jax.Array  # i32 [E]
    rows: jax.Array  # [E, dim]
    freq: jax.Array  # i32 [E]
    accum: jax.Array  # f32 [E] rowwise optimizer state (zeros if none)
    count: jax.Array  # i32 scalar: number of valid entries


def evict_pass(spec: TableSpec, shard: TableShard, step) -> Tuple[TableShard, EvictExport]:
    """Periodic eviction sweep (SURVEY.md §3.4): select cold rows by policy,
    export up to `max_evict_per_pass` of them (for the spill tier), and free
    their slots. Off the step critical path."""
    pol = spec.policy
    E = pol.max_evict_per_pass
    lm = live_mask(shard)
    cold = jnp.zeros_like(lm)
    if pol.evict_policy in ("lfu", "lfu_ttl"):
        cold = cold | (shard.freq < pol.lfu_min_freq)
    if pol.evict_policy in ("ttl", "lfu_ttl"):
        cold = cold | ((step - shard.last) > pol.ttl_steps)
    mask = (lm & cold).reshape(-1)  # [C]
    (idx,) = jnp.nonzero(mask, size=E, fill_value=spec.capacity)
    slot = idx.astype(jnp.int32)
    sel = slot < spec.capacity
    slot_c = jnp.where(sel, slot, 0)

    hi = gather_bucket_plane(shard.key_hi, slot_c)
    lo = gather_bucket_plane(shard.key_lo, slot_c)
    rows = gather_values(spec, shard.values, slot_c)
    freq = gather_bucket_plane(shard.freq, slot_c)
    if shard.opt_rowwise:
        accum = gather_bucket_plane(shard.opt_rowwise[0], slot_c)
    else:
        accum = jnp.zeros_like(freq, jnp.float32)
    count = jnp.sum(sel).astype(jnp.int32)

    key_hi = scatter_bucket_plane(shard.key_hi, slot, jnp.full_like(slot, hashing.EMPTY_HI), sel)
    key_lo = scatter_bucket_plane(shard.key_lo, slot, jnp.full_like(slot, hashing.EMPTY_LO), sel)
    freq_p = scatter_bucket_plane(shard.freq, slot, jnp.zeros_like(slot), sel)
    last_p = scatter_bucket_plane(shard.last, slot, jnp.zeros_like(slot), sel)
    b = jnp.where(sel, slot // LANES, shard.cnt.shape[0])
    cnt = shard.cnt.at[b].add(-1, mode="drop")
    counters = shard.counters.at[EVICTIONS].add(count)
    shard = shard._replace(
        key_hi=key_hi, key_lo=key_lo, freq=freq_p, last=last_p, cnt=cnt, counters=counters
    )
    export = EvictExport(
        hi=jnp.where(sel, hi, hashing.EMPTY_HI),
        lo=jnp.where(sel, lo, hashing.EMPTY_LO),
        rows=jnp.where(sel[:, None], rows, 0),
        freq=jnp.where(sel, freq, 0),
        accum=jnp.where(sel, accum, 0.0),
        count=count,
    )
    return shard, export


def insert_rows(
    spec: TableSpec, shard: TableShard, hi, lo, rows, valid, step, freq=None, accum=None
) -> Tuple[TableShard, jax.Array]:
    """Bulk insert/overwrite of explicit rows (restore, promotion from spill
    tiers, `table.assign`). Existing keys are overwritten in place. Returns
    (shard', ok mask)."""
    pr = probe(spec, shard, hi, lo, valid)
    plan = plan_insert(spec, shard, hi, lo, valid & ~pr.found)
    slot = jnp.where(pr.found, pr.slot, plan.slot)
    ok = valid & (slot >= 0)

    key_hi = scatter_bucket_plane(shard.key_hi, slot, hi, ok & ~pr.found)
    key_lo = scatter_bucket_plane(shard.key_lo, slot, lo, ok & ~pr.found)
    values = scatter_set_values(spec, shard.values, slot, rows, ok)
    f = freq if freq is not None else jnp.ones_like(hi)
    freq_p = scatter_bucket_plane(shard.freq, slot, f, ok)
    last_p = scatter_bucket_plane(shard.last, slot, jnp.full_like(hi, step), ok)
    opt_rowwise = shard.opt_rowwise
    if shard.opt_rowwise:
        a = accum if accum is not None else jnp.full_like(
            hi, spec.optimizer.initial_accumulator, jnp.float32
        )
        opt_rowwise = (
            scatter_bucket_plane(shard.opt_rowwise[0], slot, a, ok),
        ) + shard.opt_rowwise[1:]
    counters = shard.counters.at[INSERTS].add(jnp.sum(ok & ~pr.found).astype(jnp.int32))
    return (
        shard._replace(
            key_hi=key_hi,
            key_lo=key_lo,
            cnt=plan.cnt,
            ovf=plan.ovf,
            values=values,
            freq=freq_p,
            last=last_p,
            opt_rowwise=opt_rowwise,
            counters=counters,
        ),
        ok,
    )
