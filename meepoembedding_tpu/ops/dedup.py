"""Batch ID deduplication with inverse index (SURVEY.md C5).

The reference class dedups ids on GPU before the table lookup and uses the
inverse index to segment-sum gradients (BASELINE.json north-star: "all-to-all
ID exchange and dedup before lookup"). Ids are (hi, lo) int32 pairs (no int64
on TPU), so uniqueness is computed by lexicographic sort + neighbor compare —
one fused XLA sort, static output size `size` (jit-friendly).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from meepoembedding_tpu.table import hashing


class Unique(NamedTuple):
    hi: jax.Array  # i32 [U] unique ids (padded with the invalid sentinel)
    lo: jax.Array  # i32 [U]
    inverse: jax.Array  # i32 [n] position of each input id in (hi, lo)
    valid: jax.Array  # bool [U] slot holds a real unique id
    count: jax.Array  # i32 scalar: number of uniques


def sorted_run_sums(ks: jax.Array, vs: jax.Array, disjoint: bool = False):
    """Sum equal-key runs of an ALREADY-SORTED (ks, vs) stream without any
    scatter-add: prefix-sum + end-of-run differencing + unique-index
    compaction. Returns (key_of_rank [n], totals [n, d], live [n]) where rank
    r < num_runs holds run r's key and total.

    XLA TPU lowers scatter-add with duplicate indices to a serialized
    per-element loop (~200ns/element); everything here is vectorized.

    Exactness: integer runs are BIT-EXACT for any run content — int32 cumsum
    wraps mod 2^32 and the end-of-run differencing cancels the wrap, so even
    overflowing prefixes recover exact in-range totals. Plain float runs
    carry cumsum rounding ~ULP(global prefix). `disjoint=True` declares that
    within every run each column has AT MOST ONE nonzero contributor (the
    table-write case: unique slots -> disjoint lane windows); float values
    are then split bitwise into four byte planes and summed on the exact
    integer path, making float combines bit-exact too."""
    n = ks.shape[0]
    if disjoint and not jnp.issubdtype(vs.dtype, jnp.integer):
        d = vs.shape[-1]
        # canonicalize -0.0 -> +0.0: masked/window-expanded updates produce
        # negative zeros (x * 0.0 == -0.0), which are bitwise 0x80000000 and
        # would violate the one-nonzero-contributor-per-column contract by
        # adding 128 into another contributor's sign byte
        f = vs.astype(jnp.float32)
        f = jnp.where(f == 0.0, 0.0, f)
        u = jax.lax.bitcast_convert_type(f, jnp.uint32)
        planes = jnp.concatenate(
            [((u >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
             for j in range(4)],
            axis=-1,
        )  # [n, 4d]; per-column run totals <= 255 (single contributor)
        key_of_rank, tot, live = sorted_run_sums(ks, planes)
        bits = jnp.zeros((n, d), jnp.uint32)
        for j in range(4):
            bits = bits | (tot[..., j * d : (j + 1) * d].astype(jnp.uint32)
                           << jnp.uint32(8 * j))
        totals = jax.lax.bitcast_convert_type(bits, jnp.float32)
        return key_of_rank, totals, live
    if not jnp.issubdtype(vs.dtype, jnp.integer):
        # float path accumulates in f32; int planes (keys!) stay exact in i32
        vs = vs.astype(jnp.float32)
    prefix = jnp.cumsum(vs, axis=0)
    is_last = jnp.concatenate([ks[1:] != ks[:-1], jnp.ones((1,), bool)])
    rank = (jnp.cumsum(is_last) - 1).astype(jnp.int32)
    num_runs = jnp.sum(is_last).astype(jnp.int32)
    at_rank = jnp.where(is_last, rank, n)
    ends = jnp.zeros_like(prefix).at[at_rank].set(prefix, mode="drop", unique_indices=True)
    key_of_rank = jnp.zeros_like(ks).at[at_rank].set(ks, mode="drop", unique_indices=True)
    prev = jnp.concatenate([jnp.zeros_like(ends[:1]), ends[:-1]], axis=0)
    totals = ends - prev
    live = jnp.arange(n, dtype=jnp.int32) < num_runs
    return key_of_rank, totals, live


def sorted_segment_sum(values: jax.Array, seg: jax.Array, num_segments: int) -> jax.Array:
    """Scatter-add-free segment_sum: sort by segment, sum runs, one
    unique-index set into the output."""
    order = jnp.argsort(seg)
    ss = jnp.take(seg, order)
    vs = jnp.take(values, order, axis=0)
    key_of_rank, totals, live = sorted_run_sums(ss, vs)
    out = jnp.zeros((num_segments,) + totals.shape[1:], jnp.float32)
    return out.at[jnp.where(live, key_of_rank, num_segments)].set(
        totals, mode="drop", unique_indices=True
    )


def unique_pairs(hi: jax.Array, lo: jax.Array, size: int) -> Unique:
    """Deduplicate id pairs to static capacity `size`.

    Invalid/pad ids (the reserved sentinel) sort together and come out as a
    single "unique" whose `valid` flag is False; their inverse entries point
    at it, and downstream lookups return zero rows for it.

    If the true unique count exceeds `size`, the overflow ids alias the last
    slot (counted, never out-of-bounds) — callers size `size` to the batch.

    ONE multi-operand `lax.sort` carries (hi, lo, position) through a 2-key
    lexicographic sort (jnp.lexsort + post-gathers costs 2 extra stable sorts
    and three serialized 1-D gathers); the inverse permutation comes from a
    unique-index 1-D scatter instead of a second argsort."""
    n = hi.shape[0]
    with jax.named_scope("meepo.dedup"):
        # Bias keys for unsigned comparison of two's-complement halves;
        # invalid ids sort LAST so truncation under overflow drops them first.
        inval = ~hashing.is_valid(hi, lo)
        bh = hi.astype(jnp.uint32) ^ jnp.uint32(0x80000000)
        bh = jnp.where(inval, jnp.uint32(0xFFFFFFFF), bh)
        bl = lo.astype(jnp.uint32) ^ jnp.uint32(0x80000000)
        iota = jnp.arange(n, dtype=jnp.int32)
        sbh, sbl, order, sh, sl = jax.lax.sort(
            (bh, bl, iota, hi, lo), num_keys=2, is_stable=True
        )
        is_new = jnp.concatenate(
            [jnp.ones((1,), bool), (sbh[1:] != sbh[:-1]) | (sbl[1:] != sbl[:-1])]
        )
        gid0 = jnp.cumsum(is_new).astype(jnp.int32) - 1  # group id, sorted order
        gid = jnp.minimum(gid0, size - 1)  # overflow aliases the last slot
        # inverse[order[j]] = gid[j]: one unique-index 1-D scatter
        inverse = jnp.zeros((n,), jnp.int32).at[order].set(gid, unique_indices=True)
        # write each group's key at its first occurrence only (unique indices;
        # overflow groups beyond `size` are dropped, not aliased-by-UB)
        first_idx = jnp.where(is_new & (gid0 < size), gid0, size)
        uh = jnp.full((size,), hashing.EMPTY_HI, jnp.int32).at[first_idx].set(
            sh, mode="drop", unique_indices=True
        )
        ul = jnp.full((size,), hashing.EMPTY_LO, jnp.int32).at[first_idx].set(
            sl, mode="drop", unique_indices=True
        )
        valid = hashing.is_valid(uh, ul)
        count = jnp.sum(valid).astype(jnp.int32)
        return Unique(hi=uh, lo=ul, inverse=inverse, valid=valid, count=count)


def segment_sum_grads(grads: jax.Array, inverse: jax.Array, num_unique: int) -> jax.Array:
    """[n, dim] per-occurrence grads -> [U, dim] per-unique-id grads
    (the backward half of dedup, SURVEY.md §3.3).

    Implemented as ONE duplicate-tolerant row scatter-add in 128-lane space:
    XLA's [R,128] row-granular scatter-add is fast on TPU even with duplicate
    rows (~7ms for 512K), while sort-based segment sums pay an argsort plus a
    padded-minor gather (a [n,32] gather runs ~6x slower than [n,128])."""
    n, d = grads.shape
    dpad = -(-d // 128) * 128
    g = grads.astype(jnp.float32)
    if dpad != d:
        g = jnp.pad(g, ((0, 0), (0, dpad - d)))
    out = jnp.zeros((num_unique, dpad), jnp.float32).at[inverse].add(g, mode="drop")
    return out[:, :d]
