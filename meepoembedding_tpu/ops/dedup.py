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


def unique_pairs(hi: jax.Array, lo: jax.Array, size: int) -> Unique:
    """Deduplicate id pairs to static capacity `size`.

    Invalid/pad ids (the reserved sentinel) sort together and come out as a
    single "unique" whose `valid` flag is False; their inverse entries point
    at it, and downstream lookups return zero rows for it.

    If the true unique count exceeds `size`, the overflow ids alias the last
    slot (counted, never out-of-bounds) — callers size `size` to the batch.
    """
    n = hi.shape[0]
    # Sort lexicographically by (hi, lo); put invalid ids LAST so that
    # truncation under overflow drops them first. Bias keys for unsigned
    # comparison of two's-complement halves.
    inval = ~hashing.is_valid(hi, lo)
    bh = hi.astype(jnp.uint32) ^ jnp.uint32(0x80000000)
    bh = jnp.where(inval, jnp.uint32(0xFFFFFFFF), bh)
    order = jnp.lexsort((lo.astype(jnp.uint32) ^ jnp.uint32(0x80000000), bh))
    sh, sl = jnp.take(hi, order), jnp.take(lo, order)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])]
    )
    gid = jnp.cumsum(is_new).astype(jnp.int32) - 1  # [n] group id in sorted order
    gid = jnp.minimum(gid, size - 1)  # overflow aliases the last slot
    inverse = jnp.zeros((n,), jnp.int32).at[order].set(gid)
    uh = jnp.full((size,), hashing.EMPTY_HI, jnp.int32).at[gid].set(sh)
    ul = jnp.full((size,), hashing.EMPTY_LO, jnp.int32).at[gid].set(sl)
    valid = hashing.is_valid(uh, ul)
    count = jnp.sum(valid).astype(jnp.int32)
    return Unique(hi=uh, lo=ul, inverse=inverse, valid=valid, count=count)


def segment_sum_grads(grads: jax.Array, inverse: jax.Array, num_unique: int) -> jax.Array:
    """[n, dim] per-occurrence grads -> [U, dim] per-unique-id grads
    (the backward half of dedup, SURVEY.md §3.3)."""
    return jax.ops.segment_sum(grads, inverse, num_segments=num_unique)
