"""Streaming item-frequency estimation for sampled-softmax bias correction
(models/two_tower.py; README.md:2 "recommendation, search").

In-batch sampled softmax over-penalizes popular items: a popular item
appears as a negative for almost every query. The standard fix (the
sampling-bias-corrected softmax of Yi et al. 2019, RecSys) subtracts
log q(item) from each candidate's logit, where q is the probability of the
item appearing in a batch. This module supplies q as a HOST-side streaming
count-min sketch over item keys — numpy-only, O(B) per batch, no device
round-trip: the trainer computes the per-batch log-q vector while assembling
inputs and passes it into the jitted step like any other batch array.

The sketch intentionally does NOT share the device-side CMS (table
admission, xla_ops): admission counts lookup ids per table shard; this
counts (whole) items per batch on the input stream, and lives where the
batch is built.
"""

from __future__ import annotations

import numpy as np

from meepoembedding_tpu.table.hashing import EMPTY_ID

_MIX = np.uint64(0x9E3779B97F4A7C15)
_SALTS = (
    np.uint64(0xC2B2AE3D27D4EB4F),
    np.uint64(0x165667B19E3779F9),
    np.uint64(0x27D4EB2F165667C5),
    np.uint64(0x9E3779B97F4A7C15),
)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def item_keys_np(ids: np.ndarray, qf: int) -> np.ndarray:
    """[B, S] or [B, S, L] int64 ids -> [B] uint64 item identity keys over
    the item-side columns (qf..S-1), ignoring padding. Host-side analog of
    TwoTower.item_key — it does NOT need to produce the same values (the
    device key masks in-batch duplicates; this one buckets the sketch)."""
    ids = np.asarray(ids, np.int64)
    it = ids[:, qf:]
    h = _mix64(it.view(np.uint64) if it.dtype == np.int64 else it)
    # position salt per feature column so permuted features hash differently
    pos = (np.arange(it.shape[1], dtype=np.uint64) + np.uint64(1)) * _MIX
    h = _mix64(h ^ pos.reshape((1, -1) + (1,) * (it.ndim - 2)))
    h = np.where(it == EMPTY_ID, np.uint64(0), h)
    axes = tuple(range(1, it.ndim))
    return np.bitwise_xor.reduce(h, axis=axes)


class ItemFrequencyEstimator:
    """Count-min sketch of item occurrence counts across batches.

    `update_and_logq(keys)` counts THIS batch's items, then returns
    log q_i = log(count_i / batches_seen), clipped to [log(1/batches), 0] —
    exactly the quantity the corrected softmax subtracts. Estimates only
    ever overcount (count-min property), so corrections are conservative
    for rare items.
    """

    def __init__(self, width: int = 1 << 16, depth: int = 4):
        assert width & (width - 1) == 0, "width must be a power of two"
        assert 1 <= depth <= len(_SALTS)
        self.width = width
        self.depth = depth
        self.counts = np.zeros((depth, width), np.int64)
        self.batches = 0

    def _slots(self, keys: np.ndarray) -> np.ndarray:
        """[B] uint64 -> [depth, B] sketch columns."""
        return np.stack([
            (_mix64(keys ^ _SALTS[d]) & np.uint64(self.width - 1)).astype(np.int64)
            for d in range(self.depth)
        ])

    def update_and_logq(self, keys: np.ndarray) -> np.ndarray:
        """Count the batch's items (each distinct item once per batch —
        q is 'probability the item appears in a batch'), then estimate
        log q for every row's item. Returns [B] float32."""
        keys = np.asarray(keys, np.uint64)
        uniq, inv = np.unique(keys, return_inverse=True)
        slots = self._slots(uniq)  # [depth, U]
        for d in range(self.depth):
            np.add.at(self.counts[d], slots[d], 1)
        self.batches += 1
        est = self.counts[np.arange(self.depth)[:, None], slots].min(0)  # [U]
        q = np.clip(est / self.batches, 1.0 / self.batches, 1.0)
        return np.log(q).astype(np.float32)[inv]
