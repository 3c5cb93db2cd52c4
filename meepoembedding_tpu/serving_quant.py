"""Int8-quantized read-only serving tables (SURVEY.md L7 serving path).

Serving replicas do not train, so the dynamic-table machinery (probe planes,
optimizer slots, admission sketches) is pure overhead there. QuantizedTable
is the serving-optimized form of a checkpoint: sorted-id binary search over
a dense array triple

    ids     int64 [N]      (sorted)
    values  int8  [N, dim] (per-row absmax quantization)
    scales  f32   [N]      (row absmax / 127)

-> ~(8 + dim + 4) bytes/row vs 4*dim for the f32 training table (2.9x
smaller at dim 32; 3.6x at dim 64), lookup is `searchsorted` (log N gathers,
fully jittable, batch-vectorized) + verify + dequantizing gather. Unknown
ids return zero rows — identical semantics to the probe-only serve path.

Max quantization error per element is absmax/254 (round-to-nearest over a
symmetric int8 grid), i.e. <= 0.4% of the row's largest weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedTable:
    def __init__(self, ids: np.ndarray, values: np.ndarray):
        """ids [N] int64 (any order), values [N, dim] float.

        Per-row AFFINE int8: q = round((v - zero) / scale) - 128 with
        zero = row min and scale = row range / 255 — uses all 256 codes over
        the row's actual range (max error range/510 per element) instead of
        the symmetric absmax grid (absmax/254, which wastes codes whenever a
        row's distribution is skewed — trained CTR embeddings usually are).
        Cost: one extra f32 (the zero point) per row."""
        ids = np.asarray(ids, np.int64)
        values = np.asarray(values, np.float32)
        order = np.argsort(ids, kind="stable")
        ids, values = ids[order], values[order]
        vmin = values.min(axis=1) if values.size else np.zeros((0,), np.float32)
        vmax = values.max(axis=1) if values.size else np.zeros((0,), np.float32)
        scales = np.where(vmax > vmin, (vmax - vmin) / 255.0, 1.0).astype(np.float32)
        q = np.clip(
            np.rint((values - vmin[:, None]) / scales[:, None]) - 128, -128, 127
        ).astype(np.int8)
        self.dim = values.shape[1]
        self.ids = jnp.asarray(ids)
        self.values = jnp.asarray(q)
        self.scales = jnp.asarray(scales)
        self.zeros = jnp.asarray(vmin.astype(np.float32))

    @classmethod
    def from_checkpoint(cls, path: str) -> "QuantizedTable":
        from meepoembedding_tpu import checkpoint

        ids_parts, val_parts = [], []
        for data in checkpoint.iter_rows(path):
            ids_parts.append(data["ids"])
            val_parts.append(data["values"])
        if not ids_parts or sum(len(p) for p in ids_parts) == 0:
            dim = int(checkpoint.read_manifest(path)["dim"])
            return cls(np.zeros((0,), np.int64), np.zeros((0, dim), np.float32))
        return cls(np.concatenate(ids_parts), np.concatenate(val_parts))

    def __len__(self) -> int:
        return int(self.ids.shape[0])

    def nbytes(self) -> int:
        return int(self.ids.nbytes + self.values.nbytes + self.scales.nbytes
                   + self.zeros.nbytes)

    def lookup(self, ids64, train: bool = False) -> jax.Array:
        """[n] int64 -> [n, dim] f32 dequantized rows; absent ids -> zeros.
        `train` is accepted for ScoringService interface compatibility and
        must be False (the table is read-only)."""
        assert not train, "QuantizedTable is read-only"
        return _quant_lookup(self.ids, self.values, self.scales, self.zeros,
                             jnp.asarray(np.asarray(ids64, np.int64)))


@jax.jit
def _quant_lookup(sorted_ids, qvalues, scales, zeros, query):
    n_rows = sorted_ids.shape[0]
    if n_rows == 0:
        return jnp.zeros(query.shape + (qvalues.shape[1],), jnp.float32)
    pos = jnp.searchsorted(sorted_ids, query)
    pos_c = jnp.clip(pos, 0, n_rows - 1)
    found = sorted_ids[pos_c] == query
    q = jnp.take(qvalues, pos_c, axis=0).astype(jnp.float32) + 128.0
    rows = q * jnp.take(scales, pos_c)[:, None] + jnp.take(zeros, pos_c)[:, None]
    return jnp.where(found[:, None], rows, 0.0)
