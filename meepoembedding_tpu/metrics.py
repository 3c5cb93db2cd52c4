"""Metrics/logging/observability (SURVEY.md C22).

- StreamingAUC: fixed-bin histogram rank-sum AUC — O(1) memory, jit-friendly
  update (pos/neg histograms over sigmoid-score bins), exact in the limit of
  bin count. This is the eval gate for BASELINE.json "AUC parity".
- Meter: scalar EMA/mean meters for loss/throughput.
- JsonlLogger: append-one-JSON-object-per-line run logs.
"""

from __future__ import annotations

import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class StreamingAUC:
    def __init__(self, num_bins: int = 8192):
        self.num_bins = num_bins
        self.pos = np.zeros(num_bins, np.float64)
        self.neg = np.zeros(num_bins, np.float64)

    @staticmethod
    def _bin_counts(logits, labels, num_bins: int):
        """jit-friendly histogram update; returns (pos_hist, neg_hist)."""
        p = jax.nn.sigmoid(logits.reshape(-1).astype(jnp.float32))
        idx = jnp.clip((p * num_bins).astype(jnp.int32), 0, num_bins - 1)
        y = labels.reshape(-1).astype(jnp.float32)
        pos = jnp.zeros(num_bins, jnp.float32).at[idx].add(y)
        neg = jnp.zeros(num_bins, jnp.float32).at[idx].add(1.0 - y)
        return pos, neg

    def update(self, logits, labels):
        pos, neg = jax.jit(self._bin_counts, static_argnums=(2,))(
            logits, labels, self.num_bins
        )
        self.pos += np.asarray(pos, np.float64)
        self.neg += np.asarray(neg, np.float64)

    def compute(self) -> float:
        """AUC = P(score_pos > score_neg) + 0.5 P(equal), from histograms."""
        npos, nneg = self.pos.sum(), self.neg.sum()
        if npos == 0 or nneg == 0:
            return 0.5
        cum_neg = np.cumsum(self.neg) - self.neg  # negs strictly below bin
        wins = np.sum(self.pos * cum_neg)
        ties = np.sum(self.pos * self.neg) * 0.5
        return float((wins + ties) / (npos * nneg))

    def reset(self):
        self.pos[:] = 0
        self.neg[:] = 0


class Meter:
    """Running mean + last value."""

    def __init__(self):
        self.sum = 0.0
        self.n = 0
        self.last = 0.0

    def update(self, v: float):
        v = float(v)
        self.sum += v
        self.n += 1
        self.last = v

    @property
    def mean(self) -> float:
        return self.sum / max(1, self.n)


class JsonlLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = open(path, "a") if path else None

    def log(self, **kv):
        kv.setdefault("t", time.time())
        line = json.dumps(kv, default=float)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line, flush=True)

    def close(self):
        if self._fh:
            self._fh.close()


class Timer:
    """Wall-clock timer that blocks on device work for honest step timing."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self, *block_on) -> float:
        for x in block_on:
            jax.block_until_ready(x)
        t = time.perf_counter()
        dt = t - self.t0
        self.t0 = t
        return dt
