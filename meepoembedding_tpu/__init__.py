"""meepoembedding_tpu — a TPU-native dynamic (lookuptable-style) embedding engine.

A from-scratch JAX/XLA/Pallas re-design of the system class described by the
reference project MeepoEmbedding (`/root/reference/README.md:2`):

    "A distributed high-performance dynamic lookuptable-style Embedding
     designed for recommendation, search, CTR and advertising systems.
     Supports GPU, CPU, remote distributed KV (such as Redis), SSD, and
     other backends."

TPU-native realization (see SURVEY.md §1 for the layer map):

- Hash-keyed, growable/evictable embedding tables stored as flat JAX arrays
  in HBM (bucketized open addressing; one bucket == one 128-lane vector row).
- Lookup / insert / sparse-optimizer update as vectorized XLA programs with
  Pallas kernels for the hot gather/scatter paths.
- Row-sharding across a device mesh via `jax.shard_map` with all-to-all ID
  exchange (the TPU equivalent of the reference class's NCCL/PS layer).
- Host-DRAM (C++), remote-KV and disk spill tiers behind one KVBackend
  protocol (the reference's "GPU, CPU, Redis, SSD, and other backends").
- Streaming sharded checkpoints with elastic reshard-on-restore.
"""

__version__ = "0.1.0"

import os as _os

# Honor JAX_PLATFORMS BEFORE the imports below can initialize a jax backend
# (importing pallas modules creates the client): plugin-registered backends
# (e.g. a tunneled TPU) can PREPEND themselves to the platform list and win
# selection even when the env var names "cpu". Only strip exactly that
# prepended prefix — never override a platform the program already chose via
# jax.config.update (conftests do that before importing this package).
_plat = _os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax as _jax

    _cur = str(_jax.config.jax_platforms or "")
    if _cur != _plat and _cur.endswith("," + _plat):
        _jax.config.update("jax_platforms", _plat)

from meepoembedding_tpu.config import (  # noqa: F401
    TableConfig,
    OptimizerConfig,
    PolicyConfig,
    RunConfig,
)
from meepoembedding_tpu.table.runtime import DynamicEmbeddingTable  # noqa: F401

# Heavier surfaces (trainers, TableGroup, serving) import from their modules:
#   from meepoembedding_tpu import embed          # differentiable lookup op
#   from meepoembedding_tpu.train import Trainer
#   from meepoembedding_tpu.group_train import GroupTrainer
#   from meepoembedding_tpu.table.group import TableGroup
#   from meepoembedding_tpu.parallel.trainer import ShardedTrainer
