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

from meepoembedding_tpu.config import (  # noqa: F401
    TableConfig,
    OptimizerConfig,
    PolicyConfig,
    RunConfig,
)
from meepoembedding_tpu.table.runtime import DynamicEmbeddingTable  # noqa: F401
