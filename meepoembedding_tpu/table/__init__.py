from meepoembedding_tpu.table.layout import TableSpec, TableShard  # noqa: F401
from meepoembedding_tpu.table.runtime import DynamicEmbeddingTable  # noqa: F401
