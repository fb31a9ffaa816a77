"""Dense retrieval indexes (TPU-native FAISS replacement).

API parity with dvl/indexer/faiss_indexers.py: ``index_data([(id, vec)])``,
``search_knn(queries, top_docs) -> [(db_ids, scores)]``, ``serialize`` /
``deserialize_from`` — but the search itself is one MXU matmul + on-device
``lax.top_k``, optionally sharded over the corpus axis of a device mesh with
an all-gather merge over ICI.
"""

from lightningdot_tpu.index.dense import (  # noqa: F401
    DenseFlatIndex, DenseFlatIndexer, DenseShardedIndex,
)
from lightningdot_tpu.index.hnsw import DenseHNSWFlatIndexer  # noqa: F401
