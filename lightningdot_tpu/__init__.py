"""LightningDOT-TPU: a TPU-native dual-encoder image-text retrieval framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
intersun/LightningDOT (NAACL 2021): BERT-base text tower + UNITER-style
image-region tower producing 768-d CLS embeddings, dot-product retrieval
over an on-device sharded dense index, UNITER-style multi-task pre-training
(MLM/MRFR/MRC-kl/ITM), ITM fine-tuning with in-batch + mined hard negatives,
knowledge distillation from a cross-encoder teacher, and a second-stage
cross-encoder re-ranker.

Design notes (TPU-first, not a port):
  * models are pure pytrees + functional apply, jitted end to end;
  * attention / layernorm run as fused Pallas kernels on TPU (XLA fallback
    elsewhere);
  * data parallelism is a `jax.sharding.Mesh` with XLA collectives; global
    in-batch negatives fall out of jitting the global batch (the reference's
    dead DPR-style path, dvl/utils.py:114-169, made real);
  * FAISS is replaced by a sharded MXU matmul + `lax.top_k` merge and a
    native C++ HNSW (dvl/indexer/faiss_indexers.py equivalents);
  * LMDB is replaced by a native C++ mmap key-value store (native/ldkv.cc)
    with a pure-python fallback.

See PARITY.md for the component-by-component map and PERF.md for measured
numbers.
"""

__version__ = "0.1.0"

from lightningdot_tpu import const  # noqa: F401
from lightningdot_tpu.config import EncoderConfig  # noqa: F401


def __getattr__(name):
    # lazy heavyweight imports so `import lightningdot_tpu` stays light
    if name == "BiEncoder":
        from lightningdot_tpu.models.bi_encoder import BiEncoder
        return BiEncoder
    if name == "CrossEncoder":
        from lightningdot_tpu.models.cross_encoder import CrossEncoder
        return CrossEncoder
    if name == "Retriever":
        from lightningdot_tpu.serving import Retriever
        return Retriever
    if name == "BatchingFrontend":
        from lightningdot_tpu.serving_frontend import BatchingFrontend
        return BatchingFrontend
    if name == "RetrievalServer":
        from lightningdot_tpu.serving_http import RetrievalServer
        return RetrievalServer
    if name == "WordPieceTokenizer":
        from lightningdot_tpu.data.tokenizer import WordPieceTokenizer
        return WordPieceTokenizer
    if name == "DenseFlatIndex":
        from lightningdot_tpu.index import DenseFlatIndex
        return DenseFlatIndex
    raise AttributeError(name)
