"""Serve text->image retrieval over HTTP (production shape of the demo).

Runs anywhere on synthetic data; with real data, load released weights via
``models.checkpoint_torch.load_biencoder_checkpoint`` and a real corpus via
``Retriever.load_corpus`` / ``get_model_encoded_vecs``, and use
``data.tokenizer.WordPieceTokenizer(vocab_file)`` (the native tokenizer).

    python examples/serve_http.py [port]
    curl 'http://127.0.0.1:8080/search?q=two+dogs+play&top=5'

Concurrent clients coalesce into batched device calls (BatchingFrontend);
the device program is shared and serialized.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.serving import Retriever
from lightningdot_tpu.serving_frontend import BatchingFrontend
from lightningdot_tpu.serving_http import RetrievalServer


class SimpleTokenizer:
    """Stand-in for WordPieceTokenizer over the synthetic vocab."""

    def encode(self, text):
        return [101] + [106 + (hash(w) % 20000) for w in text.split()] + [102]


def main():
    from lightningdot_tpu.utils.runtime import setup_runtime

    setup_runtime()
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8080

    cfg = EncoderConfig(vocab_size=28996, project_dim=0)
    model = BiEncoder(cfg, cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))

    retriever = Retriever(model, params, SimpleTokenizer(),
                          quantization="int8", topk="approx")
    rng = np.random.default_rng(0)
    n = 20_000
    retriever.set_corpus([f"img_{i:08d}" for i in range(n)],
                         rng.standard_normal((n, 768)).astype(np.float32))

    frontend = BatchingFrontend(retriever, max_batch=64, max_wait_ms=2.0)
    frontend.warmup(top=100)
    with RetrievalServer(frontend, host="127.0.0.1", port=port) as srv:
        print(f"serving on {srv.address}  (Ctrl-C to stop)")
        try:
            import time

            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass


if __name__ == "__main__":
    main()
