"""Serving latency/QPS across Retriever quantization configs x batch sizes
(full-COCO scale).

Same slope methodology as bench.py, driving each config's own fused
Retriever program. Run on the TPU:

    python scripts/perf_serving_quant.py [batch ...]   (default: 1 16 64 128)

Round-2 finding: int8 anything loses at batch 1 (HBM-bound regime, the
bf16 corpus scan dominates). VERDICT r2 item 3: the batch>=16 calls are
compute-heavy, where the int8 MXU path may win — this sweep decides the
QPS-optimal config per batch.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models import encoder as enc
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.serving import Retriever
from lightningdot_tpu.utils.runtime import setup_runtime

N_CORPUS, TOP_K = 123_287, 100
QUERY_LEN = int(os.environ.get("LDOT_SERVE_QLEN", "32"))  # bucket ladder

CONFIGS = [
    ({}, "bf16 weights + bf16 corpus"),
    ({"quantization": "int8"}, "bf16 weights + int8 corpus"),
    ({"weight_quantization": "int8"}, "int8 weights + bf16 corpus"),
    ({"quantization": "int8", "weight_quantization": "int8"},
     "int8 weights + int8 corpus"),
]
if os.environ.get("LDOT_SERVE_TOPK") == "approx":
    CONFIGS = [(dict(kw, topk="approx", topk_recall=0.95),
                tag + " + approx topk") for kw, tag in CONFIGS]
if os.environ.get("LDOT_SERVE_CONFIGS"):
    wanted = os.environ["LDOT_SERVE_CONFIGS"].split(",")
    CONFIGS = [c for c in CONFIGS if any(w in c[1] for w in wanted)]


class Tok:
    def encode(self, text):
        return [101] + [106 + (hash(w) % 28000) for w in text.split()] + [102]


def measure(retriever, batch: int = 1, n_iters: int = None) -> float:
    """ms per fused-program call at the given query batch (slope method)."""
    if n_iters is None:
        n_iters = 100 if batch <= 16 else 40
    query_fn = retriever._query_fn(QUERY_LEN, TOP_K)
    enc_params = retriever._enc_params()
    scales = (retriever._scales if retriever._scales is not None
              else jnp.zeros((0,), jnp.float32))
    mask = jnp.ones((batch, QUERY_LEN), jnp.int32)

    @jax.jit
    def chained(ids, corpus, bias, n):
        def cond(c):
            return c[0] < n

        def body(c):
            i, ids, acc = c
            s, _ = query_fn(enc_params, ids, mask, corpus, bias, scales)
            # serial dependency: next ids derive from this call's scores
            ids = (ids + s[:, :1].astype(jnp.int32)) % 28000 + 106
            return i + 1, ids, acc + s[0, 0]

        return jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), ids, jnp.float32(0)))

    rng = np.random.default_rng(1)
    ids0 = jnp.asarray(rng.integers(106, 28996, (batch, QUERY_LEN)),
                       jnp.int32)
    args = (ids0, retriever._corpus, retriever._bias)
    float(chained(*args, jnp.int32(1))[2])  # compile + real sync

    def total(n):
        t0 = time.perf_counter()
        float(chained(*args, jnp.int32(n))[2])
        return time.perf_counter() - t0

    # median of slope pairs (single relay hiccup corrupts only one pair)
    slopes = sorted((total(2 + n_iters) - total(2)) / n_iters
                    for _ in range(5))
    return slopes[2] * 1000.0


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 16, 64, 128]
    setup_runtime()
    rng = np.random.default_rng(0)
    cfg = EncoderConfig(vocab_size=28996, project_dim=0)
    tower = enc.init_encoder_tower(jax.random.PRNGKey(0), cfg,
                                   with_img=False)
    tower = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), tower)
    model = BiEncoder(cfg, cfg, compute_dtype=jnp.bfloat16)
    params = {"txt_model": tower, "img_model": {}}
    corpus = rng.standard_normal((N_CORPUS, 768)).astype(np.float32)
    ids = [f"coco_{i:012}.npz" for i in range(N_CORPUS)]

    for kw, tag in CONFIGS:
        r = Retriever(model, params, Tok(), query_buckets=(QUERY_LEN,), **kw)
        r.set_corpus(ids, corpus)
        for b in batches:
            ms = measure(r, batch=b)
            print(f"{tag} | batch {b:4d}: {ms:8.3f} ms/call -> "
                  f"{b / ms * 1000:7.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
