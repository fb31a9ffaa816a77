"""Serving latency across Retriever quantization configs (full-COCO scale).

Same slope methodology as bench.py, driving each config's own fused
Retriever program. Run on the TPU.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models import encoder as enc
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.serving import Retriever
from lightningdot_tpu.utils.runtime import setup_runtime

N_CORPUS, TOP_K, QUERY_LEN, N_ITERS = 123_287, 100, 32, 100


class Tok:
    def encode(self, text):
        return [101] + [106 + (hash(w) % 28000) for w in text.split()] + [102]


def measure(retriever):
    query_fn = retriever._query_fn(QUERY_LEN, TOP_K)
    enc_params = retriever._enc_params()
    scales = (retriever._scales if retriever._scales is not None
              else jnp.zeros((0,), jnp.float32))
    mask = jnp.ones((1, QUERY_LEN), jnp.int32)

    @jax.jit
    def chained(ids, corpus, bias, n):
        def cond(c):
            return c[0] < n

        def body(c):
            i, ids, acc = c
            s, _ = query_fn(enc_params, ids, mask, corpus, bias, scales)
            ids = (ids + s[0, 0].astype(jnp.int32)) % 28000 + 106
            return i + 1, ids, acc + s[0, 0]

        return jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), ids, jnp.float32(0)))

    rng = np.random.default_rng(1)
    ids0 = jnp.asarray(rng.integers(106, 28996, (1, QUERY_LEN)), jnp.int32)
    args = (ids0, retriever._corpus, retriever._bias)
    float(chained(*args, jnp.int32(1))[2])

    def total(n):
        t0 = time.perf_counter()
        float(chained(*args, jnp.int32(n))[2])
        return time.perf_counter() - t0

    base = min(total(2) for _ in range(3))
    long = min(total(2 + N_ITERS) for _ in range(3))
    return (long - base) / N_ITERS * 1000.0


def main():
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

    for kw, tag in [({}, "bf16 weights + bf16 corpus"),
                    ({"quantization": "int8"}, "bf16 weights + int8 corpus"),
                    ({"weight_quantization": "int8"},
                     "int8 weights + bf16 corpus"),
                    ({"quantization": "int8",
                      "weight_quantization": "int8"},
                     "int8 weights + int8 corpus")]:
        r = Retriever(model, params, Tok(), query_buckets=(QUERY_LEN,), **kw)
        r.set_corpus(ids, corpus)
        ms = measure(r)
        print(f"{tag}: {ms:.3f} ms p50", flush=True)


if __name__ == "__main__":
    main()


def batch_qps(batch=64):
    """Batched-query throughput via the Retriever program."""
    setup_runtime()
    rng = np.random.default_rng(0)
    cfg = EncoderConfig(vocab_size=28996, project_dim=0)
    tower = enc.init_encoder_tower(jax.random.PRNGKey(0), cfg,
                                   with_img=False)
    tower = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), tower)
    model = BiEncoder(cfg, cfg, compute_dtype=jnp.bfloat16)
    r = Retriever(model, {"txt_model": tower, "img_model": {}}, Tok(),
                  query_buckets=(QUERY_LEN,))
    r.set_corpus([f"i{i}" for i in range(N_CORPUS)],
                 rng.standard_normal((N_CORPUS, 768)).astype(np.float32))
    query_fn = r._query_fn(QUERY_LEN, TOP_K)
    enc_params = r._enc_params()
    scales = jnp.zeros((0,), jnp.float32)
    mask = jnp.ones((batch, QUERY_LEN), jnp.int32)

    @jax.jit
    def chained(ids, corpus, bias, n):
        def cond(c):
            return c[0] < n

        def body(c):
            i, ids, acc = c
            s, _ = query_fn(enc_params, ids, mask, corpus, bias, scales)
            ids = (ids + s[:, :1].astype(jnp.int32)) % 28000 + 106
            return i + 1, ids, acc + s[0, 0]

        return jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), ids, jnp.float32(0)))

    ids0 = jnp.asarray(rng.integers(106, 28996, (batch, QUERY_LEN)),
                       jnp.int32)
    args = (ids0, r._corpus, r._bias)
    float(chained(*args, jnp.int32(1))[2])

    def total(n):
        t0 = time.perf_counter()
        float(chained(*args, jnp.int32(n))[2])
        return time.perf_counter() - t0

    n_iters = 60
    base = min(total(2) for _ in range(3))
    long = min(total(2 + n_iters) for _ in range(3))
    dt = (long - base) / n_iters
    print(f"batch-{batch} query: {dt*1e3:.2f} ms/call -> "
          f"{batch/dt:.0f} QPS/chip", flush=True)
