"""Headline benchmark: end-to-end query latency on full-COCO-scale retrieval.

The reference's north star (BASELINE.json): real-time image-text retrieval —
encode a text query with the BERT-base tower and retrieve top-100 from a
123,287-image corpus (full MSCOCO scale). Target: <10 ms p50 on one chip.

Methodology (this harness reaches the TPU through an async relay where
``block_until_ready`` does NOT actually wait — only a host value pull does):
the whole pipeline (token ids -> text tower -> 768-d vec -> MXU matmul vs
corpus -> top-k) runs as ONE jitted ``while_loop`` with a serial dependency
between iterations (query i+1's tokens derive from query i's top-1 result),
and latency is the slope between a 2-iteration and an (2+N)-iteration run,
each closed by a real device->host pull. This cancels dispatch/RTT constants
and makes pipelining impossible.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_CORPUS = 123_287          # full-COCO image count
TOP_K = 100
QUERY_LEN = 32              # typical caption length incl CLS/SEP
BASELINE_P50_MS = 10.0      # BASELINE.md target
N_ITERS = 100


def main():
    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.models import encoder as enc

    rng = np.random.default_rng(0)
    cfg = EncoderConfig(vocab_size=28996, project_dim=0)
    params = enc.init_encoder_tower(jax.random.PRNGKey(0), cfg,
                                    with_img=False)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)

    corpus = jnp.asarray(
        rng.standard_normal((N_CORPUS + (-N_CORPUS) % 128, 768)),
        dtype=jnp.bfloat16)

    mask = jnp.ones((1, QUERY_LEN), jnp.int32)
    pos = jnp.arange(QUERY_LEN, dtype=jnp.int32)[None, :]

    def query(ids, corpus):
        _, vec = enc.encode_text(params, cfg, ids, mask, pos,
                                 dtype=jnp.bfloat16)
        scores = jnp.dot(vec.astype(jnp.bfloat16), corpus.T,
                         preferred_element_type=jnp.float32)
        return jax.lax.top_k(scores[0], TOP_K)

    @jax.jit
    def chained(ids, corpus, n):
        def cond(c):
            return c[0] < n

        def body(c):
            i, ids, acc = c
            top_s, top_i = query(ids, corpus)
            ids = (ids + top_i[0].astype(jnp.int32)) % 28000 + 106
            return i + 1, ids, acc + top_s[0]

        return jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), ids, jnp.float32(0)))

    ids0 = jnp.asarray(rng.integers(106, 28996, (1, QUERY_LEN)),
                       dtype=jnp.int32)
    float(chained(ids0, corpus, jnp.int32(1))[2])  # compile + real sync

    def total(n):
        t0 = time.perf_counter()
        out = chained(ids0, corpus, jnp.int32(n))
        float(out[2])  # genuine device->host sync
        return time.perf_counter() - t0

    base = min(total(2) for _ in range(3))
    long = min(total(2 + N_ITERS) for _ in range(3))
    p50_ms = (long - base) / N_ITERS * 1000.0

    print(json.dumps({
        "metric": "full_coco_123k_query_latency_p50",
        "value": round(p50_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / p50_ms, 2),
    }))


if __name__ == "__main__":
    main()
