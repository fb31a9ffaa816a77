"""Headline benchmark: end-to-end query latency on full-COCO-scale retrieval.

The reference's north star (BASELINE.json): real-time image-text retrieval —
encode a text query with the BERT-base tower and retrieve top-100 from a
123,287-image corpus (full MSCOCO, README/paper scale). Target: <10 ms p50
on one chip.

Measures the fused jitted pipeline (token ids -> text tower -> 768-d vec ->
MXU matmul vs corpus -> top-k) with a serial dependency chain so each
iteration's input depends on the previous output — pipelining cannot hide
per-query latency. Host<->device relay round-trips are excluded (they are an
artifact of this harness's TPU tunnel, not the serving path).

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

    @jax.jit
    def query(ids, corpus):
        _, vec = enc.encode_text(params, cfg, ids, mask, pos,
                                 dtype=jnp.bfloat16)
        scores = jnp.dot(vec.astype(jnp.bfloat16), corpus.T,
                         preferred_element_type=jnp.float32)
        top_s, top_i = jax.lax.top_k(scores[0], TOP_K)
        return top_s, top_i

    ids0 = jnp.asarray(rng.integers(106, 28996, (1, QUERY_LEN)),
                       dtype=jnp.int32)

    # compile
    s, i = query(ids0, corpus)
    jax.block_until_ready((s, i))

    # serial chain: next query's ids depend on previous top-1 index
    @jax.jit
    def chained(ids, corpus, n):
        def body(_, carry):
            ids, acc = carry
            top_s, top_i = query(ids, corpus)
            ids = (ids + top_i[0].astype(jnp.int32)) % 28000 + 106
            return ids, acc + top_s[0]

        return jax.lax.fori_loop(0, n, body, (ids, jnp.float32(0)))

    n_iter = 50
    out = chained(ids0, corpus, 2)  # compile the loop
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(ids0, corpus, n_iter)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    p50_ms = elapsed / n_iter * 1000.0

    print(json.dumps({
        "metric": "full_coco_123k_query_latency_p50",
        "value": round(p50_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / p50_ms, 2),
    }))


if __name__ == "__main__":
    main()
