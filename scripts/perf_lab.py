"""Performance lab: candidate optimizations for the serving query path.

Measures batch-1 text-tower latency variants on the attached TPU:
  A. current encoder (scan over layers, separate Q/K/V matmuls)
  B. fused QKV (one [H, 3H] matmul per layer)
  C. fused QKV + fused attention-out (fewer kernels)

Each timed with a serial dependency chain (no pipelining).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models import encoder as enc
from lightningdot_tpu.ops import gelu, layer_norm, multi_head_attention

S = 32
cfg = EncoderConfig(vocab_size=28996)


def serial_time(fn, ids, n=50):
    @jax.jit
    def chain(ids, n):
        def body(_, carry):
            ids, acc = carry
            v = fn(ids)
            ids = (ids + jnp.argmax(v).astype(jnp.int32)) % 28000 + 1
            return ids, acc + jnp.sum(v)

        return jax.lax.fori_loop(0, n, body, (ids, jnp.float32(0)))

    out = chain(ids, 2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chain(ids, n)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    params = enc.init_encoder_tower(jax.random.PRNGKey(0), cfg,
                                    with_img=False)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    mask = jnp.ones((1, S), jnp.int32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]
    ids0 = jnp.ones((1, S), jnp.int32)

    # A: current
    def encode_a(ids):
        _, p = enc.encode_text(params, cfg, ids, mask, pos,
                               dtype=jnp.bfloat16)
        return p

    print(f"A current:        {serial_time(encode_a, ids0):.3f} ms",
          flush=True)

    # B: fused QKV, precomputed outside jit
    L = params["layers"]
    qkv_k = jnp.concatenate([L["attn"]["query"]["kernel"],
                             L["attn"]["key"]["kernel"],
                             L["attn"]["value"]["kernel"]], axis=2)
    qkv_b = jnp.concatenate([L["attn"]["query"]["bias"],
                             L["attn"]["key"]["bias"],
                             L["attn"]["value"]["bias"]], axis=1)
    bias4 = enc.attention_bias(mask)

    def layer_b(h, lp, qk, qb):
        b, s, hd = h.shape
        qkv = (jnp.dot(h, qk, preferred_element_type=jnp.float32)
               + qb).astype(h.dtype)
        q, k, v = qkv[..., :768], qkv[..., 768:1536], qkv[..., 1536:]

        def sh(x):
            return x.reshape(b, s, 12, 64)  # [B,S,h,d] layout

        ctx = multi_head_attention(sh(q), sh(k), sh(v), bias4)
        ctx = ctx.reshape(b, s, hd)
        ap, mp = lp["attn"], lp["mlp"]
        a = enc._dense(ap["output"], ctx, jnp.bfloat16)
        a = layer_norm(a + h, ap["ln"]["scale"], ap["ln"]["bias"], 1e-12)
        i = gelu(enc._dense(mp["intermediate"], a, jnp.bfloat16))
        o = enc._dense(mp["output"], i, jnp.bfloat16)
        return layer_norm(o + a, mp["ln"]["scale"], mp["ln"]["bias"], 1e-12)

    def encode_b(ids):
        emb = enc.text_embeddings(params["embeddings"], cfg, ids, pos, None,
                                  dtype=jnp.bfloat16)

        def body(h, xs):
            lp, qk, qb = xs
            return layer_b(h, lp, qk, qb), None

        h, _ = jax.lax.scan(body, emb, (params["layers"], qkv_k, qkv_b))
        return h[:, 0]

    print(f"B fused qkv:      {serial_time(encode_b, ids0):.3f} ms",
          flush=True)

    # C: B + unrolled python loop over layers (no scan)
    layer_list = [jax.tree.map(lambda x, i=i: x[i], params["layers"])
                  for i in range(12)]
    qkv_k_list = [qkv_k[i] for i in range(12)]
    qkv_b_list = [qkv_b[i] for i in range(12)]

    def encode_c(ids):
        h = enc.text_embeddings(params["embeddings"], cfg, ids, pos, None,
                                dtype=jnp.bfloat16)
        for lp, qk, qb in zip(layer_list, qkv_k_list, qkv_b_list):
            h = layer_b(h, lp, qk, qb)
        return h[:, 0]

    print(f"C fused+unrolled: {serial_time(encode_c, ids0):.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
