"""Multi-head self-attention: fused Pallas TPU kernel + XLA reference.

Math parity with the reference's naive QKV attention
(uniter_model/model/layer.py:75-101): scores = q@k.T / sqrt(d) + additive
mask bias (0 for keep, -10000 for masked, uniter_model/model/model.py:362-365),
row softmax, optional dropout on the probabilities, probs@v.

TPU design: sequences here are short (<=512: 60 text tokens / ~101 regions /
512 joint), so instead of a streaming flash kernel the Pallas kernel computes
the whole S x S score block per (batch, head) program entirely in VMEM —
one MXU matmul, fused softmax, one MXU matmul — never materialising the
attention matrix in HBM. f32 accumulation, bf16 in/out supported.

The backward pass recomputes attention in jnp (XLA-fused), so the op is
differentiable on every backend; training with dropout uses the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lightningdot_tpu.ops.backend import backend


def _precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _attention_math(q, k, v, bias, scale):
    # q,k,v: [B, H, S, D]; bias: broadcastable to [B, H, S, S]
    prec = _precision(q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.astype(v.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, prec):
    q = q_ref[0, 0].astype(jnp.float32)         # [S, D]
    k = k_ref[0, 0].astype(jnp.float32)         # [S, D]
    v = v_ref[0, 0].astype(jnp.float32)         # [S, D]
    b = bias_ref[0].astype(jnp.float32)         # [1, S] -> broadcast rows
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec) * scale
    scores = scores + b
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32,
                  precision=prec)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _attention_pallas(q, k, v, bias, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, heads, s, d = q.shape
    bias_b = jnp.broadcast_to(bias, (batch, 1, 1, s)).reshape(batch, 1, s)

    grid = (batch, heads)
    qkv_spec = pl.BlockSpec((1, 1, s, d), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    # one [1, S] mask row per batch, shared across heads
    bias_spec = pl.BlockSpec((1, 1, s), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale,
                          prec=_precision(q.dtype)),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, bias_b)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_nodrop(q, k, v, bias, scale):
    if backend() == "pallas" and bias.shape[-2] == 1:
        return _attention_pallas(q, k, v, bias, scale)
    return _attention_math(q, k, v, bias, scale)


def _attention_nodrop_fwd(q, k, v, bias, scale):
    return _attention_nodrop(q, k, v, bias, scale), (q, k, v, bias)


def _attention_nodrop_bwd(scale, res, g):
    q, k, v, bias = res

    def ref(q, k, v):
        return _attention_math(q, k, v, bias, scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(bias)


_attention_nodrop.defvjp(_attention_nodrop_fwd, _attention_nodrop_bwd)


def multi_head_attention(q, k, v, bias, *, dropout_rate: float = 0.0,
                         dropout_rng=None, deterministic: bool = True):
    """Fused scaled-dot-product attention.

    Args:
      q, k, v: [batch, heads, seq, head_dim].
      bias: additive mask, broadcastable to [batch, heads, seq, seq]
        (0 keep / -10000 drop, reference model.py:362-365).
      dropout_rate: attention-prob dropout (layer.py:95); only applied when
        ``deterministic`` is False.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if deterministic or dropout_rate == 0.0:
        return _attention_nodrop(q, k, v, bias, scale)

    # Training path with prob dropout: XLA (autodiff-native).
    prec = _precision(q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
    probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.astype(v.dtype)
