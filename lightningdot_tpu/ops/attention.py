"""Multi-head self-attention: XLA einsum core + Pallas small-batch kernel.

Math parity with the reference's naive QKV attention
(uniter_model/model/layer.py:75-101): scores = q@k.T / sqrt(d) + additive
mask bias (0 for keep, -10000 for masked, uniter_model/model/model.py:362-365),
row softmax, optional dropout on the probabilities, probs@v.

TPU design: tensors stay in the projection-native [batch, seq, heads, dim]
layout — the head split is a free reshape and the per-head contraction is
expressed directly as einsums (``bqhd,bkhd->bhqk`` / ``bhqk,bkhd->bqhd``),
so XLA folds the head transposes into the matmuls instead of materialising
[B,H,S,S]-adjacent copies in HBM. Measured on v5e at the train shape
[96,65,12,64]: 32 us eval / 216 us with prob-dropout, vs 482 us for a
whole-block Pallas kernel and 247 us for the transpose-based layout
(scripts/perf_micro2.py). The Pallas whole-block kernel is kept for tiny
batches (serving batch~1), where the grid is small and everything lives in
VMEM. f32 accumulation everywhere; bf16 in/out supported.

The backward pass recomputes attention in jnp (XLA-fused), so the op is
differentiable on every backend; training with dropout uses the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lightningdot_tpu.ops.backend import backend

# largest batch*heads grid still dispatched to the whole-block Pallas kernel
# (beyond this the batched-einsum XLA form wins by a wide margin)
_PALLAS_MAX_GRID = 128


def _precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _attention_math(q, k, v, bias, scale, layout="bshd", defer=None):
    # q,k,v: [B, S, H, D] ('bshd') or [B, H, S, D] ('bnsd'); bias
    # broadcastable to [B, H, S, S] (same semantic axes either way).
    # ``defer``: None = auto (deferred softmax at bf16 unless
    # LDOT_DEFER_SOFTMAX=0 — read at TRACE time like the other LDOT_*
    # gates, so set it before the first jit of a program); the backward
    # recompute passes defer=False explicitly (the quotient form's vjp
    # was measured slower, PERF.md "Negative results").
    from lightningdot_tpu.ops.fused import _ATTN_EQS

    prec = _precision(q.dtype)
    scores = jnp.einsum(_ATTN_EQS[layout][0], q, k,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    scores = scores + bias.astype(jnp.float32)
    import os as _os

    if defer is None:
        defer = (q.dtype != jnp.float32
                 and _os.environ.get("LDOT_DEFER_SOFTMAX", "1") != "0")
    if q.dtype == jnp.float32 or not defer:
        # f32 parity path: reference softmax-then-matmul (layer.py:92-100)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(_ATTN_EQS[layout][1], probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32, precision=prec)
        return out.astype(v.dtype)
    # bf16 compute: deferred-normalization softmax. Writing normalized f32
    # probabilities costs two VMEM-write-bound passes over [B,H,S,S]
    # (measured 0.49 ms of a 3.28 ms batch-64 serving call); instead write
    # un-normalized exp(s-m) once in bf16, keep the f32 row denominator,
    # and divide AFTER the AV matmul — identical math (softmax is linear
    # in the numerator), the bf16 rounding merely moves from the
    # normalized probs to the un-normalized ones.
    m = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
    ex = jnp.exp(scores - m)                      # f32, fused with denom
    denom = jnp.sum(ex, axis=-1)                  # f32 [B,H,Sq]/[B,N,Sq]
    e = ex.astype(v.dtype)                        # one bf16 write
    out = jnp.einsum(_ATTN_EQS[layout][1], e, v,
                     preferred_element_type=jnp.float32, precision=prec)
    if layout == "bshd":                          # out [B,Sq,H,D]
        out = out / denom.transpose(0, 2, 1)[..., None]
    else:                                         # out [B,N,Sq,D]
        out = out / denom[..., None]
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
    """Whole-block kernel on the head-major [B,H,S,D] view.

    The grid blocks one (batch, head) program per [S, D] tile, which needs a
    head-major layout (a Mosaic block must tile the last two axes); the
    transposes from the projection-native layout are negligible at the tiny
    batches this kernel is gated to (<= _PALLAS_MAX_GRID programs).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, s, heads, d = q.shape
    q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
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
        out_shape=jax.ShapeDtypeStruct((batch, heads, s, d), q.dtype),
    )(q, k, v, bias_b)
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_nodrop(q, k, v, bias, scale, layout):
    small_grid = (q.shape[0] * q.shape[2] <= _PALLAS_MAX_GRID
                  and layout == "bshd")
    if backend() == "pallas" and bias.shape[-2] == 1 and small_grid:
        return _attention_pallas(q, k, v, bias, scale)
    return _attention_math(q, k, v, bias, scale, layout)


def _attention_nodrop_fwd(q, k, v, bias, scale, layout):
    return _attention_nodrop(q, k, v, bias, scale, layout), (q, k, v, bias)


def _attention_nodrop_bwd(scale, layout, res, g):
    q, k, v, bias = res

    def ref(q, k, v):
        # normalized form: the deferred quotient's autodiff backward adds
        # f32 [B,S,H,D] intermediates (measured +2.2 ms/step at B=96 on
        # the dropout core, PERF.md); same gradient up to bf16 rounding
        return _attention_math(q, k, v, bias, scale, layout, defer=False)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(bias)


_attention_nodrop.defvjp(_attention_nodrop_fwd, _attention_nodrop_bwd)


def multi_head_attention(q, k, v, bias, *, dropout_rate: float = 0.0,
                         dropout_rng=None, deterministic: bool = True,
                         layout: str = "bshd"):
    """Fused scaled-dot-product attention.

    Args:
      q, k, v: [batch, seq, heads, head_dim] (projection-native 'bshd'
        layout) or [batch, heads, seq, head_dim] ('bnsd' head-major).
      bias: additive mask, broadcastable to [batch, heads, seq, seq]
        (0 keep / -10000 drop, reference model.py:362-365).
      dropout_rate: attention-prob dropout (layer.py:95); only applied when
        ``deterministic`` is False.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if deterministic or dropout_rate == 0.0:
        return _attention_nodrop(q, k, v, bias, scale, layout)

    # Training path with prob dropout: fused custom-VJP (ops/fused.py) —
    # the backward pass recomputes scores/softmax, so no [B,H,S,S]
    # probabilities are stored between forward and backward. The keep mask
    # follows LDOT_DROPOUT_MASK: 'store' (default, bool residual — 4x
    # smaller than regenerating the u32 bits, which also pay a layout
    # copy) or 'regen' (no residual at all). The softmax runs in f32 for
    # stability; the probs are cast to the compute dtype BEFORE the
    # dropout mask so the mask traffic moves half as many bytes. Identical
    # expectation; only bf16 rounding of the kept probabilities differs
    # from the reference.
    from lightningdot_tpu.ops import fused

    if fused.fused_enabled():
        return fused.attention_prob_dropout(q, k, v, bias, dropout_rng,
                                            rate=dropout_rate, scale=scale,
                                            prec=_precision(q.dtype),
                                            layout=layout)
    keydata, impl = fused.key_data_of(dropout_rng)
    return fused._attn_drop_math(q, k, v, bias, keydata, dropout_rate,
                                 scale, impl, _precision(q.dtype), layout)
