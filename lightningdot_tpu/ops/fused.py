"""Fused training-path compositions with residual-storage control.

The default autodiff of ``dropout -> residual-add -> LayerNorm`` (two sites
per BertLayer, uniter_model/model/layer.py:120-170) materialises the
LayerNorm input for the backward pass — pure HBM traffic on TPU. These
custom-VJP compositions save only tensors that are already live (the
matmul output, the residual stream) plus, under the default
LDOT_DROPOUT_MASK='store' policy, the bool keep-mask (1 byte/elem —
measured cheaper than the 'regen' policy, whose backward re-draws the u32
bits at 4 bytes/elem and pays a layout copy next to the attention
einsums); the LayerNorm input is always recomputed. XLA fuses each side
into one kernel with no other intermediate round-trips.

Same treatment for attention-probability dropout (layer.py:95): the fused
op saves (q, k, v, bias, key) and recomputes scores/softmax/mask in the
backward pass — the recomputed score einsum is ~1 GFLOP/layer (microseconds
on the MXU) versus megabytes of saved [B,H,S,S] probabilities + mask.

Numerics are bit-identical to the unfused forms (same bernoulli call, same
bf16 rounding points); tests/test_fused.py asserts exact forward equality
and tight gradient agreement against the unfused compositions.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def fused_enabled() -> bool:
    """A/B switch for perf forensics: LDOT_FUSED=0 restores the unfused
    (default-autodiff) training compositions."""
    return os.environ.get("LDOT_FUSED", "1") != "0"


def _float0(x):
    return np.zeros(np.shape(x), jax.dtypes.float0)


def _key(keydata, impl):
    return jax.random.wrap_key_data(keydata, impl=impl)


def key_data_of(rng):
    """(key_data, impl_name) for shipping a PRNG key through a custom_vjp.

    Typed keys carry their impl; legacy raw uint32 keys use the configured
    default impl (threefry2x32 unless overridden). Rebuilding with
    ``wrap_key_data`` reproduces the exact same random stream.
    """
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(rng), str(jax.random.key_impl(rng))
    return rng, str(jax.config.jax_default_prng_impl)


def _mask_stored() -> bool:
    """Dropout-mask residual policy: 'store' (default) keeps the bool keep
    mask for the backward pass (1 byte/elem); 'regen' regenerates it from
    the key (the rng-bit-generator emits 4 byte/elem u32 bits which then
    pay a layout copy next to the attention einsums). Measured on v5e at
    the ITM train shape: store 62.1 ms/step vs regen 63.3 (device-loop
    slope, scripts/perf_train_device_loop.py)."""
    return os.environ.get("LDOT_DROPOUT_MASK", "store") != "regen"


def _keep_mask(keydata, rate, shape, impl):
    """Bit-identical to encoder._dropout's bernoulli call."""
    return jax.random.bernoulli(_key(keydata, impl), 1.0 - rate, shape)


def _apply_keep(x, keep, rate):
    """Inverted dropout given the keep mask (scale rounded to x.dtype,
    matching encoder._dropout)."""
    return x * keep.astype(x.dtype) * jnp.asarray(1.0 / (1.0 - rate), x.dtype)


def _apply_mask(x, keydata, rate, impl):
    return _apply_keep(x, _keep_mask(keydata, rate, x.shape, impl), rate)


def _ln_f32(u, scale, bias, eps):
    """f32 LayerNorm, cast back — delegates to the ONE LN formula
    (ops/layernorm._ln_math) so the fused and unfused paths cannot
    diverge."""
    from lightningdot_tpu.ops.layernorm import _ln_math

    return _ln_math(u.astype(jnp.float32), scale, bias, eps).astype(u.dtype)


def _dal_math(x, res, scale, bias, keydata, rate, eps, impl):
    if rate > 0.0:
        x = _apply_mask(x, keydata, rate, impl)
    return _ln_f32(x + res, scale, bias, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _dal(x, res, scale, bias, keydata, rate, eps, impl):
    return _dal_math(x, res, scale, bias, keydata, rate, eps, impl)


def _dal_fwd(x, res, scale, bias, keydata, rate, eps, impl):
    keep = (None if rate == 0.0 or not _mask_stored()
            else _keep_mask(keydata, rate, x.shape, impl))
    if keep is None:
        out = _dal_math(x, res, scale, bias, keydata, rate, eps, impl)
    else:
        out = _ln_f32(_apply_keep(x, keep, rate) + res, scale, bias, eps)
    return out, (x, res, scale, bias, keydata, keep)


def _dal_bwd(rate, eps, impl, residuals, g):
    x, res, scale, bias, keydata, keep = residuals
    if keep is None:
        def f(x_, res_, scale_, bias_):
            return _dal_math(x_, res_, scale_, bias_, keydata, rate, eps,
                             impl)
    else:
        def f(x_, res_, scale_, bias_):
            return _ln_f32(_apply_keep(x_, keep, rate) + res_, scale_,
                           bias_, eps)
    _, vjp = jax.vjp(f, x, res, scale, bias)
    dx, dres, dscale, dbias = vjp(g)
    return dx, dres, dscale, dbias, _float0(keydata)


_dal.defvjp(_dal_fwd, _dal_bwd)


def dropout_add_ln(x, res, scale, bias, rng, *, rate: float,
                   eps: float) -> jnp.ndarray:
    """``LayerNorm(dropout(x) + res)`` storing no LN input (and, under the
    'regen' policy, no mask either — see _mask_stored).

    Parity: BertSelfOutput / BertOutput (layer.py:110-122,147-157). ``rng``
    may be None only with rate 0 (the mask-free fused add+LN) — a missing
    key with a non-zero rate is a caller bug that must fail fast, exactly
    like jax.random.bernoulli(None) in the unfused path.
    """
    if rate == 0.0:
        keydata, impl = jnp.zeros((2,), jnp.uint32), "threefry2x32"
    elif rng is None:
        raise ValueError("dropout_add_ln: rate > 0 requires an rng key")
    else:
        keydata, impl = key_data_of(rng)
    return _dal(x, res, scale, bias, keydata, float(rate), float(eps), impl)


# ---------------------------------------------------------------------------
# Attention with probability dropout (training path)
# ---------------------------------------------------------------------------

# einsum equations per q/k/v layout: (scores, probs@v). 'bshd' is the
# projection-native default; 'bnsd' is the head-major experiment (q/k/v
# produced as [B, heads, S, dim] directly by the projection einsum so the
# attention dot_generals see their preferred batch-leading layout without a
# materialised transpose). The keep-mask SHAPE is [B, h, q, k] in both, so
# the rng draw — and therefore the math — is bit-identical across layouts.
_ATTN_EQS = {
    "bshd": ("bqhd,bkhd->bhqk", "bhqk,bkhd->bqhd"),
    "bnsd": ("bnqd,bnkd->bnqk", "bnqk,bnkd->bnqd"),
}


def _attn_mask_shape(q, k, layout):
    if layout == "bnsd":
        return (q.shape[0], q.shape[1], q.shape[2], k.shape[2])
    return (q.shape[0], q.shape[2], q.shape[1], k.shape[1])


def _attn_drop_math(q, k, v, bias, keydata, rate, scale, impl, prec,
                    layout="bshd"):
    """Bit-identical to the inline training branch it replaces
    (ops/attention.py multi_head_attention): f32 softmax, probs cast to the
    compute dtype BEFORE the mask so mask traffic moves bf16 bytes. One
    shared core (_attn_core) serves both mask policies."""
    keep = _keep_mask(keydata, rate, _attn_mask_shape(q, k, layout), impl)
    return _attn_core(q, k, v, bias, keep, rate, scale, prec, layout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _attn_drop(q, k, v, bias, keydata, rate, scale, impl, prec, layout):
    return _attn_drop_math(q, k, v, bias, keydata, rate, scale, impl, prec,
                           layout)


def _attn_probs(q, k, bias, scale, prec, layout="bshd"):
    scores = jnp.einsum(_ATTN_EQS[layout][0], q, k,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    scores = scores + bias.astype(jnp.float32)
    return jax.nn.softmax(scores, axis=-1)


def _attn_core(q, k, v, bias, keep, rate, scale, prec, layout="bshd"):
    # Normalized softmax-then-matmul (layer.py:92-100). The
    # deferred-normalization form that pays on the eval/serving path
    # (ops/attention.py::_attention_math) was MEASURED SLOWER here:
    # 64.3 vs 62.1 ms/step at B=96 — the quotient form's backward adds
    # f32 [B,S,H,D] intermediates that outweigh the forward's saved
    # normalize pass (PERF.md "Negative results").
    probs = _attn_probs(q, k, bias, scale, prec, layout).astype(v.dtype)
    probs = _apply_keep(probs, keep, rate)
    out = jnp.einsum(_ATTN_EQS[layout][1], probs, v,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.astype(v.dtype)


def _attn_resid_policy() -> str:
    """Backward residual policy for the attention op: 'recompute' (default)
    re-runs scores+softmax in the backward from (q, k); 'store_probs'
    additionally keeps the f32 probabilities so the backward is einsums +
    the softmax-vjp formula only. A/B-measured on the chip."""
    return os.environ.get("LDOT_ATTN_RESID", "recompute")


def _attn_drop_fwd(q, k, v, bias, keydata, rate, scale, impl, prec, layout):
    keep = (_keep_mask(keydata, rate, _attn_mask_shape(q, k, layout), impl)
            if _mask_stored() else None)
    store_probs = _attn_resid_policy() == "store_probs" and keep is not None
    probs_f = None
    if keep is None:
        out = _attn_drop_math(q, k, v, bias, keydata, rate, scale, impl,
                              prec, layout)
    elif store_probs:
        probs_f = _attn_probs(q, k, bias, scale, prec, layout)
        dropped = _apply_keep(probs_f.astype(v.dtype), keep, rate)
        out = jnp.einsum(_ATTN_EQS[layout][1], dropped, v,
                         preferred_element_type=jnp.float32,
                         precision=prec).astype(v.dtype)
    else:
        out = _attn_core(q, k, v, bias, keep, rate, scale, prec, layout)
    return out, (q, k, v, bias, keydata, keep, probs_f)


def _attn_drop_bwd(rate, scale, impl, prec, layout, residuals, g):
    q, k, v, bias, keydata, keep, probs_f = residuals
    if probs_f is not None:
        # stored-probs backward: no scores/softmax recompute
        def pv(probs_f_, v_):
            dropped = _apply_keep(probs_f_.astype(v_.dtype), keep, rate)
            return jnp.einsum(_ATTN_EQS[layout][1], dropped, v_,
                              preferred_element_type=jnp.float32,
                              precision=prec).astype(v_.dtype)

        _, vjp_pv = jax.vjp(pv, probs_f, v)
        dprobs, dv = vjp_pv(g)
        # softmax vjp from the OUTPUT probs (standard formula), then the
        # score einsum adjoints
        ds = probs_f * (dprobs - jnp.sum(dprobs * probs_f, axis=-1,
                                         keepdims=True))
        ds = (ds * scale).astype(q.dtype)
        if layout == "bnsd":
            dq = jnp.einsum("bnqk,bnkd->bnqd", ds, k,
                            preferred_element_type=jnp.float32,
                            precision=prec).astype(q.dtype)
            dk = jnp.einsum("bnqk,bnqd->bnkd", ds, q,
                            preferred_element_type=jnp.float32,
                            precision=prec).astype(k.dtype)
        else:
            dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k,
                            preferred_element_type=jnp.float32,
                            precision=prec).astype(q.dtype)
            dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q,
                            preferred_element_type=jnp.float32,
                            precision=prec).astype(k.dtype)
        return dq, dk, dv, jnp.zeros_like(bias), _float0(keydata)
    if keep is None:
        def f(q_, k_, v_):
            return _attn_drop_math(q_, k_, v_, bias, keydata, rate, scale,
                                   impl, prec, layout)
    else:
        def f(q_, k_, v_):
            return _attn_core(q_, k_, v_, bias, keep, rate, scale, prec,
                              layout)
    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(bias), _float0(keydata)


_attn_drop.defvjp(_attn_drop_fwd, _attn_drop_bwd)


def attention_prob_dropout(q, k, v, bias, rng, *, rate: float, scale: float,
                           prec, layout: str = "bshd") -> jnp.ndarray:
    """Attention with prob dropout; bwd recomputes, saving only (q,k,v)."""
    keydata, impl = key_data_of(rng)
    return _attn_drop(q, k, v, bias, keydata, float(rate), float(scale),
                      impl, prec, layout)
