"""LayerNorm: fused Pallas TPU kernel + XLA reference.

Replaces apex ``FusedLayerNorm`` (uniter_model/model/layer.py:25). eps is
1e-12 everywhere in the reference.

The Pallas kernel fuses mean/var/normalize/affine in VMEM over row blocks.
The backward pass is a hand-written jnp VJP (fully fused by XLA) so the op is
differentiable regardless of backend.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lightningdot_tpu.ops.backend import backend

DEFAULT_EPS = 1e-12
_ROW_BLOCK = 256


def _ln_math(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * scale + bias


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    out = _ln_math(x, scale_ref[...].astype(jnp.float32),
                   bias_ref[...].astype(jnp.float32), eps)
    out_ref[...] = out.astype(out_ref.dtype)


def _ln_pallas(x2d: jnp.ndarray, scale, bias, eps) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, hidden = x2d.shape
    block = min(_ROW_BLOCK, rows)
    grid = (pl.cdiv(rows, block),)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, hidden), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
    )(x2d, scale, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, scale, bias, eps=DEFAULT_EPS):
    """LayerNorm over the last axis with learned affine (scale, bias)."""
    if backend() == "pallas":
        shape = x.shape
        out = _ln_pallas(x.reshape(-1, shape[-1]), scale, bias, eps)
        return out.reshape(shape)
    return _ln_math(x.astype(jnp.float32), scale, bias, eps).astype(x.dtype)


def _layer_norm_fwd(x, scale, bias, eps):
    out = layer_norm(x, scale, bias, eps)
    return out, (x, scale)


def _layer_norm_bwd(eps, res, g):
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    h = xf.shape[-1]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv

    reduce_axes = tuple(range(x.ndim - 1))
    dscale = jnp.sum(gf * xhat, axis=reduce_axes)
    dbias = jnp.sum(gf, axis=reduce_axes)

    gs = gf * scale.astype(jnp.float32)
    # dx = inv * (gs - mean(gs) - xhat * mean(gs * xhat))
    dx = inv * (gs
                - jnp.mean(gs, axis=-1, keepdims=True)
                - xhat * jnp.mean(gs * xhat, axis=-1, keepdims=True))
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)
