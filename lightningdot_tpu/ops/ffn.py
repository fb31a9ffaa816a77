"""Fused FFN (dense -> erf-GELU -> dense) with a VMEM-resident intermediate.

Parity: BertIntermediate + BertOutput's dense (uniter_model/model/layer.py:
125-145). In the unfused form XLA must round-trip the [rows, intermediate]
activation through HBM between the two matmuls (it cannot fuse matmul into
matmul), and the backward pass re-reads the pre-GELU activation. At the ITM
train shape that is ~200 MB of HBM traffic per layer pair.

The Pallas forward tiles rows; both weight matrices stay resident in VMEM
across the grid and the GELU intermediate never leaves VMEM. Under autodiff
the kernel additionally emits the pre-GELU activation ``h1`` (the one
residual the backward pass genuinely needs); outside autodiff (serving,
offline encode) the output-only kernel runs and nothing extra is written.
The backward pass is plain jnp matmuls (XLA, MXU-roofline) recomputing
``gelu(h1)`` elementwise.

Numerics match the unfused composition: dot in the compute dtype with f32
accumulation, bias added in f32, cast to the compute dtype, erf GELU on the
compute dtype (tests/test_ffn.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from lightningdot_tpu.ops.activations import gelu
from lightningdot_tpu.ops.backend import backend

_DEFAULT_BLOCK = 128


def _precision(dtype):
    return (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)


def _dot(a, b, prec):
    return lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=prec)


def _ffn_math(x, w1, b1, w2, b2):
    """Unfused reference: identical math to encoder._dense + gelu."""
    prec = _precision(x.dtype)
    h1 = (_dot(x, w1, prec) + b1).astype(x.dtype)
    inter = gelu(h1)
    return (_dot(inter, w2, prec) + b2).astype(x.dtype), h1


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7, i.e. f32-level).

    Mosaic has no lowering for the erf primitive; evaluated in f32."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592
                + t * (-0.284496736
                       + t * (1.421413741
                              + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_kernel(h1):
    """erf GELU for in-kernel use; erf evaluated in f32 (matches lax.erf to
    ~1e-7, below bf16 resolution), product rounded like ops.gelu."""
    hf = h1.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_poly(hf * (2 ** -0.5)))
    return (hf * cdf).astype(h1.dtype)


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *refs,
                prec, with_h1, with_inter):
    x = x_ref[...]
    h1 = (_dot(x, w1_ref[...], prec)
          + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    idx = 0
    if with_h1:
        refs[idx][...] = h1
        idx += 1
    inter = _gelu_kernel(h1)
    if with_inter:
        refs[idx][...] = inter
    out = _dot(inter, w2_ref[...], prec) + b2_ref[...].astype(jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype)


def _ffn_pallas(x2d, w1, b1, w2, b2, *, with_h1, with_inter=False,
                interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, h = x2d.shape
    inter_dim = w1.shape[1]
    block = min(int(os.environ.get("LDOT_FFN_BLOCK", _DEFAULT_BLOCK)), rows)
    grid = (pl.cdiv(rows, block),)

    row_spec = pl.BlockSpec((block, h), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    h1_spec = pl.BlockSpec((block, inter_dim), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    # constant index_map: the weights are DMA'd once and stay VMEM-resident
    w_spec = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    vec_spec = lambda n: pl.BlockSpec((n,), lambda i: (0,),  # noqa: E731
                                      memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((rows, h), x2d.dtype)]
    out_specs = [row_spec]
    if with_h1:
        out_shape.append(jax.ShapeDtypeStruct((rows, inter_dim), x2d.dtype))
        out_specs.append(h1_spec)
    if with_inter:
        out_shape.append(jax.ShapeDtypeStruct((rows, inter_dim), x2d.dtype))
        out_specs.append(h1_spec)

    outs = pl.pallas_call(
        functools.partial(_ffn_kernel, prec=_precision(x2d.dtype),
                          with_h1=with_h1, with_inter=with_inter),
        grid=grid,
        in_specs=[row_spec, w_spec(h, inter_dim), vec_spec(inter_dim),
                  w_spec(inter_dim, h), vec_spec(h)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x2d, w1, b1, w2, b2)
    outs = list(outs) if isinstance(outs, (list, tuple)) else [outs]
    out = outs.pop(0)
    h1 = outs.pop(0) if with_h1 else None
    inter = outs.pop(0) if with_inter else None
    return out, h1, inter


_VMEM_BUDGET = 14 * 2 ** 20  # scoped-VMEM limit is 16 MiB; leave headroom


def _vmem_fits(x2d, w1, w2, *, with_h1: bool) -> bool:
    """Whether the kernel's VMEM working set fits the scoped limit.

    The weights are grid-resident (constant index_map) so their full size
    counts once; the row blocks (x in, h1 staging, optional h1/inter out,
    out) are double-buffered by the pipeline. At f32 BERT-base dims the
    weights alone are ~18 MiB > the 16 MiB limit — measured as a compile
    failure ("Ran out of memory in memory space vmem", axon relay HTTP
    500) on the f32 selftest eval; bf16 (the shipped training/serving
    dtype, ~10 MiB) fits. Fall back to the unfused XLA path when over.
    """
    itemsize = x2d.dtype.itemsize
    h = w1.shape[0]
    inter = w1.shape[1]
    block = min(int(os.environ.get("LDOT_FFN_BLOCK", _DEFAULT_BLOCK)),
                x2d.shape[0])
    weights = (w1.size + w2.size) * itemsize + (inter + h) * 4  # + biases
    # per-block row buffers: x in, out; with_h1 adds up to two inter-wide
    # outputs (h1 + stored gelu(h1))
    row_width = 2 * h + (2 * inter if with_h1 else 0)
    blocks = 2 * block * row_width * itemsize  # double-buffered
    return weights + blocks <= _VMEM_BUDGET


def _use_pallas(x2d, w1, w2, *, with_h1=True):
    mode = os.environ.get("LDOT_FFN", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return (backend() == "pallas" and x2d.shape[0] >= 256
            and _vmem_fits(x2d, w1, w2, with_h1=with_h1))


def _store_inter() -> bool:
    """Backward residual policy: 'store' (default) saves gelu(h1) from the
    forward so the backward is pure matmuls; 'recompute' re-evaluates
    gelu(h1) in the backward (XLA must then materialise it for the dW2
    contraction — one extra write plus an erf sweep, usually a loss)."""
    return os.environ.get("LDOT_FFN_BWD", "store") != "recompute"


@jax.custom_vjp
def _ffn(x2d, w1, b1, w2, b2):
    if _use_pallas(x2d, w1, w2, with_h1=False):
        out, _, _ = _ffn_pallas(x2d, w1, b1, w2, b2, with_h1=False)
        return out
    out, _ = _ffn_math(x2d, w1, b1, w2, b2)
    return out


def _ffn_fwd(x2d, w1, b1, w2, b2):
    store = _store_inter()
    if _use_pallas(x2d, w1, w2):
        out, h1, inter = _ffn_pallas(x2d, w1, b1, w2, b2, with_h1=True,
                                     with_inter=store)
    else:
        out, h1 = _ffn_math(x2d, w1, b1, w2, b2)
        inter = gelu(h1) if store else None  # XLA dedups with the fwd use
    return out, (x2d, w1, w2, h1, inter)


def _gelu_grad(h1):
    """d/dx [x * 0.5 * (1 + erf(x/sqrt(2)))]."""
    cdf = 0.5 * (1.0 + lax.erf(h1 * (2 ** -0.5)))
    pdf = jnp.asarray((2.0 * jnp.pi) ** -0.5, h1.dtype) * jnp.exp(
        -0.5 * jnp.square(h1))
    return cdf + h1 * pdf


def _gelu_grad_kernel(h1):
    """In-kernel gelu' (f32, A&S erf polynomial — no erf in Mosaic)."""
    hf = h1.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_poly(hf * (2 ** -0.5)))
    pdf = ((2.0 * jnp.pi) ** -0.5) * jnp.exp(-0.5 * jnp.square(hf))
    return (cdf + hf * pdf).astype(h1.dtype)


def _ffn_bwd(res, g):
    x2d, w1, w2, h1, inter = res
    prec = _precision(x2d.dtype)
    g = g.astype(x2d.dtype)
    if inter is None:
        inter = gelu(h1)                                # recompute policy
    dw2 = _dot(inter.T, g, prec)
    db2 = jnp.sum(g.astype(jnp.float32), axis=0)
    if (_use_pallas(x2d, w1, w2)
            and os.environ.get("LDOT_FFN_DH1", "0") == "1"):
        # measured-loser kernel, parked under ops/experimental (import only
        # when the gate is set — the default path stays kernel-free)
        from lightningdot_tpu.ops.experimental.ffn_dh1 import dh1_pallas

        dh1 = dh1_pallas(g, h1, w2)
    else:
        dinter = _dot(g, w2.T, prec).astype(x2d.dtype)
        dh1 = dinter * _gelu_grad(h1)
    dw1 = _dot(x2d.T, dh1, prec)
    db1 = jnp.sum(dh1.astype(jnp.float32), axis=0)
    dx = _dot(dh1, w1.T, prec).astype(x2d.dtype)
    return (dx, dw1.astype(w1.dtype), db1, dw2.astype(w2.dtype), db2)


_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def ffn_gelu(x, intermediate: dict, output: dict, dtype) -> jnp.ndarray:
    """dense(H->I) -> erf GELU -> dense(I->H) on [..., H] input.

    ``intermediate`` / ``output``: {'kernel','bias'} param dicts (f32
    masters; cast to the compute dtype here, as encoder._dense does).
    """
    shape = x.shape
    x2d = x.reshape(-1, shape[-1]).astype(dtype)
    args = (x2d,
            intermediate["kernel"].astype(dtype),
            intermediate["bias"].astype(jnp.float32),
            output["kernel"].astype(dtype),
            output["bias"].astype(jnp.float32))
    if os.environ.get("LDOT_FFN", "auto") == "off":
        # plain composition under default autodiff (perf-forensics baseline)
        out, _ = _ffn_math(*args)
    else:
        out = _ffn(*args)
    return out.reshape(shape)
