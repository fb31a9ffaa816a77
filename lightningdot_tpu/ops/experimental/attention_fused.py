"""Fused multi-head self-attention TRAINING kernel (Pallas TPU).

Parity: BertSelfAttention with probability dropout
(uniter_model/model/layer.py:53-101): scores = q@k.T/sqrt(d) + additive
mask bias, f32 row softmax, inverted dropout on the probabilities, probs@v.

Why a kernel: in the XLA form at the ITM train shape the attention
neighbourhood spends multiples of its matmul time on HBM round-trips and
layout copies — the [B,S,H,D] head-split reshapes materialise as copies
(~2.5 ms/step), the f32 scores / bf16 probs / keep-mask tensors each make
an HBM round trip, and the u32 dropout bits pay a relayout
(hlo_stats, scripts/perf_profile_step.py). This kernel takes the RAW
projection outputs [B, S, H*D] (no reshape at the XLA level at all), does
the head split, scores, softmax, dropout (in-kernel PRNG — no bits in
HBM), and the probs@v contraction entirely in VMEM, and writes back
[B, S, H*D] ready for the output projection.

The backward pass is a second kernel that recomputes scores/softmax and
regenerates the dropout mask from the same seed (residuals: just q, k, v
and the bias — all already live). Dropout draws come from the Mosaic
per-core PRNG, which is a different (equally uniform) stream than
jax.random.bernoulli; the eval path and the XLA fallback are unchanged.

Used only for training (deterministic=False) on the TPU backend at
batch*heads grids where the XLA einsum form pays the layout tax; gated by
LDOT_ATTN_KERNEL (auto|0|1).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from lightningdot_tpu.ops.backend import backend

_DEFAULT_BLOCK = 8       # batch items per program (forward)
_DEFAULT_BLOCK_BWD = 2   # backward: 5 input + 3 output blocks + f32
# score/prob temporaries — larger blocks exceed VMEM and crash the
# Mosaic compiler with no diagnostic


def _block_size(batch, bwd=False):
    env = "LDOT_ATTN_BLOCK_BWD" if bwd else "LDOT_ATTN_BLOCK"
    default = _DEFAULT_BLOCK_BWD if bwd else _DEFAULT_BLOCK
    blk = int(os.environ.get(env, default))
    while batch % blk:
        blk //= 2
    return max(blk, 1)


def _bdot(a, b, dims, prec):
    return lax.dot_general(a, b, dimension_numbers=dims,
                           preferred_element_type=jnp.float32,
                           precision=prec)


# dimension_numbers for batched (leading-axis) dots
_CONTRACT_LAST = (((2,), (2,)), ((0,), (0,)))   # [B,S,D]x[B,T,D] -> [B,S,T]
_PROBS_V = (((2,), (1,)), ((0,), (0,)))         # [B,S,T]x[B,T,D] -> [B,S,D]


def _keep_from_bits(shape, rate):
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # keep iff uniform < 1-rate  <=>  bits < (1-rate) * 2^32
    thresh = np.uint32(min((1.0 - rate) * 4294967296.0, 4294967295.0))
    return bits < jnp.uint32(thresh)


def _keep_per_item(seed_ref, bb, nh, s, t, rate):
    """[bb*nh, s, t] keep mask, seeded PER BATCH ITEM (seed + global item
    index) so the mask is invariant to the grid block size — the forward
    and backward kernels use different blocks but must regenerate
    identical masks."""
    from jax.experimental.pallas import tpu as pltpu

    base = seed_ref[0] + pl_program_id() * bb
    keeps = []
    for j in range(bb):
        pltpu.prng_seed(base + j)
        keeps.append(_keep_from_bits((nh, s, t), rate)[None])
    return jnp.concatenate(keeps, 0).reshape(bb * nh, s, t)


def _heads_major(ref, nh):
    """[BB,S,H,D] VMEM block -> [BB*H,S,D] (in-VMEM transpose + leading
    merge — Mosaic lowers transposes of untiled dims; lane-splitting
    reshapes it cannot)."""
    x = jnp.transpose(ref[...], (0, 2, 1, 3))        # [BB,H,S,D]
    bb, _, s, hd = x.shape
    return x.reshape(bb * nh, s, hd)


def _store_heads(ref, x, bb, nh):
    """[BB*H,S,D] -> store into a [BB,S,H,D] ref."""
    _, s, hd = x.shape
    x = x.reshape(bb, nh, s, hd)
    ref[...] = jnp.transpose(x, (0, 2, 1, 3)).astype(ref.dtype)


def _softmax_all(q, k, bias, bb, nh, scale, prec):
    """[BB*H,S,D] -> f32 probs [BB*H,S,T]; bias [BB*H,T] (pre-repeated per
    head OUTSIDE the kernel so its block rows stay 8-aligned for any batch
    block size)."""
    scores = _bdot(q, k, _CONTRACT_LAST, prec) * scale
    scores = scores + bias[:, None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                nh, hd, rate, scale, prec):
    from jax.experimental.pallas import tpu as pltpu

    bb = q_ref.shape[0]
    bias = bias_ref[...].astype(jnp.float32)                 # [BB*H, S]
    q = _heads_major(q_ref, nh)                              # [BB*H,S,D]
    k = _heads_major(k_ref, nh)
    v = _heads_major(v_ref, nh)
    probs = _softmax_all(q, k, bias, bb, nh, scale, prec).astype(q.dtype)
    if rate > 0.0:
        keep = _keep_per_item(seed_ref, bb, nh, probs.shape[1],
                              probs.shape[2], rate)
        probs = probs * keep.astype(probs.dtype) * jnp.asarray(
            1.0 / (1.0 - rate), probs.dtype)
    out = _bdot(probs, v, _PROBS_V, prec)                    # [BB*H,S,D]
    _store_heads(o_ref, out, bb, nh)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, nh, hd, rate, scale, prec):
    from jax.experimental.pallas import tpu as pltpu

    bb = q_ref.shape[0]
    bias = bias_ref[...].astype(jnp.float32)                 # [BB*H, S]
    q = _heads_major(q_ref, nh)
    k = _heads_major(k_ref, nh)
    v = _heads_major(v_ref, nh)
    g = _heads_major(g_ref, nh)
    probs_f = _softmax_all(q, k, bias, bb, nh, scale, prec)   # f32
    probs_c = probs_f.astype(q.dtype)                         # fwd cast point
    if rate > 0.0:
        # per-ITEM seeding regenerates the forward masks exactly even
        # though the backward grid uses a different block size
        keep = _keep_per_item(seed_ref, bb, nh, probs_c.shape[1],
                              probs_c.shape[2], rate)
        mscale = jnp.asarray(1.0 / (1.0 - rate), q.dtype)
        dropped = probs_c * keep.astype(q.dtype) * mscale
    else:
        keep = None
        dropped = probs_c
    # dv = dropped^T @ g: express via an explicit in-VMEM transpose +
    # contract-last dot (the contract-over-rows dims pattern crashes the
    # Mosaic compiler)
    dv = _bdot(jnp.transpose(dropped, (0, 2, 1)), g, _PROBS_V, prec)
    # d(dropped) = g @ v^T
    ddrop = _bdot(g, v, _CONTRACT_LAST, prec)                 # [BB*H,S,S]
    if keep is not None:
        dp = ddrop * keep.astype(jnp.float32) * jnp.asarray(
            1.0 / (1.0 - rate), jnp.float32)
    else:
        dp = ddrop
    # softmax vjp in f32
    ds = probs_f * (dp - jnp.sum(dp * probs_f, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q.dtype)
    dq = _bdot(ds, k, _PROBS_V, prec)                         # [BB*H,S,D]
    dk = _bdot(jnp.transpose(ds, (0, 2, 1)), q, _PROBS_V, prec)
    _store_heads(dq_ref, dq, bb, nh)
    _store_heads(dk_ref, dk, bb, nh)
    _store_heads(dv_ref, dv, bb, nh)


def pl_program_id():
    from jax.experimental import pallas as pl

    return pl.program_id(0)


def _call(kernel, n_out, q, k, v, bias2d, seed, *, nh, rate, scale,
          interpret=False, extra=()):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret == "tpu_interp":
        interpret = False  # sentinel: force_tpu_interpret_mode is active
    else:
        if not interpret:
            try:
                interpret = jax.default_backend() != "tpu"
            except Exception:
                interpret = True
        if interpret:
            # the generic HLO interpreter has no pltpu prng primitives;
            # the TPU-semantics interpreter does
            with pltpu.force_tpu_interpret_mode():
                return _call(kernel, n_out, q, k, v, bias2d, seed, nh=nh,
                             rate=rate, scale=scale,
                             interpret="tpu_interp", extra=extra)

    b, s, nh_, hd = q.shape
    assert nh_ == nh
    blk = _block_size(b, bwd=bool(extra))
    grid = (b // blk,)
    row = pl.BlockSpec((blk, s, nh, hd), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    # bias arrives [B, S]; repeat per head at the XLA level (tiny, f32) so
    # the kernel block rows (blk*nh) are 8-aligned for any batch block
    bias_rep = jnp.repeat(bias2d.astype(jnp.float32), nh, axis=0)
    bias_spec = pl.BlockSpec((blk * nh, s), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    prec = (lax.Precision.HIGHEST if q.dtype == jnp.float32
            else lax.Precision.DEFAULT)
    in_specs = [seed_spec, row, row, row, bias_spec] + [row] * len(extra)
    outs = pl.pallas_call(
        functools.partial(kernel, nh=nh, hd=hd, rate=rate, scale=scale,
                          prec=prec),
        grid=grid,
        in_specs=in_specs,
        out_specs=[row] * n_out,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * n_out,
        interpret=interpret,
    )(seed, q, k, v, bias_rep, *extra)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _attn(q, k, v, bias2d, seed, nh, rate, scale):
    (out,) = _call(_fwd_kernel, 1, q, k, v, bias2d, seed,
                   nh=nh, rate=rate, scale=scale)
    return out


def _attn_fwd(q, k, v, bias2d, seed, nh, rate, scale):
    return (_attn(q, k, v, bias2d, seed, nh, rate, scale),
            (q, k, v, bias2d, seed))


def _attn_bwd(nh, rate, scale, res, g):
    q, k, v, bias2d, seed = res
    dq, dk, dv = _call(_bwd_kernel, 3, q, k, v, bias2d, seed,
                       nh=nh, rate=rate, scale=scale, extra=(g,))
    return (dq, dk, dv, jnp.zeros_like(bias2d),
            np.zeros(np.shape(seed), jax.dtypes.float0))


_attn.defvjp(_attn_fwd, _attn_bwd)


def attention_kernel_enabled(batch, heads) -> bool:
    """Default OFF: the kernel is hardware-validated (determinism, seed
    sensitivity, fwd/bwd mask consistency — scripts/tpu_attn_kernel_check
    .py) and eliminates all attention-neighbourhood HBM traffic, but
    Mosaic's batched dot_general runs the small [S,D] per-head contractions
    at ~5 TF/s (scripts/perf_pallas_batched_dot.py) vs XLA's batched einsum
    at MXU rates — measured 77.3 vs 62.1 ms/step at the ITM train shape.
    Kept as LDOT_ATTN_KERNEL=1 for future Mosaic releases."""
    mode = os.environ.get("LDOT_ATTN_KERNEL", "0")
    if mode == "1":
        return backend() == "pallas" and batch * heads >= 256
    return False


def seed_from_key(rng) -> jnp.ndarray:
    """Derive a (1,)-int32 seed from a JAX PRNG key (typed or raw)."""
    data = (jax.random.key_data(rng)
            if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) else rng)
    flat = jnp.ravel(data).astype(jnp.uint32)
    # FNV-1a (position-sensitive — rbg key_data repeats words, so a plain
    # xor-fold cancels)
    folded = jnp.uint32(2166136261)
    for i in range(int(flat.shape[0])):
        folded = (folded ^ flat[i]) * jnp.uint32(16777619)
    return folded.astype(jnp.int32).reshape(1)


def fused_attention_train(q, k, v, bias2d, rng, *, nh: int, rate: float,
                          interpret: bool = False):
    """q, k, v: RAW projection outputs [B, S, nh*hd]; bias2d: [B, S]
    additive mask bias (0 keep / -10000 drop, model.py:362-365).

    Returns [B, S, nh*hd] context (heads merged), differentiable wrt
    q/k/v.
    """
    b, s, width = q.shape
    hd = width // nh
    scale = 1.0 / (hd ** 0.5)
    bias2d = bias2d.astype(jnp.float32)
    seed = seed_from_key(rng) if rng is not None else jnp.zeros(
        (1,), jnp.int32)
    # [B,S,H*D] -> [B,S,H,D] is a free bitcast at the XLA level (Pallas
    # pins default layouts, so no relayout copy appears)
    q4 = q.reshape(b, s, nh, hd)
    k4 = k.reshape(b, s, nh, hd)
    v4 = v.reshape(b, s, nh, hd)
    if interpret:
        (out,) = _call(_fwd_kernel, 1, q4, k4, v4, bias2d, seed,
                       nh=nh, rate=float(rate), scale=scale, interpret=True)
    else:
        out = _attn(q4, k4, v4, bias2d, seed, int(nh), float(rate),
                    float(scale))
    return out.reshape(b, s, width)
