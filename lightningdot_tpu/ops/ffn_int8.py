"""Fused int8 FFN for the quantized serving tower.

Parity: the same dense -> erf-GELU -> dense pair as ops/ffn.py
(BertIntermediate + BertOutput, uniter_model/model/layer.py:125-145), on the
int8-weight serving path (serving.py::_dense_int8 composition: dynamic
per-row activation int8 x per-output-channel weight int8, int32 MXU
accumulation, f32 dequant epilogue).

Hypothesis (why a kernel): the XLA form of fc1 carries a huge fused
epilogue — dequant, bias, GELU, then the *next* dense's dynamic
re-quantization — and its trace bucket runs at 147 TF/s vs 367 TF/s for
the clean fc2 (PERF.md serving profile). The kernel keeps the
intermediate in VMEM: quantize -> int8 dot -> dequant+GELU -> requantize
-> int8 dot per row block.

MEASURED NEUTRAL-TO-NEGATIVE, gated off by default (same-day A/B on the
batch-64 int8 serving call: 3.085 ms kernel vs 3.064 ms XLA; batch-1
regresses ~0.3 ms). Post-mortem: XLA's fc1 fusion already emits the
*requantized int8* intermediate, so only ~6 MB crosses HBM at the serving
shape — there was no round-trip to save; the epilogue is VPU compute that
costs the same inside VMEM, and the 12 opaque custom-calls cost schedule
overlap (same lesson as the Pallas AdamW sweep). The kernel is parked in
ops/experimental/ffn_int8_pallas.py; enable with LDOT_INT8_FFN=1 to
re-measure on future Mosaic/XLA releases.

Kernel numerics match the unfused serving composition op-for-op (same
1e-8 scale floor, round-to-nearest-even, int32 accumulation) except
GELU's erf, evaluated with the Abramowitz-Stegun 7.1.26 polynomial
(|err| <= 1.5e-7 — below bf16 resolution; Mosaic has no erf primitive).
The XLA fallback is bit-identical to the pre-existing composition.
Serving-only: no custom VJP (the quantized tower is never trained).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from lightningdot_tpu.ops.ffn import _gelu_kernel

_DEFAULT_BLOCK = 256


def _quant_rows(xf):
    """Per-row symmetric int8 quantization (serving.py::_dense_int8 math)."""
    xs = jnp.maximum(jnp.abs(xf).max(axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _int8_dot(xq, wq):
    return lax.dot_general(xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def _ffn_int8_math(x2d, w1, s1, b1, w2, s2, b2, *, erf="exact"):
    """Unfused reference: identical to the serving _dense_int8 composition.

    ``erf='poly'`` selects the in-kernel A&S polynomial GELU (what the
    Pallas kernel computes); 'exact' is lax.erf (the XLA path)."""
    from lightningdot_tpu.ops.activations import gelu

    xq, xs = _quant_rows(x2d.astype(jnp.float32))
    h1 = (_int8_dot(xq, w1).astype(jnp.float32) * xs * s1[None, :]
          + b1).astype(jnp.bfloat16)
    inter = _gelu_kernel(h1) if erf == "poly" else gelu(h1)
    iq, is_ = _quant_rows(inter.astype(jnp.float32))
    out = (_int8_dot(iq, w2).astype(jnp.float32) * is_ * s2[None, :]
           + b2).astype(jnp.bfloat16)
    return out


def _use_pallas() -> bool:
    mode = os.environ.get("LDOT_INT8_FFN", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return False  # auto = off: measured neutral-to-negative (module doc)


def ffn_gelu_int8(intermediate: dict, output: dict, x) -> jnp.ndarray:
    """int8-dense(H->I) -> erf GELU -> int8-dense(I->H) on [..., H] bf16.

    ``intermediate`` / ``output``: {'q','scale','bias'} quantized param dicts
    (serving.quantize_text_tower layout).
    """
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    args = (x2d,
            intermediate["q"], intermediate["scale"].astype(jnp.float32),
            intermediate["bias"].astype(jnp.float32),
            output["q"], output["scale"].astype(jnp.float32),
            output["bias"].astype(jnp.float32))
    if _use_pallas():
        # measured-loser kernel, parked under ops/experimental (import only
        # when the gate is set — the default path stays kernel-free)
        from lightningdot_tpu.ops.experimental.ffn_int8_pallas import (
            ffn_int8_pallas)

        out = ffn_int8_pallas(*args)
    else:
        out = _ffn_int8_math(*args)
    return out.reshape(shape)
