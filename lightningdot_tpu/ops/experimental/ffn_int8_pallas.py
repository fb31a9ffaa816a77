"""Fused int8 serving-FFN Pallas kernel (gated: ``LDOT_INT8_FFN=1``).

Keeps the quantize -> int8 dot -> dequant+GELU -> requantize -> int8 dot
chain in VMEM per row block. MEASURED NEUTRAL-TO-NEGATIVE on v5e (3.085 ms
kernel vs 3.064 ms XLA on the batch-64 int8 serving call; batch-1
regresses ~0.3 ms — PERF.md "Negative results"): XLA's fc1 fusion already
emits the requantized int8 intermediate, so there was no HBM round-trip to
save. Re-measure with ``LDOT_INT8_FFN=1 LDOT_SERVE_TOPK=approx
python scripts/perf_serving_quant.py 1 64``.

The shipped dispatch and the bit-exact unfused math live in
ops/ffn_int8.py; interpret-mode parity in tests/test_ffn.py.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from lightningdot_tpu.ops.ffn_int8 import _DEFAULT_BLOCK, _ffn_int8_math


def _ffn_int8_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                     out_ref):
    out_ref[...] = _ffn_int8_math(
        x_ref[...], w1_ref[...], s1_ref[...], b1_ref[...],
        w2_ref[...], s2_ref[...], b2_ref[...], erf="poly")


def ffn_int8_pallas(x2d, w1, s1, b1, w2, s2, b2, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, h = x2d.shape
    inter_dim = w1.shape[1]
    block = min(int(os.environ.get("LDOT_INT8_FFN_BLOCK", _DEFAULT_BLOCK)),
                rows)
    grid = (pl.cdiv(rows, block),)

    row_spec = pl.BlockSpec((block, h), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # constant index maps: weights/scales DMA once, stay VMEM-resident
    w_spec = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    vec_spec = lambda n: pl.BlockSpec((n,), lambda i: (0,),  # noqa: E731
                                      memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _ffn_int8_kernel,
        grid=grid,
        in_specs=[row_spec,
                  w_spec(h, inter_dim), vec_spec(inter_dim),
                  vec_spec(inter_dim),
                  w_spec(inter_dim, h), vec_spec(h), vec_spec(h)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h), x2d.dtype),
        interpret=interpret,
    )(x2d, w1, s1, b1, w2, s2, b2)
