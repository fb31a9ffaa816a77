"""Fused FFN-backward dh1 Pallas kernel (gated: ``LDOT_FFN_DH1=1``).

dh1 = (g @ w2^T) * gelu'(h1) in one VMEM pass — the [rows, intermediate]
``dinter`` tensor never reaches HBM (76 MB/step of traffic at the ITM
train shape). Measured NET-NEGATIVE on v5e (64.5 vs 63.5 ms/step,
PERF.md "Negative results"): Mosaic's NT matmul loses more than the saved
dinter round-trip. Kept for bandwidth-starved configurations and future
Mosaic releases; re-measure with
``LDOT_FFN_DH1=1 python scripts/perf_train_device_loop.py``.

Parity: backward of the BertIntermediate+BertOutput pair
(uniter_model/model/layer.py:125-145); interpret-mode equality vs the
unfused math in tests/test_ffn.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from lightningdot_tpu.ops.ffn import (_DEFAULT_BLOCK, _gelu_grad_kernel,
                                      _precision)


def _dh1_kernel(g_ref, h1_ref, w2_ref, dh1_ref, *, prec):
    g = g_ref[...]
    h1 = h1_ref[...]
    dinter = lax.dot_general(g, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec).astype(g.dtype)
    dh1_ref[...] = (dinter * _gelu_grad_kernel(h1)).astype(dh1_ref.dtype)


def dh1_pallas(g2d, h1, w2, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, h = g2d.shape
    inter_dim = w2.shape[0]
    block = min(int(os.environ.get("LDOT_FFN_BLOCK", _DEFAULT_BLOCK)), rows)
    grid = (pl.cdiv(rows, block),)
    return pl.pallas_call(
        functools.partial(_dh1_kernel, prec=_precision(g2d.dtype)),
        grid=grid,
        in_specs=[pl.BlockSpec((block, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block, inter_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((inter_dim, h), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, inter_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, inter_dim), g2d.dtype),
        interpret=interpret,
    )(g2d, h1, w2)
