"""Pallas fused AdamW leaf update (TPU).

The AdamW sweep is pure HBM streaming: per parameter it reads g, m, v, p
(16 B) and writes p', m', v' (12 B). XLA's loop fusions run this at
~618 GB/s on v5e (round-2 trace, PERF.md) — ~75 % of the 819 GB/s HBM
peak, 8.5 ms/step at BERT-base×2 towers. A Pallas kernel streaming
[rows,128] f32 blocks can sit closer to peak; this is exactly the
bandwidth-bound regime where Mosaic kernels pay (memory:
mosaic-kernel-limits — never Pallas a compute-bound op).

Only f32 leaves whose element count is a multiple of 128 go through the
kernel (in this model that is everything but a handful of sub-KB biases);
the rest use the jnp form. Parity: identical update math to
training/optim.FusedAdamW.apply's ``leaf`` (verified elementwise in
tests/test_loss.py::test_pallas_adamw_matches_jnp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLOCK_ROWS = 2048  # [2048, 128] f32 = 1 MB per operand; 7 operands in VMEM


def _adamw_kernel(sc_ref, p_ref, g_ref, m_ref, v_ref,
                  p2_ref, m2_ref, v2_ref, *, b1, b2, eps, wd):
    # reference formula (uniter_model/optim/adamw.py:75-103): eps on the
    # uncorrected sqrt(v) (bias correction folded into step_size outside);
    # decoupled decay multiplies the POST-step param with the plain lr
    scale = sc_ref[0]
    step_size = sc_ref[1]
    lr = sc_ref[2]
    g = g_ref[...] * scale
    m2 = b1 * m_ref[...] + (1.0 - b1) * g
    v2 = b2 * v_ref[...] + (1.0 - b2) * g * g
    p2 = p_ref[...] - step_size * m2 / (jnp.sqrt(v2) + eps)
    if wd:
        p2 = p2 - lr * wd * p2
    p2_ref[...] = p2
    m2_ref[...] = m2
    v2_ref[...] = v2


@functools.partial(jax.jit,
                   static_argnames=("b1", "b2", "eps", "wd", "interpret"))
def adamw_leaf_pallas(p, g, m, v, scalars, *, b1, b2, eps, wd,
                      interpret=False):
    """One fused read(g,m,v,p) -> write(p',m',v') pass over a leaf.

    scalars: f32[4] = (clip_scale, step_size, lr, unused) — step_size is
    lr*sqrt(1-b2^t)/(1-b1^t), computed outside so the kernel stays
    elementwise.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = p.shape
    x2 = lambda a: a.reshape(-1, 128)
    p2d, g2d, m2d, v2d = x2(p), x2(g), x2(m), x2(v)
    rows = p2d.shape[0]
    br = min(_BLOCK_ROWS, rows)
    grid = (pl.cdiv(rows, br),)
    blk = pl.BlockSpec((br, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_adamw_kernel, b1=b1, b2=b2, eps=eps, wd=wd),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk] * 4,
        out_specs=[blk] * 3,
        out_shape=[jax.ShapeDtypeStruct(p2d.shape, jnp.float32)] * 3,
        input_output_aliases={1: 0, 3: 1, 4: 2},  # p->p', m->m', v->v'
        interpret=interpret,
    )(scalars, p2d, g2d, m2d, v2d)
    return tuple(o.reshape(shape) for o in out)


def leaf_eligible(p, g, m, v) -> bool:
    """Kernel path: f32 everywhere, lane-aligned, big enough to matter."""
    return (p.dtype == jnp.float32 and g.dtype == jnp.float32
            and m.dtype == jnp.float32 and v.dtype == jnp.float32
            and p.size % 128 == 0 and p.size >= 1 << 14)
