"""Probe Mosaic lowerings needed by the fused attention kernel:
  (a) in-kernel transpose [BB,S,H,D] -> [BB,H,S,D];
  (b) per-head strided DMA from an HBM (ANY) ref into VMEM scratch.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightningdot_tpu.utils.runtime import setup_runtime

BB, S, H, D = 8, 65, 12, 64


def probe_transpose():
    def kern(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.transpose(x, (0, 2, 1, 3))

    x = jax.random.normal(jax.random.PRNGKey(0), (BB, S, H, D), jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BB, H, S, D), jnp.bfloat16),
    )(x)
    want = jnp.transpose(x, (0, 2, 1, 3))
    ok = bool(jnp.all(out == want))
    print(f"transpose kernel: ok={ok}", flush=True)


def probe_head_dma():
    def kern(x_hbm, o_ref, scratch, sem):
        def body(h, _):
            dma = pltpu.make_async_copy(
                x_hbm.at[:, :, h, :], scratch, sem)
            dma.start()
            dma.wait()
            o_ref[:, h] = scratch[...] * 2.0
            return 0

        jax.lax.fori_loop(0, H, body, 0)

    x = jax.random.normal(jax.random.PRNGKey(1), (BB, S, H, D), jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BB, H, S, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BB, S, D), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x)
    want = jnp.transpose(x, (0, 2, 1, 3)) * 2.0
    ok = bool(jnp.all(out == want))
    print(f"head-DMA kernel: ok={ok}", flush=True)


def main():
    setup_runtime()
    for name, fn in (("transpose", probe_transpose),
                     ("head_dma", probe_head_dma)):
        try:
            fn()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:250]}",
                  flush=True)


if __name__ == "__main__":
    main()
