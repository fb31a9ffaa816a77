"""Bisect the fused-attention BWD kernel compile crash (HTTP 500, no
Mosaic diagnostic). Variants isolate: last-two-dim transpose at odd sizes,
three outputs, six inputs."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightningdot_tpu.utils.runtime import setup_runtime

N, S, D = 96, 65, 64


def run(tag, kern, n_in, n_out, shapes_in, shapes_out):
    try:
        args = [jax.random.normal(jax.random.PRNGKey(i), s, jnp.bfloat16)
                for i, s in enumerate(shapes_in)]
        outs = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
            out_shape=[jax.ShapeDtypeStruct(s, jnp.bfloat16)
                       for s in shapes_out],
        )(*args)
        float(jnp.sum(outs[0].astype(jnp.float32)))
        print(f"{tag}: OK", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    setup_runtime()

    def t_odd(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (0, 2, 1))

    run("transpose-last2-odd [96,65,65]", t_odd, 1, 1,
        [(N, S, S)], [(N, S, S)])

    def t_dot(x_ref, y_ref, o_ref):
        xt = jnp.transpose(x_ref[...], (0, 2, 1))
        o_ref[...] = jax.lax.dot_general(
            xt, y_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    run("transpose+dot", t_dot, 2, 1, [(N, S, S), (N, S, D)], [(N, S, D)])

    def three_out(x_ref, a_ref, b_ref, c_ref):
        x = x_ref[...]
        a_ref[...] = x * 2.0
        b_ref[...] = x * 3.0
        c_ref[...] = x * 4.0

    run("three-outputs", three_out, 1, 3, [(N, S, D)],
        [(N, S, D)] * 3)

    def contract_mid(x_ref, y_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], y_ref[...], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    run("contract-mid dims", contract_mid, 2, 1,
        [(N, S, S), (N, S, D)], [(N, S, D)])


if __name__ == "__main__":
    main()
