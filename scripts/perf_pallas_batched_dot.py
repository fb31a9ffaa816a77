"""Probe: does Mosaic lower a BATCHED dot_general inside a Pallas kernel?

If yes (and at reasonable MXU efficiency), a fused attention kernel
(scores+softmax+dropout+pv in VMEM) becomes viable — XLA's batched einsum
is otherwise the only efficient way to run the [B*H] small attention dots.

Also times the in-kernel PRNG (pltpu.prng_random_bits) at the attention
mask shape.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightningdot_tpu.utils.runtime import setup_runtime

B, H, S, D = 96, 12, 65, 64


def _kernel(q_ref, k_ref, out_ref):
    q = q_ref[...]  # [H, S, D] (one batch item per program)
    k = k_ref[...]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [H, S, S]
    out_ref[...] = scores.astype(out_ref.dtype)


def batched_dot(q, k):
    grid = (q.shape[0],)
    spec = pl.BlockSpec((1, H, S, D), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    # kernel sees [1,H,S,D]; index away the leading 1 inside
    def kern(q_ref, k_ref, o_ref):
        _kernel(q_ref.at[0], k_ref.at[0], o_ref.at[0])
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((1, H, S, S), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q.shape[0], H, S, S), jnp.float32),
    )(q, k)


def _rng_kernel(seed_ref, o_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(o_ref.shape)
    o_ref[...] = (bits > jnp.uint32(429496729)).astype(jnp.bfloat16)


def prng_mask(seed, n):
    grid = (n,)
    return pl.pallas_call(
        _rng_kernel, grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, H, S, S), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, H, S, S), jnp.bfloat16),
    )(seed)


def slope(fn, args, n_s=8, n_l=32):
    def chain(n):
        def run(*a):
            def body(c, _):
                r = fn(*a)
                return c + jnp.sum(r[0, 0, 0].astype(jnp.float32)), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c
        return jax.jit(run)
    fs, fl = chain(n_s), chain(n_l)
    float(fs(*args)); t0=time.perf_counter(); float(fs(*args)); ts=time.perf_counter()-t0
    float(fl(*args)); t0=time.perf_counter(); float(fl(*args)); tl=time.perf_counter()-t0
    return (tl-ts)/(n_l-n_s)


def main():
    setup_runtime()
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)

    try:
        t = slope(batched_dot, (q, k))
        gf = 2 * B * H * S * S * D / 1e9
        print(f"pallas batched dot: {t*1e6:.0f} us -> {gf/t:.0f} GF/s",
              flush=True)
    except Exception as e:
        print(f"pallas batched dot FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    def xla_scores(q, k):
        return jnp.einsum("bhsd,bhtd->bhst", q, k,
                          preferred_element_type=jnp.float32)
    t = slope(xla_scores, (q, k))
    gf = 2 * B * H * S * S * D / 1e9
    print(f"xla batched einsum: {t*1e6:.0f} us -> {gf/t:.0f} GF/s", flush=True)

    try:
        seed = jnp.zeros((1,), jnp.int32)
        t = slope(lambda s: prng_mask(s, B), (seed,))
        mb = B * H * S * S * 2 / 1e6
        print(f"pallas prng mask [B,H,S,S]: {t*1e6:.0f} us "
              f"({mb/t/1e3:.0f} GB/s written)", flush=True)
    except Exception as e:
        print(f"pallas prng mask FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
