"""Isolated FFN fwd micro A/B at the train shape: Pallas kernel vs XLA.

Chained-slope method inside one program per variant: y_{i+1} = ffn(y_i)
(serial dependency), short vs long chain difference, one float() pull.
Both variants run the SAME program structure, only the ffn impl differs.

Usage: python scripts/perf_ffn_micro.py [rows]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from lightningdot_tpu.ops.ffn import _ffn_math, _ffn_pallas
from lightningdot_tpu.utils.runtime import setup_runtime

H, I = 768, 3072


def chain(impl, n):
    def run(x, w1, b1, w2, b2):
        def body(y, _):
            if impl == "pallas":
                out, _h1, _ = _ffn_pallas(y, w1, b1, w2, b2, with_h1=False)
            elif impl == "pallas_h1":
                out, _h1, _ = _ffn_pallas(y, w1, b1, w2, b2, with_h1=True)
            elif impl == "pallas_h1i":
                out, _h1, _ = _ffn_pallas(y, w1, b1, w2, b2, with_h1=True,
                                          with_inter=True)
            else:
                out, _h1 = _ffn_math(y, w1, b1, w2, b2)
            return out * jnp.asarray(0.5, out.dtype), None
        y, _ = lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))
    return jax.jit(run)


def measure(impl, args, n_s=8, n_l=32):
    fs, fl = chain(impl, n_s), chain(impl, n_l)
    float(fs(*args))
    t0 = time.perf_counter(); float(fs(*args)); ts = time.perf_counter() - t0
    float(fl(*args))
    t0 = time.perf_counter(); float(fl(*args)); tl = time.perf_counter() - t0
    per = (tl - ts) / (n_l - n_s)
    gf = 2 * args[0].shape[0] * H * I * 2 / 1e9
    print(f"ffn/{impl}: {per*1e6:.0f} us/call -> {gf/per:.0f} GF/s",
          flush=True)
    return per


def main():
    setup_runtime()
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 6240
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (rows, H), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (H, I), jnp.bfloat16) * 0.03
    b1 = jnp.zeros((I,), jnp.float32)
    w2 = jax.random.normal(ks[2], (I, H), jnp.bfloat16) * 0.03
    b2 = jnp.zeros((H,), jnp.float32)
    args = (x, w1, b1, w2, b2)
    measure("xla", args)
    measure("pallas", args)
    measure("pallas_h1", args)


if __name__ == "__main__":
    main()
