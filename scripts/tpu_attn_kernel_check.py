"""REAL-TPU validation of the fused attention training kernel.

The CPU TPU-interpreter's PRNG is deterministic but not seed-faithful, so
these properties must be checked on hardware:
  1. same seed -> identical output; different seed -> different mask;
  2. realized keep-rate ~= 1 - rate;
  3. fwd/bwd regenerate the SAME mask: directional finite differences of
     the fixed-seed forward match the backward kernel's dq/dk/dv.

Usage: python scripts/tpu_attn_kernel_check.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.ops.experimental.attention_fused import (_bwd_kernel, _call,
                                                  _fwd_kernel,
                                                  fused_attention_train)
from lightningdot_tpu.utils.runtime import setup_runtime

B, S, NH, HD = 8, 65, 12, 64
W = NH * HD
RATE = 0.3


def main():
    setup_runtime()
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, S, W), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, W), jnp.bfloat16)
    v = jnp.ones((B, S, W), jnp.bfloat16)
    bias2d = jnp.zeros((B, S), jnp.float32)

    f = jax.jit(functools.partial(fused_attention_train, nh=NH, rate=RATE))
    r1 = jax.random.key(5, impl="rbg")
    r2 = jax.random.key(6, impl="rbg")
    o1 = np.asarray(f(q, k, v, bias2d, r1), np.float32)
    o1b = np.asarray(f(q, k, v, bias2d, r1), np.float32)
    o2 = np.asarray(f(q, k, v, bias2d, r2), np.float32)
    assert np.array_equal(o1, o1b), "same seed must be deterministic"
    assert not np.array_equal(o1, o2), "different seed must differ"
    # v = ones => each output element is the sum of dropped probs for a
    # row; expectation 1.0 (inverted dropout)
    mean = float(o1.mean())
    assert abs(mean - 1.0) < 0.05, f"keep-rate expectation off: {mean}"
    print(f"determinism + seed sensitivity ok; E[sum dropped probs]="
          f"{mean:.4f}", flush=True)

    # finite-difference consistency (f32 for a clean FD)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    vf = jax.random.normal(ks[2], (B, S, W), jnp.float32)
    g = jax.random.normal(ks[3], (B, S, W), jnp.float32)
    seed = jnp.asarray([1234], jnp.int32)
    scale = 1.0 / (HD ** 0.5)

    def r4(x):
        return x.reshape(B, S, NH, HD)

    def fwd(q_, k_, v_):
        (out,) = _call(_fwd_kernel, 1, r4(q_), r4(k_), r4(v_), bias2d, seed,
                       nh=NH, rate=RATE, scale=scale)
        return out.reshape(B, S, W)

    fwd_j = jax.jit(fwd)
    bwd_j = jax.jit(lambda: _call(_bwd_kernel, 3, r4(qf), r4(kf), r4(vf),
                                  bias2d, seed, nh=NH, rate=RATE,
                                  scale=scale, extra=(r4(g),)))
    dq, dk, dv = [x.reshape(B, S, W) for x in bwd_j()]
    rng = np.random.default_rng(0)
    eps = 1e-2
    for name, x, dx, i in (("q", qf, dq, 0), ("k", kf, dk, 1),
                           ("v", vf, dv, 2)):
        u = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        args = [qf, kf, vf]
        ap = list(args); ap[i] = x + eps * u
        am = list(args); am[i] = x - eps * u
        fd = (np.sum(np.asarray(fwd_j(*ap)) * np.asarray(g))
              - np.sum(np.asarray(fwd_j(*am)) * np.asarray(g))) / (2 * eps)
        an = float(jnp.sum(dx * u))
        rel = abs(an - fd) / max(abs(fd), 1e-6)
        print(f"d{name}: analytic={an:.4f} fd={fd:.4f} rel={rel:.4f}",
              flush=True)
        assert rel < 2e-2, f"d{name} mismatch: {an} vs {fd}"
    print("fwd/bwd mask consistency ok", flush=True)


if __name__ == "__main__":
    main()
