"""Fused Pallas attention training kernel (ops/experimental/attention_fused.py).

Interpret-mode tests on CPU: rate=0 must match the XLA attention math
exactly (same f32 softmax, same contractions); with dropout the kernel's
mask comes from the Mosaic PRNG, so we test determinism, keep-rate, and
forward/backward mask consistency via directional finite differences.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningdot_tpu.ops.attention import _attention_math
from lightningdot_tpu.ops.experimental.attention_fused import (_attn_bwd, _attn_fwd,
                                                  _call, _bwd_kernel,
                                                  _fwd_kernel,
                                                  fused_attention_train,
                                                  seed_from_key)

B, S, NH, HD = 4, 9, 3, 8
W = NH * HD


def _inputs(dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, S, W), dtype)
    k = jax.random.normal(ks[1], (B, S, W), dtype)
    v = jax.random.normal(ks[2], (B, S, W), dtype)
    mask = (jax.random.uniform(ks[3], (B, S)) > 0.25).astype(jnp.float32)
    bias2d = (1.0 - mask) * -10000.0
    return q, k, v, bias2d


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_rate0_matches_xla_math(dtype):
    q, k, v, bias2d = _inputs(dtype)
    out = fused_attention_train(q, k, v, bias2d, None, nh=NH, rate=0.0,
                                interpret=True)
    want = _attention_math(
        q.reshape(B, S, NH, HD), k.reshape(B, S, NH, HD),
        v.reshape(B, S, NH, HD), bias2d[:, None, None, :],
        1.0 / (HD ** 0.5)).reshape(B, S, W)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        rtol=3e-6 if dtype == jnp.float32 else 2e-2,
        atol=3e-6 if dtype == jnp.float32 else 2e-2)


def test_dropout_deterministic():
    """Same seed -> same output, twice. NOTE: the CPU TPU-interpreter's
    prng is deterministic but NOT seed-faithful (it ignores the seed
    value), so seed-sensitivity and the actual keep rate are validated on
    the real chip by scripts/tpu_attn_kernel_check.py instead."""
    q, k, v, bias2d = _inputs()
    v1 = jnp.ones_like(v)
    rng = jax.random.key(5, impl="rbg")
    f = functools.partial(fused_attention_train, nh=NH, rate=0.3,
                          interpret=True)
    o1 = f(q, k, v1, bias2d, rng)
    o2 = f(q, k, v1, bias2d, rng)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def _r4(x):
    return x.reshape(x.shape[0], x.shape[1], NH, HD)


def _bwd_call(q, k, v, bias2d, seed, g, rate):
    outs = _call(_bwd_kernel, 3, _r4(q), _r4(k), _r4(v), bias2d, seed,
                 nh=NH, rate=rate, scale=1.0 / (HD ** 0.5),
                 interpret=True, extra=(_r4(g),))
    return [o.reshape(B, S, W) for o in outs]


def test_backward_matches_autodiff_rate0():
    q, k, v, bias2d = _inputs()
    g = jax.random.normal(jax.random.PRNGKey(9), (B, S, W))
    seed = jnp.zeros((1,), jnp.int32)
    dq, dk, dv = _bwd_call(q, k, v, bias2d, seed, g, 0.0)

    def ref(q, k, v):
        return _attention_math(
            q.reshape(B, S, NH, HD), k.reshape(B, S, NH, HD),
            v.reshape(B, S, NH, HD), bias2d[:, None, None, :],
            1.0 / (HD ** 0.5)).reshape(B, S, W)

    _, vjp = jax.vjp(ref, q, k, v)
    wq, wk, wv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(wq), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(wk), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(wv), rtol=2e-5,
                               atol=2e-5)


def test_backward_finite_difference_with_dropout():
    """fwd and bwd regenerate the SAME mask: directional finite differences
    of the (deterministic, fixed-seed) forward match the kernel backward."""
    q, k, v, bias2d = _inputs()
    seed = jnp.asarray([42], jnp.int32)
    rate = 0.2
    g = jax.random.normal(jax.random.PRNGKey(3), (B, S, W))

    def fwd(q_, k_, v_):
        (out,) = _call(_fwd_kernel, 1, _r4(q_), _r4(k_), _r4(v_), bias2d,
                       seed, nh=NH, rate=rate, scale=1.0 / (HD ** 0.5),
                       interpret=True)
        return out.reshape(B, S, W)

    dq, dk, dv = _bwd_call(q, k, v, bias2d, seed, g, rate)
    rng = np.random.default_rng(0)
    eps = 1e-3
    for name, x, dx in (("q", q, dq), ("k", k, dk), ("v", v, dv)):
        u = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        args = {"q": [q, k, v], "k": [q, k, v], "v": [q, k, v]}[name]
        i = {"q": 0, "k": 1, "v": 2}[name]
        ap = list(args); ap[i] = x + eps * u
        am = list(args); am[i] = x - eps * u
        fd = (np.sum(np.asarray(fwd(*ap)) * np.asarray(g))
              - np.sum(np.asarray(fwd(*am)) * np.asarray(g))) / (2 * eps)
        an = float(jnp.sum(dx * u))
        np.testing.assert_allclose(an, fd, rtol=2e-3, atol=2e-2)


def test_custom_vjp_wiring():
    """jax.grad through the public custom_vjp path (interpret via env is
    not available here, so rate=0 + the pure-callable fallback check)."""
    q, k, v, bias2d = _inputs()
    rng = jax.random.key(1, impl="rbg")
    s = seed_from_key(rng)
    assert s.shape == (1,) and s.dtype == jnp.int32
    # gradient flows and has the right shape through _attn_fwd/_attn_bwd
    q4, k4, v4 = _r4(q), _r4(k), _r4(v)
    out, res = _attn_fwd(q4, k4, v4, bias2d, s, NH, 0.0, 1.0 / (HD ** 0.5))
    g = jnp.ones_like(out)
    dq, dk, dv, dbias, dseed = _attn_bwd(NH, 0.0, 1.0 / (HD ** 0.5), res, g)
    assert dq.shape == q4.shape and dk.shape == k4.shape
    assert dv.shape == v4.shape


def test_seed_from_key_variants():
    s1 = seed_from_key(jax.random.key(0, impl="rbg"))
    s2 = seed_from_key(jax.random.key(1, impl="rbg"))
    assert s1.shape == (1,) and int(s1[0]) != int(s2[0])
    s3 = seed_from_key(jax.random.PRNGKey(0))
    assert s3.shape == (1,)
