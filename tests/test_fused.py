"""Fused training compositions (ops/fused.py) vs their unfused forms.

The fused ops must be bit-identical forward (same bernoulli stream, same
rounding points) and gradient-equal to the naive compositions they replace
— the ONLY difference is which residuals the backward pass stores.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningdot_tpu.ops.fused import attention_prob_dropout, dropout_add_ln
from lightningdot_tpu.ops.layernorm import _ln_math


def unfused_dal(x, res, scale, bias, rng, rate, eps):
    """The composition from models/encoder.py before fusion."""
    if rng is not None and rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        x = x * keep.astype(x.dtype) * jnp.asarray(1.0 / (1.0 - rate),
                                                   x.dtype)
    u = x + res
    return _ln_math(u.astype(jnp.float32), scale, bias, eps).astype(x.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("impl", ["threefry2x32", "rbg"])
def test_dropout_add_ln_forward_bitwise(dtype, impl):
    rng = jax.random.key(7, impl=impl)
    xk, rk = jax.random.split(jax.random.key(0), 2)
    x = jax.random.normal(xk, (6, 33, 64), dtype)
    res = jax.random.normal(rk, (6, 33, 64), dtype)
    scale = jnp.linspace(0.5, 1.5, 64, dtype=jnp.float32)
    bias = jnp.linspace(-0.1, 0.1, 64, dtype=jnp.float32)
    got = dropout_add_ln(x, res, scale, bias, rng, rate=0.1, eps=1e-12)
    want = unfused_dal(x, res, scale, bias, rng, 0.1, 1e-12)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dropout_add_ln_legacy_key_and_maskfree():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(2), (4, 16), jnp.float32)
    scale, bias = jnp.ones((16,)), jnp.zeros((16,))
    # legacy raw uint32 key
    rng = jax.random.PRNGKey(3)
    got = dropout_add_ln(x, res, scale, bias, rng, rate=0.25, eps=1e-12)
    want = unfused_dal(x, res, scale, bias, rng, 0.25, 1e-12)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # rate=0 -> plain fused add+LN (rng may be None)
    got0 = dropout_add_ln(x, res, scale, bias, None, rate=0.0, eps=1e-12)
    want0 = unfused_dal(x, res, scale, bias, None, 0.0, 1e-12)
    np.testing.assert_array_equal(np.asarray(got0), np.asarray(want0))
    # a missing key with rate>0 is a caller bug and must fail fast
    with pytest.raises(ValueError):
        dropout_add_ln(x, res, scale, bias, None, rate=0.5, eps=1e-12)


@pytest.mark.parametrize("policy", ["store", "regen"])
def test_dropout_add_ln_grads_match_unfused(policy, monkeypatch):
    monkeypatch.setenv("LDOT_DROPOUT_MASK", policy)
    rng = jax.random.key(11, impl="rbg")
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 32), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(5), (8, 32), jnp.float32)
    scale = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(6), (32,))
    bias = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (32,))
    w = jax.random.normal(jax.random.PRNGKey(8), (8, 32))

    def loss_fused(x, res, scale, bias):
        return jnp.sum(
            dropout_add_ln(x, res, scale, bias, rng, rate=0.2, eps=1e-12) * w)

    def loss_unfused(x, res, scale, bias):
        return jnp.sum(unfused_dal(x, res, scale, bias, rng, 0.2, 1e-12) * w)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    g2 = jax.grad(loss_unfused, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def unfused_attn_dropout(q, k, v, bias, rng, rate, scale, prec):
    """The inline training branch replaced by attention_prob_dropout."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    keep = jax.random.bernoulli(rng, 1.0 - rate, probs.shape)
    probs = (probs * keep.astype(probs.dtype)
             * jnp.asarray(1.0 / (1.0 - rate), probs.dtype))
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.astype(v.dtype)


@pytest.mark.parametrize("policy,resid", [("store", "recompute"),
                                          ("regen", "recompute"),
                                          ("store", "store_probs")])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_attention_prob_dropout_matches_inline(dtype, policy, resid,
                                               monkeypatch):
    monkeypatch.setenv("LDOT_DROPOUT_MASK", policy)
    monkeypatch.setenv("LDOT_ATTN_RESID", resid)
    b, s, h, d = 3, 9, 2, 8
    rng = jax.random.key(3, impl="rbg")
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, s, h, d), dtype)
    k = jax.random.normal(ks[1], (b, s, h, d), dtype)
    v = jax.random.normal(ks[2], (b, s, h, d), dtype)
    mask = (jax.random.uniform(ks[3], (b, s)) > 0.2).astype(jnp.float32)
    bias = ((1.0 - mask) * -10000.0)[:, None, None, :]
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    scale = 1.0 / (d ** 0.5)

    got = attention_prob_dropout(q, k, v, bias, rng, rate=0.1, scale=scale,
                                 prec=prec)
    want = unfused_attn_dropout(q, k, v, bias, rng, 0.1, scale, prec)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    if dtype == jnp.float32:
        w = jax.random.normal(jax.random.PRNGKey(9), (b, s, h, d))

        def lf(q, k, v):
            return jnp.sum(attention_prob_dropout(
                q, k, v, bias, rng, rate=0.1, scale=scale, prec=prec) * w)

        def lu(q, k, v):
            return jnp.sum(
                unfused_attn_dropout(q, k, v, bias, rng, 0.1, scale, prec)
                * w)

        g1 = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lu, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-6)


def test_fused_ops_under_jit_and_scan():
    """The real usage: inside jit + lax.scan with per-layer keys."""
    rng = jax.random.key(0, impl="rbg")
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32), jnp.bfloat16)
    scale, bias = jnp.ones((32,)), jnp.zeros((32,))

    @jax.jit
    def f(x, rng):
        def body(h, lrng):
            return dropout_add_ln(h, h, scale, bias, lrng,
                                  rate=0.1, eps=1e-12), None
        out, _ = jax.lax.scan(body, x, jax.random.split(rng, 3))
        return jnp.sum(out.astype(jnp.float32))

    g = jax.grad(f)(x, rng)
    assert g.shape == x.shape
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
