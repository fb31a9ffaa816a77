"""Fused FFN (ops/ffn.py) vs the unfused dense->gelu->dense composition."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningdot_tpu.ops import ffn_gelu
from lightningdot_tpu.ops.activations import gelu
from lightningdot_tpu.ops.ffn import _ffn_math, _ffn_pallas


def _params(h=64, inter=256, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    intermediate = {"kernel": 0.05 * jax.random.normal(ks[0], (h, inter)),
                    "bias": 0.01 * jax.random.normal(ks[1], (inter,))}
    output = {"kernel": 0.05 * jax.random.normal(ks[2], (inter, h)),
              "bias": 0.01 * jax.random.normal(ks[3], (h,))}
    return intermediate, output


def _unfused(x, intermediate, output, dtype):
    """encoder._dense + gelu composition, pre-fusion."""
    def dense(p, x):
        prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        return (jnp.dot(x.astype(dtype), p["kernel"].astype(dtype),
                        preferred_element_type=jnp.float32,
                        precision=prec) + p["bias"]).astype(dtype)
    return dense(output, gelu(dense(intermediate, x)))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ffn_forward_matches_unfused(dtype):
    intermediate, output = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 64), dtype)
    got = ffn_gelu(x, intermediate, output, dtype)
    want = _unfused(x, intermediate, output, dtype)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ffn_grads_match_unfused():
    intermediate, output = _params()
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (5, 64))

    def lf(x, intermediate, output):
        return jnp.sum(ffn_gelu(x, intermediate, output, jnp.float32) * w)

    def lu(x, intermediate, output):
        return jnp.sum(_unfused(x, intermediate, output, jnp.float32) * w)

    g1 = jax.grad(lf, argnums=(0, 1, 2))(x, intermediate, output)
    g2 = jax.grad(lu, argnums=(0, 1, 2))(x, intermediate, output)
    flat1, _ = jax.tree.flatten(g1)
    flat2, _ = jax.tree.flatten(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_erf_poly_accuracy():
    """The in-kernel erf polynomial (A&S 7.1.26) is f32-accurate vs lax.erf."""
    from lightningdot_tpu.ops.ffn import _erf_poly
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    got = _erf_poly(x)
    want = jax.lax.erf(x)
    # A&S 7.1.26 bound is 1.5e-7; f32 evaluation adds rounding on top
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("rows", [128, 130])  # 130: ragged last block
def test_ffn_pallas_kernel_interpret(rows, monkeypatch):
    """The Pallas kernel (interpret mode) matches the jnp math, including
    the h1 residual output and non-divisible row counts."""
    monkeypatch.setenv("LDOT_FFN_BLOCK", "64")
    intermediate, output = _params()
    x2d = jax.random.normal(jax.random.PRNGKey(4), (rows, 64), jnp.float32)
    w1, b1 = intermediate["kernel"], intermediate["bias"]
    w2, b2 = output["kernel"], output["bias"]
    out, h1, inter = _ffn_pallas(x2d, w1, b1, w2, b2, with_h1=True,
                                 with_inter=True, interpret=True)
    want_out, want_h1 = _ffn_math(x2d, w1, b1, w2, b2)
    # kernel gelu uses the A&S 7.1.26 erf polynomial (|err|<=1.5e-7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(want_h1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(inter), np.asarray(gelu(want_h1)),
                               rtol=3e-5, atol=3e-6)
    out2, h1_none, inter_none = _ffn_pallas(x2d, w1, b1, w2, b2,
                                            with_h1=False, interpret=True)
    assert h1_none is None and inter_none is None
    np.testing.assert_allclose(np.asarray(out2), np.asarray(want_out),
                               rtol=3e-5, atol=3e-6)


def test_dh1_pallas_kernel_interpret(monkeypatch):
    """Fused (g @ w2^T) * gelu'(h1) kernel matches the jnp backward math
    (A&S erf polynomial tolerance)."""
    monkeypatch.setenv("LDOT_FFN_BLOCK", "64")
    from lightningdot_tpu.ops.experimental.ffn_dh1 import dh1_pallas
    from lightningdot_tpu.ops.ffn import _dot, _gelu_grad, _precision
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    rows, h, inter = 130, 64, 256  # ragged last block
    g = jax.random.normal(ks[0], (rows, h), jnp.float32)
    h1 = jax.random.normal(ks[1], (rows, inter), jnp.float32)
    w2 = 0.05 * jax.random.normal(ks[2], (inter, h), jnp.float32)
    got = dh1_pallas(g, h1, w2, interpret=True)
    prec = _precision(jnp.float32)
    want = (_dot(g, w2.T, prec).astype(jnp.float32)) * _gelu_grad(h1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-6)


def _int8_params(h=64, inter=256, seed=5):
    """Quantized param dicts in the serving.quantize_text_tower layout."""
    intermediate, output = _params(h, inter, seed)

    def q(kernel):
        k = jnp.asarray(kernel, jnp.float32)
        s = jnp.maximum(jnp.abs(k).max(axis=-2), 1e-8) / 127.0
        qi = jnp.clip(jnp.round(k / s[None, :]), -127, 127).astype(jnp.int8)
        return {"q": qi, "scale": s}

    qi = {**q(intermediate["kernel"]),
          "bias": intermediate["bias"].astype(jnp.float32)}
    qo = {**q(output["kernel"]), "bias": output["bias"].astype(jnp.float32)}
    return qi, qo


@pytest.mark.parametrize("rows", [128, 130])  # 130: ragged last block
def test_ffn_int8_pallas_kernel_interpret(rows, monkeypatch):
    """The fused int8 FFN kernel (interpret mode) matches the unfused
    serving composition it replaces. Not bit-exact: the two compilations
    round the dynamic-scale division (x/127) differently by 1 f32 ulp
    (reciprocal-multiply strength reduction), which can flip borderline
    int8 levels by +-1 — bound the effect instead."""
    monkeypatch.setenv("LDOT_INT8_FFN_BLOCK", "64")
    from lightningdot_tpu.ops.experimental.ffn_int8_pallas import (
        ffn_int8_pallas)
    from lightningdot_tpu.ops.ffn_int8 import _ffn_int8_math
    qi, qo = _int8_params()
    x2d = jax.random.normal(jax.random.PRNGKey(6), (rows, 64), jnp.bfloat16)
    args = (x2d, qi["q"], qi["scale"], qi["bias"],
            qo["q"], qo["scale"], qo["bias"])
    got = np.asarray(ffn_int8_pallas(*args, interpret=True), np.float32)
    want = np.asarray(_ffn_int8_math(*args, erf="poly"), np.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 0.01 * scale
    assert (got != want).mean() < 0.05  # the overwhelming majority is exact


def test_ffn_int8_matches_legacy_dense_composition():
    """ffn_gelu_int8 (default XLA path) is bit-identical to the pre-fusion
    serving composition gelu(_dense_int8(.)) -> _dense_int8(.)."""
    from lightningdot_tpu.ops.ffn_int8 import ffn_gelu_int8
    from lightningdot_tpu.serving import _dense_int8
    qi, qo = _int8_params()
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 9, 64), jnp.bfloat16)
    got = np.asarray(ffn_gelu_int8(qi, qo, x), np.float32)
    want = np.asarray(_dense_int8(qo, gelu(_dense_int8(qi, x))), np.float32)
    np.testing.assert_array_equal(got, want)


def test_use_pallas_vmem_gate(monkeypatch):
    """The Pallas FFN keeps both weight matrices VMEM-resident; at f32
    BERT-base dims (768x3072 twice = ~18 MiB) that exceeds the 16 MiB
    scoped-VMEM limit and the compile fails on hardware (measured: axon
    HTTP 500 "Ran out of memory in memory space vmem" on the f32 selftest
    eval). The dispatch must fall back to XLA for f32 full-size and keep
    the kernel for bf16 (the shipped dtype)."""
    from lightningdot_tpu.ops.ffn import _use_pallas, _vmem_fits

    h, inter, rows = 768, 3072, 3840
    x32 = jnp.zeros((rows, h), jnp.float32)
    w1_32 = jnp.zeros((h, inter), jnp.float32)
    w2_32 = jnp.zeros((inter, h), jnp.float32)
    assert not _vmem_fits(x32, w1_32, w2_32, with_h1=False)
    x16, w1_16, w2_16 = (a.astype(jnp.bfloat16) for a in (x32, w1_32, w2_32))
    assert _vmem_fits(x16, w1_16, w2_16, with_h1=True)

    monkeypatch.setattr("lightningdot_tpu.ops.ffn.backend",
                        lambda: "pallas")
    assert not _use_pallas(x32, w1_32, w2_32, with_h1=False)
    assert _use_pallas(x16, w1_16, w2_16)
    # explicit override still wins (perf forensics)
    monkeypatch.setenv("LDOT_FFN", "1")
    assert _use_pallas(x32, w1_32, w2_32)
