"""Unit tests for fused ops vs reference math (and torch goldens)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lightningdot_tpu.ops import gelu, layer_norm, multi_head_attention
from lightningdot_tpu.ops.attention import _attention_math


def test_gelu_matches_torch_erf_gelu(rng):
    x = rng.standard_normal((64, 128)).astype(np.float32)
    ours = np.asarray(gelu(jnp.asarray(x)))
    theirs = F.gelu(torch.from_numpy(x)).numpy()  # erf form by default
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((4, 7, 96)).astype(np.float32)
    scale = rng.standard_normal(96).astype(np.float32)
    bias = rng.standard_normal(96).astype(np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale),
                                 jnp.asarray(bias)))
    theirs = F.layer_norm(torch.from_numpy(x), (96,),
                          torch.from_numpy(scale), torch.from_numpy(bias),
                          eps=1e-12).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_layer_norm_grad_matches_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(32).astype(np.float32))

    def f_custom(x, s, b):
        return jnp.sum(jnp.sin(layer_norm(x, s, b)))

    def f_ref(x, s, b):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-12) * s + b
        return jnp.sum(jnp.sin(y))

    g1 = jax.grad(f_custom, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_attention_matches_torch(rng):
    # ours takes the projection-native [B, S, heads, dim] layout
    b, h, s, d = 2, 4, 16, 8
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    mask = (rng.random((b, s)) > 0.2).astype(np.float32)
    bias = (1.0 - mask)[:, None, None, :] * -10000.0

    ours = np.asarray(multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias)))

    # torch golden in the conventional [B, heads, S, dim] layout
    tq, tk, tv = (torch.from_numpy(x).permute(0, 2, 1, 3)
                  for x in (q, k, v))
    scores = tq @ tk.transpose(-1, -2) / np.sqrt(d)
    scores = scores + torch.from_numpy(bias)
    probs = torch.softmax(scores, dim=-1)
    theirs = (probs @ tv).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_attention_grads_flow(rng):
    b, h, s, d = 1, 2, 8, 4
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)

    def loss(q):
        return jnp.sum(multi_head_attention(q, q, q, bias) ** 2)

    def loss_ref(q):
        return jnp.sum(_attention_math(q, q, q, bias, 1.0 / d ** 0.5) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(q)),
                               np.asarray(jax.grad(loss_ref)(q)), atol=1e-4)


def test_attention_dropout_training_path(rng):
    b, h, s, d = 1, 2, 8, 4
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    bias = jnp.zeros((b, 1, 1, s), jnp.float32)
    out = multi_head_attention(q, q, q, bias, dropout_rate=0.5,
                               dropout_rng=jax.random.PRNGKey(0),
                               deterministic=False)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_dense_heads_merge_match_reshape_form():
    """_dense_heads/_dense_merge (head split/merge folded into the einsum)
    compute exactly _dense(...).reshape and its merge counterpart."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightningdot_tpu.models.encoder import (_dense, _dense_heads,
                                                 _dense_merge)

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    b, s, h, nh, hd = 3, 5, 32, 4, 8
    x = jax.random.normal(ks[0], (b, s, h), jnp.float32)
    p = {"kernel": 0.1 * jax.random.normal(ks[1], (h, h)),
         "bias": 0.01 * jax.random.normal(ks[2], (h,))}
    got = _dense_heads(p, x, nh, hd, jnp.float32)
    want = _dense(p, x, jnp.float32).reshape(b, s, nh, hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    ctx = want
    got2 = _dense_merge(p, ctx, jnp.float32)
    want2 = _dense(p, ctx.reshape(b, s, h), jnp.float32)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-6, atol=1e-6)


def test_attention_layout_bnsd_matches_default():
    """LDOT_ATTN_LAYOUT=bnsd (head-major projections) is numerically the
    default path: same dropout mask draw (keep shape is [B,h,q,k] in both
    layouts), f32-rounding-level agreement for outputs and grads."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.models import encoder as enc

    cfg = EncoderConfig(vocab_size=300, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=16,
                        hidden_dropout_prob=0.1,
                        attention_probs_dropout_prob=0.1)
    rng = np.random.default_rng(0)
    params = enc.init_encoder_tower(jax.random.PRNGKey(0), cfg,
                                    with_img=False)
    ids = jnp.asarray(rng.integers(1, 300, (3, 10)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (3, 10)) | np.eye(1, 10, dtype=int),
                       jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(10, dtype=jnp.int32), (3, 10))
    w = jnp.asarray(rng.standard_normal((32,)), jnp.float32)

    def loss(p, key, det):
        seq, _ = enc.encode_text(p, cfg, ids, mask, pos, deterministic=det,
                                 rng=key, dtype=jnp.float32)
        return jnp.sum(jnp.sin(seq * w))

    key = jax.random.PRNGKey(5)
    try:
        for det in (True, False):
            vals, grads = [], []
            for lay in ("bshd", "bnsd"):
                os.environ["LDOT_ATTN_LAYOUT"] = lay
                l, g = jax.value_and_grad(loss)(params, key, det)
                vals.append(float(l))
                grads.append(g)
            assert abs(vals[0] - vals[1]) < 1e-4, (det, vals)
            for a, b in zip(jax.tree.leaves(grads[0]),
                            jax.tree.leaves(grads[1])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-4, atol=1e-5)
    finally:
        os.environ.pop("LDOT_ATTN_LAYOUT", None)


def test_deferred_softmax_matches_normalized():
    """The bf16 deferred-normalization path (divide by the f32 denominator
    AFTER the AV matmul — the serving win, PERF.md) must agree with the
    normalized reference form to a couple of bf16 ulps on both layouts,
    and its gradients must stay finite/consistent."""
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    b, s, h, d = 2, 9, 3, 8
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
    mask = (jax.random.uniform(ks[3], (b, s)) > 0.2).astype(jnp.float32)
    bias = ((1.0 - mask) * -10000.0)[:, None, None, :]
    scale = 1.0 / (d ** 0.5)

    out_d = _attention_math(q, k, v, bias, scale, defer=True)
    out_n = _attention_math(q, k, v, bias, scale, defer=False)
    np.testing.assert_allclose(np.asarray(out_d, np.float32),
                               np.asarray(out_n, np.float32),
                               rtol=0.02, atol=0.02)

    qb = q.transpose(0, 2, 1, 3)
    out_db = _attention_math(qb, k.transpose(0, 2, 1, 3),
                             v.transpose(0, 2, 1, 3), bias, scale,
                             layout="bnsd", defer=True)
    np.testing.assert_allclose(
        np.asarray(out_db.transpose(0, 2, 1, 3), np.float32),
        np.asarray(out_n, np.float32), rtol=0.02, atol=0.02)

    # fully-masked rows must stay finite (exp(0)=1 uniform, like softmax)
    bias_all = jnp.full_like(bias, -10000.0)
    out_m = _attention_math(q, k, v, bias_all, scale, defer=True)
    assert bool(jnp.isfinite(out_m.astype(jnp.float32)).all())

    # gradient through the public no-dropout op (deferred fwd, normalized
    # bwd recompute) is finite and close to the normalized-form gradient
    w = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d), jnp.bfloat16)

    def loss(fn_defer):
        def f(q_, k_, v_):
            o = _attention_math(q_, k_, v_, bias, scale, defer=fn_defer)
            return jnp.sum((o * w).astype(jnp.float32))
        return f

    gd = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gd, gn):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        assert np.isfinite(a32).all()
        np.testing.assert_allclose(a32, b32, rtol=0.08, atol=0.08)
