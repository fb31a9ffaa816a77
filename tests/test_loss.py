"""Contrastive loss parity vs torch (dvl/models/bi_encoder.py:613-665)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lightningdot_tpu.models.bi_encoder import (BiEncoderNllLoss,
                                                dot_product_scores)


def torch_calc(q, ctx, cap, pos_idx, caption_score_weight):
    scores_img = torch.from_numpy(q) @ torch.from_numpy(ctx).T
    if cap is not None and caption_score_weight != 0:
        scores_cap = torch.from_numpy(q) @ torch.from_numpy(cap).T
        scores = ((1 - caption_score_weight) * scores_img
                  + caption_score_weight * scores_cap)
    else:
        scores = scores_img
    sm = F.log_softmax(scores, dim=1)
    loss = F.nll_loss(sm, torch.tensor(pos_idx), reduction="mean")
    _, max_idxs = torch.max(sm, 1)
    correct = (max_idxs == torch.tensor(pos_idx)).sum()
    return loss.item(), correct.item(), scores.numpy()


def test_nll_loss_matches_torch(rng):
    nq, nc, d = 8, 12, 16
    q = rng.standard_normal((nq, d)).astype(np.float32)
    ctx = rng.standard_normal((nc, d)).astype(np.float32)
    pos = rng.integers(0, nc, nq).tolist()

    loss, correct, scores = BiEncoderNllLoss.calc(
        jnp.asarray(q), jnp.asarray(ctx), None, pos, None, 0.0)
    t_loss, t_correct, t_scores = torch_calc(q, ctx, None, pos, 0.0)
    assert abs(float(loss) - t_loss) < 1e-5
    assert int(correct) == t_correct
    np.testing.assert_allclose(np.asarray(scores), t_scores, atol=1e-5)


def test_nll_loss_with_caption_blending(rng):
    nq, d = 6, 16
    q = rng.standard_normal((nq, d)).astype(np.float32)
    ctx = rng.standard_normal((nq, d)).astype(np.float32)
    cap = rng.standard_normal((nq, d)).astype(np.float32)
    pos = list(range(nq))
    w = 0.3
    loss, correct, scores = BiEncoderNllLoss.calc(
        jnp.asarray(q), jnp.asarray(ctx), jnp.asarray(cap), pos, None, w)
    t_loss, t_correct, t_scores = torch_calc(q, ctx, cap, pos, w)
    assert abs(float(loss) - t_loss) < 1e-5
    np.testing.assert_allclose(np.asarray(scores), t_scores, atol=1e-5)


def test_dot_product_cosine(rng):
    q = rng.standard_normal((4, 8)).astype(np.float32)
    c = rng.standard_normal((5, 8)).astype(np.float32)
    r = np.asarray(dot_product_scores(jnp.asarray(q), jnp.asarray(c),
                                      cosine=True))
    tq, tc = torch.from_numpy(q), torch.from_numpy(c)
    ref = (tq @ tc.T / torch.ger(tq.norm(dim=-1), tc.norm(dim=-1))).numpy()
    np.testing.assert_allclose(r, ref, atol=1e-5)


def test_fused_adamw_matches_optax():
    """FusedAdamW (single-pass clip+AdamW) == make_optimizer's chained
    transform, element-wise — including the schedule-index convention
    (both evaluate the schedule at the 0-based update index)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lightningdot_tpu.training.optim import (make_fused_adamw,
                                                 make_optimizer,
                                                 schedule_linear)

    rng = np.random.default_rng(0)
    params = {
        "dense": {"kernel": jnp.asarray(rng.standard_normal((8, 16)),
                                        jnp.float32),
                  "bias": jnp.zeros((16,), jnp.float32)},
        "ln": {"scale": jnp.ones((16,), jnp.float32),
               "bias": jnp.zeros((16,), jnp.float32)},
    }
    sched = schedule_linear(1e-3, 2, 10)
    kw = dict(weight_decay=0.01, betas=(0.9, 0.98), max_grad_norm=0.5)
    tx = make_optimizer(sched, **kw)
    fused = make_fused_adamw(sched, **kw)

    p_ref, s_ref = params, tx.init(params)
    p_f, s_f = params, fused.init(params)
    for step in range(5):
        g = jax.tree.map(
            lambda x: jnp.asarray(
                rng.standard_normal(x.shape) * (10.0 if step == 0 else 0.1),
                jnp.float32), params)  # step 0 exercises the clip branch
        u, s_ref = tx.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        p_f, s_f = fused.apply(g, s_f, p_f)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6), p_ref, p_f)
    assert float(s_f.grad_norm) > 0


def test_fused_adamw_bf16_state_option():
    """state_dtype=bf16 halves the m/v sweep; update math stays f32 —
    params after several steps track the f32-state optimizer to bf16
    resolution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightningdot_tpu.training.optim import make_fused_adamw

    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)}
    kw = dict(weight_decay=0.01, betas=(0.9, 0.98), max_grad_norm=0.5)
    f32 = make_fused_adamw(1e-3, **kw)
    b16 = make_fused_adamw(1e-3, state_dtype=jnp.bfloat16, **kw)
    p1, s1 = params, f32.init(params)
    p2, s2 = params, b16.init(params)
    # mu stores bf16; nu must STAY f32 (a bf16 nu's per-step EMA change
    # is below half an ulp near steady state and would freeze)
    assert s2.mu["w"].dtype == jnp.bfloat16
    assert s2.nu["w"].dtype == jnp.float32
    for step in range(10):
        g = {"w": jnp.asarray(rng.standard_normal((16, 32)) * 0.1,
                              jnp.float32)}
        p1, s1 = f32.apply(g, s1, p1)
        p2, s2 = b16.apply(g, s2, p2)
    # updates are O(lr)=1e-3/step; bf16 moment rounding perturbs each
    # update by ~0.4% of its magnitude
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]),
                               atol=2e-4)
    assert s2.mu["w"].dtype == jnp.bfloat16


def test_pallas_adamw_matches_jnp():
    """ops/adamw_pallas kernel (interpret mode) == FusedAdamW jnp leaf math,
    elementwise, including weight decay and clip scale."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightningdot_tpu.ops.experimental.adamw_pallas import adamw_leaf_pallas

    rng = np.random.default_rng(3)
    shape = (24, 128)  # multiple of 128 elements
    p = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    g = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    m = jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.float32)
    v = jnp.asarray(rng.random(shape) * 0.01, jnp.float32)
    b1, b2, eps, wd = 0.9, 0.98, 1e-8, 0.01
    scale, lr, c1, c2 = 0.7, 1e-3, 1.0 - b1 ** 3, 1.0 - b2 ** 3
    step_size = lr * np.sqrt(c2) / c1
    scalars = jnp.asarray([scale, step_size, lr, 0.0], jnp.float32)

    p2, m2, v2 = adamw_leaf_pallas(p, g, m, v, scalars, b1=b1, b2=b2,
                                   eps=eps, wd=wd, interpret=True)

    gs = g * scale
    m_ref = b1 * m + (1 - b1) * gs
    v_ref = b2 * v + (1 - b2) * jnp.square(gs)
    # reference AdamW formula (uniter_model/optim/adamw.py:75-103)
    p_ref = p - step_size * m_ref / (jnp.sqrt(v_ref) + eps)
    p_ref = p_ref - lr * wd * p_ref
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m_ref), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v_ref), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p_ref), rtol=1e-5, atol=1e-7)

    # odd row count exercises the ragged last grid block
    p3, m3, v3 = adamw_leaf_pallas(p[:17], g[:17], m[:17], v[:17], scalars,
                                   b1=b1, b2=b2, eps=eps, wd=0.0,
                                   interpret=True)
    p3_ref = p[:17] - step_size * m_ref[:17] / (jnp.sqrt(v_ref[:17]) + eps)
    np.testing.assert_allclose(np.asarray(p3), np.asarray(p3_ref),
                               rtol=1e-5, atol=1e-7)
