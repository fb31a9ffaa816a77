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
