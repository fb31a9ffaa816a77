"""Cross-encoder (teacher/re-ranker), OT distance, and KD loss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.cross_encoder import CrossEncoder
from lightningdot_tpu.models.ot import optimal_transport_dist


def tiny_cross():
    cfg = EncoderConfig(vocab_size=256, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=64, img_dim=16,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    return CrossEncoder(cfg)


def joint_batch(rng, bs=6, tl=8, nr=5, vocab=256, img_dim=16):
    return {
        "input_ids": jnp.asarray(rng.integers(1, vocab, (bs, tl)),
                                 dtype=jnp.int32),
        "position_ids": jnp.broadcast_to(jnp.arange(tl, dtype=jnp.int32),
                                         (bs, tl)),
        "img_feat": jnp.asarray(rng.standard_normal((bs, nr, img_dim)),
                                dtype=jnp.float32),
        "img_pos_feat": jnp.asarray(rng.random((bs, nr, 7)),
                                    dtype=jnp.float32),
        "attn_masks": jnp.ones((bs, tl + nr), jnp.int32),
        "sample_size": 3,
    }


def test_rank_scores_and_triplet_loss(rng):
    model = tiny_cross()
    params = model.init(jax.random.PRNGKey(0))
    batch = joint_batch(rng)
    scores = model.apply(params, batch, compute_loss=False)
    assert scores.shape == (6, 1)

    loss = model.apply(params, batch, compute_loss=True)
    # 6 rows / sample_size 3 -> 2 groups x 2 negatives
    assert loss.shape == (2, 2)
    # hand-check: clamp(margin + sig(neg) - sig(pos), 0)
    sig = jax.nn.sigmoid(scores.reshape(2, 3))
    expected = np.clip(0.2 + np.asarray(sig[:, 1:]) - np.asarray(sig[:, :1]),
                       0, None)
    np.testing.assert_allclose(np.asarray(loss), expected, atol=1e-6)


def test_init_output_seeds_rank_from_itm():
    model = tiny_cross()
    params = model.init(jax.random.PRNGKey(0))
    seeded = CrossEncoder.init_output(params)
    np.testing.assert_array_equal(
        np.asarray(seeded["rank_output"]["kernel"]),
        np.asarray(params["itm_output"]["kernel"][:, 1:2]))
    np.testing.assert_array_equal(
        np.asarray(seeded["rank_output"]["bias"]),
        np.asarray(params["itm_output"]["bias"][1:]))


def test_gather_index_compaction(rng):
    """gather_index=identity over concat must equal gather_index=None."""
    model = tiny_cross()
    params = model.init(jax.random.PRNGKey(0))
    batch = joint_batch(rng)
    s1 = model.encode(params, batch)
    tl, nr = 8, 5
    gi = jnp.broadcast_to(jnp.arange(tl + nr, dtype=jnp.int32), (6, tl + nr))
    batch2 = dict(batch, gather_index=gi)
    s2 = model.encode(params, batch2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_ot_distance_properties(rng):
    b, m, n, d = 3, 6, 5, 8
    txt = jnp.asarray(rng.standard_normal((b, m, d)).astype(np.float32))
    img = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    txt_pad = jnp.zeros((b, m), bool).at[:, 4:].set(True)
    img_pad = jnp.zeros((b, n), bool).at[:, 4:].set(True)

    dist = optimal_transport_dist(txt, img, txt_pad, img_pad)
    assert dist.shape == (b,)
    assert (np.asarray(dist) >= -1e-5).all()

    # identical (aligned) embeddings -> near-zero transport cost
    same = optimal_transport_dist(txt[:, :4], txt[:, :4],
                                  jnp.zeros((b, 4), bool),
                                  jnp.zeros((b, 4), bool))
    assert np.asarray(same).max() < 0.05

    # padded tail must not affect the distance
    txt2 = txt.at[:, 4:].set(123.0)
    dist2 = optimal_transport_dist(txt2, img, txt_pad, img_pad)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist2), atol=1e-5)

    # differentiable (through the cost matrix only)
    g = jax.grad(lambda t: jnp.sum(optimal_transport_dist(
        t, img, txt_pad, img_pad)))(txt)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_kd_loss_runs(rng):
    from lightningdot_tpu.data.itm import make_teacher_batch
    from lightningdot_tpu.training.itm_step import make_kd_fn

    teacher = tiny_cross()
    t_params = teacher.init(jax.random.PRNGKey(1))
    bs, tl, nr = 4, 8, 5
    n_teacher = 2
    batch = {
        "sample_size": bs,
        "txts": {"input_ids": np.asarray(
                     rng.integers(1, 256, (bs, tl)), np.int32),
                 "attention_mask": np.ones((bs, tl), np.int32),
                 "position_ids": np.broadcast_to(np.arange(tl, dtype=np.int32),
                                                 (bs, tl))},
        "imgs": {"input_ids": np.full((bs, 1), 101, np.int32),
                 "attention_mask": np.ones((bs, 1 + nr), np.int32),
                 "img_feat": rng.standard_normal((bs, nr, 16)).astype(np.float32),
                 "img_pos_feat": rng.random((bs, nr, 7)).astype(np.float32)},
        "caps": None,
    }
    tb = make_teacher_batch(batch, n_teacher)
    assert tb["input_ids"].shape == (bs * n_teacher, tl)
    assert tb["img_feat"].shape == (bs * n_teacher, nr, 16)
    assert tb["attn_masks"].shape == (bs * n_teacher, tl + nr)
    batch["teacher"] = tb

    kd_fn = make_kd_fn(teacher, t_params, T=2.0, n_teacher=n_teacher)
    txt = jnp.asarray(rng.standard_normal((bs, 32)).astype(np.float32))
    img = jnp.asarray(rng.standard_normal((bs, 32)).astype(np.float32))
    batch_j = jax.tree.map(jnp.asarray, batch)
    loss = kd_fn(None, batch_j, (txt, img, None))
    assert np.isfinite(float(loss)) and float(loss) >= 0


def test_kd_formula_matches_torch(rng):
    """KD KL term matches nn.KLDivLoss()(log_softmax(s/T), softmax(t/T))*T^2
    (train_itm.py:237-239)."""
    import torch
    import torch.nn.functional as F

    from lightningdot_tpu.training.itm_step import make_kd_fn

    nt, bs = 3, 6
    student = rng.standard_normal((bs, bs)).astype(np.float32)
    t_scores = rng.standard_normal((bs * nt, 1)).astype(np.float32)
    T = 2.0

    class StubTeacher:
        def rank_scores(self, params, batch, deterministic=True):
            return jnp.asarray(t_scores)

    kd_fn = make_kd_fn(StubTeacher(), None, T=T, n_teacher=nt)
    txt = rng.standard_normal((bs, 8)).astype(np.float32)
    img = rng.standard_normal((bs, 8)).astype(np.float32)
    batch = {"teacher": {"input_ids": np.zeros((bs * nt, 4), np.int32)}}
    ours = float(kd_fn(None, batch, (jnp.asarray(txt), jnp.asarray(img), None)))

    s = txt @ img.T
    blended = 0.5 * (s + s.T)
    student_rows = torch.from_numpy(blended[:nt])
    teacher_rows = torch.from_numpy(t_scores.reshape(bs, nt).T.copy())
    ref = torch.nn.KLDivLoss()(
        F.log_softmax(student_rows / T, dim=1),
        F.softmax(teacher_rows / T, dim=1)) * T * T
    assert abs(ours - float(ref)) < 1e-5
