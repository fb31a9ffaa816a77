"""ITM train step: loss decreases, dp-mesh == single-device, graft entry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _synthetic_batch, dryrun_multichip
from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.parallel.mesh import data_parallel_mesh, replicate
from lightningdot_tpu.training.itm_step import (create_train_state,
                                                itm_loss_fn, jit_train_step,
                                                make_itm_train_step)
from lightningdot_tpu.training.optim import make_optimizer


def tiny_model():
    cfg = dict(vocab_size=512, hidden_size=32, num_hidden_layers=2,
               num_attention_heads=4, intermediate_size=64,
               max_position_embeddings=32, hidden_dropout_prob=0.0,
               attention_probs_dropout_prob=0.0)
    txt_cfg = EncoderConfig(**cfg)
    img_cfg = EncoderConfig(**cfg, img_dim=16)
    return BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.float32)


def test_loss_decreases_when_training():
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(1e-3, max_grad_norm=2.0)
    state = create_train_state(params, tx)
    batch = _synthetic_batch(8, txt_len=16, n_regions=8, vocab=512,
                             img_dim=16)
    step = jit_train_step(make_itm_train_step(model, tx), donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert np.isfinite(losses).all()


def test_dp_mesh_matches_single_device():
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(1))
    tx = make_optimizer(1e-3)
    batch = _synthetic_batch(16, txt_len=16, n_regions=8, vocab=512,
                             img_dim=16, seed=3)
    rng = jax.random.PRNGKey(2)
    train_step = make_itm_train_step(model, tx)

    s1, m1 = jit_train_step(train_step, donate=False)(
        create_train_state(params, tx), batch, rng)

    mesh = data_parallel_mesh()
    state = replicate(mesh, create_train_state(params, tx))
    s8, m8 = jit_train_step(train_step, mesh=mesh, donate=False)(
        state, batch, rng)

    # global in-batch negatives: sharded step must equal the single-device
    # computation on the same global batch
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    # atol: Adam's first update is lr * g/(|g|+eps/sqrt(1-b2)) — for leaves
    # whose gradient is roundoff-scale (~1e-6), the psum reduction-order
    # difference between the two meshes lands mid-transition of that
    # normalizer and gets amplified to a few 1e-4 of lr-scale update;
    # real gradients agree to ~1e-7
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_hard_negative_batch_shapes():
    """imgs longer than txts (appended hard negatives)."""
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    batch = _synthetic_batch(6, txt_len=16, n_regions=8, vocab=512, img_dim=16)
    # append 4 hard-negative images
    extra = _synthetic_batch(4, txt_len=16, n_regions=8, vocab=512, img_dim=16,
                             seed=9)
    batch["imgs"] = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0),
        batch["imgs"], extra["imgs"])
    loss, (metrics, _) = itm_loss_fn(model, params, batch,
                                     jax.random.PRNGKey(0),
                                     deterministic=True)
    assert np.isfinite(float(loss))


def test_graft_dryrun_multichip():
    dryrun_multichip(8)


def test_padded_batch_loss_matches_exact_with_hard_negatives():
    """fixed_batch padding with hard negatives: the pad item's duplicated
    negatives must not enter any real row's softmax denominator — the
    padded batch's loss equals the exact (unpadded) batch's."""
    k = 2  # negatives per item
    n_real, n_pad = 3, 5

    def build(bs, pad_to):
        rng = np.random.default_rng(0)
        items = []
        for i in range(bs):
            b = _synthetic_batch(1, txt_len=16, n_regions=8, vocab=512,
                                 img_dim=16, seed=100 + i)
            items.append(b)
        # assemble [pos..., negs item-major] like itm_fast_collate
        if pad_to > bs:
            items = items + [items[-1]] * (pad_to - bs)
        negs = []
        for i in range(len(items)):
            for j in range(k):
                negs.append(_synthetic_batch(
                    1, txt_len=16, n_regions=8, vocab=512, img_dim=16,
                    seed=1000 + 10 * (i % bs) + j))
        def cat(field):
            return jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0),
                *[it[field] for it in items + negs])
        batch = {"txts": cat("txts"), "imgs": cat("imgs"), "caps": None,
                 "valid_mask": (np.arange(len(items)) < bs
                                ).astype(np.float32)}
        return batch

    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    exact = build(n_real, n_real)
    padded = build(n_real, n_pad)
    loss_e, (m_e, _) = itm_loss_fn(model, params, exact,
                                   jax.random.PRNGKey(0),
                                   deterministic=True,
                                   num_hard_negatives=k)
    loss_p, (m_p, _) = itm_loss_fn(model, params, padded,
                                   jax.random.PRNGKey(0),
                                   deterministic=True,
                                   num_hard_negatives=k)
    np.testing.assert_allclose(float(loss_p), float(loss_e), rtol=1e-5)
    np.testing.assert_allclose(float(m_p["acc"]), float(m_e["acc"]),
                               rtol=1e-5)
