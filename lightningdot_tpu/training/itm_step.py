"""Jitted ITM fine-tuning step.

Parity: the train_itm.py hot loop (train_itm.py:191-289) — bidirectional
in-batch NCE (txt->img and img->txt averaged, train_itm.py:197-222), optional
caption-score blending, optional KD KL-divergence against a cross-encoder
teacher (train_itm.py:224-239), grad clip + AdamW + linear schedule.

TPU-native distribution: the step is jitted over a dp mesh with the batch
sharded on its leading axis and parameters replicated. Because jit sees the
*global* batch, the score matrix q @ ctx.T is computed over all devices'
examples — i.e. GLOBAL in-batch negatives (the reference's dead
``_calc_loss`` cross-rank gather, dvl/utils.py:114-169, realised by XLA
collectives instead of explicit code). Gradients are psum'd by XLA
automatically.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from lightningdot_tpu.models.bi_encoder import BiEncoder


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def itm_loss_fn(model: BiEncoder, params, batch, rng, *,
                caption_score_weight: float = 0.0,
                num_hard_negatives: int = 0,
                deterministic: bool = False) -> Tuple[jnp.ndarray, Dict]:
    """Bidirectional NCE (train_itm.py:191-222).

    With hard negatives, txts/imgs carry bs positives followed by
    bs*num_hard_negatives negatives (itm_fast_collate layout); queries are
    the positives, contexts are everything (train_itm.py:197-201).
    """
    txt, img, cap = model.apply(params, batch, deterministic=deterministic,
                                rng=rng)
    bs = txt.shape[0] // (1 + num_hard_negatives)
    pos_idx = jnp.arange(bs)

    # Fixed-batch padding: the collate duplicates the last item to fill the
    # batch (itm_fast_collate fixed_batch). Padded rows must neither act as
    # queries nor as negative contexts (the reference trains on the exact
    # dynamic batch). 'valid' marks real positives.
    valid = batch.get("valid_mask")
    if valid is None:
        valid = jnp.ones((bs,), jnp.float32)
    # a padded column j (valid[j]==0) is masked for OTHER rows via a large
    # negative bias, except at its own diagonal position
    neg_inf = -1e30

    def masked_calc(q, ctx, cap_ctx, n_pos_ctx):
        scores = jnp.dot(q, ctx.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        if cap_ctx is not None and caption_score_weight != 0:
            cap_scores = jnp.dot(q, cap_ctx.T,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
            scores = ((1 - caption_score_weight) * scores
                      + caption_score_weight * cap_scores)
        n_ctx = ctx.shape[0]
        ctx_valid = jnp.ones((n_ctx,), jnp.float32)
        ctx_valid = ctx_valid.at[:n_pos_ctx].set(valid)
        if n_ctx > n_pos_ctx:
            # hard-negative rows are item-major (k per item,
            # itm_fast_collate); a PAD item's negatives are duplicates of
            # the last real item's and must not act as extra contexts
            # (they would double-count those negatives in every real
            # row's softmax denominator)
            k = (n_ctx - n_pos_ctx) // n_pos_ctx
            if k > 0:
                neg_valid = jnp.repeat(valid, k)
                ctx_valid = ctx_valid.at[
                    n_pos_ctx:n_pos_ctx + neg_valid.shape[0]].set(neg_valid)
        col_mask = (1.0 - ctx_valid)[None, :] * neg_inf
        # keep each row's own positive column unmasked
        diag = jax.nn.one_hot(pos_idx, n_ctx)
        scores = scores + col_mask * (1.0 - diag)
        logp = jax.nn.log_softmax(scores, axis=1)
        nll = -jnp.take_along_axis(logp, pos_idx[:, None], axis=1)[:, 0]
        loss = jnp.sum(nll * valid) / jnp.maximum(valid.sum(), 1.0)
        correct = jnp.sum((jnp.argmax(logp, axis=1) == pos_idx) * valid)
        return loss, correct

    # img -> txt ("loss_nce_txt": q=imgs[:bs], ctx=all texts,
    # train_itm.py:199-201)
    loss1, correct1 = masked_calc(img[:bs], txt, cap, bs)
    # txt -> img ("loss_nce_img": q=txts[:bs], ctx=all images)
    loss2, correct2 = masked_calc(txt[:bs], img, cap, bs)
    loss = 0.5 * loss1 + 0.5 * loss2
    n_valid = jnp.maximum(valid.sum(), 1.0)
    metrics = {
        "loss": loss, "loss_img2txt": loss1, "loss_txt2img": loss2,
        "acc": (correct1 + correct2) / (2.0 * n_valid),
    }
    return loss, (metrics, (txt, img, cap))


def make_kd_fn(teacher, teacher_params, *, T: float = 1.0,
               n_teacher: int = 10,
               caption_score_weight: float = 0.0) -> Callable:
    """Teacher-distillation loss (train_itm.py:224-239).

    Student scores: symmetrized blend of the in-batch score matrices from
    both directions (train_itm.py:217-222), each including the caption term
    when ``caption_score_weight`` > 0 (the _calc_loss blending), first
    ``n_teacher`` rows. Teacher scores: cross-encoder rank logits on the
    (text x first-n images) pair grid, reshaped [n_teacher, bs].
    KL(log_softmax(student/T) || softmax(teacher/T)) * T^2, elementwise-mean
    reduction (nn.KLDivLoss default).
    """

    def kd_fn(params, batch, embs):
        del params
        txt, img, cap = embs
        bs = batch["teacher"]["input_ids"].shape[0] // n_teacher

        def blended(q, ctx):
            s = jnp.dot(q, ctx.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            if cap is not None and caption_score_weight != 0:
                sc = jnp.dot(q, cap[:bs].T,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                s = (1 - caption_score_weight) * s + caption_score_weight * sc
            return s

        s_img_q = blended(img[:bs], txt[:bs])   # "scores_txt" (q=imgs)
        s_txt_q = blended(txt[:bs], img[:bs])   # "scores_img" (q=txts)
        student = (0.5 * s_img_q + 0.5 * s_txt_q)[:n_teacher]      # [nt, bs]
        t_scores = teacher.rank_scores(
            jax.lax.stop_gradient(teacher_params), batch["teacher"],
            deterministic=True)
        t_scores = jax.lax.stop_gradient(
            t_scores.reshape(bs, n_teacher).T)                     # [nt, bs]
        logp = jax.nn.log_softmax(student / T, axis=1)
        q = jax.nn.softmax(t_scores / T, axis=1)
        # F.kl_div(logp, q, reduction='mean'): elementwise mean of
        # q * (log q - logp)
        safe_logq = jnp.where(q > 0, jnp.log(jnp.maximum(q, 1e-30)), 0.0)
        kl = jnp.where(q > 0, q * (safe_logq - logp), 0.0)
        return jnp.mean(kl) * T * T

    return kd_fn


def make_itm_train_step(model: BiEncoder, tx: optax.GradientTransformation,
                        *, caption_score_weight: float = 0.0,
                        num_hard_negatives: int = 0,
                        kd_fn: Optional[Callable] = None,
                        kd_loss_weight: float = 1.0) -> Callable:
    """Build the jittable (state, batch, rng) -> (state, metrics) step.

    ``kd_fn(params, batch, student_embs) -> kd_loss`` hooks in the teacher
    distillation term (train_itm.py:224-239).
    """

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            loss, (metrics, embs) = itm_loss_fn(
                model, params, batch, rng,
                caption_score_weight=caption_score_weight,
                num_hard_negatives=num_hard_negatives)
            if kd_fn is not None:
                kd_loss = kd_fn(params, batch, embs)
                metrics["kd_loss"] = kd_loss
                loss = loss + kd_loss_weight * kd_loss
                metrics["loss"] = loss
            return loss, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        from lightningdot_tpu.training.optim import (FusedAdamW,
                                                     grad_norm_from_opt_state)

        if isinstance(tx, FusedAdamW):
            # single-pass clip+AdamW producing new params directly
            params, opt_state = tx.apply(grads, state.opt_state,
                                         state.params)
            metrics["grad_norm"] = opt_state.grad_norm
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            # read the norm the clip stage already measured — a second
            # optax.global_norm(grads) would re-read every gradient byte
            gnorm = grad_norm_from_opt_state(opt_state)
            metrics["grad_norm"] = (gnorm if gnorm is not None
                                    else optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def jit_train_step(train_step: Callable, mesh=None,
                   donate: bool = True) -> Callable:
    """jit the step; with a mesh, dp-shard the batch (params replicated).

    Sharding is carried by the inputs (``shard_batch`` / ``replicate``), and
    jit propagates it — XLA inserts the gradient psum and the all-gathers
    for the global in-batch score matrix.
    """
    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def model_batch(batch):
        """Drop host-only fields (ids, fnames, python ints) before tracing."""
        mb = {"txts": batch["txts"], "imgs": batch["imgs"],
              "caps": batch["caps"]}
        if "valid_mask" in batch:
            mb["valid_mask"] = batch["valid_mask"]
        if "targets" in batch:  # dense per-answer targets (VQA)
            mb["targets"] = batch["targets"]
        if "teacher" in batch and batch["teacher"] is not None:
            t = dict(batch["teacher"])
            t.pop("gather_index", None)
            mb["teacher"] = t
        return mb

    if mesh is None:
        return lambda state, batch, rng: jitted(state, model_batch(batch), rng)

    from lightningdot_tpu.parallel.mesh import shard_batch

    def wrapped(state, batch, rng):
        return jitted(state, shard_batch(mesh, model_batch(batch)), rng)

    return wrapped
