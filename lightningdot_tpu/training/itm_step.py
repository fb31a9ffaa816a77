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

from lightningdot_tpu.models.bi_encoder import BiEncoder, BiEncoderNllLoss


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
                deterministic: bool = False) -> Tuple[jnp.ndarray, Dict]:
    """Bidirectional NCE (train_itm.py:197-222).

    batch['imgs'] may contain hard negatives appended after the first bs
    positives; positives are columns 0..bs-1 (itm_fast_collate
    pos_ctx_indices).
    """
    txt, img, cap = model.apply(params, batch, deterministic=deterministic,
                                rng=rng)
    bs = txt.shape[0]
    pos_idx = jnp.arange(bs)

    # txt -> img over ALL image contexts (positives + hard negatives)
    loss1, correct1, _ = BiEncoderNllLoss.calc(
        txt, img, cap, pos_idx, None, caption_score_weight,
        reduction="mean")
    # img -> txt: only the positive images are queries (counts must match)
    loss2, correct2, _ = BiEncoderNllLoss.calc(
        img[:bs], txt, cap[:bs] if cap is not None else None, pos_idx, None,
        0.0, reduction="mean")
    loss = 0.5 * loss1 + 0.5 * loss2
    metrics = {
        "loss": loss, "loss_txt2img": loss1, "loss_img2txt": loss2,
        "acc_txt2img": correct1 / bs, "acc_img2txt": correct2 / bs,
    }
    return loss, (metrics, (txt, img))


def make_itm_train_step(model: BiEncoder, tx: optax.GradientTransformation,
                        *, caption_score_weight: float = 0.0,
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
                caption_score_weight=caption_score_weight)
            if kd_fn is not None:
                kd_loss = kd_fn(params, batch, embs)
                metrics["kd_loss"] = kd_loss
                loss = loss + kd_loss_weight * kd_loss
                metrics["loss"] = loss
            return loss, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
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
    if mesh is None:
        return jitted

    from lightningdot_tpu.parallel.mesh import replicate, shard_batch

    def wrapped(state, batch, rng):
        return jitted(state, shard_batch(mesh, batch), rng)

    return wrapped
