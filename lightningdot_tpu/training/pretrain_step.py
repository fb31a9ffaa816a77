"""Jitted multi-task pre-training steps.

Parity: the pretrain.py hot loop (pretrain.py:388-536) — per-task losses
reduced as the mean over loss units (pretrain.py:399-406), gradient
accumulation over an accum window on a single task, grad clip + AdamW + LR
from ``get_lr_sched`` per update.

One jitted step per (task, shape-bucket) signature; accumulation uses
optax.MultiSteps so the optimizer state machine matches "backward every
micro-batch, step every accum_steps".
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from lightningdot_tpu.models.bi_encoder import BiEncoderForPretraining
from lightningdot_tpu.training.itm_step import TrainState, create_train_state


def weighted_mean(loss: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid loss units (matches ``loss.mean()`` on the dynamic-
    shape reference tensors, pretrain.py:399-406)."""
    while weights.ndim < loss.ndim:
        weights = weights[..., None]
    denom = jnp.maximum(jnp.sum(weights) * (loss.size / weights.size), 1.0)
    return jnp.sum(loss * weights) / denom


def task_loss(model: BiEncoderForPretraining, params, batch, task: str, rng,
              deterministic: bool = False) -> Tuple[jnp.ndarray, Dict]:
    """Weighted scalar loss for one task."""
    if task == "mlm":
        nll, logits, w = model.forward_mlm(params, batch, rng=rng,
                                           deterministic=deterministic)
        loss = weighted_mean(nll, w)
        correct = jnp.sum((jnp.argmax(logits, -1).reshape(-1)
                           == batch["masked_labels"].reshape(-1)) * w)
        return loss, {"loss": loss, "acc": correct / jnp.maximum(w.sum(), 1),
                      "_logits": logits, "_weights": w}
    if task == "mrfr":
        mse, pred, w = model.forward_mrfr(params, batch, rng=rng,
                                          deterministic=deterministic)
        loss = weighted_mean(mse, w)
        return loss, {"loss": loss, "_logits": pred, "_weights": w}
    if task.startswith("mrc"):
        kl, logits, w = model.forward_mrc(params, batch, task, rng=rng,
                                          deterministic=deterministic)
        loss = weighted_mean(kl, w)
        pred = jnp.argmax(logits[:, :, 1:], -1) + 1
        tgt = jnp.argmax(batch["label_targets"][:, :, 1:], -1) + 1
        acc = jnp.sum((pred == tgt) * w) / jnp.maximum(w.sum(), 1)
        return loss, {"loss": loss, "acc": acc, "_logits": logits,
                      "_weights": w}
    if task == "itm":
        nll, _, correct = model.forward_itm(params, batch, rng=rng,
                                            deterministic=deterministic,
                                            compute_loss=False)
        w = batch["weights"]
        loss = weighted_mean(nll, w)
        return loss, {"loss": loss,
                      "acc": correct / jnp.maximum(w.sum(), 1)}
    raise ValueError(f"invalid task {task}")


def kd_loss(teacher, teacher_params, batch, task: str, student_logits,
            weights, *, T: float, kd_loss_weight: float) -> jnp.ndarray:
    """Teacher distillation for pre-training (pretrain.py:409-428):
    mse for mrfr feature regression, T^2-scaled KL otherwise; teacher runs
    on the joint-input sub-batch under stop_gradient."""
    t_logits = jax.lax.stop_gradient(
        teacher.task_logits(teacher_params, batch["teacher"], task))
    if task == "mrfr":
        sq = jnp.square(t_logits / T - student_logits / T)
        return kd_loss_weight * weighted_mean(sq, weights)
    logp = jax.nn.log_softmax(student_logits / T, axis=-1)
    q = jax.nn.softmax(t_logits / T, axis=-1)
    safe_logq = jnp.where(q > 0, jnp.log(jnp.maximum(q, 1e-30)), 0.0)
    kl = jnp.where(q > 0, q * (safe_logq - logp), 0.0)
    if task == "mlm":
        # student mlm logits come back flattened-compatible [B, M, V];
        # weights is the flat [B*M] vector
        kl = kl.reshape(weights.shape[0], -1)
    return kd_loss_weight * T * T * weighted_mean(kl, weights)


def make_pretrain_step(model: BiEncoderForPretraining,
                       tx: optax.GradientTransformation,
                       accum_steps: int = 1, *, teacher=None,
                       teacher_params=None, kd_loss_weight: float = 1.0,
                       kd_T: float = 1.0) -> Tuple[Callable, Callable]:
    """Returns (init_state, step_fn(task)(state, batch, rng))."""
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)

    def init_state(params) -> TrainState:
        return create_train_state(params, tx)

    _cache: Dict[str, Callable] = {}

    def step_for_task(task: str) -> Callable:
        fn = _cache.get(task)
        if fn is None:
            def train_step(state: TrainState, batch, rng):
                def loss_fn(params):
                    loss, metrics = task_loss(model, params, batch, task, rng)
                    # KD for non-itm tasks only (pretrain.py:402-429)
                    if teacher is not None and task != "itm" \
                            and "teacher" in batch:
                        kd = kd_loss(teacher, teacher_params, batch, task,
                                     metrics.pop("_logits"),
                                     metrics.pop("_weights"),
                                     T=kd_T, kd_loss_weight=kd_loss_weight)
                        metrics["kd_loss"] = kd
                        loss = loss + kd
                        metrics["loss"] = loss
                    else:
                        metrics.pop("_logits", None)
                        metrics.pop("_weights", None)
                    return loss, metrics

                grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
                return (TrainState(params, opt_state, state.step + 1),
                        metrics)

            fn = jax.jit(train_step, donate_argnums=(0,))
            _cache[task] = fn
        return fn

    return init_state, step_for_task


def make_validate_fn(model: BiEncoderForPretraining,
                     mesh=None) -> Callable:
    """Per-task validation forward (pretrain.py:539-790 validate_*).

    With a ``mesh``, batches are device_put replicated over it: validation
    loaders are complete per host (no rank sharding), so every host runs
    the identical sweep and the metrics agree bit-for-bit; in multi-process
    mode the jitted SPMD program requires global arrays, which replication
    provides.
    """
    _cache: Dict[str, Callable] = {}

    def validate_batch(params, batch, task: str):
        fn = _cache.get(task)
        if fn is None:
            def val_step(params, batch):
                loss, metrics = task_loss(model, params, batch, task,
                                          rng=None, deterministic=True)
                metrics.pop("_logits", None)
                metrics.pop("_weights", None)
                return metrics

            fn = jax.jit(val_step)
            _cache[task] = fn
        model_batch = {k: v for k, v in batch.items()
                       if k not in ("n_valid", "sample_size")}
        if mesh is not None:
            from lightningdot_tpu.parallel.mesh import replicate
            model_batch = replicate(mesh, model_batch)
        return fn(params, model_batch)

    return validate_batch
