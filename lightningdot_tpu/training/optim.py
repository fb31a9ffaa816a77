"""Optimizer and LR schedules.

Parity:
  * AdamW with no-decay groups for bias/LayerNorm params — ``get_optimizer``
    (dvl/models/bi_encoder.py:566-576) and ``build_optimizer``
    (uniter_model/optim/misc.py:7-32). Realised as optax.adamw with a mask.
  * ``get_schedule_linear`` linear warmup->linear decay
    (bi_encoder.py:668-680).
  * ``get_lr_sched`` decay families: linear / invsqrt (noam) / constant /
    vqa-step (uniter_model/optim/sched.py:7-52), including the 1e-8 floor.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def _is_no_decay(path: Tuple) -> bool:
    """bias / LayerNorm params are excluded from weight decay
    (bi_encoder.py:568: no_decay = ['bias', 'LayerNorm.weight'])."""
    keys = [getattr(p, "key", str(p)) for p in path]
    if not keys:
        return False
    leaf = keys[-1]
    if leaf == "bias":
        return True
    # our LayerNorm subtrees are named 'ln'/'*_ln' with 'scale'/'bias' leaves
    if len(keys) >= 2 and ("ln" in keys[-2] or keys[-2] == "LayerNorm"):
        return True
    return False


def decay_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_no_decay(path), params)


def make_optimizer(learning_rate: Callable[[int], float] | float,
                   *, adam_eps: float = 1e-8, weight_decay: float = 0.0,
                   betas: Sequence[float] = (0.9, 0.999),
                   max_grad_norm: float = 0.0) -> optax.GradientTransformation:
    """AdamW (+ optional global-norm clip, train_itm.py:258 / pretrain.py:488)."""
    tx = optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=adam_eps,
                     weight_decay=weight_decay,
                     mask=decay_mask if weight_decay else None)
    if max_grad_norm and max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


# -- schedules ---------------------------------------------------------------

def schedule_linear(learning_rate: float, warmup_steps: int,
                    training_steps: int) -> Callable:
    """get_schedule_linear (bi_encoder.py:668-680)."""

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps)
        decay = jnp.maximum(
            0.0, (training_steps - step) / max(1, training_steps - warmup_steps))
        return learning_rate * jnp.where(step < warmup_steps, warm, decay)

    return lr


def noam_schedule(step, warmup_step=4000):
    """sched.py:7-10."""
    step = jnp.asarray(step, jnp.float32)
    return jnp.where(step <= warmup_step, step / warmup_step,
                     (warmup_step ** 0.5) * jnp.maximum(step, 1.0) ** -0.5)


def warmup_linear(step, warmup_step, tot_step):
    """sched.py:13-16."""
    step = jnp.asarray(step, jnp.float32)
    return jnp.where(step < warmup_step, step / max(1, warmup_step),
                     jnp.maximum(0.0, (tot_step - step)
                                 / max(1, tot_step - warmup_step)))


def vqa_schedule(step, warmup_interval, decay_interval, decay_start,
                 decay_rate):
    """sched.py:19-31."""
    step = jnp.asarray(step, jnp.float32)
    num_decay = jnp.ceil((step - decay_start) / decay_interval)
    return jnp.where(
        step < warmup_interval, 0.25,
        jnp.where(step < 2 * warmup_interval, 0.5,
                  jnp.where(step < 3 * warmup_interval, 0.75,
                            jnp.where(step >= decay_start,
                                      decay_rate ** num_decay, 1.0))))


def get_lr_sched(decay: str, learning_rate: float, warmup_steps: int,
                 num_train_steps: int, **vqa_kwargs) -> Callable:
    """sched.py:35-52 (with the <=0 -> 1e-8 guard)."""

    def lr(step):
        if decay == "linear":
            v = learning_rate * warmup_linear(step, warmup_steps,
                                              num_train_steps)
        elif decay == "invsqrt":
            v = learning_rate * noam_schedule(step, warmup_steps)
        elif decay == "constant":
            v = jnp.full_like(jnp.asarray(step, jnp.float32), learning_rate)
        elif decay == "vqa":
            v = learning_rate * vqa_schedule(
                step, vqa_kwargs["warm_int"], vqa_kwargs["decay_int"],
                vqa_kwargs["decay_st"], vqa_kwargs["decay_rate"])
        else:
            raise ValueError(f"unknown decay {decay}")
        return jnp.maximum(v, 1e-8)

    return lr
