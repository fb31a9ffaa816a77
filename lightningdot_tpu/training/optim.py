"""Optimizer and LR schedules.

Parity:
  * AdamW with no-decay groups for bias/LayerNorm params — ``get_optimizer``
    (dvl/models/bi_encoder.py:566-576) and ``build_optimizer``
    (uniter_model/optim/misc.py:7-32). Realised as ``scale_by_ref_adamw``,
    which follows the reference's transformers-2.x update formula EXACTLY
    (uniter_model/optim/adamw.py:75-103) — it differs from optax.adamw in
    two places: eps is added to the UNCORRECTED sqrt(v) (bias correction is
    folded into the step size instead), and decoupled weight decay
    multiplies the POST-step parameter with the plain schedule lr.
    tests/test_train_parity.py pins both against a torch implementation.
  * ``get_schedule_linear`` linear warmup->linear decay
    (bi_encoder.py:668-680).
  * ``get_lr_sched`` decay families: linear / invsqrt (noam) / constant /
    vqa-step (uniter_model/optim/sched.py:7-52), including the 1e-8 floor.

Schedule indexing: every optimizer here evaluates the schedule at the
0-based update index (torch LambdaLR convention — the DPR drivers' first
update runs at lr_lambda(0)); UNITER drivers increment global_step BEFORE
reading the schedule, which is expressed by ``first_lr_step=1``.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence, Tuple

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


class ClipNormState(NamedTuple):
    grad_norm: jnp.ndarray  # pre-clip global norm, readable by the step


def clip_by_global_norm_with_norm(max_norm: float
                                  ) -> optax.GradientTransformation:
    """optax.clip_by_global_norm, but the measured norm is kept in the
    transform state so training steps can report it WITHOUT a second full
    pass over the gradients (optax.global_norm reads every grad byte —
    ~0.5 ms at BERT-base on v5e)."""

    def init(params):
        del params
        return ClipNormState(jnp.zeros((), jnp.float32))

    def update(updates, state, params=None):
        del state, params
        gnorm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, max_norm))
        updates = jax.tree.map(lambda g: g * scale, updates)
        return updates, ClipNormState(gnorm)

    return optax.GradientTransformation(init, update)


def grad_norm_from_opt_state(opt_state) -> jnp.ndarray | None:
    """Pull the pre-clip gradient norm recorded by
    clip_by_global_norm_with_norm out of a (possibly chained) opt state."""
    for leaf_state in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, ClipNormState)):
        if isinstance(leaf_state, ClipNormState):
            return leaf_state.grad_norm
    return None


class RefAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_ref_adamw(lr_fn, *, b1: float, b2: float, eps: float,
                       weight_decay: float = 0.0,
                       mask_fn=None) -> optax.GradientTransformation:
    """The reference's AdamW as one optax transform producing param deltas.

    transformers-2.x AdamW, vendored at uniter_model/optim/adamw.py:41-103
    and imported by the DPR path (dvl/models/bi_encoder.py:36,575):

        m <- b1*m + (1-b1)*g ;  v <- b2*v + (1-b2)*g^2
        denom     = sqrt(v) + eps            # eps on the UNCORRECTED v
        step_size = lr * sqrt(1-b2^t) / (1-b1^t)
        p         <- p - step_size * m/denom
        p         <- p - lr*wd*p             # decay on the POST-step p

    optax.adamw instead computes m_hat/(sqrt(v_hat)+eps) and decays the
    pre-step parameter; both differences are real math divergences (the
    eps one matters wherever sqrt(v) ~ eps). ``mask_fn(params)`` returns a
    bool tree, True = decay applies. The schedule is evaluated at the
    0-based update index.
    """

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return RefAdamWState(jnp.zeros((), jnp.int32), zeros(), zeros())

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("scale_by_ref_adamw requires params")
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = lr_fn(count - 1) if callable(lr_fn) else lr_fn
        step_size = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
                          state.nu, grads)
        if weight_decay and mask_fn is not None:
            mask = mask_fn(params)
        else:
            mask = jax.tree.map(lambda _: True, params)

        def delta(m, v, p, decay):
            d = -step_size * m / (jnp.sqrt(v) + eps)
            if weight_decay:
                wd = jnp.where(decay, weight_decay, 0.0)
                d = d - lr * wd * (p + d)
            return d

        updates = jax.tree.map(delta, mu, nu, params, mask)
        return updates, RefAdamWState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(learning_rate: Callable[[int], float] | float,
                   *, adam_eps: float = 1e-8, weight_decay: float = 0.0,
                   betas: Sequence[float] = (0.9, 0.999),
                   max_grad_norm: float = 0.0,
                   first_lr_step: int = 0) -> optax.GradientTransformation:
    """AdamW (+ optional global-norm clip, train_itm.py:258 / pretrain.py:488).

    ``first_lr_step`` is the schedule index of the FIRST optimizer update —
    the reference uses two conventions and they differ by exactly this:

      * 0 — DPR/LambdaLR (train_itm.py:175,288): update k uses lambda(k),
        so under warmup the first update runs at lr=0 (torch LambdaLR
        applies lr_lambda(0) before the first scheduler.step()).
      * 1 — UNITER post-increment (pretrain.py:458-463, uniter_model/
        train_{itm,vqa}.py:204-215): ``global_step += 1`` precedes
        ``get_lr_sched(global_step)``, so update k uses lr(k+1).

    Defaults (eps 1e-8, betas (0.9, 0.999)) are the DPR ``get_optimizer``
    values; UNITER drivers pass betas (0.9, 0.98) and eps 1e-6 (the
    vendored AdamW's default, uniter_model/optim/adamw.py:23).
    """
    if callable(learning_rate) and first_lr_step:
        lr_raw = learning_rate
        learning_rate = lambda step: lr_raw(step + first_lr_step)
    tx = scale_by_ref_adamw(learning_rate, b1=betas[0], b2=betas[1],
                            eps=adam_eps, weight_decay=weight_decay,
                            mask_fn=decay_mask if weight_decay else None)
    if max_grad_norm and max_grad_norm > 0:
        tx = optax.chain(clip_by_global_norm_with_norm(max_grad_norm), tx)
    return tx


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any
    grad_norm: jnp.ndarray


class FusedAdamW(NamedTuple):
    """Single-pass AdamW + global-norm clip.

    Same math as make_optimizer's chain (clip + the reference AdamW
    formula, uniter_model/optim/adamw.py:75-103) — verified element-wise
    in tests/test_loss.py::test_fused_adamw_matches_optax —
    but each parameter/grad/moment leaf is touched exactly once per step
    (one fused read g,m,v,p -> write m,v,p pass), where the optax chain
    makes ~4 passes (clip-scale, adam, decay-add, apply). On v5e at
    BERT-base (86M f32 params) this is the difference between ~10 ms and
    ~4 ms of optimizer time per step.

    API: ``init(params) -> state``; ``apply(grads, state, params) ->
    (new_params, new_state)`` (returns NEW PARAMS directly — no separate
    optax.apply_updates pass). ``state.grad_norm`` is the pre-clip norm.
    """

    lr_fn: Callable
    b1: float
    b2: float
    eps: float
    weight_decay: float
    max_grad_norm: float
    mask_fn: Any  # params -> bool tree (True = apply weight decay), or None
    state_dtype: Any = None  # None = param dtype; jnp.bfloat16 stores the
    # FIRST moment in bf16 (update math stays f32) — a measured-throughput
    # OPTION, not the parity default (reference torch AdamW keeps f32).
    # The SECOND moment always stays f32: its per-step change
    # |0.001*(g^2 - v)| is below half a bf16 ulp (~0.002*v) near steady
    # state, so a bf16 v would round back to itself every step and freeze.
    # bf16 mu is safe: (1-b1)=0.1 moves it well above ulp scale.

    def init(self, params) -> FusedAdamWState:
        def zm(p):
            return jnp.zeros(p.shape, self.state_dtype or p.dtype)

        return FusedAdamWState(jnp.zeros((), jnp.int32),
                               jax.tree.map(zm, params),
                               jax.tree.map(jnp.zeros_like, params),
                               jnp.zeros((), jnp.float32))

    def apply(self, grads, state: FusedAdamWState, params):
        gnorm = optax.global_norm(grads)
        if self.max_grad_norm and self.max_grad_norm > 0:
            scale = jnp.minimum(
                1.0, self.max_grad_norm / jnp.maximum(gnorm,
                                                      self.max_grad_norm))
        else:
            scale = jnp.float32(1.0)
        count = state.count + 1
        # 0-based schedule index (make_fused_adamw's first_lr_step shifts
        # it for the UNITER post-increment convention)
        lr = self.lr_fn(count - 1) if callable(self.lr_fn) else self.lr_fn
        lr = jnp.asarray(lr, jnp.float32)
        c1 = 1.0 - self.b1 ** count.astype(jnp.float32)
        c2 = 1.0 - self.b2 ** count.astype(jnp.float32)
        step_size = lr * jnp.sqrt(c2) / c1

        # LDOT_ADAMW_KERNEL=1 on TPU: stream eligible leaves through the
        # Pallas fused kernel (a measured loser parked in
        # ops/experimental/adamw_pallas.py — same math, one pass, but the
        # opaque custom-calls defeat XLA's optimizer/backward overlap);
        # ineligible leaves fall through to jnp. Imported only when gated.
        import os as _os

        from lightningdot_tpu.ops.backend import backend as _backend

        use_kernel = (_os.environ.get("LDOT_ADAMW_KERNEL", "0") == "1"
                      and _backend() == "pallas")
        if use_kernel:
            from lightningdot_tpu.ops.experimental.adamw_pallas import (
                adamw_leaf_pallas, leaf_eligible)
        scalars = jnp.stack([scale, step_size, lr,
                             jnp.zeros((), jnp.float32)]).astype(jnp.float32)

        def leaf(g, m, v, p, decay):
            if use_kernel and leaf_eligible(p, g, m, v):
                wd = float(self.weight_decay) if decay else 0.0
                return adamw_leaf_pallas(p, g, m, v, scalars, b1=self.b1,
                                         b2=self.b2, eps=self.eps, wd=wd)
            mdt = m.dtype
            g = g * scale
            m2 = self.b1 * m.astype(jnp.float32) + (1.0 - self.b1) * g
            v2 = self.b2 * v + (1.0 - self.b2) * jnp.square(g)
            # reference formula (uniter_model/optim/adamw.py:75-103):
            # eps on the uncorrected sqrt(v); decay on the POST-step param
            p2 = p - step_size * m2 / (jnp.sqrt(v2) + self.eps)
            if self.weight_decay:
                p2 = p2 - lr * jnp.where(decay, self.weight_decay, 0.0) * p2
            return p2, m2.astype(mdt), v2

        mask = (self.mask_fn(params) if self.mask_fn is not None
                else jax.tree.map(lambda _: True, params))
        out = jax.tree.map(leaf, grads, state.mu, state.nu, params, mask)
        new_p = jax.tree.map(lambda t: t[0], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        new_m = jax.tree.map(lambda t: t[1], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        new_v = jax.tree.map(lambda t: t[2], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        return new_p, FusedAdamWState(count, new_m, new_v, gnorm)


def make_fused_adamw(learning_rate, *, adam_eps: float = 1e-8,
                     weight_decay: float = 0.0,
                     betas: Sequence[float] = (0.9, 0.999),
                     max_grad_norm: float = 0.0,
                     state_dtype=None,
                     first_lr_step: int = 0) -> FusedAdamW:
    """``first_lr_step`` as in make_optimizer (0 = DPR/LambdaLR, 1 = UNITER
    post-increment)."""
    if callable(learning_rate) and first_lr_step:
        lr_raw = learning_rate
        learning_rate = lambda step: lr_raw(step + first_lr_step)
    return FusedAdamW(learning_rate, betas[0], betas[1], adam_eps,
                      weight_decay, max_grad_norm,
                      decay_mask if weight_decay else None,
                      state_dtype)


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
