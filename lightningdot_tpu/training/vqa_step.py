"""Jitted VQA fine-tuning step + evaluation.

Parity: uniter_model/train_vqa.py:175-311 adapted to the bi-encoder VQA
head (the reference ships BiEncoderForVisualQuestionAnswering,
dvl/models/bi_encoder.py:683-734, but no dvl driver; the training loss and
VQA-score conventions come from the UNITER VQA driver):
  * instance-level BCE — elementwise BCE-with-logits summed over answers,
    averaged over instances (``loss.mean() * targets.size(1)``,
    train_vqa.py:188);
  * VQA score — soft target value at the argmax answer
    (compute_score_with_logits, train_vqa.py:305-311).
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lightningdot_tpu.models.vqa import BiEncoderForVQA
from lightningdot_tpu.training.itm_step import TrainState


def vqa_loss_fn(model: BiEncoderForVQA, params, batch, rng, *,
                deterministic: bool = False) -> Tuple[jnp.ndarray, Dict]:
    """Masked instance-level BCE (train_vqa.py:187-188).

    Fixed-batch pad rows (valid_mask == 0) contribute nothing; scores are
    returned for accuracy metrics.
    """
    scores = model.apply(params, batch, compute_loss=False,
                         deterministic=deterministic, rng=rng)
    t = batch["targets"].astype(jnp.float32)
    # elementwise BCE-with-logits (bi_encoder.py:715-717), from the one
    # training forward
    elem = (jnp.maximum(scores, 0) - scores * t
            + jnp.log1p(jnp.exp(-jnp.abs(scores))))
    valid = batch.get("valid_mask")
    if valid is None:
        valid = jnp.ones((elem.shape[0],), jnp.float32)
    per_row = jnp.sum(elem, axis=1)  # BCE summed over answers
    n_valid = jnp.maximum(valid.sum(), 1.0)
    loss = jnp.sum(per_row * valid) / n_valid
    sc = vqa_score(scores, batch["targets"])
    metrics = {"loss": loss, "score": jnp.sum(sc * valid) / n_valid}
    return loss, metrics


def vqa_score(scores: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Soft target value at the argmax answer per row
    (compute_score_with_logits, train_vqa.py:305-311)."""
    pred = jnp.argmax(scores, axis=-1)
    return jnp.take_along_axis(targets, pred[:, None], axis=1)[:, 0]


def make_vqa_train_step(model: BiEncoderForVQA,
                        tx: optax.GradientTransformation) -> Callable:
    """(state, batch, rng) -> (state, metrics); grad + clip + AdamW.

    ``tx`` may be an optax transformation or a ``FusedAdamW`` (single-pass
    clip+AdamW, training/optim.py) — same branch contract as
    itm_step.make_itm_train_step.
    """

    def step(state: TrainState, batch, rng):
        def loss_fn(p):
            return vqa_loss_fn(model, p, batch, rng, deterministic=False)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        from lightningdot_tpu.training.optim import (FusedAdamW,
                                                     grad_norm_from_opt_state)

        if isinstance(tx, FusedAdamW):
            params, opt_state = tx.apply(grads, state.opt_state,
                                         state.params)
            metrics["grad_norm"] = opt_state.grad_norm
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            gnorm = grad_norm_from_opt_state(opt_state)
            if gnorm is not None:  # free when a clip stage measured it;
                metrics["grad_norm"] = gnorm  # not worth a dedicated
                # full-gradient pass otherwise (no VQA consumer reads it)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


_EVAL_FNS: "OrderedDict[int, Tuple[Callable, BiEncoderForVQA]]" = \
    OrderedDict()
_EVAL_FNS_MAX = 8


def _eval_score_fn(model: BiEncoderForVQA) -> Callable:
    """Jitted deterministic scorer, cached per model so repeated
    evaluate_vqa calls (once per epoch) hit jax.jit's trace cache instead
    of re-tracing a fresh lambda each time. Bounded LRU (the model object
    is kept alive alongside its fn — id() is only unique while the object
    lives) so long processes don't accumulate compiled executables for
    every model ever evaluated."""
    entry = _EVAL_FNS.get(id(model))
    if entry is not None:
        _EVAL_FNS.move_to_end(id(model))
        return entry[0]
    fn = jax.jit(lambda p, b: model.apply(p, b, compute_loss=False,
                                          deterministic=True))
    _EVAL_FNS[id(model)] = (fn, model)
    while len(_EVAL_FNS) > _EVAL_FNS_MAX:
        _EVAL_FNS.popitem(last=False)
    return fn


def evaluate_vqa(model: BiEncoderForVQA, params, dataloader) -> Dict:
    """Validation sweep (train_vqa.py:268-302): per-example loss, VQA
    score, and the qid -> argmax-answer dict."""
    score_fn = _eval_score_fn(model)
    tot_loss = tot_score = n_ex = 0.0
    results: Dict[str, int] = {}
    for batch in dataloader:
        mb = {"txts": batch["txts"], "imgs": batch["imgs"], "caps": None}
        scores = np.asarray(score_fn(params, mb), np.float32)
        n_valid = int(batch["n_valid"])
        scores = scores[:n_valid]
        targets = np.asarray(batch["targets"][:n_valid], np.float32)
        # sum-reduction BCE (train_vqa.py:280-282)
        tot_loss += float(np.sum(np.maximum(scores, 0) - scores * targets
                                 + np.log1p(np.exp(-np.abs(scores)))))
        pred = scores.argmax(axis=-1)
        tot_score += float(targets[np.arange(n_valid), pred].sum())
        for qid, a in zip(batch["qids"], pred.tolist()):
            results[qid] = int(a)
        n_ex += n_valid
    n_ex = max(n_ex, 1.0)
    return {"loss": tot_loss / n_ex, "acc": tot_score / n_ex,
            "n_ex": int(n_ex), "results": results}
