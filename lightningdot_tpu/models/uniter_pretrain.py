"""One-tower UNITER pre-training model (the pretrain KD teacher).

Parity: UniterForPretraining (uniter_model/model/model.py:419-701) — joint
text+image encoding with MLM / MRFR / MRC(-kl) / ITM heads; the MLM decoder
ties to UNITER's own word embeddings (model.py:425-426) and the
feature-regression weight to its img_linear (model.py:427-429).

Used by the pre-training driver's KD path (pretrain.py:409-428): teacher
logits on the same masked positions, mse (mrfr) or KL (others) vs student.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models import encoder as enc
from lightningdot_tpu.models.bi_encoder import (
    _gather_positions, apply_feat_regress, apply_mlm_head,
    apply_region_classifier, init_pretrain_heads, mrc_loss_from_logits)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UniterForPretraining:
    cfg: EncoderConfig
    img_label_dim: int = 1601
    compute_dtype: Any = jnp.float32

    def init(self, rng) -> Params:
        k1, k2 = jax.random.split(rng)
        return {
            "uniter": enc.init_encoder_tower(k1, self.cfg, with_img=True),
            "heads": init_pretrain_heads(k2, self.cfg, self.img_label_dim),
        }

    def encode(self, params: Params, batch, *, deterministic=True, rng=None):
        """Joint sequence [B, S, H] with gather-index compaction."""
        return enc.encode_joint(
            params["uniter"], self.cfg,
            batch["input_ids"], batch["position_ids"], batch["img_feat"],
            batch["img_pos_feat"], batch["attn_masks"],
            gather_index=batch.get("gather_index"),
            img_masks=batch.get("img_masks"),
            deterministic=deterministic, rng=rng, dtype=self.compute_dtype)

    def forward_mlm(self, params, batch, *, deterministic=True, rng=None):
        """model.py:508-527 on static masked positions."""
        seq = self.encode(params, batch, deterministic=deterministic, rng=rng)
        hidden = _gather_positions(seq, batch["masked_positions"])
        logits = apply_mlm_head(
            params["heads"]["mlm"], hidden,
            params["uniter"]["embeddings"]["word"],
            eps=self.cfg.layer_norm_eps, dtype=self.compute_dtype)
        labels = batch["masked_labels"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.maximum(labels, 0)[:, :, None], axis=2)[:, :, 0]
        weights = batch["masked_weights"].astype(jnp.float32)
        return nll.reshape(-1), logits, weights.reshape(-1)

    def forward_mrfr(self, params, batch, *, deterministic=True, rng=None):
        """model.py:562-579; positions index the JOINT sequence."""
        seq = self.encode(params, batch, deterministic=deterministic, rng=rng)
        hidden = _gather_positions(seq, batch["img_masked_positions"])
        pred = apply_feat_regress(
            params["heads"]["feat_regress"], hidden,
            params["uniter"]["img_embeddings"]["img_linear"]["kernel"],
            eps=self.cfg.layer_norm_eps, dtype=self.compute_dtype)
        target = batch["feat_targets"].astype(jnp.float32)
        weights = batch["img_masked_weights"].astype(jnp.float32)
        return jnp.square(pred - target), pred, weights

    def forward_mrc(self, params, batch, task: str, *, deterministic=True,
                    rng=None):
        """model.py:675-701."""
        seq = self.encode(params, batch, deterministic=deterministic, rng=rng)
        hidden = _gather_positions(seq, batch["img_masked_positions"])
        logits = apply_region_classifier(
            params["heads"]["region_classifier"], hidden,
            eps=self.cfg.layer_norm_eps, dtype=self.compute_dtype)
        weights = batch["img_masked_weights"].astype(jnp.float32)
        return mrc_loss_from_logits(logits, batch["label_targets"],
                                    task), logits, weights

    def forward_itm(self, params, batch, *, deterministic=True, rng=None):
        """model.py:627-672 (2-way itm head over the tanh pooler)."""
        seq = self.encode(params, batch, deterministic=deterministic, rng=rng)
        pooled = enc.pooler(params["uniter"]["pooler"], seq,
                            self.compute_dtype)
        logits = enc._dense(params["heads"]["itm_output"], pooled,
                            self.compute_dtype).astype(jnp.float32)
        targets = batch["targets"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
        return nll, logits, batch.get("weights")

    def task_logits(self, params, batch, task: str):
        """Teacher predictions for KD (pretrain.py:409-428)."""
        if task == "mlm":
            _, logits, _ = self.forward_mlm(params, batch)
        elif task == "mrfr":
            _, logits, _ = self.forward_mrfr(params, batch)
        elif task.startswith("mrc"):
            _, logits, _ = self.forward_mrc(params, batch, task)
        elif task == "itm":
            _, logits, _ = self.forward_itm(params, batch)
        else:
            raise ValueError(task)
        return logits
