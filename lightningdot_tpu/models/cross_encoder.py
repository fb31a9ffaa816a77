"""UNITER-style joint cross-encoder: KD teacher + second-stage re-ranker.

Parity: UniterForImageTextRetrieval (uniter_model/model/itm.py:12-53) —
joint text+region encoding, tanh pooler, scalar ``rank_output`` head,
sigmoid-triplet margin loss over ``sample_size`` groups; ``init_output``
seeds the rank head from the itm head (itm.py:23-26). Also carries the
2-way ``itm_output`` head used by UNITER pre-training ITM
(uniter_model/model/model.py:627-672).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models import encoder as enc
from lightningdot_tpu.models.ot import optimal_transport_dist

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CrossEncoder:
    cfg: EncoderConfig
    margin: float = 0.2
    compute_dtype: Any = jnp.float32
    remat: bool = False

    def init(self, rng) -> Params:
        k1, k2, k3 = jax.random.split(rng, 3)
        h, std = self.cfg.hidden_size, self.cfg.initializer_range
        return {
            "uniter": enc.init_encoder_tower(k1, self.cfg, with_img=True),
            "itm_output": enc._dense_init(k2, h, 2, std),
            "rank_output": enc._dense_init(k3, h, 1, std),
        }

    @staticmethod
    def init_output(params: Params) -> Params:
        """Seed rank head from itm head row 1 (itm.py:23-26)."""
        params = dict(params)
        params["rank_output"] = {
            "kernel": params["itm_output"]["kernel"][:, 1:2],
            "bias": params["itm_output"]["bias"][1:2],
        }
        return params

    def encode(self, params: Params, batch, *, deterministic=True, rng=None):
        """Joint sequence output [B, S, H]."""
        return enc.encode_joint(
            params["uniter"], self.cfg,
            batch["input_ids"], batch["position_ids"], batch["img_feat"],
            batch["img_pos_feat"], batch["attn_masks"],
            gather_index=batch.get("gather_index"),
            img_masks=batch.get("img_masks"),
            deterministic=deterministic, rng=rng, dtype=self.compute_dtype,
            remat=self.remat)

    def rank_scores(self, params: Params, batch, *, deterministic=True,
                    rng=None) -> jnp.ndarray:
        """[B, 1] raw rank logits (itm.py:36-41)."""
        seq = self.encode(params, batch, deterministic=deterministic, rng=rng)
        pooled = enc.pooler(params["uniter"]["pooler"], seq,
                            self.compute_dtype)
        return enc._dense(params["rank_output"], pooled,
                          self.compute_dtype).astype(jnp.float32)

    def apply(self, params: Params, batch, *, compute_loss=True,
              deterministic=True, rng=None, sample_size: Optional[int] = None):
        """itm.py:28-53. ``sample_size`` overrides batch['sample_size'] so
        the group width can stay static under jit."""
        rank = self.rank_scores(params, batch, deterministic=deterministic,
                                rng=rng)
        if not compute_loss:
            return rank
        if sample_size is None:
            sample_size = batch["sample_size"]
        scores = jax.nn.sigmoid(rank).reshape(-1, sample_size)
        pos = scores[:, :1]
        neg = scores[:, 1:]
        return jnp.clip(self.margin + neg - pos, 0.0, None)

    def itm_scores(self, params: Params, batch, *, deterministic=True,
                   rng=None, targets=None, ot_inputs=None,
                   ot_pos_only: bool = False, compute_loss=True):
        """UNITER pre-training ITM head + optional OT loss
        (model.py:627-672)."""
        seq = self.encode(params, batch, deterministic=deterministic, rng=rng)
        pooled = enc.pooler(params["uniter"]["pooler"], seq,
                            self.compute_dtype)
        rank_scores = enc._dense(params["itm_output"], pooled,
                                 self.compute_dtype).astype(jnp.float32)
        ot_loss = None
        if ot_inputs is not None:
            tl = batch["input_ids"].shape[1]
            txt_emb = seq[:, :tl, :].astype(jnp.float32)
            img_emb = seq[:, tl:, :].astype(jnp.float32)
            ot_dist = optimal_transport_dist(
                txt_emb, img_emb, ot_inputs["txt_pad"], ot_inputs["img_pad"])
            if ot_pos_only:
                ot_loss = jnp.where(targets == 1, ot_dist, 0.0)
            else:
                pos = jnp.where(targets == 1, ot_dist, 0.0)
                neg = jnp.where(targets == 0, ot_dist, 0.0)
                ot_loss = (pos, neg)
        if compute_loss:
            logp = jax.nn.log_softmax(rank_scores, axis=-1)
            nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
            return nll, ot_loss
        return rank_scores, ot_loss
