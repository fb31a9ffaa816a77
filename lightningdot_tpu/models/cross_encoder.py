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


def sigmoid_triplet_loss(rank_scores, sample_size: int, margin: float):
    """Sigmoid-margin triplet loss over candidate groups (itm.py:43-51):
    positive first per group, hinge on sigmoid scores."""
    scores = jax.nn.sigmoid(rank_scores).reshape(-1, sample_size)
    pos = scores[:, :1]
    neg = scores[:, 1:]
    return jnp.clip(margin + neg - pos, 0.0, None)


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
        return sigmoid_triplet_loss(rank, sample_size, self.margin)

    def mine_and_apply(self, params: Params, batch, *, hard_size: int,
                       sample_from: str = "t", deterministic=False, rng=None):
        """In-batch self-mined hard-negative triplet loss.

        Parity: UniterForImageTextRetrievalHardNeg.forward/_get_hard_batch
        (uniter_model/model/itm.py:63-137): score the full candidate group
        in eval mode without gradients (index 0 is the positive), keep the
        top-``hard_size`` negatives, and train on [positive + hard
        negatives] with the sigmoid-triplet loss.

        TPU redesign: instead of the reference's host-side ``index_select``
        + cut-to-minimum-padding (dynamic shapes), the hard batch is a
        static-shape on-device gather — everything stays in one jitted
        program. ``sample_from='t'`` shares the text across candidates,
        ``'i'`` shares the image (itm.py:70-80 expand).
        """
        batch = dict(batch)
        n = batch["attn_masks"].shape[0]

        def expanded(x):
            return (jnp.broadcast_to(x, (n,) + x.shape[1:])
                    if x.shape[0] == 1 else x)

        if sample_from == "t":
            batch["input_ids"] = expanded(batch["input_ids"])
        elif sample_from == "i":
            batch["img_feat"] = expanded(batch["img_feat"])
            batch["img_pos_feat"] = expanded(batch["img_pos_feat"])
        else:
            raise ValueError(f"sample_from={sample_from!r}")
        batch["position_ids"] = expanded(batch["position_ids"])

        # eval-mode scoring pass, no gradient (itm.py:82-86 torch.no_grad)
        scores = self.rank_scores(jax.lax.stop_gradient(params), batch,
                                  deterministic=True)[:, 0]
        # NOTE first example is the positive (itm.py:103-105)
        _, hard = jax.lax.top_k(scores[1:], hard_size)
        indices = jnp.concatenate(
            [jnp.zeros((1,), hard.dtype), hard + 1])

        hard_batch = {
            k: (jnp.take(v, indices, axis=0)
                if hasattr(v, "shape") and v.shape and v.shape[0] == n else v)
            for k, v in batch.items() if v is not None
        }
        # explicitly the base triplet forward (a subclass apply() routes
        # back here when training — itm.py:87-89 super().forward)
        return CrossEncoder.apply(self, params, hard_batch,
                                  compute_loss=True,
                                  deterministic=deterministic, rng=rng,
                                  sample_size=hard_size + 1)

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
            if batch.get("gather_index") is not None:
                # a compacting gather_index places each example's regions
                # at its TRUE text length, so splitting at the padded tl
                # would hand OT region embeddings as text (the reference
                # un-scatters via ot_scatter first, model.py:640-653) —
                # reject rather than compute silently-wrong OT
                raise NotImplementedError(
                    "itm_scores OT with a compacting gather_index needs "
                    "the ot_scatter un-compaction; pass uncompacted "
                    "batches (gather_index=None) for OT")
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


@dataclasses.dataclass(frozen=True)
class CrossEncoderHardNeg(CrossEncoder):
    """Self-mining hard-negative teacher
    (UniterForImageTextRetrievalHardNeg, uniter_model/model/itm.py:56-137).

    ``apply`` in training mode scores the full candidate group without
    gradients and trains the triplet loss on the top-``hard_size`` negatives
    only; in eval mode it behaves exactly like the base class.
    """

    hard_size: int = 16

    def apply(self, params: Params, batch, *, compute_loss=True,
              deterministic=True, rng=None, sample_size=None,
              sample_from: str = "t"):
        if compute_loss and not deterministic:
            return self.mine_and_apply(params, batch,
                                       hard_size=self.hard_size,
                                       sample_from=sample_from,
                                       deterministic=deterministic, rng=rng)
        return super().apply(params, batch, compute_loss=compute_loss,
                             deterministic=deterministic, rng=rng,
                             sample_size=sample_size)


@dataclasses.dataclass(frozen=True)
class CrossEncoderFast:
    """Two-stream cosine teacher (UniterForImageTextRetrievalFast,
    uniter_model/model/itm.py:140-195).

    Text stream: the full-depth ``bert`` tower encoding text only; image
    stream: a separate ``img_bert`` tower of ``cfg.num_hidden_layers_img``
    layers encoding regions only (no [CLS] token). Score = cosine similarity
    of the two tanh-pooled outputs (itm.py:183), trained with the same
    sigmoid-triplet loss.

    Both towers keep the full UniterModel parameter layout (the reference's
    ``img_bert`` carries unused text embeddings too — kept for checkpoint
    parity; they are never touched at apply time).
    """

    cfg: EncoderConfig
    margin: float = 0.2
    compute_dtype: Any = jnp.float32
    remat: bool = False

    def init(self, rng) -> Params:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        h, std = self.cfg.hidden_size, self.cfg.initializer_range
        img_cfg = dataclasses.replace(
            self.cfg, num_hidden_layers=self.cfg.num_hidden_layers_img)
        return {
            "bert": enc.init_encoder_tower(k1, self.cfg, with_img=True),
            "img_bert": enc.init_encoder_tower(k2, img_cfg, with_img=True),
            "itm_output": enc._dense_init(k3, h, 2, std),
            "rank_output": enc._dense_init(k4, h, 1, std),
        }

    @staticmethod
    def init_output(params: Params) -> Params:
        """Seed rank head from itm head row 1 (itm.py:158-161)."""
        return CrossEncoder.init_output(params)

    @property
    def img_cfg(self) -> EncoderConfig:
        return dataclasses.replace(
            self.cfg, num_hidden_layers=self.cfg.num_hidden_layers_img)

    def rank_scores(self, params: Params, batch, *, deterministic=True,
                    rng=None) -> jnp.ndarray:
        """[B] cosine scores (itm.py:166-183)."""
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        n = batch["attn_masks_img"].shape[0]
        ids = batch["input_ids"]
        # under dropout each pair must draw its own text masks — only the
        # deterministic scoring pass may share one encode
        shared_txt = (ids.shape[0] == 1 and n > 1
                      and (deterministic or rng is None))
        if ids.shape[0] == 1 and not shared_txt:
            ids = jnp.broadcast_to(ids, (n,) + ids.shape[1:])
        pos = jnp.broadcast_to(batch["position_ids"],
                               (ids.shape[0], batch["position_ids"].shape[-1]))
        txt_mask = batch["attn_masks_text"]
        if shared_txt and txt_mask.shape[0] != 1:
            txt_mask = txt_mask[:1]
        # a SHARED text (mining pools pair one text against n images) is
        # encoded ONCE and its pooled vector broadcast — broadcasting the
        # ids first would run the full-depth text tower n times on
        # identical input (numerically identical in the deterministic
        # scoring pass)
        txt_seq, _ = enc.encode_text(
            params["bert"], self.cfg, ids, txt_mask, pos,
            deterministic=deterministic, rng=rngs[0],
            dtype=self.compute_dtype, remat=self.remat, project=False)
        pooled_txt = enc.pooler(params["bert"]["pooler"], txt_seq,
                                self.compute_dtype)
        if shared_txt:
            pooled_txt = jnp.broadcast_to(pooled_txt,
                                          (n,) + pooled_txt.shape[1:])
        feat = batch["img_feat"]
        if feat.shape[0] == 1:
            feat = jnp.broadcast_to(feat, (n,) + feat.shape[1:])
        pfeat = batch["img_pos_feat"]
        if pfeat.shape[0] == 1:
            pfeat = jnp.broadcast_to(pfeat, (n,) + pfeat.shape[1:])
        img_seq = enc.encode_image_only(
            params["img_bert"], self.img_cfg, batch["attn_masks_img"],
            feat, pfeat, deterministic=deterministic, rng=rngs[1],
            dtype=self.compute_dtype, remat=self.remat)
        pooled_img = enc.pooler(params["img_bert"]["pooler"], img_seq,
                                self.compute_dtype)
        t = pooled_txt.astype(jnp.float32)
        v = pooled_img.astype(jnp.float32)
        eps = 1e-8  # torch.nn.CosineSimilarity default
        return (jnp.sum(t * v, axis=-1)
                / (jnp.maximum(jnp.linalg.norm(t, axis=-1), eps)
                   * jnp.maximum(jnp.linalg.norm(v, axis=-1), eps)))

    def apply(self, params: Params, batch, *, compute_loss=True,
              deterministic=True, rng=None, sample_size=None):
        """itm.py:185-195: sigmoid-triplet over sample_size groups."""
        rank = self.rank_scores(params, batch, deterministic=deterministic,
                                rng=rng)
        if not compute_loss:
            return rank
        if sample_size is None:
            sample_size = batch["sample_size"]
        return sigmoid_triplet_loss(rank, sample_size, self.margin)
