"""Two-tower bi-encoder, contrastive loss, and pre-training heads.

Parity targets:
  * ``BiEncoder`` — dvl/models/bi_encoder.py:199-290 (routes
    batch['txts'/'imgs'/'caps'] through the towers; freeze flags).
  * ``BiEncoderNllLoss`` — dvl/models/bi_encoder.py:54-68,613-665 (dot-product
    scores, optional caption-score blending, log-softmax NLL vs positive
    index, correct-prediction count).
  * ``BiEncoderForPretraining`` — dvl/models/bi_encoder.py:293-563
    (MLM / MRFR / MRC(-kl) / bidirectional ITM heads with cross-tower CLS
    fusion ``cls_concat`` in {add, multiply, ''}).

TPU redesign notes:
  * masked-position losses (MLM/MRFR/MRC) use *static-size* masked-position
    index arrays emitted by the collates instead of boolean dynamic gathers —
    identical math, XLA-friendly shapes;
  * the MLM decoder weight is tied to the image tower's word embeddings
    (bi_encoder.py:300-301) and the feat-regression weight to img_linear
    (model.py:390-403) — ties are realised by referencing the same leaves at
    apply time, so there is exactly one stored copy.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models import encoder as enc
from lightningdot_tpu.ops import gelu, layer_norm

Params = Dict[str, Any]


def dot_product_scores(q_vectors, ctx_vectors, cosine: bool = False):
    """q [n1,D] x ctx [n2,D] -> [n1,n2] (bi_encoder.py:54-68).

    One MXU matmul; f32 accumulation for rank stability.
    """
    r = jnp.dot(q_vectors, ctx_vectors.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    if cosine:
        n1 = jnp.linalg.norm(q_vectors, axis=-1)
        n2 = jnp.linalg.norm(ctx_vectors, axis=-1)
        return r / jnp.outer(n1, n2)
    return r


class BiEncoderNllLoss:
    """In-batch contrastive NLL (bi_encoder.py:613-665)."""

    @staticmethod
    def calc(q_vectors, ctx_vectors, caption_vectors, positive_idx,
             hard_negative_idx=None, caption_score_weight: float = 0.1,
             reduction: str = "mean", col_valid=None):
        """Returns (loss, correct_prediction_count, scores).

        ``positive_idx``: int array [n_q] of the positive ctx column per query.
        ``col_valid``: optional [n_ctx] 0/1 mask — invalid context columns
        (fixed-size batch padding duplicates) are excluded from every OTHER
        row's softmax denominator (each row's own positive stays unmasked).
        """
        scores_img = dot_product_scores(q_vectors, ctx_vectors)
        if caption_vectors is not None and caption_score_weight != 0:
            scores_cap = dot_product_scores(q_vectors, caption_vectors)
            scores = ((1 - caption_score_weight) * scores_img
                      + caption_score_weight * scores_cap)
        else:
            scores = scores_img

        positive_idx = jnp.asarray(positive_idx)
        if col_valid is not None:
            col_mask = (1.0 - jnp.asarray(col_valid, scores.dtype)
                        )[None, :] * -1e30
            diag = jax.nn.one_hot(positive_idx, scores.shape[1],
                                  dtype=scores.dtype)
            scores = scores + col_mask * (1.0 - diag)
        log_probs = jax.nn.log_softmax(scores, axis=1)
        nll = -jnp.take_along_axis(log_probs, positive_idx[:, None],
                                   axis=1)[:, 0]
        if reduction == "mean":
            loss = jnp.mean(nll)
        elif reduction == "sum":
            loss = jnp.sum(nll)
        else:
            loss = nll
        correct = jnp.sum(jnp.argmax(log_probs, axis=1) == positive_idx)
        return loss, correct, scores


@dataclasses.dataclass(frozen=True)
class BiEncoder:
    """Two-tower model definition (configs + flags; params are a pytree).

    params tree layout::

        {'txt_model': <text tower>, 'img_model': <image tower>}

    matching BiEncoder.txt_model / img_model (bi_encoder.py:203-219).
    """

    txt_cfg: EncoderConfig
    img_cfg: EncoderConfig
    fix_txt_encoder: bool = False
    fix_img_encoder: bool = False
    compute_dtype: Any = jnp.float32
    remat: bool = False

    def init(self, rng) -> Params:
        k1, k2 = jax.random.split(rng)
        return {
            "txt_model": enc.init_encoder_tower(k1, self.txt_cfg,
                                                with_img=False),
            "img_model": enc.init_encoder_tower(k2, self.img_cfg,
                                                with_img=True),
        }

    # -- single-tower passes -------------------------------------------------
    def encode_txt(self, params: Params, sb: Dict[str, Any], *,
                   deterministic=True, rng=None, sequence=False):
        """Text/caption sub-batch -> pooled [B, out] (or sequence)."""
        tower = params["txt_model"]
        if self.fix_txt_encoder:
            tower = jax.lax.stop_gradient(tower)
        seq, pooled = enc.encode_text(
            tower, self.txt_cfg, sb["input_ids"], sb["attention_mask"],
            sb["position_ids"], deterministic=deterministic, rng=rng,
            dtype=self.compute_dtype, remat=self.remat)
        return seq if sequence else pooled

    def encode_img(self, params: Params, sb: Dict[str, Any], *,
                   deterministic=True, rng=None, sequence=False):
        """Image sub-batch -> pooled [B, out] (or sequence)."""
        tower = params["img_model"]
        if self.fix_img_encoder:
            tower = jax.lax.stop_gradient(tower)
        seq, pooled = enc.encode_image(
            tower, self.img_cfg, sb["input_ids"], sb["attention_mask"],
            sb["img_feat"], sb["img_pos_feat"], img_masks=sb.get("img_masks"),
            deterministic=deterministic, rng=rng, dtype=self.compute_dtype,
            remat=self.remat)
        return seq if sequence else pooled

    def apply(self, params: Params, batch: Dict[str, Any], *,
              deterministic=True, rng=None, sequence=False):
        """batch{'txts','imgs','caps'} -> (txt, img, cap) pooled vectors.

        Parity: BiEncoder.forward (bi_encoder.py:250-290).
        """
        rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
        txt = img = cap = None
        if batch.get("txts") is not None:
            txt = self.encode_txt(params, batch["txts"],
                                  deterministic=deterministic, rng=rngs[0],
                                  sequence=sequence)
        if batch.get("imgs") is not None:
            img = self.encode_img(params, batch["imgs"],
                                  deterministic=deterministic, rng=rngs[1],
                                  sequence=sequence)
        caps = batch.get("caps")
        if caps is not None and caps.get("input_ids") is not None:
            cap = self.encode_txt(params, caps,
                                  deterministic=deterministic, rng=rngs[2],
                                  sequence=sequence)
        return txt, img, cap


# ---------------------------------------------------------------------------
# Pre-training heads
# ---------------------------------------------------------------------------

def init_pretrain_heads(rng, cfg: EncoderConfig, img_label_dim: int) -> Params:
    """Heads for MLM/MRFR/MRC/ITM (bi_encoder.py:295-319).

    Tied weights (MLM decoder = word embeddings; feat_regress weight =
    img_linear) are NOT stored here; they are read from the towers at apply
    time.
    """
    ks = jax.random.split(rng, 4)
    h, std = cfg.hidden_size, cfg.initializer_range
    return {
        "mlm": {  # BertLMPredictionHead transform + free bias (layer.py:205-222)
            "transform": {
                "dense": enc._dense_init(ks[0], h, h, std),
                "ln": enc._ln_init(h),
            },
            "bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        },
        "feat_regress": {  # RegionFeatureRegression net (model.py:390-403)
            "dense": enc._dense_init(ks[1], h, h, std),
            "ln": enc._ln_init(h),
            "bias": jnp.zeros((cfg.img_dim,), jnp.float32),
        },
        "region_classifier": {  # RegionClassification (model.py:406-416)
            "dense": enc._dense_init(ks[2], h, h, std),
            "ln": enc._ln_init(h),
            "out": enc._dense_init(ks[3], h, img_label_dim, std),
        },
        "itm_output": enc._dense_init(
            jax.random.split(ks[3])[0], h, 2, std),
    }


def apply_mlm_head(heads: Params, hidden, decoder_weight, *, eps=1e-12,
                   dtype=jnp.float32):
    """Tied-decoder MLM head (layer.py:205-233). decoder_weight: [V, H]."""
    h = gelu(enc._dense(heads["transform"]["dense"], hidden, dtype))
    h = layer_norm(h, heads["transform"]["ln"]["scale"],
                   heads["transform"]["ln"]["bias"], eps)
    logits = jnp.dot(h, decoder_weight.T.astype(dtype),
                     preferred_element_type=jnp.float32,
                     precision=enc.matmul_precision(dtype))
    return logits + heads["bias"]


def apply_feat_regress(heads: Params, hidden, img_linear_kernel, *,
                       eps=1e-12, dtype=jnp.float32):
    """RegionFeatureRegression with tied img_linear weight (model.py:390-403).
    img_linear_kernel: [img_dim, H] (our jax layout)."""
    h = gelu(enc._dense(heads["dense"], hidden, dtype))
    h = layer_norm(h, heads["ln"]["scale"], heads["ln"]["bias"], eps)
    return (jnp.dot(h, img_linear_kernel.T.astype(dtype),
                    preferred_element_type=jnp.float32,
                    precision=enc.matmul_precision(dtype))
            + heads["bias"])


def apply_region_classifier(heads: Params, hidden, *, eps=1e-12,
                            dtype=jnp.float32):
    """RegionClassification (model.py:406-416)."""
    h = gelu(enc._dense(heads["dense"], hidden, dtype))
    h = layer_norm(h, heads["ln"]["scale"], heads["ln"]["bias"], eps)
    return enc._dense(heads["out"], h, dtype).astype(jnp.float32)


def mrc_loss_from_logits(logits, label_targets, task: str):
    """KL (mrc-kl) or hard-label CE over region classes
    (bi_encoder.py:552-563)."""
    label_targets = label_targets.astype(jnp.float32)
    if "kl" in task:
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe_log = jnp.where(label_targets > 0,
                             jnp.log(jnp.maximum(label_targets, 1e-30)), 0.0)
        return jnp.where(label_targets > 0,
                         label_targets * (safe_log - logp), 0.0)
    hard = jnp.argmax(label_targets[..., 1:], axis=-1) + 1
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, hard[..., None], axis=-1)[..., 0]


def _cls_concat_fuse(seq, other_cls, mode: str):
    """Cross-tower CLS fusion (bi_encoder.py:370-378)."""
    if mode == "add":
        return seq + other_cls
    if mode == "multiply":
        return seq * other_cls
    if mode == "":
        return seq
    raise NotImplementedError(f"cls_concat={mode!r}")


def _gather_positions(seq, positions):
    """[B,S,H], [B,M] -> [B,M,H] static-shape gather."""
    return jnp.take_along_axis(seq, positions[:, :, None], axis=1)


@dataclasses.dataclass(frozen=True)
class BiEncoderForPretraining:
    """MLM + MRFR + MRC(-kl) + ITM on top of the bi-encoder
    (bi_encoder.py:293-563).

    params tree: {'bert': <BiEncoder params>, 'heads': <init_pretrain_heads>}
    ('bert' mirrors ``self.bert = BiEncoder(...)``, bi_encoder.py:299).
    """

    bi_encoder: BiEncoder
    cls_concat: str = ""
    img_label_dim: int = 1601
    nce_temp: float = 1.0
    ot_pos_only: bool = False

    @property
    def cfg(self) -> EncoderConfig:
        return self.bi_encoder.img_cfg

    def init(self, rng) -> Params:
        k1, k2 = jax.random.split(rng)
        return {
            "bert": self.bi_encoder.init(k1),
            "heads": init_pretrain_heads(k2, self.cfg, self.img_label_dim),
        }

    def apply(self, params: Params, batch, task: str, *, deterministic=False,
              rng=None):
        """Dispatch on task (bi_encoder.py:330-363)."""
        if task == "mlm":
            return self.forward_mlm(params, batch, deterministic=deterministic,
                                    rng=rng)
        if task == "mrfr":
            return self.forward_mrfr(params, batch,
                                     deterministic=deterministic, rng=rng)
        if task == "itm":
            return self.forward_itm(params, batch,
                                    deterministic=deterministic, rng=rng)
        if task.startswith("mrc"):
            return self.forward_mrc(params, batch, task,
                                    deterministic=deterministic, rng=rng)
        raise ValueError(f"invalid task {task}")

    # -- task forwards -------------------------------------------------------
    def _dual_sequences(self, params, batch, deterministic, rng):
        txt_seq, img_seq, _ = self.bi_encoder.apply(
            params["bert"], batch, deterministic=deterministic, rng=rng,
            sequence=True)
        return txt_seq, img_seq

    def mlm_logits(self, params: Params, hidden):
        """MLM head; decoder tied to the IMAGE tower's word embeddings
        (bi_encoder.py:300-301)."""
        return apply_mlm_head(
            params["heads"]["mlm"], hidden,
            params["bert"]["img_model"]["embeddings"]["word"],
            eps=self.cfg.layer_norm_eps, dtype=self.bi_encoder.compute_dtype)

    def forward_mlm(self, params, batch, *, deterministic=False, rng=None):
        """MLM with image-CLS fusion (bi_encoder.py:366-389).

        batch extras: 'masked_positions' [B,M], 'masked_labels' [B,M],
        'masked_weights' [B,M] (1 for real masked slots).
        Returns (per-position loss [B*M], logits, weights).
        """
        txt_seq, img_seq = self._dual_sequences(params, batch, deterministic,
                                                rng)
        img_cls = img_seq[:, 0:1, :]
        seq = _cls_concat_fuse(txt_seq, img_cls, self.cls_concat)
        hidden = _gather_positions(seq, batch["masked_positions"])
        logits = self.mlm_logits(params, hidden)
        labels = batch["masked_labels"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.maximum(labels, 0)[:, :, None], axis=2)[:, :, 0]
        weights = batch["masked_weights"].astype(jnp.float32)
        return nll.reshape(-1), logits, weights.reshape(-1)

    def forward_mrfr(self, params, batch, *, deterministic=False, rng=None):
        """Masked region feature regression (bi_encoder.py:419-439).

        batch extras: 'img_masked_positions' [B,M] (positions into the image
        tower sequence, i.e. region index + 1 for the CLS offset),
        'feat_targets' [B,M,img_dim], 'img_masked_weights' [B,M].
        """
        txt_seq, img_seq = self._dual_sequences(params, batch, deterministic,
                                                rng)
        txt_cls = txt_seq[:, 0:1, :]
        seq = _cls_concat_fuse(img_seq, txt_cls, self.cls_concat)
        hidden = _gather_positions(seq, batch["img_masked_positions"])
        # weight tied to img_linear (model.py:397-403)
        pred = apply_feat_regress(
            params["heads"]["feat_regress"], hidden,
            params["bert"]["img_model"]["img_embeddings"]["img_linear"][
                "kernel"],
            eps=self.cfg.layer_norm_eps, dtype=self.bi_encoder.compute_dtype)
        target = batch["feat_targets"].astype(jnp.float32)
        loss = jnp.square(pred - target)  # elementwise mse (reduction none)
        weights = batch["img_masked_weights"].astype(jnp.float32)
        return loss, pred, weights

    def forward_mrc(self, params, batch, task: str, *, deterministic=False,
                    rng=None):
        """Masked region classification (bi_encoder.py:533-563).

        batch extras: 'img_masked_positions', 'label_targets' [B,M,n_labels]
        soft labels, 'img_masked_weights'.
        """
        txt_seq, img_seq = self._dual_sequences(params, batch, deterministic,
                                                rng)
        txt_cls = txt_seq[:, 0:1, :]
        seq = _cls_concat_fuse(img_seq, txt_cls, self.cls_concat)
        hidden = _gather_positions(seq, batch["img_masked_positions"])
        logits = apply_region_classifier(
            params["heads"]["region_classifier"], hidden,
            eps=self.cfg.layer_norm_eps, dtype=self.bi_encoder.compute_dtype)
        weights = batch["img_masked_weights"].astype(jnp.float32)
        loss = mrc_loss_from_logits(logits, batch["label_targets"], task)
        return loss, logits, weights

    def forward_mrm_nce(self, *args, **kwargs):
        """MRM-NCE is dead in the reference too (bi_encoder.py:341:
        ``raise NotImplementedError('nce does not work')``)."""
        raise NotImplementedError("nce does not work")

    def forward_itm(self, params, batch, *, deterministic=False, rng=None,
                    compute_loss=True):
        """Bidirectional in-batch contrastive ITM (bi_encoder.py:484-530).

        Uses pooled embeddings both directions (txt->img, img->txt), averaged.
        """
        txt, img, cap = self.bi_encoder.apply(
            params["bert"], batch, deterministic=deterministic, rng=rng)
        # positives are the diagonal of the in-batch score matrix. Computed
        # on the traced batch (not read from batch['pos_ctx_indices']): the
        # collate emits a LOCAL arange, and under multi-host shard_batch the
        # per-host aranges concatenate to [0..n-1, 0..n-1, ...] — wrong
        # global labels that would make rank>0 rows treat rank 0's images
        # as positives (matches itm_step.py's pos_idx construction).
        pos_idx = jnp.arange(txt.shape[0])
        # fixed-size padding duplicates the last item: its copies must not
        # act as extra negative context columns in the real rows' softmax
        # denominators (weights already zero the pad rows' own loss)
        col_valid = batch.get("weights")
        loss1, correct1, scores1 = BiEncoderNllLoss.calc(
            txt, img, cap, pos_idx, None, 0.0, reduction="none",
            col_valid=col_valid)
        loss2, correct2, scores2 = BiEncoderNllLoss.calc(
            img, txt, cap, pos_idx, None, 0.0, reduction="none",
            col_valid=col_valid)
        loss = loss1 * 0.5 + loss2 * 0.5
        if compute_loss:
            return loss, None
        return loss, None, correct1 * 0.5 + correct2 * 0.5
