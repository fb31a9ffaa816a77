"""VQA head on the bi-encoder.

Parity: BiEncoderForVisualQuestionAnswering (dvl/models/bi_encoder.py:683-734)
— concatenated (optionally "intersection": [q, ctx, q*ctx, q+ctx]) pooled
vectors through a Linear-GELU-LN-Linear head, BCE-with-logits loss. Present
in the reference but unused by the retrieval pipeline; kept for capability
parity.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from lightningdot_tpu.models import encoder as enc
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.ops import gelu, layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BiEncoderForVQA:
    bi_encoder: BiEncoder
    hidden_size: int
    num_answer: int
    intersection: bool = False

    def init(self, rng) -> Params:
        k1, k2, k3 = jax.random.split(rng, 3)
        h = self.hidden_size * (2 if self.intersection else 1) * 2
        std = 0.02
        return {
            "biencoder": self.bi_encoder.init(k1),
            "vqa_output": {
                "fc1": enc._dense_init(k2, h, h * 2, std),
                "ln": enc._ln_init(h * 2),
                "fc2": enc._dense_init(k3, h * 2, self.num_answer, std),
            },
        }

    def apply(self, params: Params, batch, *, targets=None,
              compute_loss: bool = True, deterministic=True, rng=None):
        q, ctx, _ = self.bi_encoder.apply(params["biencoder"], batch,
                                          deterministic=deterministic,
                                          rng=rng)
        if self.intersection:
            pooled = jnp.concatenate([q, ctx, q * ctx, q + ctx], axis=1)
        else:
            pooled = jnp.concatenate([q, ctx], axis=1)
        head = params["vqa_output"]
        dtype = self.bi_encoder.compute_dtype
        hdn = gelu(enc._dense(head["fc1"], pooled.astype(dtype), dtype))
        hdn = layer_norm(hdn, head["ln"]["scale"], head["ln"]["bias"])
        scores = enc._dense(head["fc2"], hdn, dtype).astype(jnp.float32)
        if compute_loss:
            # F.binary_cross_entropy_with_logits(reduction='none')
            t = targets.astype(jnp.float32)
            return (jnp.maximum(scores, 0) - scores * t
                    + jnp.log1p(jnp.exp(-jnp.abs(scores))))
        return scores
