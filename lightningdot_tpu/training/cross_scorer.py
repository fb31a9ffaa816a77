"""Batched cross-encoder pair scoring.

Used by the re-ranker (rerank.py stage 2) and the teacher inference driver
(uniter_model/inf_itm.py: ``inference()`` builds the full txt x img score
matrix by batched cross-encoding, uniter_model/train_itm.py:437-460).

TPU notes: pairs are scored in fixed-size [pair_block, L+R] batches with
bucketed padding; the jitted forward is cached per shape.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import numpy as np

from lightningdot_tpu.data.padding import (bucket_len, pad_feats, pad_ids,
                                           pad_mask, position_ids)
from lightningdot_tpu.models.cross_encoder import CrossEncoder


class CrossScorer:
    """Scores (text, image) pairs with the joint cross-encoder rank head."""

    def __init__(self, model: CrossEncoder, params, *, pair_block: int = 128,
                 txt_buckets: Sequence[int] = (32, 64),
                 img_buckets: Sequence[int] = (32, 64, 104),
                 use_itm_head: bool = False):
        self.model = model
        self.params = params
        self.pair_block = pair_block
        self.txt_buckets = txt_buckets
        self.img_buckets = img_buckets
        self.use_itm_head = use_itm_head
        self._fns: Dict[Tuple, Any] = {}

    def _fn(self, shapes):
        fn = self._fns.get(shapes)
        if fn is None:
            if self.use_itm_head:
                def score(params, batch):
                    logits, _ = self.model.itm_scores(params, batch,
                                                      compute_loss=False)
                    return logits[:, 1] - logits[:, 0]
            else:
                def score(params, batch):
                    return self.model.rank_scores(params, batch)[:, 0]

            fn = jax.jit(score)
            self._fns[shapes] = fn
        return fn

    def score_pairs(self, txt_tokens: List[Sequence[int]],
                    img_feats: List[np.ndarray],
                    img_pos_feats: List[np.ndarray]) -> np.ndarray:
        """-> [n_pairs] rank scores; i-th pair = (txt_tokens[i], img i)."""
        n = len(txt_tokens)
        out = np.zeros((n,), np.float32)
        B = self.pair_block
        pending = []  # dispatch every block, pull once at the end: a
        # blocking np.asarray per block would serialize the pipeline on
        # the device round-trip (up to ~800 ms each through the relay)
        for st in range(0, n, B):
            tok = txt_tokens[st:st + B]
            feats = img_feats[st:st + B]
            poss = img_pos_feats[st:st + B]
            n_valid = len(tok)
            if n_valid < B:
                tok = list(tok) + [tok[-1]] * (B - n_valid)
                feats = list(feats) + [feats[-1]] * (B - n_valid)
                poss = list(poss) + [poss[-1]] * (B - n_valid)
            L = bucket_len(max(len(t) for t in tok), self.txt_buckets)
            R = bucket_len(max(f.shape[0] for f in feats), self.img_buckets)
            batch = {
                "input_ids": pad_ids(tok, L),
                "position_ids": position_ids(B, L),
                "img_feat": pad_feats(feats, R),
                "img_pos_feat": pad_feats(poss, R),
                "attn_masks": np.concatenate(
                    [pad_mask([len(t) for t in tok], L),
                     pad_mask([f.shape[0] for f in feats], R)], axis=1),
            }
            shapes = (B, L, R)
            pending.append((st, n_valid,
                            self._fn(shapes)(self.params, batch)))
        for st, n_valid, dev in pending:
            out[st:st + n_valid] = np.asarray(dev)[:n_valid]
        return out

    def score_matrix(self, txt_tokens: List[Sequence[int]],
                     img_feats: List[np.ndarray],
                     img_pos_feats: List[np.ndarray]) -> np.ndarray:
        """Full [n_txt, n_img] matrix (inf_itm semantics)."""
        n_txt, n_img = len(txt_tokens), len(img_feats)
        mat = np.zeros((n_txt, n_img), np.float32)
        for i, tok in enumerate(txt_tokens):
            mat[i] = self.score_pairs([tok] * n_img, img_feats,
                                      img_pos_feats)
        return mat
