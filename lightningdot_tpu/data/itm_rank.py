"""Triplet-ranking dataset for cross-encoder (teacher) fine-tuning.

Parity: ItmRankDataset (uniter_model/data/itm.py:198-249) — each item packs
the ground-truth pair plus ``neg_sample_size`` negative-image pairs and
``neg_sample_size`` negative-text pairs (1 + 2n joint sequences, positive
first), consumed by the sigmoid-triplet loss with
``sample_size = 1 + 2n`` (uniter_model/model/itm.py:43-51).
"""
from __future__ import annotations

import random
from collections import defaultdict
from typing import Any, Dict, List, Sequence

import numpy as np

from lightningdot_tpu import const
from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.padding import (bucket_len, pad_feats, pad_ids,
                                           pad_mask, position_ids)
from lightningdot_tpu.data.pretrain import _sample_negative
from lightningdot_tpu.data.txt_db import TxtTokDb, get_ids_and_lens


class ItmRankDataset:
    def __init__(self, txt_db: TxtTokDb, img_db: DetectFeatDb,
                 neg_sample_size: int = 1, seed: int = 0):
        assert neg_sample_size > 0, \
            "ItmRankDataset needs at least 1 negative sample"
        self.txt_db = txt_db
        self.img_db = img_db
        _, self.ids = get_ids_and_lens(txt_db)
        txt2img = txt_db.txt2img
        self.txt2img = {i: txt2img[i] for i in self.ids}
        self.img2txts = defaultdict(list)
        for id_, img in self.txt2img.items():
            self.img2txts[img].append(id_)
        self.img_name_list = list(self.img2txts.keys())
        self.neg_sample_size = neg_sample_size
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, i: int) -> List[Dict[str, Any]]:
        gt_txt_id = self.ids[i]
        gt_img = self.txt2img[gt_txt_id]
        id_pairs = [(gt_txt_id, gt_img)]
        neg_imgs = _sample_negative(self.img_name_list, [gt_img],
                                    self.neg_sample_size, self.rng)
        neg_txts = _sample_negative(self.ids, self.img2txts[gt_img],
                                    self.neg_sample_size, self.rng)
        id_pairs += [(gt_txt_id, im) for im in neg_imgs]
        id_pairs += [(t, gt_img) for t in neg_txts]

        inputs = []
        for txt_id, img_id in id_pairs:
            ex = self.txt_db[txt_id]
            feat, pos, nbb = self.img_db.get_img_feat(img_id)
            inputs.append({
                "input_ids": self.txt_db.combine_inputs(ex["input_ids"]),
                "img_feat": feat, "img_pos_feat": pos, "num_bb": nbb,
            })
        return inputs


def itm_rank_collate(items: List[List[Dict[str, Any]]],
                     txt_buckets: Sequence[int] = const.TXT_LEN_BUCKETS,
                     img_buckets: Sequence[int] = const.IMG_LEN_BUCKETS
                     ) -> Dict[str, Any]:
    """Flatten groups into one joint batch; positive first per group."""
    sample_size = len(items[0])
    assert all(len(g) == sample_size for g in items)
    flat = [p for g in items for p in g]
    n = len(flat)
    toks = [p["input_ids"] for p in flat]
    L = bucket_len(max(len(t) for t in toks), txt_buckets)
    nbbs = [p["num_bb"] for p in flat]
    R = bucket_len(max(nbbs), img_buckets)
    return {
        "input_ids": pad_ids(toks, L),
        "position_ids": position_ids(n, L),
        "img_feat": pad_feats([p["img_feat"] for p in flat], R),
        "img_pos_feat": pad_feats([p["img_pos_feat"] for p in flat], R),
        "attn_masks": np.concatenate(
            [pad_mask([len(t) for t in toks], L),
             pad_mask(nbbs, R)], axis=1),
        "sample_size": sample_size,
        "n_groups": len(items),
    }
