"""Teacher-side hard-negative mining over random candidate pools.

Parity: get_hard_negs / compute_hard_neg (uniter_model/train_itm.py:50-65,
306-365) — for every text, score a random ``mini_batch_size`` image pool with
the (eval-mode) teacher and keep the top ``hard_negative_num`` images; for
every image, aggregate the scores it received across all pools and keep the
top texts. The maps are dumped as JSON and reloaded into
``ItmRankDatasetHardNeg`` for triplet training.

TPU design: scoring runs as one jitted program per (txt, img) bucket pair
(batches come from ``ItmHardNegDataset`` with static bucket-ladder shapes);
scores are pulled to the host once per pool. Single-host by design — on a
multi-host mesh each host mines its rank-strided shard of texts
(TxtTokDb(rank, world_size)) and rank 0 merges img2hardtxts, mirroring the
reference's all_gather_list flow (train_itm.py:334-354).
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Callable, Dict, List, Tuple

import numpy as np

from lightningdot_tpu.utils.logging import LOGGER


def make_joint_score_fn(model) -> Callable:
    """Eval-mode rank-score fn(params, batch) for the joint CrossEncoder
    over the ItmHardNegDataset/ItmValDataset batch layout (split masks).

    The jitted closure is built ONCE per model — re-mining passes reuse the
    compiled programs and only swap ``params`` (a fresh jax.jit per pass
    would re-trace and pay the 30 s–2 min relay compile every time).
    """
    import jax

    @jax.jit
    def score(params, batch):
        return model.rank_scores(params, batch, deterministic=True)[:, 0]

    def fn(params, batch):
        mb = {
            "input_ids": batch["input_ids"],
            "position_ids": batch["position_ids"],
            "img_feat": batch["img_feat"],
            "img_pos_feat": batch["img_pos_feat"],
            "attn_masks": np.concatenate(
                [batch["attn_masks_text"], batch["attn_masks_img"]], axis=1),
        }
        return score(params, mb)

    return fn


def make_fast_score_fn(model) -> Callable:
    """Eval-mode cosine-score fn(params, batch) for CrossEncoderFast."""
    import jax

    @jax.jit
    def score(params, batch):
        return model.rank_scores(params, batch, deterministic=True)

    def fn(params, batch):
        mb = {k: batch[k] for k in
              ("input_ids", "position_ids", "img_feat", "img_pos_feat",
               "attn_masks_text", "attn_masks_img")}
        return score(params, mb)

    return fn


def get_hard_negs(score_fn: Callable, loader,
                  hard_negative_num: int = 20, *,
                  pipeline_depth: int = 8
                  ) -> Tuple[Dict[str, List[str]], Dict[str, List[str]]]:
    """Mine (txt2hardimgs, img2hardtxts) (train_itm.py:306-365).

    ``loader`` yields ItmHardNegDataset batches (one text vs a random image
    pool, ``gt_txt_id``/``neg_img_ids`` attached); ``score_fn(batch)``
    returns the [pool] candidate scores (device array or numpy).

    Device->host pulls are pipelined ``pipeline_depth`` pools deep: the
    relay's per-pull RTT (~hundreds of ms) overlaps the next pools'
    dispatch instead of serializing N round-trips.
    """
    from collections import deque

    LOGGER.info("start running hard negative extraction")
    st = time.time()
    txt2hardimgs: Dict[str, List[str]] = {}
    img_to_score_txts = defaultdict(list)
    in_flight = deque()

    def drain_one():
        dev_scores, txt, imgs = in_flight.popleft()
        scores = np.asarray(dev_scores, np.float32)
        k = min(hard_negative_num, len(imgs))
        hard_idx = np.argpartition(-scores, k - 1)[:k]
        txt2hardimgs[txt] = [imgs[int(i)] for i in hard_idx]
        for i, img in enumerate(imgs):
            img_to_score_txts[img].append((float(scores[i]), txt))

    for batch in loader:
        in_flight.append((score_fn(batch), batch["gt_txt_id"],
                          batch["neg_img_ids"]))
        if len(in_flight) >= pipeline_depth:
            drain_one()
    while in_flight:
        drain_one()

    LOGGER.info("start computing hard texts from images...")
    n_less_neg = 0
    img2hardtxts: Dict[str, List[str]] = {}
    for img, score_txts in img_to_score_txts.items():
        if len(score_txts) < hard_negative_num:
            img2hardtxts[img] = [t for _, t in score_txts]
            n_less_neg += 1
        else:
            s = np.asarray([sc for sc, _ in score_txts], np.float32)
            top = np.argpartition(-s, hard_negative_num - 1)
            img2hardtxts[img] = [score_txts[int(i)][1]
                                 for i in top[:hard_negative_num]]
    if n_less_neg:
        LOGGER.info("Warning: %d images did not sample enough negatives",
                    n_less_neg)
    LOGGER.info("hard negative extraction finished in %d seconds",
                int(time.time() - st))
    return txt2hardimgs, img2hardtxts


def compute_hard_neg(score_fn: Callable, loader, datasets,
                     hard_negative_num: int, hard_neg_dir: str,
                     rank: int = 0) -> None:
    """Mine, dump JSONs, reload into the training dataset(s)
    (train_itm.py:50-65).

    Multi-host: each host mines its text shard; the img->txt map is
    merged across hosts (reference: all_gather_list + rank-0 write +
    barrier, train_itm.py:52-65) so the shared img2hardtxts.json carries
    every shard's texts, only the main process writes it, and every host
    waits for the files before reloading.
    """
    from lightningdot_tpu.parallel.mesh import is_main_process
    from lightningdot_tpu.utils.misc import host_all_gather

    txt2hardimgs, img2hardtxts = get_hard_negs(score_fn, loader,
                                               hard_negative_num)
    # txt2hardimgs is per-rank by design (each host trains its own text
    # shard); img2hardtxts must merge every host's texts per image
    merged: dict = {}
    for part in host_all_gather(img2hardtxts):
        for img, txts in part.items():
            merged.setdefault(img, []).extend(txts)
    os.makedirs(hard_neg_dir, exist_ok=True)
    with open(os.path.join(hard_neg_dir,
                           f"txt2hardimgs_rank{rank}.json"), "w") as f:
        json.dump(txt2hardimgs, f)
    if is_main_process():
        with open(os.path.join(hard_neg_dir, "img2hardtxts.json"),
                  "w") as f:
            json.dump(merged, f)
    # barrier: no host may reload before the write lands (host_all_gather
    # is itself a collective, so every host reaches this point together)
    host_all_gather("hard-neg-write-done")
    if not isinstance(datasets, (list, tuple)):
        datasets = [datasets]
    for dset in datasets:
        dset.reload_hard_negs(hard_neg_dir, rank=rank)
