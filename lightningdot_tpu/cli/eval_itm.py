"""Retrieval evaluation driver.

Parity: eval_itm.py (reference root) — load config + checkpoint, build the
val/test ItmFast datasets, run eval_model_on_dataloader, report
recall@{1,5,10} both directions.

Usage (reference-compatible config JSONs):
  python -m lightningdot_tpu.cli.eval_itm --config configs/flickr30k_eval.json \
      --biencoder_checkpoint /path/LightningDot.pt
"""
from __future__ import annotations

import argparse
import json
import time

from lightningdot_tpu.config import (add_itm_params, add_kd_params,
                                     add_logging_params, default_params,
                                     parse_with_config, print_args)
from lightningdot_tpu.data.feat_db import ImageDbGroup
from lightningdot_tpu.data.itm import CollateConfig, itm_fast_collate
from lightningdot_tpu.models.factory import build_biencoder
from lightningdot_tpu.training.evaluator import eval_model_on_dataloader
from lightningdot_tpu.training.trainer_utils import build_dataloader, load_dataset
from lightningdot_tpu.utils.logging import LOGGER
from lightningdot_tpu.utils.runtime import setup_runtime


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("eval_itm", allow_abbrev=False)
    default_params(parser)
    add_itm_params(parser)
    add_logging_params(parser)
    add_kd_params(parser)
    return parser


def _load_caption_meta(args) -> None:
    """Populate img_meta_dict + tokenizer from --itm_global_file so the
    caption-blending path gets its caps (reference eval_itm.py:54,86-90;
    without this, caption_score_weight silently falls back to image-only
    scores). Same wiring as train_itm."""
    args.img_meta_dict = getattr(args, "img_meta_dict", None)
    args.tokenizer = getattr(args, "tokenizer", None)
    if getattr(args, "itm_global_file", None) and args.img_meta_dict is None:
        with open(args.itm_global_file) as f:
            args.img_meta_dict = json.load(f)
        from transformers import BertTokenizer
        args.tokenizer = BertTokenizer.from_pretrained("bert-base-cased")


def evaluate(args, split: str = "test", model=None, params=None):
    """EVAL_MODEL equivalent (eval_itm.py:28-181)."""
    setup_runtime(args)
    _load_caption_meta(args)

    if model is None:
        model, params = build_biencoder(args, seed=args.seed)

    all_img_dbs = ImageDbGroup(args.conf_th, args.max_bb, args.min_bb,
                               args.num_bb)
    txt_db = args.test_txt_db if split == "test" else args.val_txt_db
    img_db = args.test_img_db if split == "test" else args.val_img_db
    dataset = load_dataset(all_img_dbs, txt_db, img_db, args, is_train=False)
    dataset.new_epoch()
    img2txt = dataset.txt_db.img2txts

    collate = lambda items: itm_fast_collate(
        items, CollateConfig(fixed_batch=args.valid_batch_size))
    loader = build_dataloader(dataset, collate, False, args)

    t0 = time.time()
    result = eval_model_on_dataloader(
        model, params, loader, img2txt=img2txt,
        vector_size=model.txt_cfg.out_size,
        caption_score_weight=args.caption_score_weight,
        hnsw=args.hnsw_index)
    LOGGER.info("eval %s: time cost = %.1fs", split, time.time() - t0)
    recall_txt, recall_img = result.recall
    LOGGER.info("%s: loss=%.4f correct_ratio=%.4f", split, result.loss,
                result.correct_ratio)
    LOGGER.info("txt->img (image retrieval) recall: %s", recall_txt)
    LOGGER.info("img->txt (text retrieval) recall: %s", recall_img)
    return result


def main(cmds=None):
    args = parse_with_config(build_parser(), cmds)
    print_args(args, LOGGER.info)
    setup_runtime(args)
    # build once: loading + torch-mapping the checkpoint (and re-jitting
    # the encoders) per split doubles startup through the remote relay
    model, params = build_biencoder(args, seed=args.seed)
    results = {}
    for split in ("val", "test"):
        txt_db = args.test_txt_db if split == "test" else args.val_txt_db
        if not txt_db:
            continue
        res = evaluate(args, split, model=model, params=params)
        results[split] = {
            "loss": res.loss,
            "correct_ratio": res.correct_ratio,
            "recall_txt": res.recall[0],
            "recall_img": res.recall[1],
        }
    print(json.dumps(results, indent=2, default=float))
    return results


if __name__ == "__main__":
    main()
