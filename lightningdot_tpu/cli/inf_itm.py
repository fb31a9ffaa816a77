"""Cross-encoder inference: full txt x img score matrix + itm_eval recalls.

Parity: uniter_model/inf_itm.py — evaluate a UNITER cross-encoder on an ITM
split by scoring every (text, image) pair, report itm_eval recalls, and dump
``results.bin`` = pickle((score_matrix, txt_ids, img_ids)) consumed by the
re-ranker (rerank.py:227-233).
"""
from __future__ import annotations

import argparse
import json
import os
import pickle


from lightningdot_tpu.config import parse_with_config, print_args
from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.txt_db import TxtTokDb
from lightningdot_tpu.training.cross_scorer import CrossScorer
from lightningdot_tpu.utils.logging import LOGGER
from lightningdot_tpu.utils.runtime import setup_runtime
from lightningdot_tpu.utils.metrics import itm_eval


def build_parser():
    p = argparse.ArgumentParser("inf_itm", allow_abbrev=False)
    p.add_argument("--txt_db", required=True)
    p.add_argument("--img_db", required=True)
    p.add_argument("--checkpoint", required=True,
                   help=".pt or native checkpoint of the cross-encoder")
    p.add_argument("--model_config", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--conf_th", default=0.2, type=float)
    p.add_argument("--max_bb", default=100, type=int)
    p.add_argument("--min_bb", default=10, type=int)
    p.add_argument("--num_bb", default=36, type=int)
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--config", default=None)
    p.add_argument("--compute_dtype", default="bf16", choices=["bf16", "f32"])
    return p


def main(cmds=None):
    args = parse_with_config(build_parser(), cmds)
    print_args(args, LOGGER.info)
    setup_runtime(args)
    os.makedirs(args.output_dir, exist_ok=True)

    import jax.numpy as jnp

    from lightningdot_tpu.models.factory import load_cross_encoder

    dtype = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32
    model, params = load_cross_encoder(args.checkpoint,
                                       model_config=args.model_config,
                                       compute_dtype=dtype)

    txt_db = TxtTokDb(args.txt_db, -1)
    img_db = DetectFeatDb(args.img_db, args.conf_th, args.max_bb, args.min_bb,
                          args.num_bb)
    txt2img = txt_db.txt2img
    img2txts = txt_db.img2txts
    txt_ids = list(txt_db.ids)
    img_ids = sorted({txt2img[t] for t in txt_ids})

    tokens = [txt_db.combine_inputs(txt_db[t]["input_ids"]) for t in txt_ids]
    feats, poss = [], []
    for im in img_ids:
        f, p, _ = img_db.get_img_feat(im)
        feats.append(f)
        poss.append(p)

    scorer = CrossScorer(model, params, pair_block=args.batch_size)
    LOGGER.info("scoring %d x %d pairs", len(txt_ids), len(img_ids))
    score_matrix = scorer.score_matrix(tokens, feats, poss)

    eval_log = itm_eval(score_matrix, txt_ids, img_ids, txt2img, img2txts)
    LOGGER.info("itm_eval: %s", eval_log)

    out = os.path.join(args.output_dir, "results.bin")
    with open(out, "wb") as f:
        pickle.dump((score_matrix, txt_ids, img_ids), f)
    LOGGER.info("wrote %s", out)
    print(json.dumps(eval_log, default=float))
    return eval_log, out


if __name__ == "__main__":
    main()
