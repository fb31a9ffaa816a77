"""Two-stage retrieval: dense top-K then cross-encoder re-score.

Parity: rerank.py (reference root) — stage 1 builds full-corpus indexes from
the bi-encoder and retrieves top-100 per query both directions with
recall@{1,5,10,20,50,100} (rerank.py:149-214); stage 2 re-scores the
top-{10,20,50,100} candidates with cross-encoder scores and reports
recall-after-rerank (rerank.py:256-292).

Score sources for stage 2:
  * ``--score_file``: pickled (score_matrix, txt_ids, img_ids) tuple — the
    ``results.bin`` format produced by inf_itm (rerank.py:227-233);
  * ``--teacher_checkpoint``: compute scores on the fly with the joint
    cross-encoder — TPU-native path that only scores retrieved candidates
    instead of the full matrix.
"""
from __future__ import annotations

import argparse
import itertools
import json
import pickle
import time

import numpy as np

from lightningdot_tpu.config import (add_itm_params, add_kd_params,
                                     add_logging_params, default_params,
                                     parse_with_config, print_args)
from lightningdot_tpu.data.feat_db import ImageDbGroup
from lightningdot_tpu.data.itm import CollateConfig, itm_fast_collate
from lightningdot_tpu.models.factory import build_biencoder
from lightningdot_tpu.training.cross_scorer import CrossScorer
from lightningdot_tpu.training.evaluator import eval_model_on_dataloader
from lightningdot_tpu.training.trainer_utils import build_dataloader, load_dataset
from lightningdot_tpu.utils.logging import LOGGER
from lightningdot_tpu.utils.runtime import setup_runtime

RECALL_TOPS = (1, 5, 10, 20, 50, 100)
RERANK_THRESHOLDS = (10, 20, 50, 100)


def build_parser():
    parser = argparse.ArgumentParser("rerank", allow_abbrev=False)
    default_params(parser)
    add_itm_params(parser)
    add_logging_params(parser)
    add_kd_params(parser)
    parser.add_argument("--score_file", default=None, type=str,
                        help="pickled (score_matrix, txt_ids, img_ids)")
    parser.add_argument("--num_tops", default=100, type=int)
    return parser


def main(cmds=None):
    args = parse_with_config(build_parser(), cmds)
    print_args(args, LOGGER.info)
    setup_runtime(args)

    model, params = build_biencoder(args, seed=args.seed)
    vector_size = model.txt_cfg.out_size

    all_img_dbs = ImageDbGroup(args.conf_th, args.max_bb, args.min_bb,
                               args.num_bb)
    dataset = load_dataset(all_img_dbs, args.test_txt_db, args.test_img_db,
                           args, is_train=False)
    dataset.new_epoch()
    collate = lambda items: itm_fast_collate(
        items, CollateConfig(fixed_batch=args.valid_batch_size))
    dataloader = build_dataloader(dataset, collate, False, args)
    img2txt = dataset.txt_db.img2txts
    txt2img = dict(itertools.chain(
        *[[(v, k) for v in vals] for k, vals in img2txt.items()]))

    # ---- stage 1: dense retrieval (rerank.py:149-214) ----------------------
    result = eval_model_on_dataloader(model, params, dataloader,
                                      img2txt=img2txt, no_eval=True,
                                      vector_size=vector_size)
    indexer_img, indexer_txt = result.indexers
    txt_emb, img_emb = result.embeddings["txt"], result.embeddings["img"]
    txt_ids = list(txt_emb.keys())
    img_ids = list(img_emb.keys())

    # stage-1 candidate depth: at least the recall table, deeper if asked
    depth = max(max(RECALL_TOPS), args.num_tops)
    t0 = time.time()
    res_img = indexer_img.search_knn(np.stack(list(txt_emb.values())), depth)
    res_txt = indexer_txt.search_knn(np.stack(list(img_emb.values())), depth)
    search_time = time.time() - t0

    ranking_res_img = {t: r[0] for t, r in zip(txt_ids, res_img)}
    ranking_res_txt = {f: r[0] for f, r in zip(img_ids, res_txt)}

    recall_img2 = {k: 0 for k in RECALL_TOPS}
    for t in txt_ids:
        r = ranking_res_img[t]
        for top in recall_img2:
            recall_img2[top] += txt2img[t] in r[:top]
    recall_txt2 = {k: 0 for k in RECALL_TOPS}
    for f in img_ids:
        r = ranking_res_txt[f]
        for top in recall_txt2:
            recall_txt2[top] += any(t in r[:top] for t in img2txt[f])
    recall_img2 = {k: v / len(txt_ids) for k, v in recall_img2.items()}
    recall_txt2 = {k: v / len(img_ids) for k, v in recall_txt2.items()}
    # includes the first-use jit compile of the index kernel (30 s - 2 min
    # through the relay) — steady-state search latency is bench.py's number
    LOGGER.info("stage-1 search time (incl. first-call compile): %.2fs "
                "(%d txt + %d img queries)",
                search_time, len(txt_ids), len(img_ids))
    LOGGER.info("img retrieval (dense): %s", recall_img2)
    LOGGER.info("txt retrieval (dense): %s", recall_txt2)

    # ---- stage 2: cross-encoder rescoring ---------------------------------
    out = {"stage1_img": recall_img2, "stage1_txt": recall_txt2}
    get_pair_score = _load_pair_scorer(args, dataset, txt_ids)
    if get_pair_score is None:
        print(json.dumps(out, default=float))
        return out

    score_txt_queries, score_img_queries = get_pair_score
    max_th = min(max(RERANK_THRESHOLDS), depth)
    # score the max-threshold candidate set ONCE for all queries (one
    # batched call per direction — a call per query would pay one blocking
    # relay round-trip each, hours over a test split); thresholds slice
    cand_scores_img = score_txt_queries(
        [(t, list(ranking_res_img[t][:max_th])) for t in txt_ids])
    cand_scores_txt = score_img_queries(
        [(f, list(ranking_res_txt[f][:max_th])) for f in img_ids])

    for threshold in RERANK_THRESHOLDS:
        recall_rerank = {1: 0, 5: 0, 10: 0}
        for txt_id in txt_ids:
            cands = list(ranking_res_img[txt_id][:threshold])
            scores = cand_scores_img[txt_id][:threshold]
            order = np.argsort(-scores)[:10]
            reranked = [cands[i] for i in order]
            for top in recall_rerank:
                recall_rerank[top] += txt2img[txt_id] in reranked[:top]
        rec = {k: v / len(txt_ids) for k, v in recall_rerank.items()}
        LOGGER.info("rerank ir top-%d: %s", threshold, rec)
        out[f"rerank_img_top{threshold}"] = rec

    for threshold in RERANK_THRESHOLDS:
        recall_rerank = {1: 0, 5: 0, 10: 0}
        for img_id in img_ids:
            cands = list(ranking_res_txt[img_id][:threshold])
            scores = cand_scores_txt[img_id][:threshold]
            order = np.argsort(-scores)[:10]
            reranked = [cands[i] for i in order]
            for top in recall_rerank:
                recall_rerank[top] += any(t in reranked[:top]
                                          for t in img2txt[img_id])
        rec = {k: v / len(img_ids) for k, v in recall_rerank.items()}
        LOGGER.info("rerank tr top-%d: %s", threshold, rec)
        out[f"rerank_txt_top{threshold}"] = rec

    print(json.dumps(out, default=float))
    return out


def _load_pair_scorer(args, dataset, txt_ids):
    """Return (score_txt_queries, score_img_queries) BATCHED scorers:
    ``score_txt_queries([(txt_id, [img_ids]), ...]) -> {txt_id: scores}``
    and vice versa — all queries of a direction score in one call so the
    on-the-fly teacher path pays one device pipeline, not one blocking
    relay round-trip per query. None if no score source is configured."""
    if args.score_file:
        with open(args.score_file, "rb") as f:
            tup = pickle.load(f)
        scores_mat, f_txt_ids, f_img_ids = tup[0], tup[1], tup[2]
        scores_mat = np.asarray(scores_mat)
        ti = {t: i for i, t in enumerate(f_txt_ids)}
        ii = {im: i for i, im in enumerate(f_img_ids)}

        def score_txt_queries(items):
            return {t: np.asarray([scores_mat[ti[t]][ii[im]] for im in ims])
                    for t, ims in items}

        def score_img_queries(items):
            return {im: np.asarray([scores_mat[ti[t]][ii[im]] for t in ts])
                    for im, ts in items}

        return score_txt_queries, score_img_queries

    if args.teacher_checkpoint:
        from lightningdot_tpu.cli.train_itm import _load_teacher
        teacher, t_params = _load_teacher(args)
        scorer = CrossScorer(teacher, t_params)
        txt_db = dataset.txt_db
        img_db = dataset.img_db
        tok_cache = {t: txt_db.combine_inputs(txt_db[t]["input_ids"])
                     for t in txt_ids}
        feat_cache = {}

        def feats(im):
            if im not in feat_cache:
                f, p, _ = img_db.get_img_feat(im)
                feat_cache[im] = (f, p)
            return feat_cache[im]

        def _score_flat(items, pair_of):
            toks, fs, ps, counts = [], [], [], []
            for q, cands in items:
                counts.append(len(cands))
                for c in cands:
                    tok, (f, p) = pair_of(q, c)
                    toks.append(tok)
                    fs.append(f)
                    ps.append(p)
            flat = scorer.score_pairs(toks, fs, ps)
            out, pos = {}, 0
            for (q, _), n in zip(items, counts):
                out[q] = flat[pos:pos + n]
                pos += n
            return out

        def score_txt_queries(items):
            return _score_flat(
                items, lambda t, im: (tok_cache[t], feats(im)))

        def score_img_queries(items):
            return _score_flat(
                items, lambda im, t: (tok_cache[t], feats(im)))

        return score_txt_queries, score_img_queries

    LOGGER.info("no score_file / teacher_checkpoint: skipping stage 2")
    return None


if __name__ == "__main__":
    main()
