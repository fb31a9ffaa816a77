"""Recall math vs a direct torch reimplementation of the reference."""
import numpy as np
import torch

from lightningdot_tpu.utils.metrics import (
    itm_eval, recall_any_from_ranked_ids, recall_from_ranked_ids)


def torch_itm_eval(score_matrix, txt_ids, img_ids, txt2img, img2txts):
    """uniter_model/eval/itm.py:6-53 verbatim semantics (torch)."""
    score_matrix = torch.from_numpy(score_matrix)
    img2j = {i: j for j, i in enumerate(img_ids)}
    _, rank_txt = score_matrix.topk(10, dim=1)
    gt_img_j = torch.LongTensor([img2j[txt2img[t]] for t in txt_ids]
                                ).unsqueeze(1).expand_as(rank_txt)
    rank = (rank_txt == gt_img_j).nonzero()[:, 1]
    n = len(txt_ids)
    ir = [float((rank < k).sum()) / n for k in (1, 5, 10)]

    txt2i = {t: i for i, t in enumerate(txt_ids)}
    _, rank_img = score_matrix.topk(10, dim=0)
    tr = [0, 0, 0]
    for j, img_id in enumerate(img_ids):
        gt_is = [txt2i[t] for t in img2txts[img_id]]
        ranks = [(rank_img[:, j] == i).nonzero() for i in gt_is]
        rank = min([10] + [r.item() for r in ranks if r.numel()])
        for a, k in enumerate((1, 5, 10)):
            tr[a] += rank < k
    tr = [t / len(img_ids) for t in tr]
    return dict(img_r1=ir[0], img_r5=ir[1], img_r10=ir[2],
                txt_r1=tr[0], txt_r5=tr[1], txt_r10=tr[2])


def test_itm_eval_matches_reference(rng):
    n_img, caps_per_img = 20, 3
    img_ids = [f"img{i}" for i in range(n_img)]
    txt_ids = [f"txt{i}_{c}" for i in range(n_img)
               for c in range(caps_per_img)]
    txt2img = {f"txt{i}_{c}": f"img{i}" for i in range(n_img)
               for c in range(caps_per_img)}
    img2txts = {f"img{i}": [f"txt{i}_{c}" for c in range(caps_per_img)]
                for i in range(n_img)}
    scores = rng.standard_normal((len(txt_ids), n_img)).astype(np.float32)

    ours = itm_eval(scores, txt_ids, img_ids, txt2img, img2txts)
    ref = torch_itm_eval(scores, txt_ids, img_ids, txt2img, img2txts)
    for k, v in ref.items():
        assert abs(ours[k] - v) < 1e-9, (k, ours[k], v)


def test_knn_recall_helpers():
    ranked = {"q1": ["a", "b", "c"], "q2": ["b", "c", "a"]}
    gt = {"q1": "a", "q2": "a"}
    r = recall_from_ranked_ids(["q1", "q2"], ranked, gt, ks=(1, 3))
    assert r[1] == 0.5 and r[3] == 1.0

    gts = {"q1": ["x", "c"], "q2": ["z"]}
    r = recall_any_from_ranked_ids(["q1", "q2", "q2"], ranked, gts, ks=(1, 3))
    assert r[1] == 0.0 and r[3] == 0.5
