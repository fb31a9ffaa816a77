"""Teacher hard-negative variants.

Covers (vs the reference recipes):
  * CrossEncoderHardNeg in-batch self-mining — mined negatives are the
    top-scoring non-gt candidates and the loss equals the base triplet loss
    on that hard batch (uniter_model/model/itm.py:56-137);
  * CrossEncoderFast two-stream cosine scoring — torch golden
    (itm.py:140-195);
  * the mined-JSON flow: get_hard_negs top-k maps, ItmRankDatasetHardNeg
    group layout, ItmHardNegDataset pools (uniter_model/train_itm.py:50-65,
    306-365 + data/itm.py:252-303,529-549);
  * train_teacher driver smoke for --self_mining and --hard_neg_size, with
    decreasing triplet loss.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.itm import ItmHardNegDataset
from lightningdot_tpu.data.itm_rank import (ItmRankDatasetHardNeg,
                                            ItmRankDatasetHardNegFromImage,
                                            ItmRankDatasetHardNegFromText)
from lightningdot_tpu.data.synth import make_synth_dataset
from lightningdot_tpu.data.txt_db import TxtTokDb
from lightningdot_tpu.models.checkpoint_torch import map_cross_encoder_fast
from lightningdot_tpu.models.cross_encoder import (CrossEncoder,
                                                   CrossEncoderFast,
                                                   CrossEncoderHardNeg)
from lightningdot_tpu.training.hn_teacher import get_hard_negs
from tests.test_encoder_parity import SMALL, TorchUniterImageEmbeddings

CFG = EncoderConfig(**SMALL, img_dim=16, num_hidden_layers_img=1,
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)


def _group_batch(rng, n, tl=8, nr=5, shared="t"):
    """One candidate group, gt at index 0 (FromText/FromImage layout)."""
    n_txt = 1 if shared == "t" else n
    n_img = n if shared == "t" else 1
    return {
        "input_ids": jnp.asarray(
            rng.integers(1, CFG.vocab_size, (n_txt, tl)), jnp.int32),
        "position_ids": jnp.broadcast_to(jnp.arange(tl, dtype=jnp.int32),
                                         (1, tl)),
        "img_feat": jnp.asarray(
            rng.standard_normal((n_img, nr, 16)), jnp.float32),
        "img_pos_feat": jnp.asarray(rng.random((n_img, nr, 7)), jnp.float32),
        "attn_masks": jnp.ones((n, tl + nr), jnp.int32),
    }


@pytest.mark.parametrize("sample_from", ["t", "i"])
def test_self_mining_selects_top_candidates(rng, sample_from):
    """Mined loss == base triplet loss on [gt + top-hard_size negatives]."""
    n, hard_size = 9, 3
    model = CrossEncoderHardNeg(CFG, hard_size=hard_size)
    params = model.init(jax.random.PRNGKey(0))
    batch = _group_batch(rng, n, shared=sample_from)

    # deterministic=False triggers mining, but with all dropout probs 0 the
    # training forward is numerically the eval forward
    mined_loss = model.apply(params, batch, compute_loss=True,
                             deterministic=False,
                             rng=jax.random.PRNGKey(1),
                             sample_from=sample_from)

    # manual mining with the base model
    base = CrossEncoder(CFG)
    full = dict(batch)
    if sample_from == "t":
        full["input_ids"] = jnp.broadcast_to(
            full["input_ids"], (n,) + full["input_ids"].shape[1:])
    else:
        full["img_feat"] = jnp.broadcast_to(
            full["img_feat"], (n,) + full["img_feat"].shape[1:])
        full["img_pos_feat"] = jnp.broadcast_to(
            full["img_pos_feat"], (n,) + full["img_pos_feat"].shape[1:])
    full["position_ids"] = jnp.broadcast_to(
        full["position_ids"], (n, full["position_ids"].shape[-1]))
    scores = np.asarray(base.rank_scores(params, full))[:, 0]
    top = np.argsort(-scores[1:])[:hard_size] + 1
    idx = np.concatenate([[0], np.sort(top)])
    hard = {k: jnp.asarray(np.asarray(v)[idx]) for k, v in full.items()}
    want = base.apply(params, hard, compute_loss=True,
                      sample_size=hard_size + 1)

    np.testing.assert_allclose(np.sort(np.asarray(mined_loss), axis=None),
                               np.sort(np.asarray(want), axis=None),
                               atol=1e-5)


def test_fast_matches_torch_golden(rng):
    """CrossEncoderFast == torch two-stream cosine (itm.py:166-183)."""
    from transformers import BertConfig, BertModel

    torch.manual_seed(3)
    bert = BertModel(BertConfig(hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0, **SMALL))
    img_cfg_t = dict(SMALL)
    img_cfg_t["num_hidden_layers"] = 1
    img_bert = BertModel(BertConfig(hidden_dropout_prob=0.0,
                                    attention_probs_dropout_prob=0.0,
                                    **img_cfg_t))
    img_emb_t = TorchUniterImageEmbeddings(SMALL["hidden_size"], img_dim=16)
    img_emb_i = TorchUniterImageEmbeddings(SMALL["hidden_size"], img_dim=16)
    for m in (bert, img_bert, img_emb_t, img_emb_i):
        m.eval()

    sd = {f"bert.{k}": v for k, v in bert.state_dict().items()}
    sd.update({f"bert.img_embeddings.{k}": v
               for k, v in img_emb_t.state_dict().items()})
    sd.update({f"img_bert.{k}": v for k, v in img_bert.state_dict().items()})
    sd.update({f"img_bert.img_embeddings.{k}": v
               for k, v in img_emb_i.state_dict().items()})
    params = map_cross_encoder_fast(sd, num_layers=2, num_layers_img=1)

    n, tl, nr = 4, 9, 6
    ids = rng.integers(1, SMALL["vocab_size"], (n, tl))
    feat = rng.standard_normal((n, nr, 16)).astype(np.float32)
    pos = rng.random((n, nr, 7)).astype(np.float32)
    tmask = np.ones((n, tl), np.int32)
    imask = np.ones((n, nr), np.int32)
    imask[2, 4:] = 0

    with torch.no_grad():
        tout = bert(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(tmask).long(),
                    position_ids=torch.arange(tl)[None].expand(n, tl),
                    token_type_ids=None).last_hidden_state
        pooled_t = torch.tanh(bert.pooler.dense(tout[:, 0]))

        type1 = img_bert.embeddings.token_type_embeddings(
            torch.ones(n, nr, dtype=torch.long))
        iemb = img_emb_i(torch.from_numpy(feat), torch.from_numpy(pos), type1)
        ext = (1.0 - torch.from_numpy(imask).float()
               )[:, None, None, :] * -10000.0
        hidden = iemb
        for layer in img_bert.encoder.layer:
            hidden = layer(hidden, attention_mask=ext)[0]
        pooled_i = torch.tanh(img_bert.pooler.dense(hidden[:, 0]))
        want = torch.nn.CosineSimilarity()(pooled_t, pooled_i).numpy()

    model = CrossEncoderFast(CFG)
    batch = {
        "input_ids": jnp.asarray(ids), "position_ids": jnp.broadcast_to(
            jnp.arange(tl, dtype=jnp.int32), (1, tl)),
        "img_feat": jnp.asarray(feat), "img_pos_feat": jnp.asarray(pos),
        "attn_masks_text": jnp.asarray(tmask),
        "attn_masks_img": jnp.asarray(imask),
    }
    got = np.asarray(model.rank_scores(params, batch))
    np.testing.assert_allclose(got, want, atol=3e-4)

    # triplet loss shape over groups
    loss = model.apply(params, batch, compute_loss=True, sample_size=4)
    assert loss.shape == (1, 3)


@pytest.fixture(scope="module")
def synth_dbs(tmp_path_factory):
    root = tmp_path_factory.mktemp("hn_dbs")
    txt_dir, img_dir = make_synth_dataset(str(root), n_imgs=10,
                                          txts_per_img=2, img_dim=16,
                                          min_bb=4, max_bb=8,
                                          max_txt_len=16, seed=11)
    txt_db = TxtTokDb(txt_dir, 16)
    img_db = DetectFeatDb(img_dir, 0.2, 8, 4, 6)
    return txt_db, img_db


def test_hardneg_dataset_pool_excludes_gt(synth_dbs):
    txt_db, img_db = synth_dbs
    ds = ItmHardNegDataset(txt_db, img_db, mini_batch_size=6, seed=0)
    item = ds[0]
    gt_img = ds.txt2img[item["gt_txt_id"]]
    assert gt_img not in item["neg_img_ids"]
    assert len(item["neg_img_ids"]) == 6
    assert item["img_feat"].shape[0] == 6
    # static bucket shapes
    from lightningdot_tpu import const
    assert item["img_feat"].shape[1] in const.IMG_LEN_BUCKETS
    assert item["input_ids"].shape[1] in const.TXT_LEN_BUCKETS


def test_get_hard_negs_topk(synth_dbs):
    """Miner keeps exactly the top-k scored candidates per text/image."""
    txt_db, img_db = synth_dbs
    ds = ItmHardNegDataset(txt_db, img_db, mini_batch_size=6, seed=1)
    items = [ds[i] for i in range(len(ds))]

    def score_fn(batch):
        # deterministic synthetic scores: hash of image id
        return np.asarray([hash(im) % 97 for im in batch["neg_img_ids"]],
                          np.float32)

    txt2hard, img2hard = get_hard_negs(score_fn, items, hard_negative_num=3)
    assert len(txt2hard) == len(ds)
    it = items[0]
    want = sorted(it["neg_img_ids"],
                  key=lambda im: -(hash(im) % 97))[:3]
    assert sorted(txt2hard[it["gt_txt_id"]]) == sorted(want)
    # every image map entry holds txts that actually scored it
    for img, txts in img2hard.items():
        assert 1 <= len(txts) <= 3


def test_rank_dataset_hardneg_group_layout(synth_dbs, tmp_path):
    txt_db, img_db = synth_dbs
    ds = ItmRankDatasetHardNeg(txt_db, img_db, neg_sample_size=1,
                               hard_neg_size=2, seed=0)
    # fabricate mined maps: every text/image lists 3 candidates
    all_imgs = ds.img_name_list
    all_txts = list(ds.ids)
    t2i = {t: [im for im in all_imgs if im != ds.txt2img[t]][:3]
           for t in all_txts}
    i2t = {im: [t for t in all_txts if ds.txt2img[t] != im][:3]
           for im in all_imgs}
    with open(tmp_path / "txt2hardimgs_rank0.json", "w") as f:
        json.dump(t2i, f)
    with open(tmp_path / "img2hardtxts.json", "w") as f:
        json.dump(i2t, f)
    ds.reload_hard_negs(str(tmp_path))

    group = ds[0]
    # 1 gt + 2 hard img + 2 hard txt + 1 rand img + 1 rand txt
    assert len(group) == 1 + 2 * 2 + 2 * 1
    assert all("input_ids" in p and "img_feat" in p for p in group)


def test_from_text_from_image_groups(synth_dbs):
    txt_db, img_db = synth_dbs
    ds_t = ItmRankDatasetHardNegFromText(txt_db, img_db, neg_sample_size=4,
                                         seed=0)
    g = ds_t[1]
    assert g["input_ids"].shape[0] == 1          # shared text
    assert g["img_feat"].shape[0] == 5           # gt + 4 negs
    assert g["attn_masks"].shape[0] == 5
    assert g["sample_size"] == 5

    ds_i = ItmRankDatasetHardNegFromImage(txt_db, img_db, neg_sample_size=4,
                                          seed=0)
    g = ds_i[1]
    assert g["img_feat"].shape[0] == 1           # shared image
    assert g["input_ids"].shape[0] == 5
    assert g["sample_size"] == 5


def _write_cfg(path):
    with open(path, "w") as f:
        json.dump({"vocab_size": 28996, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_hidden_layers_img": 1,
                   "num_attention_heads": 4, "intermediate_size": 64,
                   "max_position_embeddings": 64, "img_dim": 16,
                   "hidden_dropout_prob": 0.0,
                   "attention_probs_dropout_prob": 0.0}, f)
    return str(path)


def test_train_teacher_self_mining(tmp_path_factory):
    root = tmp_path_factory.mktemp("sm")
    txt_dir, img_dir = make_synth_dataset(str(root), n_imgs=8, txts_per_img=2,
                                          img_dim=16, min_bb=4, max_bb=8,
                                          max_txt_len=16, seed=5)
    cfg_path = _write_cfg(tmp_path_factory.mktemp("cfg") / "small.json")
    out = str(tmp_path_factory.mktemp("sm_out"))

    from lightningdot_tpu.cli.train_teacher import main

    results, _ = main([
        "--model_config", cfg_path,
        "--train_txt_db", txt_dir, "--train_img_db", img_dir,
        "--output_dir", out, "--self_mining",
        "--neg_sample_size", "5", "--self_mining_hard_size", "2",
        "--learning_rate", "1e-3", "--num_train_steps", "8",
        "--warmup_steps", "2", "--valid_steps", "4",
        "--max_bb", "8", "--min_bb", "4", "--compute_dtype", "f32"])
    assert np.isfinite(results["final_loss"])


def test_train_teacher_mined_hard_negs(tmp_path_factory):
    root = tmp_path_factory.mktemp("mined")
    txt_dir, img_dir = make_synth_dataset(str(root), n_imgs=8, txts_per_img=2,
                                          img_dim=16, min_bb=4, max_bb=8,
                                          max_txt_len=16, seed=6)
    cfg_path = _write_cfg(tmp_path_factory.mktemp("cfg2") / "small.json")
    out = str(tmp_path_factory.mktemp("mined_out"))

    from lightningdot_tpu.cli.train_teacher import main

    results, _ = main([
        "--model_config", cfg_path,
        "--train_txt_db", txt_dir, "--train_img_db", img_dir,
        "--output_dir", out,
        "--neg_sample_size", "1", "--hard_neg_size", "1",
        "--hard_neg_pool_size", "3", "--inf_minibatch_size", "4",
        "--steps_per_hard_neg", "4", "--train_batch_size", "2",
        "--learning_rate", "1e-3", "--num_train_steps", "8",
        "--warmup_steps", "2", "--valid_steps", "4",
        "--max_bb", "8", "--min_bb", "4", "--compute_dtype", "f32"])
    assert np.isfinite(results["final_loss"])
    import os
    assert os.path.exists(os.path.join(out, "results_train",
                                       "txt2hardimgs_rank0.json"))


def test_train_teacher_fast_variant(tmp_path_factory):
    root = tmp_path_factory.mktemp("fastv")
    txt_dir, img_dir = make_synth_dataset(str(root), n_imgs=8, txts_per_img=2,
                                          img_dim=16, min_bb=4, max_bb=8,
                                          max_txt_len=16, seed=7)
    cfg_path = _write_cfg(tmp_path_factory.mktemp("cfg3") / "small.json")
    out = str(tmp_path_factory.mktemp("fast_out"))

    from lightningdot_tpu.cli.train_teacher import main

    results, _ = main([
        "--model_config", cfg_path, "--model_variant", "fast",
        "--train_txt_db", txt_dir, "--train_img_db", img_dir,
        "--output_dir", out,
        "--neg_sample_size", "1", "--train_batch_size", "4",
        "--learning_rate", "1e-3", "--num_train_steps", "8",
        "--warmup_steps", "2", "--valid_steps", "4",
        "--max_bb", "8", "--min_bb", "4", "--compute_dtype", "f32"])
    assert np.isfinite(results["final_loss"])


def test_rank_dataset_hardneg_tolerates_short_mined_lists(synth_dbs,
                                                          tmp_path):
    """The miner legitimately emits short/missing lists (an image may land
    in fewer than hard_neg_size pools); groups must keep their static width
    by topping up with random negatives instead of crashing."""
    txt_db, img_db = synth_dbs
    ds = ItmRankDatasetHardNeg(txt_db, img_db, neg_sample_size=1,
                               hard_neg_size=3, seed=0)
    # short list for text 0's gt, missing entries for everything else
    t0 = ds.ids[0]
    gt_img = ds.txt2img[t0]
    t2i = {t0: [im for im in ds.img_name_list if im != gt_img][:1]}
    i2t = {}
    with open(tmp_path / "txt2hardimgs_rank0.json", "w") as f:
        json.dump(t2i, f)
    with open(tmp_path / "img2hardtxts.json", "w") as f:
        json.dump(i2t, f)
    ds.reload_hard_negs(str(tmp_path))

    group = ds[0]
    assert len(group) == 1 + 2 * 3 + 2 * 1  # static width preserved
