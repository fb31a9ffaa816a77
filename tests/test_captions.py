"""Caption-blending path: img_meta captions through dataset/collate/loss
(dvl/data/itm.py:111-118, BiEncoderNllLoss caption blending)."""
import json

import numpy as np
import pytest

from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.itm import (CollateConfig, ItmFastDataset,
                                       itm_fast_collate)
from lightningdot_tpu.data.synth import make_synth_dataset
from lightningdot_tpu.data.txt_db import TxtTokDb


class FakeTokenizer:
    cls_token_id = 101
    sep_token_id = 102

    def encode(self, text, add_special_tokens=True):
        ids = [200 + (hash(w) % 100) for w in text.split()]
        if add_special_tokens:
            return [self.cls_token_id] + ids + [self.sep_token_id]
        return ids


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("cap")
    return make_synth_dataset(str(root), n_imgs=6, txts_per_img=2,
                              img_dim=32, min_bb=5, max_bb=10,
                              max_txt_len=20, seed=6)


def test_caption_ids_in_dataset_and_collate(synth):
    txt_dir, img_dir = synth
    txt_db = TxtTokDb(txt_dir, -1)
    img_db = DetectFeatDb(img_dir, conf_th=0.2, max_bb=10, min_bb=5)
    img_meta = {f"synth_{i:06d}.npz":
                {"caption_multiple": [f"a photo number {i}",
                                      f"another view of thing {i}"]}
                for i in range(6)}
    ds = ItmFastDataset(txt_db, img_db, img_meta=img_meta,
                        tokenizer=FakeTokenizer())
    ds.new_epoch()
    item = ds[0]
    cap = item["img"]["caption_ids"]
    # [CLS] + (cap tokens + [SEP]) per caption (itm.py:111-114)
    assert cap[0] == 101
    assert cap.count(102) == 2

    batch = itm_fast_collate([ds[i] for i in range(4)],
                             CollateConfig(txt_buckets=(16, 32),
                                           img_buckets=(16,),
                                           cap_buckets=(32,),
                                           fixed_batch=4))
    assert batch["caps"] is not None
    assert batch["caps"]["input_ids"].shape == (4, 32)
    assert (batch["caps"]["input_ids"][:, 0] == 101).all()


def test_train_with_caption_blending(synth, tmp_path_factory):
    """Full fine-tune with caption_score_weight > 0 and itm_global_file."""
    txt_dir, img_dir = synth
    cfg_path = str(tmp_path_factory.mktemp("cfg") / "small.json")
    with open(cfg_path, "w") as f:
        json.dump({"vocab_size": 28996, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "intermediate_size": 64, "max_position_embeddings": 64,
                   "img_dim": 32, "hidden_dropout_prob": 0.0,
                   "attention_probs_dropout_prob": 0.0}, f)
    meta_path = str(tmp_path_factory.mktemp("meta") / "img_meta.json")
    with open(meta_path, "w") as f:
        json.dump({f"synth_{i:06d}.npz":
                   {"caption_multiple": [f"caption {i} alpha",
                                         f"caption {i} beta"]}
                   for i in range(6)}, f)
    out_dir = str(tmp_path_factory.mktemp("capout"))

    import lightningdot_tpu.cli.train_itm as ti

    # the reference builds a real BertTokenizer (needs network); inject ours
    from unittest import mock

    with mock.patch("transformers.BertTokenizer") as MockTok:
        MockTok.from_pretrained.return_value = FakeTokenizer()
        results, state = ti.main([
            "--txt_model_config", cfg_path, "--img_model_config", cfg_path,
            "--train_txt_dbs", txt_dir, "--train_img_dbs", img_dir,
            "--val_txt_db", txt_dir, "--val_img_db", img_dir,
            "--train_batch_size", "12", "--valid_batch_size", "12",
            "--num_train_epochs", "1", "--learning_rate", "1e-3",
            "--max_bb", "10", "--min_bb", "5", "--num_bb", "10",
            "--max_txt_len", "30", "--compute_dtype", "f32",
            "--inf_minibatch_size", "12", "--output_dir", out_dir,
            "--itm_global_file", meta_path,
            "--caption_score_weight", "0.3",
            "--log_result_step", "1"])
    assert np.isfinite(results["best_val_recall_mean"])
