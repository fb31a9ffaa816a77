"""One-tower UNITER teacher + pre-training KD."""
import json
import os

import jax
import numpy as np
import pytest

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.pretrain import (MlmDataset, MrfrDataset,
                                            PretrainCollateConfig,
                                            _gather_index_uniter,
                                            mlm_collate, mrfr_collate)
from lightningdot_tpu.data.synth import make_synth_dataset
from lightningdot_tpu.data.txt_db import TxtTokDb
from lightningdot_tpu.models.uniter_pretrain import UniterForPretraining

CFG = PretrainCollateConfig(txt_buckets=(16, 32), img_buckets=(16,),
                            batch_pad=4, with_teacher=True)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("kdp")
    return make_synth_dataset(str(root), n_imgs=8, txts_per_img=2,
                              img_dim=32, min_bb=5, max_bb=12,
                              max_txt_len=20, with_soft_labels=True,
                              n_labels=7, seed=5)


def tiny_cfg():
    return EncoderConfig(vocab_size=28996, hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, max_position_embeddings=64,
                         img_dim=32, hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0)


def test_gather_index_uniter():
    gi = _gather_index_uniter([3, 5], [2, 1], L=6, out_size=10)
    # example 0: text 0..2, then regions at positions 3,4 -> indices 6,7
    np.testing.assert_array_equal(gi[0, :5], [0, 1, 2, 6, 7])
    # example 1: text 0..4, region at position 5 -> index 6
    np.testing.assert_array_equal(gi[1, :6], [0, 1, 2, 3, 4, 6])


def test_teacher_forwards(synth):
    txt_dir, img_dir = synth
    txt_db = TxtTokDb(txt_dir, -1)
    img_db = DetectFeatDb(img_dir, conf_th=0.2, max_bb=12, min_bb=5)
    teacher = UniterForPretraining(tiny_cfg(), img_label_dim=7)
    params = teacher.init(jax.random.PRNGKey(0))

    mlm_batch = mlm_collate([MlmDataset(txt_db, img_db, seed=0)[i]
                             for i in range(4)], CFG)
    nll, logits, w = teacher.forward_mlm(params, mlm_batch["teacher"])
    assert np.isfinite(np.asarray(nll)).all()
    assert logits.shape[-1] == 28996

    mrfr_batch = mrfr_collate([MrfrDataset(0.3, txt_db, img_db, seed=0)[i]
                               for i in range(4)], CFG)
    mse, pred, w = teacher.forward_mrfr(params, mrfr_batch["teacher"])
    assert pred.shape[-1] == 32
    assert np.isfinite(np.asarray(mse)).all()


def test_pretrain_with_kd(synth, tmp_path_factory):
    txt_dir, img_dir = synth
    model_cfg_path = str(tmp_path_factory.mktemp("mc") / "model.json")
    with open(model_cfg_path, "w") as f:
        json.dump({"vocab_size": 28996, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "intermediate_size": 64, "max_position_embeddings": 64,
                   "img_dim": 32, "hidden_dropout_prob": 0.0,
                   "attention_probs_dropout_prob": 0.0}, f)

    # save a native teacher dir
    from lightningdot_tpu.models.factory import resolve_encoder_config
    from lightningdot_tpu.training.checkpoints import save_checkpoint

    teacher_dir = str(tmp_path_factory.mktemp("kd_teacher"))
    teacher = UniterForPretraining(resolve_encoder_config(model_cfg_path),
                                   img_label_dim=7)
    save_checkpoint(os.path.join(teacher_dir, "model"),
                    model=teacher.init(jax.random.PRNGKey(1)))
    with open(os.path.join(teacher_dir, "config.json"), "w") as f:
        json.dump(resolve_encoder_config(model_cfg_path).to_dict(), f)

    out_dir = str(tmp_path_factory.mktemp("kd_pretrain_out"))
    cfg = {
        "txt_model_type": "bert-base", "txt_model_config": model_cfg_path,
        "img_model_type": "uniter-base", "img_model_config": model_cfg_path,
        "model_config": model_cfg_path, "output_dir": out_dir,
        "project_dim": 0, "mrm_prob": 0.3, "itm_neg_prob": 0.5,
        "itm_ot_lambda": 0.0, "max_txt_len": 30,
        "conf_th": 0.2, "max_bb": 12, "min_bb": 5, "num_bb": 10,
        "train_batch_size": 256, "val_batch_size": 256,
        "gradient_accumulation_steps": 1, "learning_rate": 1e-4,
        "valid_steps": 3, "num_train_steps": 3,
        "optim": "adamw", "betas": [0.9, 0.98], "decay": "linear",
        "dropout": 0.0, "weight_decay": 0.01, "grad_norm": 5.0,
        "warmup_steps": 1, "seed": 11, "img_label_dim": 7,
        "teacher_checkpoint": teacher_dir, "kd_loss_weight": 0.5, "T": 2.0,
        "train_datasets": [{"name": "synth", "db": [txt_dir],
                            "img": [img_dir],
                            "tasks": ["mlm", "mrfr", "mrc"],
                            "mix_ratio": [1, 1, 1]}],
        "val_datasets": [{"name": "synth", "db": [txt_dir],
                          "img": [img_dir], "tasks": ["mlm"],
                          "mix_ratio": [1]}],
    }
    cfg_path = str(tmp_path_factory.mktemp("kdcfg") / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    from lightningdot_tpu.cli.pretrain import main

    results, state = main(["--config", cfg_path, "--compute_dtype", "f32"])
    assert np.isfinite(results["mlm_synth"]["loss"])
