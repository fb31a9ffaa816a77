"""Pre-training pipeline: datasets/collates unit checks + full driver e2e
(multi-task mixing, validation, checkpoint + auto-resume)."""
import json
import os

import numpy as np
import pytest

from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.pretrain import (ItmPreDataset, MlmDataset,
                                            MrcDataset, MrfrDataset,
                                            PretrainCollateConfig,
                                            itm_pre_collate, mlm_collate,
                                            mrc_collate, mrfr_collate,
                                            random_word)
from lightningdot_tpu.data.synth import make_synth_dataset
from lightningdot_tpu.data.txt_db import TxtTokDb

CFG = PretrainCollateConfig(txt_buckets=(16, 32), img_buckets=(16,),
                            batch_pad=4, img_label_dim=7)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("pre")
    txt_dir, img_dir = make_synth_dataset(
        str(root), n_imgs=8, txts_per_img=2, img_dim=32, min_bb=5,
        max_bb=12, max_txt_len=20, with_soft_labels=True, n_labels=7,
        seed=2)
    return txt_dir, img_dir


@pytest.fixture(scope="module")
def dbs(synth):
    txt_dir, img_dir = synth
    return (TxtTokDb(txt_dir, max_txt_len=-1),
            DetectFeatDb(img_dir, conf_th=0.2, max_bb=12, min_bb=5))


def test_random_word_rules():
    import random as pyrandom

    rng = pyrandom.Random(0)
    n_masked = 0
    for _ in range(200):
        tokens = list(range(200, 220))
        out, labels = random_word(tokens, (106, 999), 103, rng)
        masked = [i for i, l in enumerate(labels) if l != -1]
        assert masked, "at least one mask required"
        n_masked += len(masked)
        for i, l in enumerate(labels):
            if l != -1:
                assert l == 200 + i  # label is the ORIGINAL token
    assert 0.10 < n_masked / (200 * 20) < 0.20  # ~15%


def test_mlm_collate_shapes(dbs):
    txt_db, img_db = dbs
    ds = MlmDataset(txt_db, img_db, seed=0)
    batch = mlm_collate([ds[i] for i in range(5)], CFG)
    assert batch["sample_size"] == 8 and batch["n_valid"] == 5
    assert batch["masked_positions"].shape == (8, CFG.max_masked_tokens)
    assert (batch["masked_weights"][5:] == 0).all()
    # positions point at genuinely masked slots
    w = batch["masked_weights"][0] > 0
    assert w.sum() >= 1


def test_mrfr_collate_zeroes_masked_features(dbs):
    txt_db, img_db = dbs
    ds = MrfrDataset(0.3, txt_db, img_db, seed=0)
    items = [ds[i] for i in range(4)]
    batch = mrfr_collate(items, CFG)
    masks = batch["imgs"]["img_masks"]
    assert (batch["imgs"]["img_feat"][masks.astype(bool)] == 0).all()
    # feat targets hold the ORIGINAL features at masked positions
    it = items[0]
    idx = np.nonzero(it["img_mask"])[0]
    np.testing.assert_allclose(batch["feat_targets"][0, :len(idx)],
                               it["img_feat"][idx], rtol=1e-6)
    # positions offset by +1 for the image CLS slot
    np.testing.assert_array_equal(
        batch["img_masked_positions"][0, :len(idx)], idx + 1)


def test_mrc_collate_soft_labels(dbs):
    txt_db, img_db = dbs
    ds = MrcDataset(0.3, txt_db, img_db, seed=0)
    batch = mrc_collate([ds[i] for i in range(4)], CFG)
    assert batch["label_targets"].shape[-1] == 7
    w = batch["img_masked_weights"][0] > 0
    assert abs(batch["label_targets"][0][w].sum(-1) - 1).max() < 1e-5


def test_itm_pre_negative_sampling(dbs):
    txt_db, img_db = dbs
    ds = ItmPreDataset(txt_db, img_db, neg_sample_p=0.5, seed=0)
    labels = [ds[i]["target"] for i in range(len(ds))]
    assert 0 < sum(labels) < len(labels)  # mix of pos and neg
    # negatives point at a different image than the ground truth
    for i in range(len(ds)):
        if ds.labels[i] == 0:
            assert ds.train_imgs[i] != txt_db[ds.ids[i]]["img_fname"]
    batch = itm_pre_collate([ds[i] for i in range(6)], CFG)
    assert batch["targets"].shape == (8,)
    assert batch["weights"].sum() == 6


def _write_pretrain_config(tmp_path, txt_dir, img_dir, model_cfg, out_dir):
    cfg = {
        "txt_model_type": "bert-base",
        "txt_model_config": model_cfg,
        "img_model_type": "uniter-base",
        "img_model_config": model_cfg,
        "model_config": model_cfg,
        "output_dir": out_dir,
        "project_dim": 0,
        "mrm_prob": 0.3,
        "itm_neg_prob": 0.5,
        "itm_ot_lambda": 0.0,
        "max_txt_len": 30,
        "conf_th": 0.2, "max_bb": 12, "min_bb": 5, "num_bb": 10,
        "train_batch_size": 256,
        "val_batch_size": 256,
        "gradient_accumulation_steps": 2,
        "learning_rate": 1e-4,
        "valid_steps": 6,
        "num_train_steps": 6,
        "optim": "adamw", "betas": [0.9, 0.98], "decay": "linear",
        "dropout": 0.0, "weight_decay": 0.01, "grad_norm": 5.0,
        "warmup_steps": 2, "seed": 7,
        "img_label_dim": 7,
        "train_datasets": [{
            "name": "synth", "db": [txt_dir], "img": [img_dir],
            "tasks": ["mlm", "mrfr", "mrc", "itm"],
            "mix_ratio": [2, 1, 1, 1],
        }],
        "val_datasets": [{
            "name": "synth", "db": [txt_dir], "img": [img_dir],
            "tasks": ["mlm", "itm"], "mix_ratio": [1, 1],
        }],
    }
    p = tmp_path / "pretrain_cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_pretrain_driver_and_resume(synth, tmp_path_factory):
    txt_dir, img_dir = synth
    model_cfg_path = str(tmp_path_factory.mktemp("mc") / "model.json")
    with open(model_cfg_path, "w") as f:
        json.dump({"vocab_size": 28996, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "intermediate_size": 64, "max_position_embeddings": 64,
                   "img_dim": 32}, f)
    out_dir = str(tmp_path_factory.mktemp("pretrain_out"))
    cfg_path = _write_pretrain_config(tmp_path_factory.mktemp("cfgs"),
                                      txt_dir, img_dir, model_cfg_path,
                                      out_dir)
    from lightningdot_tpu.cli.pretrain import main

    results, state = main(["--config", cfg_path, "--compute_dtype", "f32"])
    for task, metrics in results.items():
        assert np.isfinite(metrics["loss"]), (task, metrics)
    assert os.path.exists(os.path.join(out_dir, "ckpt", "model_step_6.npz"))
    assert int(state.step) == 12  # 6 updates x 2 accum micro-steps

    # resume: runs 4 more steps from the saved checkpoint
    results2, state2 = main(["--config", cfg_path, "--compute_dtype", "f32",
                             "--num_train_steps", "10"])
    assert os.path.exists(os.path.join(out_dir, "ckpt", "model_step_10.npz"))


def _pretrain_cfg(synth, tmp_path_factory):
    txt_dir, img_dir = synth
    model_cfg_path = str(tmp_path_factory.mktemp("mc") / "model.json")
    with open(model_cfg_path, "w") as f:
        json.dump({"vocab_size": 28996, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "intermediate_size": 64, "max_position_embeddings": 64,
                   "img_dim": 32}, f)
    out_dir = str(tmp_path_factory.mktemp("preempt_out"))
    cfg_path = _write_pretrain_config(tmp_path_factory.mktemp("cfgs2"),
                                      txt_dir, img_dir, model_cfg_path,
                                      out_dir)
    return cfg_path, out_dir


def test_pretrain_preemption_checkpoint_and_resume(synth, tmp_path_factory):
    """Fault injection: a simulated SIGTERM at step 2 checkpoints and exits
    cleanly; re-running the same command resumes from that step."""
    cfg_path, out_dir = _pretrain_cfg(synth, tmp_path_factory)
    from lightningdot_tpu.cli.pretrain import main

    _, state = main(["--config", cfg_path, "--compute_dtype", "f32",
                     "--sim_preempt_step", "2"])
    assert os.path.exists(os.path.join(out_dir, "ckpt", "model_step_2.npz"))
    assert int(state.step) == 4          # 2 updates x 2 accum micro-steps
    assert not os.path.exists(
        os.path.join(out_dir, "ckpt", "model_step_6.npz"))

    # auto-resume completes the run
    _, state2 = main(["--config", cfg_path, "--compute_dtype", "f32"])
    assert os.path.exists(os.path.join(out_dir, "ckpt", "model_step_6.npz"))
    assert int(state2.step) == 12


def test_pretrain_real_sigterm(synth, tmp_path_factory):
    """A genuine SIGTERM mid-run lands a checkpoint and exits cleanly."""
    import signal
    import threading
    import time

    cfg_path, out_dir = _pretrain_cfg(synth, tmp_path_factory)
    from lightningdot_tpu.cli.pretrain import main

    timer = threading.Timer(
        0.5, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        t0 = time.time()
        _, state = main(["--config", cfg_path, "--compute_dtype", "f32",
                         "--num_train_steps", "100000",
                         "--valid_steps", "100000"])
    finally:
        timer.cancel()
    steps = int(state.step) // 2
    assert 1 <= steps < 100000
    assert os.path.exists(
        os.path.join(out_dir, "ckpt", f"model_step_{steps}.npz"))
    assert time.time() - t0 < 120
