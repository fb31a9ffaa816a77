"""VQA data path: target scatter vs torch golden, collate static shapes,
eval collate joint format, and a tiny end-to-end overfit through the
train_vqa driver (VERDICT r2 item 4; parity dvl/data/vqa.py:11-145)."""
import json

import numpy as np
import pytest

from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.synth import make_synth_dataset
from lightningdot_tpu.data.txt_db import TxtTokDb
from lightningdot_tpu.data.vqa import (VqaCollateConfig, VqaDataset,
                                       VqaEvalDataset, vqa_collate,
                                       vqa_eval_collate, vqa_target)

N_ANSWERS = 12


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("vqa")
    txt_dir, img_dir = make_synth_dataset(
        str(root), n_imgs=8, txts_per_img=2, img_dim=32, min_bb=5,
        max_bb=10, max_txt_len=20, seed=3, vqa_answers=N_ANSWERS)
    return txt_dir, img_dir


@pytest.fixture(scope="module")
def dbs(synth):
    txt_dir, img_dir = synth
    return (TxtTokDb(txt_dir, -1),
            DetectFeatDb(img_dir, conf_th=0.2, max_bb=10, min_bb=5,
                         num_bb=10))


def test_vqa_target_matches_torch_scatter():
    """dvl/data/vqa.py:11-17 golden: torch.zeros().scatter_."""
    import torch

    ex = {"target": {"labels": [3, 7, 1], "scores": [0.9, 0.3, 1.0]}}
    ours = vqa_target(ex, N_ANSWERS)
    ref = torch.zeros(N_ANSWERS)
    ref.scatter_(0, torch.tensor(ex["target"]["labels"]),
                 torch.tensor(ex["target"]["scores"]))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-6)
    # empty / missing target -> zeros (eval split without labels)
    assert vqa_target({}, N_ANSWERS).sum() == 0
    assert vqa_target({"target": {"labels": [], "scores": []}},
                      N_ANSWERS).sum() == 0


def test_vqa_collate_shapes_and_targets(dbs):
    txt_db, img_db = dbs
    ds = VqaDataset(N_ANSWERS, txt_db, img_db)
    assert len(ds) == 16
    assert len(ds.lens) == 16  # TokenBucketSampler key

    items = [ds[i] for i in range(6)]
    batch = vqa_collate(items, VqaCollateConfig(fixed_batch=8))
    # static bucket shapes
    assert batch["txts"]["input_ids"].shape == (8, 32)
    assert batch["txts"]["attention_mask"].shape == (8, 32)
    assert batch["imgs"]["img_feat"].shape == (8, 31, 32)
    assert batch["imgs"]["attention_mask"].shape == (8, 32)
    assert batch["imgs"]["input_ids"].shape == (8, 1)
    assert batch["targets"].shape == (8, N_ANSWERS)
    assert batch["n_valid"] == 6
    np.testing.assert_array_equal(batch["valid_mask"],
                                  [1, 1, 1, 1, 1, 1, 0, 0])
    # pad rows repeat the last real item
    np.testing.assert_array_equal(batch["targets"][7], batch["targets"][5])
    # each real row's target matches its example
    for i, it in enumerate(items):
        np.testing.assert_array_equal(batch["targets"][i], it["target"])
    assert len(batch["qids"]) == 6


def test_vqa_eval_collate_joint_format(dbs):
    txt_db, img_db = dbs
    ds = VqaEvalDataset(N_ANSWERS, txt_db, img_db)
    items = [ds[i] for i in range(4)]
    batch = vqa_eval_collate(items)
    L = batch["input_ids"].shape[1]
    R = batch["img_feat"].shape[1]
    assert batch["attn_masks_text"].shape == (4, L)
    assert batch["attn_masks_img"].shape == (4, R)
    assert batch["position_ids"].shape == (4, L)
    assert batch["targets"].shape == (4, N_ANSWERS)
    # unlabelled split -> targets None (vqa.py:124-127)
    for it in items:
        it["has_target"] = False
    assert vqa_eval_collate(items)["targets"] is None


def test_train_vqa_overfit(synth, tmp_path_factory):
    txt_dir, img_dir = synth
    cfg = {"vocab_size": 28996, "hidden_size": 32, "num_hidden_layers": 2,
           "num_attention_heads": 4, "intermediate_size": 64,
           "max_position_embeddings": 64, "img_dim": 32,
           "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0}
    p = tmp_path_factory.mktemp("cfg") / "small.json"
    p.write_text(json.dumps(cfg))
    out_dir = str(tmp_path_factory.mktemp("out_vqa"))
    from lightningdot_tpu.cli.train_vqa import main

    results, state = main([
        "--txt_model_config", str(p),
        "--img_model_config", str(p),
        "--train_txt_dbs", txt_dir,
        "--train_img_dbs", img_dir,
        "--val_txt_db", txt_dir,
        "--val_img_db", img_dir,
        "--num_answers", str(N_ANSWERS),
        "--train_batch_size", "8",
        "--valid_batch_size", "16",
        "--num_train_epochs", "80",
        "--learning_rate", "1e-3",
        "--vqa_lr_mul", "10.0",
        "--max_bb", "10", "--min_bb", "5", "--num_bb", "10",
        "--max_txt_len", "30",
        "--compute_dtype", "f32",
        "--output_dir", out_dir,
        "--log_result_step", "1",
    ])
    # trained on == evaluated on with soft targets: the argmax answer
    # should hit a positively-scored label well above the 1/12 chance rate
    assert results["best_val_acc"] > 0.5, results
    import os
    assert os.path.exists(os.path.join(out_dir, "vqa.best.npz"))
    assert os.path.exists(os.path.join(out_dir, "vqa.last.json"))


def test_train_vqa_preemption_checkpoints_and_exits(synth, tmp_path_factory):
    """Simulated preemption (fault injection, same contract as the other
    drivers): the epoch loop lands a vqa.last checkpoint and exits early."""
    txt_dir, img_dir = synth
    cfg = {"vocab_size": 28996, "hidden_size": 32, "num_hidden_layers": 2,
           "num_attention_heads": 4, "intermediate_size": 64,
           "max_position_embeddings": 64, "img_dim": 32}
    p = tmp_path_factory.mktemp("cfg_pre") / "small.json"
    p.write_text(json.dumps(cfg))
    out_dir = str(tmp_path_factory.mktemp("out_vqa_pre"))
    from lightningdot_tpu.cli.train_vqa import main

    results, state = main([
        "--txt_model_config", str(p),
        "--img_model_config", str(p),
        "--train_txt_dbs", txt_dir,
        "--train_img_dbs", img_dir,
        "--val_txt_db", txt_dir,
        "--val_img_db", img_dir,
        "--num_answers", str(N_ANSWERS),
        "--train_batch_size", "8",
        "--valid_batch_size", "16",
        "--num_train_epochs", "50",
        "--max_bb", "10", "--min_bb", "5", "--num_bb", "10",
        "--max_txt_len", "30",
        "--compute_dtype", "f32",
        "--output_dir", out_dir,
        "--sim_preempt_step", "2",
    ])
    import os

    import numpy as np

    # preempted at step 2 of epoch 0: the last-state snapshot exists, no
    # validation ran (results empty), and far fewer than 50 epochs of
    # steps were taken
    assert results == {}
    meta = json.load(open(os.path.join(out_dir, "vqa.last.json")))
    assert meta["step"] == 2 and meta["epoch"] == 0
    snap = np.load(os.path.join(out_dir, "vqa.last.npz"))
    assert len(snap.files) > 0


def test_vqa_step_fused_adamw(dbs):
    """make_vqa_train_step must take the FusedAdamW apply branch (it has
    no .update) — the perf path runs the VQA step under LDOT_OPT_STATE/
    LDOT_ADAMW_KERNEL env flags (scripts/perf_train_device_loop.py)."""
    import jax
    import jax.numpy as jnp

    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.models.bi_encoder import BiEncoder
    from lightningdot_tpu.models.vqa import BiEncoderForVQA
    from lightningdot_tpu.training.itm_step import create_train_state
    from lightningdot_tpu.training.optim import make_fused_adamw
    from lightningdot_tpu.training.vqa_step import make_vqa_train_step

    txt_db, img_db = dbs
    ds = VqaDataset(N_ANSWERS, txt_db, img_db)
    batch = vqa_collate([ds[i] for i in range(4)])
    cfg = EncoderConfig(vocab_size=28996, hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=4,
                        intermediate_size=64, max_position_embeddings=64,
                        img_dim=32)
    model = BiEncoderForVQA(
        bi_encoder=BiEncoder(cfg, cfg, compute_dtype=jnp.float32),
        hidden_size=cfg.out_size, num_answer=N_ANSWERS)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_fused_adamw(1e-3, max_grad_norm=2.0)
    step = make_vqa_train_step(model, tx)
    state = create_train_state(params, tx)
    mb = {"txts": batch["txts"], "imgs": batch["imgs"], "caps": None,
          "targets": jnp.asarray(batch["targets"]),
          "valid_mask": jnp.asarray(batch["valid_mask"])}
    state2, metrics = jax.jit(step)(state, mb, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    # params actually moved
    l0 = jax.tree.leaves(state.params)[0]
    l1 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
