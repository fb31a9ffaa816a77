"""Teacher (cross-encoder) training: triplet loss falls; the saved teacher
dir feeds straight into the KD fine-tune and the re-ranker."""
import json
import os

import numpy as np
import pytest

from lightningdot_tpu.data.synth import make_synth_dataset


def test_teacher_train_then_kd_and_rerank(tmp_path_factory):
    root = tmp_path_factory.mktemp("teach")
    txt_dir, img_dir = make_synth_dataset(str(root), n_imgs=8, txts_per_img=2,
                                          img_dim=32, min_bb=5, max_bb=10,
                                          max_txt_len=20, seed=4)
    cfg_path = str(tmp_path_factory.mktemp("cfg") / "small.json")
    with open(cfg_path, "w") as f:
        json.dump({"vocab_size": 28996, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "intermediate_size": 64, "max_position_embeddings": 64,
                   "img_dim": 32, "hidden_dropout_prob": 0.0,
                   "attention_probs_dropout_prob": 0.0}, f)
    teacher_dir = str(tmp_path_factory.mktemp("teacher_out"))

    from lightningdot_tpu.cli.train_teacher import main as teach_main

    results, state = teach_main([
        "--model_config", cfg_path,
        "--train_txt_db", txt_dir, "--train_img_db", img_dir,
        "--output_dir", teacher_dir,
        "--neg_sample_size", "1",
        "--train_batch_size", "4",
        "--learning_rate", "1e-3",
        "--num_train_steps", "12", "--warmup_steps", "2",
        "--valid_steps", "6",
        "--max_bb", "10", "--min_bb", "5",
        "--compute_dtype", "f32"])
    assert np.isfinite(results["final_loss"])
    assert os.path.exists(os.path.join(teacher_dir, "config.json"))
    assert os.path.exists(os.path.join(teacher_dir, "model.npz"))

    # KD fine-tune consumes the saved teacher directly
    from lightningdot_tpu.cli.train_itm import main as ft_main

    out_dir = str(tmp_path_factory.mktemp("kd_out"))
    ft_results, _ = ft_main([
        "--txt_model_config", cfg_path, "--img_model_config", cfg_path,
        "--train_txt_dbs", txt_dir, "--train_img_dbs", img_dir,
        "--val_txt_db", txt_dir, "--val_img_db", img_dir,
        "--train_batch_size", "16", "--valid_batch_size", "16",
        "--num_train_epochs", "1", "--learning_rate", "1e-3",
        "--max_bb", "10", "--min_bb", "5", "--num_bb", "10",
        "--max_txt_len", "30", "--compute_dtype", "f32",
        "--inf_minibatch_size", "16", "--output_dir", out_dir,
        "--teacher_checkpoint", teacher_dir,
        "--kd_loss_weight", "0.5", "--T", "2.0",
        "--log_result_step", "1"])
    assert np.isfinite(ft_results["best_val_recall_mean"])

    # re-ranker consumes the same teacher for live stage-2 scoring
    from lightningdot_tpu.cli.rerank import main as rerank_main

    rr = rerank_main([
        "--txt_model_config", cfg_path, "--img_model_config", cfg_path,
        "--test_txt_db", txt_dir, "--test_img_db", img_dir,
        "--valid_batch_size", "8", "--inf_minibatch_size", "8",
        "--max_bb", "10", "--min_bb", "5", "--compute_dtype", "f32",
        "--teacher_checkpoint", teacher_dir])
    assert "rerank_img_top10" in rr


def test_teacher_preemption_saves_directory(tmp_path_factory):
    """A (simulated) SIGTERM mid-run still writes the consumable teacher
    directory (config.json + model) before exiting."""
    root = tmp_path_factory.mktemp("teach_pre")
    txt_dir, img_dir = make_synth_dataset(str(root), n_imgs=8, txts_per_img=2,
                                          img_dim=32, min_bb=5, max_bb=10,
                                          max_txt_len=20, seed=4)
    cfg_path = str(tmp_path_factory.mktemp("cfgp") / "small.json")
    with open(cfg_path, "w") as f:
        json.dump({"vocab_size": 28996, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "intermediate_size": 64, "max_position_embeddings": 64,
                   "img_dim": 32, "hidden_dropout_prob": 0.0,
                   "attention_probs_dropout_prob": 0.0}, f)
    teacher_dir = str(tmp_path_factory.mktemp("teacher_pre_out"))

    from lightningdot_tpu.cli.train_teacher import main as teach_main

    results, state = teach_main([
        "--model_config", cfg_path,
        "--train_txt_db", txt_dir, "--train_img_db", img_dir,
        "--output_dir", teacher_dir,
        "--neg_sample_size", "1",
        "--train_batch_size", "4",
        "--num_train_steps", "1000", "--warmup_steps", "2",
        "--valid_steps", "500",
        "--max_bb", "10", "--min_bb", "5",
        "--compute_dtype", "f32",
        "--sim_preempt_step", "3"])
    assert os.path.exists(os.path.join(teacher_dir, "config.json"))
    assert os.path.exists(os.path.join(teacher_dir, "model.npz"))
