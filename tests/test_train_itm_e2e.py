"""Full fine-tune driver e2e on synthetic data: overfit a tiny model and
check retrieval recall rises well above chance; exercise hard-negative
mining and checkpointing."""
import json
import os

import numpy as np
import pytest

from lightningdot_tpu.data.synth import make_synth_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("ft")
    txt_dir, img_dir = make_synth_dataset(
        str(root), n_imgs=8, txts_per_img=2, img_dim=32, min_bb=5,
        max_bb=10, max_txt_len=20, seed=1)
    return txt_dir, img_dir


def small_cfg_file(tmp_path_factory):
    d = {"vocab_size": 28996, "hidden_size": 32, "num_hidden_layers": 2,
         "num_attention_heads": 4, "intermediate_size": 64,
         "max_position_embeddings": 64, "img_dim": 32,
         "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0}
    p = tmp_path_factory.mktemp("cfg") / "small.json"
    p.write_text(json.dumps(d))
    return str(p)


def test_train_itm_overfit(synth, tmp_path_factory):
    txt_dir, img_dir = synth
    cfg = small_cfg_file(tmp_path_factory)
    out_dir = str(tmp_path_factory.mktemp("out"))
    from lightningdot_tpu.cli.train_itm import main

    results, state = main([
        "--txt_model_config", cfg,
        "--img_model_config", cfg,
        "--train_txt_dbs", txt_dir,   # overridden below to list
        "--train_img_dbs", img_dir,
        "--val_txt_db", txt_dir,
        "--val_img_db", img_dir,
        "--test_txt_db", txt_dir,
        "--test_img_db", img_dir,
        "--train_batch_size", "16",
        "--valid_batch_size", "16",
        "--num_train_epochs", "4",
        "--learning_rate", "2e-3",
        "--max_bb", "10", "--min_bb", "5", "--num_bb", "10",
        "--max_txt_len", "30",
        "--compute_dtype", "f32",
        "--inf_minibatch_size", "16",
        "--output_dir", out_dir,
        "--log_result_step", "1",
    ])
    # trained on == evaluated on: should be far above chance (1/8 = 0.125)
    assert results["best_val_recall_mean"] > 0.5, results
    assert os.path.exists(os.path.join(out_dir, "biencoder.best.npz"))
    assert os.path.exists(os.path.join(out_dir, "biencoder.last.json"))
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))


def test_train_itm_with_hard_negatives(synth, tmp_path_factory):
    txt_dir, img_dir = synth
    cfg = small_cfg_file(tmp_path_factory)
    out_dir = str(tmp_path_factory.mktemp("out_hn"))
    from lightningdot_tpu.cli.train_itm import main

    results, state = main([
        "--txt_model_config", cfg,
        "--img_model_config", cfg,
        "--train_txt_dbs", txt_dir,
        "--train_img_dbs", img_dir,
        "--val_txt_db", txt_dir,
        "--val_img_db", img_dir,
        "--train_batch_size", "8",
        "--valid_batch_size", "8",
        "--num_train_epochs", "2",
        "--learning_rate", "1e-3",
        "--max_bb", "10", "--min_bb", "5", "--num_bb", "10",
        "--max_txt_len", "30",
        "--compute_dtype", "f32",
        "--inf_minibatch_size", "8",
        "--output_dir", out_dir,
        "--num_hard_negatives", "1",
        "--sample_init_hard_negatives",
        "--log_result_step", "2",
    ])
    assert np.isfinite(results["best_val_recall_mean"])


def test_train_itm_bf16_optstate_and_workers(synth, tmp_path_factory):
    """The --optim_state_dtype bfloat16 (FusedAdamW) and --loader_workers
    paths drive the full fine-tune loop end to end and still learn."""
    txt_dir, img_dir = synth
    cfg = small_cfg_file(tmp_path_factory)
    out_dir = str(tmp_path_factory.mktemp("out_bf16"))
    from lightningdot_tpu.cli.train_itm import main

    results, state = main([
        "--txt_model_config", cfg,
        "--img_model_config", cfg,
        "--train_txt_dbs", txt_dir,
        "--train_img_dbs", img_dir,
        "--val_txt_db", txt_dir,
        "--val_img_db", img_dir,
        "--test_txt_db", txt_dir,
        "--test_img_db", img_dir,
        "--train_batch_size", "16",
        "--valid_batch_size", "16",
        "--num_train_epochs", "4",
        "--learning_rate", "2e-3",
        "--max_bb", "10", "--min_bb", "5", "--num_bb", "10",
        "--max_txt_len", "30",
        "--compute_dtype", "f32",
        "--inf_minibatch_size", "16",
        "--output_dir", out_dir,
        "--log_result_step", "1",
        "--optim_state_dtype", "bfloat16",
        "--loader_workers", "2",
    ])
    assert results["best_val_recall_mean"] > 0.5, results
    # FusedAdamW state: bf16 first moment, f32 second moment
    import jax
    import jax.numpy as jnp
    from lightningdot_tpu.training.optim import FusedAdamWState
    opt = state.opt_state
    assert isinstance(opt, FusedAdamWState)
    leaves_mu = jax.tree.leaves(opt.mu)
    leaves_nu = jax.tree.leaves(opt.nu)
    assert all(x.dtype == jnp.bfloat16 for x in leaves_mu)
    assert all(x.dtype == jnp.float32 for x in leaves_nu)


def test_train_itm_preemption_snapshot(synth, tmp_path_factory):
    """A (simulated) SIGTERM mid-epoch saves biencoder.preempt and exits
    cleanly, skipping eval/re-mining/test in the grace window."""
    txt_dir, img_dir = synth
    cfg = small_cfg_file(tmp_path_factory)
    out_dir = str(tmp_path_factory.mktemp("out_pre"))
    from lightningdot_tpu.cli.train_itm import main

    results, state = main([
        "--txt_model_config", cfg,
        "--img_model_config", cfg,
        "--train_txt_dbs", txt_dir,
        "--train_img_dbs", img_dir,
        "--val_txt_db", txt_dir,
        "--val_img_db", img_dir,
        "--test_txt_db", txt_dir,
        "--test_img_db", img_dir,
        "--train_batch_size", "16",
        "--valid_batch_size", "16",
        "--num_train_epochs", "4",
        "--max_bb", "10", "--min_bb", "5", "--num_bb", "10",
        "--max_txt_len", "30",
        "--compute_dtype", "f32",
        "--inf_minibatch_size", "16",
        "--output_dir", out_dir,
        "--sim_preempt_step", "1",
    ])
    assert os.path.exists(os.path.join(out_dir, "biencoder.preempt.npz"))
    assert not os.path.exists(os.path.join(out_dir, "biencoder.last.npz"))
    assert "test" not in results  # grace window: no final test sweep
    # the snapshot is a loadable fine-tune checkpoint
    from lightningdot_tpu.training.checkpoints import load_checkpoint
    _model, _opt, meta = load_checkpoint(
        os.path.join(out_dir, "biencoder.preempt"),
        model_template=state.params)
    assert meta["step"] >= 1
