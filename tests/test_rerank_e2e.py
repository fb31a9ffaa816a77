"""Two-stage retrieval: inf_itm score-matrix dump + rerank driver."""
import json
import os
import pickle

import numpy as np
import pytest

from lightningdot_tpu.data.synth import make_synth_dataset
from lightningdot_tpu.data.txt_db import TxtTokDb


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("rr")
    return make_synth_dataset(str(root), n_imgs=10, txts_per_img=2,
                              img_dim=32, min_bb=5, max_bb=10,
                              max_txt_len=20, seed=3)


def model_cfg_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "small.json"
    p.write_text(json.dumps({
        "vocab_size": 28996, "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 64, "img_dim": 32}))
    return str(p)


def test_inf_itm_and_rerank_with_score_file(synth, tmp_path_factory):
    txt_dir, img_dir = synth
    cfg = model_cfg_file(tmp_path_factory)
    out_dir = str(tmp_path_factory.mktemp("inf_out"))

    # build + save a native cross-encoder checkpoint
    import jax
    import jax.numpy as jnp

    from lightningdot_tpu.models.cross_encoder import CrossEncoder
    from lightningdot_tpu.models.factory import resolve_encoder_config
    from lightningdot_tpu.training.checkpoints import save_checkpoint

    ce = CrossEncoder(resolve_encoder_config(cfg))
    ce_params = ce.init(jax.random.PRNGKey(0))
    ckpt_path = os.path.join(str(tmp_path_factory.mktemp("ce")), "ce")
    save_checkpoint(ckpt_path, model=ce_params)

    from lightningdot_tpu.cli.inf_itm import main as inf_main

    eval_log, results_bin = inf_main([
        "--txt_db", txt_dir, "--img_db", img_dir,
        "--checkpoint", ckpt_path, "--model_config", cfg,
        "--output_dir", out_dir, "--max_bb", "10", "--min_bb", "5",
        "--batch_size", "16", "--compute_dtype", "f32"])
    assert {"txt_r1", "img_r1", "r_mean"} <= set(eval_log)
    with open(results_bin, "rb") as f:
        mat, txt_ids, img_ids = pickle.load(f)
    assert mat.shape == (20, 10)

    # rerank using the dumped score file
    from lightningdot_tpu.cli.rerank import main as rerank_main

    out = rerank_main([
        "--txt_model_config", cfg, "--img_model_config", cfg,
        "--test_txt_db", txt_dir, "--test_img_db", img_dir,
        "--valid_batch_size", "8", "--inf_minibatch_size", "8",
        "--max_bb", "10", "--min_bb", "5", "--compute_dtype", "f32",
        "--score_file", results_bin])
    assert "rerank_img_top10" in out and "stage1_img" in out


def test_rerank_with_oracle_scores_recovers_candidates(synth,
                                                       tmp_path_factory):
    """Oracle stage-2 scores: recall@1 after rerank == stage-1 recall@K."""
    txt_dir, img_dir = synth
    cfg = model_cfg_file(tmp_path_factory)
    txt_db = TxtTokDb(txt_dir, -1)
    txt2img = txt_db.txt2img
    txt_ids = list(txt_db.ids)
    img_ids = sorted({txt2img[t] for t in txt_ids})
    mat = np.zeros((len(txt_ids), len(img_ids)), np.float32)
    for i, t in enumerate(txt_ids):
        mat[i, img_ids.index(txt2img[t])] = 1.0
    oracle = str(tmp_path_factory.mktemp("oracle") / "results.bin")
    with open(oracle, "wb") as f:
        pickle.dump((mat, txt_ids, img_ids), f)

    from lightningdot_tpu.cli.rerank import main as rerank_main

    out = rerank_main([
        "--txt_model_config", cfg, "--img_model_config", cfg,
        "--test_txt_db", txt_dir, "--test_img_db", img_dir,
        "--valid_batch_size", "8", "--inf_minibatch_size", "8",
        "--max_bb", "10", "--min_bb", "5", "--compute_dtype", "f32",
        "--score_file", oracle])
    # with oracle scores, recall@1 after rerank over top-K equals the dense
    # recall@K (gt is ranked first whenever it was retrieved)
    assert out["rerank_img_top10"][1] == pytest.approx(
        out["stage1_img"][10], abs=1e-9)
    assert out["rerank_img_top100"][1] == pytest.approx(
        out["stage1_img"][100], abs=1e-9)
