"""Drive every CLI entry point on the REAL TPU with tiny synthetic data.

Round-2 changed the compute path (attention layout, rbg dropout keys, full
unroll, bf16 corpus, async checkpoints); this re-validates each driver on
hardware end to end. Small configs keep relay compiles tolerable.

Run: PYTHONPATH=. python scripts/tpu_driver_smoke.py
"""
import json
import os
import tempfile

import numpy as np

from lightningdot_tpu.data.synth import make_synth_dataset


def main():
    root = tempfile.mkdtemp(prefix="tpu_smoke_")
    txt_dir, img_dir = make_synth_dataset(root, n_imgs=12, txts_per_img=2,
                                          img_dim=64, min_bb=5, max_bb=10,
                                          max_txt_len=20, seed=1,
                                          vqa_answers=12)
    cfg_path = os.path.join(root, "small.json")
    with open(cfg_path, "w") as f:
        json.dump({"vocab_size": 28996, "hidden_size": 64,
                   "num_hidden_layers": 2, "num_hidden_layers_img": 1,
                   "num_attention_heads": 4, "intermediate_size": 128,
                   "max_position_embeddings": 64, "img_dim": 64}, f)

    # 1. ITM fine-tune (dual tower, bf16, dropout, rbg keys, unroll)
    from lightningdot_tpu.cli.train_itm import main as itm_main

    out1 = os.path.join(root, "ft")
    res, _ = itm_main([
        "--txt_model_config", cfg_path, "--img_model_config", cfg_path,
        "--train_txt_dbs", txt_dir, "--train_img_dbs", img_dir,
        "--val_txt_db", txt_dir, "--val_img_db", img_dir,
        "--train_batch_size", "8", "--valid_batch_size", "8",
        "--num_train_epochs", "1", "--learning_rate", "1e-3",
        "--max_bb", "10", "--min_bb", "5", "--num_bb", "8",
        "--max_txt_len", "20", "--compute_dtype", "bf16",
        "--inf_minibatch_size", "8", "--output_dir", out1,
        "--log_result_step", "5"])
    assert np.isfinite(res["best_val_recall_mean"]), res
    print("train_itm TPU smoke ok:", res["best_val_recall_mean"], flush=True)

    # 2. eval
    from lightningdot_tpu.cli.eval_itm import main as eval_main

    res2 = eval_main([
        "--txt_model_config", cfg_path, "--img_model_config", cfg_path,
        "--test_txt_db", txt_dir, "--test_img_db", img_dir,
        "--biencoder_checkpoint", os.path.join(out1, "biencoder.best"),
        "--valid_batch_size", "8", "--max_bb", "10", "--min_bb", "5",
        "--num_bb", "8", "--max_txt_len", "20", "--compute_dtype", "bf16",
        "--output_dir", os.path.join(root, "eval")])
    assert "test" in res2 and res2["test"]["recall_txt"], res2
    print("eval_itm TPU smoke ok:", res2["test"]["recall_txt"], flush=True)

    # 3. pretrain (MetaLoader + async ckpt + host assert)
    from lightningdot_tpu.cli.pretrain import main as pre_main

    out3 = os.path.join(root, "pre")
    pre_cfg = {
        "txt_model_config": cfg_path, "img_model_config": cfg_path,
        "model_config": cfg_path, "output_dir": out3,
        "project_dim": 0, "mrm_prob": 0.3, "itm_neg_prob": 0.5,
        "itm_ot_lambda": 0.0, "max_txt_len": 20,
        "conf_th": 0.2, "max_bb": 10, "min_bb": 5, "num_bb": 8,
        "train_batch_size": 256, "val_batch_size": 256,
        "gradient_accumulation_steps": 1, "learning_rate": 1e-4,
        "valid_steps": 6, "num_train_steps": 6,
        "betas": [0.9, 0.98], "decay": "linear", "weight_decay": 0.01,
        "grad_norm": 5.0, "warmup_steps": 2, "seed": 7,
        "img_label_dim": 7,
        "train_datasets": [{"name": "synth", "db": [txt_dir],
                            "img": [img_dir], "tasks": ["mlm", "itm"],
                            "mix_ratio": [1, 1]}],
        "val_datasets": [{"name": "synth", "db": [txt_dir],
                          "img": [img_dir], "tasks": ["mlm"]}],
    }
    pre_cfg_path = os.path.join(root, "pretrain.json")
    with open(pre_cfg_path, "w") as f:
        json.dump(pre_cfg, f)
    res3, _ = pre_main(["--config", pre_cfg_path,
                        "--compute_dtype", "bf16"])
    assert res3, res3
    import glob
    assert glob.glob(os.path.join(out3, "ckpt", "model_step_*.npz")), \
        "async checkpoint did not land"
    print("pretrain TPU smoke ok (async ckpt on disk)", flush=True)

    # 4. teacher with in-batch self-mining (CrossEncoderHardNeg on TPU)
    from lightningdot_tpu.cli.train_teacher import main as teach_main

    out4 = os.path.join(root, "teach")
    res4, _ = teach_main([
        "--model_config", cfg_path,
        "--train_txt_db", txt_dir, "--train_img_db", img_dir,
        "--output_dir", out4, "--self_mining",
        "--neg_sample_size", "5", "--self_mining_hard_size", "2",
        "--learning_rate", "1e-3", "--num_train_steps", "6",
        "--warmup_steps", "2", "--valid_steps", "3",
        "--max_bb", "10", "--min_bb", "5", "--num_bb", "8",
        "--compute_dtype", "bf16"])
    assert np.isfinite(res4["final_loss"]), res4
    print("train_teacher self-mining TPU smoke ok:", res4["final_loss"],
          flush=True)

    # 5. VQA fine-tune (lr_mul multi_transform + global clip + MultiSteps)
    from lightningdot_tpu.cli.train_vqa import main as vqa_main

    out5 = os.path.join(root, "vqa")
    res5, _ = vqa_main([
        "--txt_model_config", cfg_path, "--img_model_config", cfg_path,
        "--train_txt_dbs", txt_dir, "--train_img_dbs", img_dir,
        "--val_txt_db", txt_dir, "--val_img_db", img_dir,
        "--num_answers", "12", "--train_batch_size", "8",
        "--valid_batch_size", "8", "--num_train_epochs", "1",
        "--learning_rate", "1e-3", "--vqa_lr_mul", "10.0",
        "--gradient_accumulation_steps", "2",
        "--max_bb", "10", "--min_bb", "5", "--num_bb", "8",
        "--max_txt_len", "20", "--compute_dtype", "bf16",
        "--output_dir", out5, "--log_result_step", "2"])
    assert np.isfinite(res5["last_val"]["loss"]), res5
    print("train_vqa TPU smoke ok:", res5["best_val_acc"], flush=True)

    print("ALL TPU DRIVER SMOKES PASSED", flush=True)


if __name__ == "__main__":
    main()
