"""End-to-end eval slice: synthetic DBs -> dataset -> collate -> jitted
dual-tower forward -> on-device index -> recall (SURVEY.md §7 step 3)."""
import json

import numpy as np
import pytest

from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.itm import (CollateConfig, ItmFastDataset,
                                       itm_fast_collate)
from lightningdot_tpu.data.synth import make_synth_dataset
from lightningdot_tpu.data.txt_db import TxtTokDb


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    txt_dir, img_dir = make_synth_dataset(
        str(root), n_imgs=12, txts_per_img=2, img_dim=64, min_bb=5,
        max_bb=20, max_txt_len=30)
    return txt_dir, img_dir


def small_model_config(tmp_path_factory, img_dim=64):
    d = {"vocab_size": 28996, "hidden_size": 32, "num_hidden_layers": 2,
         "num_attention_heads": 4, "intermediate_size": 64,
         "max_position_embeddings": 64, "img_dim": img_dim}
    p = tmp_path_factory.mktemp("cfg") / "small.json"
    p.write_text(json.dumps(d))
    return str(p)


def test_itm_dataset_and_collate(synth):
    txt_dir, img_dir = synth
    txt_db = TxtTokDb(txt_dir, max_txt_len=-1)
    img_db = DetectFeatDb(img_dir, conf_th=0.2, max_bb=20, min_bb=5)
    ds = ItmFastDataset(txt_db, img_db)
    ds.new_epoch()
    assert len(ds) == 24
    item = ds[0]
    assert item["input_ids"][0] == 101 and item["input_ids"][-1] == 102
    assert item["img"]["img_feat"].shape[1] == 64

    cfg = CollateConfig(txt_buckets=(16, 32), img_buckets=(32,),
                        fixed_batch=8)
    batch = itm_fast_collate([ds[i] for i in range(5)], cfg)
    assert batch["txts"]["input_ids"].shape[1] in (16, 32)
    assert batch["imgs"]["img_feat"].shape == (8, 31, 64)
    assert batch["imgs"]["attention_mask"].shape == (8, 32)
    assert batch["n_valid"] == 5 and batch["sample_size"] == 8
    # mask matches true lengths
    np.testing.assert_array_equal(
        batch["imgs"]["attention_mask"].sum(1)[:5],
        [ds[i]["img"]["num_bb"] + 1 for i in range(5)])


def test_eval_cli_end_to_end(synth, tmp_path_factory, capsys):
    txt_dir, img_dir = synth
    cfg_path = small_model_config(tmp_path_factory)
    from lightningdot_tpu.cli.eval_itm import main

    results = main([
        "--txt_model_config", cfg_path,
        "--img_model_config", cfg_path,
        "--test_txt_db", txt_dir,
        "--test_img_db", img_dir,
        "--valid_batch_size", "8",
        "--max_bb", "20", "--min_bb", "5",
        "--compute_dtype", "f32",
        "--inf_minibatch_size", "8",
    ])
    r = results["test"]
    assert np.isfinite(r["loss"])
    for d in (r["recall_txt"], r["recall_img"]):
        assert set(d.keys()) == {1, 5, 10}
        assert 0.0 <= d[1] <= d[5] <= d[10] <= 1.0

    # determinism: same config -> identical recall
    results2 = main([
        "--txt_model_config", cfg_path,
        "--img_model_config", cfg_path,
        "--test_txt_db", txt_dir,
        "--test_img_db", img_dir,
        "--valid_batch_size", "8",
        "--max_bb", "20", "--min_bb", "5",
        "--compute_dtype", "f32",
        "--inf_minibatch_size", "8",
    ])
    assert results2["test"]["recall_txt"] == r["recall_txt"]
    assert abs(results2["test"]["loss"] - r["loss"]) < 1e-6


def test_itm_val_dataset(synth):
    from lightningdot_tpu.data.itm import ItmValDataset

    txt_dir, img_dir = synth
    txt_db = TxtTokDb(txt_dir, max_txt_len=-1)
    img_db = DetectFeatDb(img_dir, conf_th=0.2, max_bb=20, min_bb=5)
    ds = ItmValDataset(txt_db, img_db, mini_batch_size=6)
    item = ds[0]
    # gt image first, then 5 wrapped negatives; same text paired with each
    assert item["img_ids"][0] == txt_db.txt2img[ds.ids[0]]
    assert len(item["img_ids"]) == 6
    assert item["input_ids"].shape[0] == 6
    assert (item["input_ids"] == item["input_ids"][0]).all()
    assert item["img_feat"].shape[0] == 6


def test_eval_with_sharded_index_matches_flat(synth, tmp_path_factory):
    """eval_model_on_dataloader(mesh=...) uses DenseShardedIndex and must
    reproduce the single-device recalls exactly."""
    import jax

    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.data.loader import DataLoader
    from lightningdot_tpu.models.bi_encoder import BiEncoder
    from lightningdot_tpu.parallel.mesh import data_parallel_mesh
    from lightningdot_tpu.training.evaluator import eval_model_on_dataloader

    txt_dir, img_dir = synth
    txt_db = TxtTokDb(txt_dir, max_txt_len=-1)
    img_db = DetectFeatDb(img_dir, conf_th=0.2, max_bb=20, min_bb=5)
    ds = ItmFastDataset(txt_db, img_db)
    ds.new_epoch()
    cfg = dict(vocab_size=28996, hidden_size=32, num_hidden_layers=2,
               num_attention_heads=4, intermediate_size=64,
               max_position_embeddings=64)
    model = BiEncoder(EncoderConfig(**cfg), EncoderConfig(**cfg, img_dim=64))
    params = model.init(jax.random.PRNGKey(3))
    collate = lambda x: itm_fast_collate(
        x, CollateConfig(txt_buckets=(32,), img_buckets=(32,),
                         fixed_batch=8))
    make_loader = lambda: DataLoader(ds, batch_size=8, collate_fn=collate)

    flat = eval_model_on_dataloader(model, params, make_loader(),
                                    img2txt=txt_db.img2txts, vector_size=32)
    sharded = eval_model_on_dataloader(model, params, make_loader(),
                                       img2txt=txt_db.img2txts,
                                       vector_size=32,
                                       mesh=data_parallel_mesh())
    assert flat.recall == sharded.recall
