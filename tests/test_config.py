"""Config system: JSON overlay with CLI-wins semantics, path remapping."""
import argparse
import json

from lightningdot_tpu.config import (EncoderConfig, add_itm_params,
                                     default_params, map_db_dirs,
                                     parse_with_config)


def make_parser():
    p = argparse.ArgumentParser()
    default_params(p)
    add_itm_params(p)
    return p


def test_parse_with_config_cli_wins(tmp_path):
    """dvl/options.py:96-109: JSON fills defaults, explicit CLI flags win."""
    cfg = {"learning_rate": 5e-5, "train_batch_size": 96, "max_txt_len": 60}
    path = tmp_path / "run.json"
    path.write_text(json.dumps(cfg))

    args = parse_with_config(make_parser(), [
        "--config", str(path),
        "--train_batch_size", "32",       # explicit -> must win over JSON
    ])
    assert args.train_batch_size == 32
    assert args.learning_rate == 5e-5     # from JSON
    assert args.max_txt_len == 60         # from JSON (default is 64)


def test_parse_with_config_equals_form(tmp_path):
    cfg = {"seed": 7}
    path = tmp_path / "run.json"
    path.write_text(json.dumps(cfg))
    args = parse_with_config(make_parser(), [
        "--config", str(path), "--seed=99"])
    assert args.seed == 99  # --flag=value form also registers as explicit


def test_map_db_dirs_prefix_only(tmp_path):
    args = argparse.Namespace(
        img_db_mapping="/mnt/images", txt_db_mapping="/mnt/db",
        pretrain_mapping=None,
        val_img_db="/img/flickr30k", test_img_db="/data/img/other",
        train_img_dbs=["/img/coco", "/data/img/keepme"],
        train_txt_dbs=["/db/itm", "/other/db/keepme"])
    map_db_dirs(args)
    assert args.val_img_db == "/mnt/images/flickr30k"
    assert args.test_img_db == "/data/img/other"          # not a prefix match
    assert args.train_img_dbs == ["/mnt/images/coco", "/data/img/keepme"]
    assert args.train_txt_dbs == ["/mnt/db/itm", "/other/db/keepme"]


def test_encoder_config_json_roundtrip(tmp_path):
    cfg = EncoderConfig(vocab_size=123, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=32)
    path = tmp_path / "enc.json"
    path.write_text(json.dumps(cfg.to_dict()))
    loaded = EncoderConfig.from_json_file(str(path))
    assert loaded == cfg
    assert loaded.head_dim == 8
    assert loaded.out_size == 16
    # unknown keys (HF-style extras) are ignored
    d = cfg.to_dict()
    d["architectures"] = ["BertForMaskedLM"]
    assert EncoderConfig.from_dict(d) == cfg


def test_lr_schedules_match_reference_formulas():
    """training/optim schedules vs the reference python formulas
    (bi_encoder.py:668-680, uniter optim/sched.py:7-16,35-52)."""
    import numpy as np

    from lightningdot_tpu.training.optim import (get_lr_sched, noam_schedule,
                                                 schedule_linear,
                                                 warmup_linear)

    lr, warm, total = 2e-4, 10, 100
    sched = schedule_linear(lr, warm, total)
    for step in (0, 1, 5, 10, 11, 50, 99, 100, 150):
        if step < warm:
            want = lr * step / max(1, warm)
        else:
            want = lr * max(0.0, (total - step) / max(1, total - warm))
        assert abs(float(sched(step)) - want) < 1e-10, step

    for step in (1, 10, 4000, 4001, 10000):
        want = (step / 4000) if step <= 4000 else (4000 ** 0.5) * step ** -0.5
        assert abs(float(noam_schedule(step, 4000)) - want) < 1e-6

    inv = get_lr_sched("invsqrt", lr, 100, 1000)
    lin = get_lr_sched("linear", lr, 100, 1000)
    const = get_lr_sched("constant", lr, 100, 1000)
    assert abs(float(const(123)) - lr) < 1e-9  # f32 precision
    assert abs(float(lin(2000)) - 1e-8) < 1e-12  # floor guard (sched.py:49-51)
    assert abs(float(inv(100)) - lr) < 1e-9
