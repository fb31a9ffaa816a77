"""Shared helpers for the multi-process (jax.distributed) test suite.

Imported both by tests/test_multiprocess.py (inside pytest, CPU backend
with 8 virtual devices) and by tests/mp_worker.py (spawned worker
processes, 1 local CPU device each, joined into a global mesh by
``jax.distributed.initialize``). Everything here is deterministic in
(step, rank) so the single-process reference run can reconstruct the
exact global batches the multi-process run consumed.
"""
from __future__ import annotations

import hashlib
import json

import numpy as np

TINY = dict(vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=32, img_dim=16,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
TXT_LEN = 12
N_REG = 6
LOCAL_BS = 4       # batch rows contributed by each process
N_STEPS = 4        # steps in the first training phase
N_RESUME_STEPS = 2  # steps after the rank-0-save -> all-rank-resume cycle


def tiny_biencoder():
    import jax
    import jax.numpy as jnp

    from lightningdot_tpu.config import EncoderConfig
    from lightningdot_tpu.models.bi_encoder import BiEncoder

    txt_cfg = EncoderConfig(**TINY)
    img_cfg = EncoderConfig(**TINY)
    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def local_itm_batch(step: int, rank: int, local_bs: int = LOCAL_BS,
                    seed: int = 123):
    """Deterministic per-(step, rank) host batch. The global batch at
    ``step`` is the rank-order concatenation — exactly what the
    multi-process ``shard_batch`` assembles on the dp mesh."""
    rng = np.random.default_rng(seed + 1000 * step + rank)
    bs = local_bs
    return {
        "txts": {
            "input_ids": rng.integers(5, TINY["vocab_size"],
                                      (bs, TXT_LEN)).astype(np.int32),
            "attention_mask": np.ones((bs, TXT_LEN), np.int32),
            "position_ids": np.tile(np.arange(TXT_LEN, dtype=np.int32),
                                    (bs, 1)),
        },
        "imgs": {
            "input_ids": np.full((bs, 1), 101, np.int32),
            "attention_mask": np.ones((bs, 1 + N_REG), np.int32),
            "img_feat": rng.standard_normal(
                (bs, N_REG, TINY["img_dim"])).astype(np.float32),
            "img_pos_feat": rng.random((bs, N_REG, 7)).astype(np.float32),
        },
        "caps": None,
        "valid_mask": np.ones((bs,), np.float32),
    }


def global_itm_batch(step: int, world: int, local_bs: int = LOCAL_BS,
                     seed: int = 123):
    """Concatenate the per-rank local batches into the global batch."""
    import jax

    parts = [local_itm_batch(step, r, local_bs, seed) for r in range(world)]
    return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *parts)


N_ITM_PRE_STEPS = 3


def tiny_pretrain_model():
    """BiEncoderForPretraining at TINY size (deterministic init)."""
    import jax

    from lightningdot_tpu.models.bi_encoder import BiEncoderForPretraining

    pre = BiEncoderForPretraining(model_for_step(), img_label_dim=7)
    return pre, pre.init(jax.random.PRNGKey(1))


def local_itm_pre_batch(step: int, rank: int, local_bs: int = LOCAL_BS,
                        seed: int = 321):
    """What itm_pre_collate emits on one host. ``pos_ctx_indices`` is a
    LOCAL arange (data/pretrain.py itm_pre_collate) — under multi-host
    shard_batch the per-host aranges concatenate to [0..n-1, 0..n-1, ...],
    NOT the global labels, so loss equality with the single-process global
    batch proves forward_itm derives positives itself (ADVICE r4 high)."""
    b = local_itm_batch(step, rank, local_bs, seed)
    del b["valid_mask"]
    b["weights"] = np.ones((local_bs,), np.float32)
    b["targets"] = np.ones((local_bs,), np.int32)
    b["pos_ctx_indices"] = np.arange(local_bs, dtype=np.int32)
    return b


def global_itm_pre_batch(step: int, world: int, local_bs: int = LOCAL_BS,
                         seed: int = 321):
    """The batch a single-host collate would emit for the same global data:
    concatenated features but a GLOBAL positive arange."""
    import jax

    parts = [local_itm_pre_batch(step, r, local_bs, seed)
             for r in range(world)]
    b = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *parts)
    b["pos_ctx_indices"] = np.arange(world * local_bs, dtype=np.int32)
    return b


def make_itm_pre_setup(mesh, model, params):
    """Real pretrain-step machinery for the 'itm' task on a dp mesh."""
    import jax

    from lightningdot_tpu.parallel.mesh import replicate
    from lightningdot_tpu.training.optim import (make_optimizer,
                                                 schedule_linear)
    from lightningdot_tpu.training.pretrain_step import make_pretrain_step

    tx = make_optimizer(schedule_linear(1e-3, 2, 100), max_grad_norm=1.0)
    init_state, step_for_task = make_pretrain_step(model, tx)
    state = replicate(mesh, init_state(params))
    rng = replicate(mesh, jax.random.PRNGKey(11))
    return state, step_for_task("itm"), rng


def make_train_setup(mesh, params):
    """Real components: optax AdamW + clip, the jitted ITM train step."""
    import jax

    from lightningdot_tpu.parallel.mesh import replicate
    from lightningdot_tpu.training.itm_step import (create_train_state,
                                                    jit_train_step,
                                                    make_itm_train_step)
    from lightningdot_tpu.training.optim import (make_optimizer,
                                                 schedule_linear)

    tx = make_optimizer(schedule_linear(1e-3, 2, 100), max_grad_norm=1.0)
    state = replicate(mesh, create_train_state(params, tx))
    step_fn = jit_train_step(make_itm_train_step(model_for_step(), tx),
                             mesh=mesh)
    rng = replicate(mesh, jax.random.PRNGKey(7))
    return tx, state, step_fn, rng


_MODEL = []


def model_for_step():
    if not _MODEL:
        _MODEL.append(tiny_biencoder())
    return _MODEL[0][0]


def init_params():
    if not _MODEL:
        _MODEL.append(tiny_biencoder())
    return _MODEL[0][1]


def params_digest(params) -> str:
    """Order-stable sha256 over every leaf's bytes."""
    import jax

    h = hashlib.sha256()
    for path, leaf in sorted(
            jax.tree_util.tree_flatten_with_path(params)[0],
            key=lambda kv: jax.tree_util.keystr(kv[0])):
        h.update(jax.tree_util.keystr(path).encode())
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def write_mp_pretrain_config(tmp_path, txt_dir, img_dir, out_dir,
                             num_train_steps=4, valid_steps=4):
    """Tiny multi-task pretrain config shared by every rank (the driver
    shards the text DBs rank-strided itself)."""
    model_cfg = str(tmp_path / "model.json")
    with open(model_cfg, "w") as f:
        json.dump({"vocab_size": 28996, "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "intermediate_size": 64, "max_position_embeddings": 64,
                   "img_dim": 32}, f)
    cfg = {
        "txt_model_type": "bert-base", "txt_model_config": model_cfg,
        "img_model_type": "uniter-base", "img_model_config": model_cfg,
        "model_config": model_cfg,
        "output_dir": out_dir,
        "project_dim": 0, "mrm_prob": 0.3, "itm_neg_prob": 0.5,
        "itm_ot_lambda": 0.0, "max_txt_len": 30,
        "conf_th": 0.2, "max_bb": 12, "min_bb": 5, "num_bb": 10,
        "train_batch_size": 512,  # -> 8 fixed rows/host at 32+32 buckets
        "val_batch_size": 256,
        "gradient_accumulation_steps": 2,
        "learning_rate": 1e-4,
        "valid_steps": valid_steps, "num_train_steps": num_train_steps,
        "optim": "adamw", "betas": [0.9, 0.98], "decay": "linear",
        "dropout": 0.0, "weight_decay": 0.01, "grad_norm": 5.0,
        "warmup_steps": 2, "seed": 7, "img_label_dim": 7,
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
    p = tmp_path / "mp_pretrain_cfg.json"
    with open(p, "w") as f:
        json.dump(cfg, f)
    return str(p)
