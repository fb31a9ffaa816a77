"""Cross-encoder (teacher) fine-tuning driver.

Parity: uniter_model/train_itm.py — fine-tune UniterForImageTextRetrieval
with the sigmoid-triplet ranking loss over ItmRankDataset groups; periodic
validation; saves a teacher checkpoint directory (config.json + model)
directly consumable by the KD path (cli/train_itm._load_teacher) and the
re-ranker.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from lightningdot_tpu.config import parse_with_config, print_args
from lightningdot_tpu.data.feat_db import DetectFeatDb
from lightningdot_tpu.data.itm_rank import ItmRankDataset, itm_rank_collate
from lightningdot_tpu.data.loader import DataLoader
from lightningdot_tpu.data.txt_db import TxtTokDb
from lightningdot_tpu.models.cross_encoder import CrossEncoder
from lightningdot_tpu.models.factory import resolve_encoder_config
from lightningdot_tpu.training.checkpoints import save_checkpoint
from lightningdot_tpu.training.itm_step import TrainState, create_train_state
from lightningdot_tpu.training.optim import make_optimizer, schedule_linear
from lightningdot_tpu.utils.logging import LOGGER
from lightningdot_tpu.utils.runtime import setup_runtime


def build_parser():
    p = argparse.ArgumentParser("train_teacher")
    p.add_argument("--config", default=None)
    p.add_argument("--model_config", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="init weights (.pt UNITER or native)")
    p.add_argument("--train_txt_db", required=True)
    p.add_argument("--train_img_db", required=True)
    p.add_argument("--val_txt_db", default=None)
    p.add_argument("--val_img_db", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--neg_sample_size", default=1, type=int)
    p.add_argument("--margin", default=0.2, type=float)
    p.add_argument("--train_batch_size", default=8, type=int,
                   help="groups per batch (each 1+2n pairs)")
    p.add_argument("--learning_rate", default=5e-5, type=float)
    p.add_argument("--num_train_steps", default=5000, type=int)
    p.add_argument("--warmup_steps", default=500, type=int)
    p.add_argument("--max_grad_norm", default=2.0, type=float)
    p.add_argument("--valid_steps", default=500, type=int)
    p.add_argument("--max_txt_len", default=60, type=int)
    p.add_argument("--conf_th", default=0.2, type=float)
    p.add_argument("--max_bb", default=100, type=int)
    p.add_argument("--min_bb", default=10, type=int)
    p.add_argument("--num_bb", default=36, type=int)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--compute_dtype", default="bf16",
                   choices=["bf16", "f32"])
    return p


def main(cmds=None):
    args = parse_with_config(build_parser(), cmds)
    print_args(args, LOGGER.info)
    os.makedirs(args.output_dir, exist_ok=True)
    setup_runtime(args)

    import jax.numpy as jnp

    cfg = resolve_encoder_config(args.model_config)
    dtype = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32
    if args.checkpoint:
        from lightningdot_tpu.models.factory import load_cross_encoder
        model, params = load_cross_encoder(
            args.checkpoint, model_config=args.model_config,
            margin=args.margin, compute_dtype=dtype)
    else:
        model = CrossEncoder(cfg, margin=args.margin, compute_dtype=dtype)
        params = jax.tree.map(jnp.asarray,
                              model.init(jax.random.PRNGKey(args.seed)))

    txt_db = TxtTokDb(args.train_txt_db, args.max_txt_len)
    img_db = DetectFeatDb(args.train_img_db, args.conf_th, args.max_bb,
                          args.min_bb, args.num_bb)
    dataset = ItmRankDataset(txt_db, img_db, args.neg_sample_size,
                             seed=args.seed)
    loader = DataLoader(dataset, batch_size=args.train_batch_size,
                        shuffle=True, drop_last=True,
                        collate_fn=itm_rank_collate, seed=args.seed)

    lr = schedule_linear(args.learning_rate, args.warmup_steps,
                         args.num_train_steps)
    tx = make_optimizer(lr, max_grad_norm=args.max_grad_norm)
    state = create_train_state(params, tx)

    sample_size = 1 + 2 * args.neg_sample_size  # static group width

    def train_step(state: TrainState, batch, rng):
        def loss_fn(p):
            loss = model.apply(p, batch, compute_loss=True,
                               deterministic=False, rng=rng,
                               sample_size=sample_size)
            return loss.mean()

        import optax

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, opt_state, state.step + 1), loss

    step_fn = jax.jit(train_step, donate_argnums=(0,))

    rng = jax.random.PRNGKey(args.seed)
    global_step = 0
    t0 = time.time()
    losses = []
    while global_step < args.num_train_steps:
        for batch in loader:
            mb = {k: v for k, v in batch.items()
                  if k not in ("n_groups", "sample_size")}
            state, loss = step_fn(state, mb,
                                  jax.random.fold_in(rng, global_step))
            losses.append(loss)
            global_step += 1
            if global_step % max(args.valid_steps, 1) == 0 or \
                    global_step >= args.num_train_steps:
                mean_loss = float(np.mean([float(l) for l in losses[-50:]]))
                LOGGER.info("step %d: triplet loss=%.4f (%.1f steps/s)",
                            global_step, mean_loss,
                            global_step / (time.time() - t0))
            if global_step >= args.num_train_steps:
                break

    # save the teacher directory (consumable by _load_teacher / rerank)
    with open(os.path.join(args.output_dir, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f)
    save_checkpoint(os.path.join(args.output_dir, "model"),
                    model=state.params, step=global_step)
    LOGGER.info("teacher saved to %s", args.output_dir)
    final_loss = float(np.mean([float(l) for l in losses[-20:]]))
    print(json.dumps({"final_loss": final_loss, "steps": global_step}))
    return {"final_loss": final_loss}, state


if __name__ == "__main__":
    main()
