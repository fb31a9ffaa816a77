"""Cross-encoder (teacher) fine-tuning driver.

Parity: uniter_model/train_itm.py — fine-tune UniterForImageTextRetrieval
with the sigmoid-triplet ranking loss over ItmRankDataset groups; periodic
validation; saves a teacher checkpoint directory (config.json + model)
directly consumable by the KD path (cli/train_itm._load_teacher) and the
re-ranker.

Variants (all from the reference teacher recipes):
  * ``--hard_neg_size > 0``: mined hard negatives — an initial + periodic
    (``--steps_per_hard_neg``) mining pass over random candidate pools
    (ItmHardNegDataset) feeds ItmRankDatasetHardNeg
    (train_itm.py:118-136,191-193,266-270).
  * ``--self_mining``: in-batch self-mining — CrossEncoderHardNeg scores a
    candidate group and trains on the top-``hard_size`` negatives,
    alternating text-shared / image-shared groups
    (train_itm_v2.py:92-101 + model/itm.py:56-137).
  * ``--model_variant fast``: two-stream cosine teacher
    (UniterForImageTextRetrievalFast, model/itm.py:140-195).
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
    p = argparse.ArgumentParser("train_teacher", allow_abbrev=False)
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
    p.add_argument("--model_variant", default="joint",
                   choices=["joint", "fast"],
                   help="joint = UniterForImageTextRetrieval; fast = "
                        "two-stream cosine (itm.py:140-195)")
    p.add_argument("--hard_neg_size", default=0, type=int,
                   help=">0 trains on mined hard negatives "
                        "(ItmRankDatasetHardNeg)")
    p.add_argument("--hard_neg_pool_size", default=20, type=int,
                   help="mined hard negatives kept per text/image")
    p.add_argument("--steps_per_hard_neg", default=-1, type=int,
                   help="re-mine every N steps (-1 = mine once at start)")
    p.add_argument("--inf_minibatch_size", default=400, type=int,
                   help="random candidate pool size for mining")
    p.add_argument("--self_mining", action="store_true",
                   help="in-batch self-mining (CrossEncoderHardNeg + "
                        "FromText/FromImage groups, train_itm_v2 flow)")
    p.add_argument("--self_mining_hard_size", default=16, type=int)
    p.add_argument("--train_batch_size", default=8, type=int,
                   help="groups per batch (each 1+2n pairs)")
    p.add_argument("--learning_rate", default=5e-5, type=float)
    p.add_argument("--num_train_steps", default=5000, type=int)
    p.add_argument("--warmup_steps", default=500, type=int)
    p.add_argument("--max_grad_norm", default=2.0, type=float)
    p.add_argument("--valid_steps", default=500, type=int)
    p.add_argument("--sim_preempt_step", type=int, default=None,
                   help="fault injection: act as if SIGTERM arrived at "
                        "this global step")
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
    from lightningdot_tpu.utils.preemption import PreemptionGuard

    # installed before setup: a preemption signal during model/data
    # construction or the first compile latches instead of killing the
    # process (the loop then checkpoints at its first boundary and exits)
    guard = PreemptionGuard(
        sim_after_step=getattr(args, "sim_preempt_step", None),
        check_every=getattr(args, "preempt_check_steps", 25))
    with guard:
        return _main(args, guard)


def _main(args, guard):
    print_args(args, LOGGER.info)
    os.makedirs(args.output_dir, exist_ok=True)
    setup_runtime(args)

    import jax.numpy as jnp

    cfg = resolve_encoder_config(args.model_config)
    dtype = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32
    if args.model_variant == "fast":
        from lightningdot_tpu.models.cross_encoder import CrossEncoderFast
        model = CrossEncoderFast(cfg, margin=args.margin, compute_dtype=dtype)
        params = jax.tree.map(jnp.asarray,
                              model.init(jax.random.PRNGKey(args.seed)))
        if args.checkpoint:
            # warm-start from a UNITER/teacher .pt: the text stream loads
            # from 'bert.*'; 'img_bert.*' loads when present (a plain
            # UNITER checkpoint leaves the image stream randomly
            # initialized, like Fast.from_pretrained's missing-key
            # tolerance, itm.py:145-151 + train_itm.py:165-167)
            from lightningdot_tpu.models import checkpoint_torch as ct

            sd = ct.normalize_keys(ct.load_torch_state_dict(args.checkpoint))
            params["bert"] = jax.tree.map(jnp.asarray, ct.map_tower(
                sd, with_img=True, num_layers=cfg.num_hidden_layers))
            if any(k.startswith("img_bert.") for k in sd):
                img_sd = {f"bert.{k}": v
                          for k, v in ct.split_prefix(sd,
                                                      "img_bert").items()}
                params["img_bert"] = jax.tree.map(jnp.asarray, ct.map_tower(
                    img_sd, with_img=True,
                    num_layers=cfg.num_hidden_layers_img))
            else:
                LOGGER.info("fast teacher: %s has no img_bert stream; "
                            "image stream stays randomly initialized",
                            args.checkpoint)
            if "itm_output.weight" in sd:
                params["itm_output"] = jax.tree.map(
                    jnp.asarray, ct._lin(sd, "itm_output"))
                params = model.init_output(params)
    elif args.checkpoint:
        from lightningdot_tpu.models.factory import load_cross_encoder
        model, params = load_cross_encoder(
            args.checkpoint, model_config=args.model_config,
            margin=args.margin, compute_dtype=dtype)
    else:
        model = CrossEncoder(cfg, margin=args.margin, compute_dtype=dtype)
        params = jax.tree.map(jnp.asarray,
                              model.init(jax.random.PRNGKey(args.seed)))

    from lightningdot_tpu.parallel.mesh import (process_count,
                                                process_index)
    # train DB shards rank-strided across hosts (data.py:185-187)
    txt_db = TxtTokDb(args.train_txt_db, args.max_txt_len,
                      rank=process_index(), world_size=process_count())
    img_db = DetectFeatDb(args.train_img_db, args.conf_th, args.max_bb,
                          args.min_bb, args.num_bb)

    lr = schedule_linear(args.learning_rate, args.warmup_steps,
                         args.num_train_steps)
    # UNITER optimizer convention (uniter_model/train_itm.py:221-240):
    # betas (0.9, 0.98), vendored-AdamW eps 1e-6, weight decay on the
    # non-bias/LN group, post-increment schedule read (first_lr_step=1)
    tx = make_optimizer(lr, max_grad_norm=args.max_grad_norm,
                        betas=tuple(getattr(args, "betas", (0.9, 0.98))),
                        adam_eps=getattr(args, "adam_eps", 1e-6),
                        weight_decay=getattr(args, "weight_decay", 0.01),
                        first_lr_step=1)
    state = create_train_state(params, tx)

    import optax

    def _loop(loader):
        while True:
            yield from loader

    # ---- mode-specific dataset(s) + jitted step(s) -------------------------
    hard_neg_dir = os.path.join(args.output_dir, "results_train")
    mine = None

    if args.self_mining:
        assert args.model_variant == "joint", \
            "self-mining is defined for the joint cross-encoder"
        # train_itm_v2 flow: one candidate group per step, alternating
        # text-shared / image-shared; in-batch top-hard_size mining on device
        from lightningdot_tpu.data.itm_rank import (
            ItmRankDatasetHardNegFromImage, ItmRankDatasetHardNegFromText,
            itm_rank_hn_collate)
        from lightningdot_tpu.models.cross_encoder import CrossEncoderHardNeg

        model = CrossEncoderHardNeg(cfg, margin=args.margin,
                                    compute_dtype=dtype,
                                    hard_size=args.self_mining_hard_size)
        assert args.neg_sample_size > args.self_mining_hard_size, (
            "self-mining needs a candidate pool larger than hard_size")
        ds_t = ItmRankDatasetHardNegFromText(txt_db, img_db,
                                             args.neg_sample_size,
                                             seed=args.seed)
        ds_i = ItmRankDatasetHardNegFromImage(txt_db, img_db,
                                              args.neg_sample_size,
                                              seed=args.seed + 1)
        loaders = [
            _loop(DataLoader(ds, batch_size=1, shuffle=True, drop_last=True,
                             collate_fn=itm_rank_hn_collate, seed=args.seed))
            for ds in (ds_t, ds_i)]

        def make_step(sample_from):
            def train_step(state: TrainState, batch, rng):
                def loss_fn(p):
                    loss = model.apply(p, batch, compute_loss=True,
                                       deterministic=False, rng=rng,
                                       sample_from=sample_from)
                    return loss.mean()

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                new_params = optax.apply_updates(state.params, updates)
                return (TrainState(new_params, opt_state, state.step + 1),
                        loss)

            return jax.jit(train_step, donate_argnums=(0,))

        step_fns = [make_step("t"), make_step("i")]

        def next_batch(global_step):
            side = global_step % 2
            batch = next(loaders[side])
            mb = {k: v for k, v in batch.items() if k != "sample_size"}
            return step_fns[side], mb
    else:
        if args.hard_neg_size > 0:
            from lightningdot_tpu.data.itm import ItmHardNegDataset
            from lightningdot_tpu.data.itm_rank import ItmRankDatasetHardNeg
            from lightningdot_tpu.training.hn_teacher import (
                compute_hard_neg, make_fast_score_fn, make_joint_score_fn)

            dataset = ItmRankDatasetHardNeg(
                txt_db, img_db, args.neg_sample_size, args.hard_neg_size,
                seed=args.seed)
            hn_dataset = ItmHardNegDataset(txt_db, img_db,
                                           args.inf_minibatch_size,
                                           seed=args.seed)
            sample_size = 1 + 2 * (args.neg_sample_size + args.hard_neg_size)

            # built once: re-mining passes reuse the compiled score program
            make_fn = (make_fast_score_fn if args.model_variant == "fast"
                       else make_joint_score_fn)
            score_fn = make_fn(model)

            def mine(state):
                compute_hard_neg(lambda b: score_fn(state.params, b),
                                 (hn_dataset[i]
                                  for i in range(len(hn_dataset))),
                                 dataset, args.hard_neg_pool_size,
                                 hard_neg_dir)
        else:
            dataset = ItmRankDataset(txt_db, img_db, args.neg_sample_size,
                                     seed=args.seed)
            sample_size = 1 + 2 * args.neg_sample_size  # static group width

        loader = _loop(DataLoader(dataset, batch_size=args.train_batch_size,
                                  shuffle=True, drop_last=True,
                                  collate_fn=itm_rank_collate,
                                  seed=args.seed))

        def train_step(state: TrainState, batch, rng):
            def loss_fn(p):
                loss = model.apply(p, batch, compute_loss=True,
                                   deterministic=False, rng=rng,
                                   sample_size=sample_size)
                return loss.mean()

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, opt_state, state.step + 1), loss

        step_fn = jax.jit(train_step, donate_argnums=(0,))
        drop = ("n_groups", "sample_size", "attn_masks_text",
                "attn_masks_img") if args.model_variant != "fast" else (
                "n_groups", "sample_size", "attn_masks")

        def next_batch(global_step):
            batch = next(loader)
            mb = {k: v for k, v in batch.items() if k not in drop}
            return step_fn, mb

    if mine is not None:
        mine(state)  # initial mining pass (train_itm.py:191-193)

    from lightningdot_tpu.data.padding import Recycler
    from lightningdot_tpu.utils.runtime import dropout_key
    rng = dropout_key(args.seed)  # rbg: free dropout masks
    global_step = 0
    t0 = time.time()
    losses = []
    recycler = Recycler()  # pool spent host batches (see padding.Recycler)
    with guard:  # re-enter the main()-installed guard around the hot loop
        while global_step < args.num_train_steps:
            fn, mb = next_batch(global_step)
            state, loss = fn(state, mb, jax.random.fold_in(rng, global_step))
            losses.append(loss)
            recycler.push(mb, ready=loss)
            global_step += 1
            if guard.check(global_step):
                # preemption: skip straight to the directory save below
                LOGGER.warning("preempted at step %d: saving the teacher "
                               "directory and exiting", global_step)
                break
            if global_step % max(args.valid_steps, 1) == 0 or \
                    global_step >= args.num_train_steps:
                mean_loss = float(np.mean([float(l) for l in losses[-50:]]))
                LOGGER.info("step %d: triplet loss=%.4f (%.1f steps/s)",
                            global_step, mean_loss,
                            global_step / (time.time() - t0))
            if (mine is not None and args.steps_per_hard_neg > 0
                    and global_step % args.steps_per_hard_neg == 0
                    and global_step < args.num_train_steps):
                # periodic re-mining (train_itm.py:266-270)
                mine(state)
    recycler.flush()

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
