"""ITM fine-tuning driver.

Parity: train_itm.py (reference root) — per-epoch hard-negative resampling,
bidirectional NCE (+ optional caption blending + optional cross-encoder KD),
AdamW + linear warmup (10% of total updates), per-epoch validation with
best/last checkpointing, optional final test eval.

TPU-native: one jitted train step over a dp mesh (global in-batch
negatives); batches stream through the device prefetcher.
"""
from __future__ import annotations

import argparse
import json
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.config import (add_itm_params, add_kd_params,
                                     add_logging_params, default_params,
                                     parse_with_config, print_args)
from lightningdot_tpu.data.feat_db import ImageDbGroup
from lightningdot_tpu.data.itm import (CollateConfig, itm_fast_collate,
                                       make_teacher_batch)
from lightningdot_tpu.models.factory import build_biencoder
from lightningdot_tpu.parallel.mesh import (data_parallel_mesh,
                                            is_main_process, replicate)
from lightningdot_tpu.training import hn as hn_mod
from lightningdot_tpu.training.checkpoints import save_checkpoint
from lightningdot_tpu.training.evaluator import eval_model_on_dataloader
from lightningdot_tpu.training.itm_step import (create_train_state,
                                                jit_train_step, make_kd_fn,
                                                make_itm_train_step)
from lightningdot_tpu.training.optim import make_optimizer, schedule_linear
from lightningdot_tpu.training.trainer_utils import build_dataloader, load_dataset
from lightningdot_tpu.utils.logging import LOGGER
from lightningdot_tpu.utils.logging import RunningMeter, TB_LOGGER
from lightningdot_tpu.utils.runtime import setup_runtime


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("train_itm", allow_abbrev=False)
    default_params(parser)
    add_itm_params(parser)
    add_logging_params(parser)
    add_kd_params(parser)
    return parser


def _load_teacher(args):
    """train_itm.py:87-96: cross-encoder teacher from checkpoint dir."""
    from lightningdot_tpu.models.factory import load_cross_encoder

    return load_cross_encoder(args.teacher_checkpoint,
                              model_config=args.img_model_config)


def main(cmds=None):
    args = parse_with_config(build_parser(), cmds)
    os.makedirs(args.output_dir, exist_ok=True)
    # options safe guard (train_itm.py:68-71)
    if args.conf_th == -1:
        assert args.max_bb + args.max_txt_len + 2 <= 512
    else:
        assert args.num_bb + args.max_txt_len + 2 <= 512
    from lightningdot_tpu.utils.preemption import PreemptionGuard

    # installed before setup: a preemption signal during model/data
    # construction or the first compile latches instead of killing the
    # process (the loop then checkpoints at its first boundary and exits)
    guard = PreemptionGuard(
        sim_after_step=getattr(args, "sim_preempt_step", None))
    with guard:
        return _main(args, guard)


def _main(args, guard):
    print_args(args, LOGGER.info)
    TB_LOGGER.create(os.path.join(args.output_dir, "metrics.jsonl"))

    setup_runtime(args)
    rng_py = random.Random(args.seed)
    np.random.seed(args.seed)

    args.vector_size = args.project_dim if args.project_dim > 0 else 768
    if isinstance(args.train_txt_dbs, str):
        args.train_txt_dbs = [args.train_txt_dbs]
    if isinstance(args.train_img_dbs, str):
        args.train_img_dbs = [args.train_img_dbs]

    # img_meta / captions (train_itm.py:116-121)
    args.img_meta_dict = None
    args.tokenizer = None
    if args.itm_global_file:
        with open(args.itm_global_file) as f:
            args.img_meta_dict = json.load(f)
        from transformers import BertTokenizer
        args.tokenizer = BertTokenizer.from_pretrained("bert-base-cased")

    if args.retrieval_mode != "both":
        # the reference raises for txt_only/img_only too (train_itm.py:212-219)
        raise ValueError("not supported anymore")

    model, params = build_biencoder(args, seed=args.seed)
    args.vector_size = model.txt_cfg.out_size

    teacher = t_params = None
    if args.teacher_checkpoint:
        LOGGER.info("teacher checkpoint provided, using KD framework")
        teacher, t_params = _load_teacher(args)

    # data
    all_img_dbs = ImageDbGroup(args.conf_th, args.max_bb, args.min_bb,
                               args.num_bb)
    (train_img2txt, train_txt2img, train_img2set, train_txt2set,
     train_set2img, train_set2txt) = hn_mod.get_img_txt_mappings(
        args.train_txt_dbs)

    collate_cfg = CollateConfig(fixed_batch=args.train_batch_size)
    collate = lambda items: itm_fast_collate(items, collate_cfg)
    eval_collate = lambda items: itm_fast_collate(
        items, CollateConfig(fixed_batch=args.valid_batch_size))

    train_dataset = load_dataset(all_img_dbs, args.train_txt_dbs,
                                 args.train_img_dbs, args, True)

    if args.sample_init_hard_negatives:
        assert args.num_hard_negatives > 0
        hard_neg_txt, hard_neg_img = hn_mod.sampled_hard_negatives(
            model, params, train_dataset.datasets, eval_collate, args,
            train_img2txt, train_txt2img, rng=rng_py)
    elif args.num_hard_negatives > 0 and \
            args.hard_negatives_sampling == "random":
        hard_neg_img = hn_mod.random_hard_neg(
            train_txt2img, args.num_hard_negatives, train_txt2set,
            train_set2img, rng=rng_py)
        hard_neg_txt = hn_mod.random_hard_neg(
            train_img2txt, args.num_hard_negatives, train_img2set,
            train_set2txt, rng=rng_py)
    else:
        hard_neg_txt, hard_neg_img = None, None

    # len() needs no epoch state; the first new_epoch runs inside the
    # epoch loop (calling it here too repeated the O(dataset) resample)
    train_dataloader = build_dataloader(train_dataset, collate, True, args)
    LOGGER.info("train dataset len = %d, dataloader len = %d",
                len(train_dataset), len(train_dataloader))

    val_dataset = load_dataset(all_img_dbs, args.val_txt_db, args.val_img_db,
                               args, is_train=False)
    val_dataset.new_epoch()
    val_dataloader = build_dataloader(val_dataset, eval_collate, False, args)
    val_img2txt = val_dataset.txt_db.img2txts

    # optimizer + schedule (train_itm.py:125,172-175)
    updates_per_epoch = max(
        len(train_dataloader) // args.gradient_accumulation_steps, 1)
    total_updates = updates_per_epoch * args.num_train_epochs
    warmup_steps = int(0.1 * total_updates)
    lr_schedule = schedule_linear(args.learning_rate, warmup_steps,
                                  total_updates)
    if (getattr(args, "optim_state_dtype", "float32") == "bfloat16"
            and args.gradient_accumulation_steps == 1):
        from lightningdot_tpu.training.optim import make_fused_adamw

        tx = make_fused_adamw(lr_schedule, max_grad_norm=args.max_grad_norm,
                              state_dtype=jnp.bfloat16)
    else:
        if getattr(args, "optim_state_dtype", "float32") == "bfloat16":
            LOGGER.warning("optim_state_dtype=bfloat16 requires "
                           "gradient_accumulation_steps=1 (optax.MultiSteps "
                           "wraps a GradientTransformation); using float32")
        tx = make_optimizer(lr_schedule, max_grad_norm=args.max_grad_norm)
    if args.gradient_accumulation_steps > 1:
        # apply every k micro-batches (train_itm.py:245-252,287-289)
        import optax

        tx = optax.MultiSteps(
            tx, every_k_schedule=args.gradient_accumulation_steps)

    kd_fn = None
    n_teacher = min(10, args.train_batch_size)  # N_EXAMPLES_TEACHER clamp
    if teacher is not None:
        kd_fn = make_kd_fn(teacher, t_params, T=args.T, n_teacher=n_teacher,
                           caption_score_weight=args.caption_score_weight)

    mesh = data_parallel_mesh(args.dp_size) if jax.device_count() > 1 else None
    train_step = jit_train_step(
        make_itm_train_step(model, tx,
                            caption_score_weight=args.caption_score_weight,
                            num_hard_negatives=args.num_hard_negatives,
                            kd_fn=kd_fn,
                            kd_loss_weight=args.kd_loss_weight),
        mesh=mesh, donate=True)
    state = create_train_state(params, tx)
    if mesh is not None:
        state = replicate(mesh, state)

    from lightningdot_tpu.utils.runtime import dropout_key
    rng = dropout_key(args.seed)  # rbg: free dropout masks
    if mesh is not None:
        # multi-process jit needs global inputs; same seed on every host
        # makes replication exact
        rng = replicate(mesh, rng)
    best_eval_metric = 0.0
    loss_meter = RunningMeter("loss")
    global_step = 0
    # gather cadence: a multiple of the accumulation window so multi-host
    # exits land on optimizer-update boundaries, coarse enough that the
    # hot loop pays no per-step collective (VERDICT r3 item 2)
    accum = args.gradient_accumulation_steps
    check_every = max(getattr(args, "preempt_check_steps", 25), accum)
    check_every += (-check_every) % accum
    guard.check_every = check_every  # now that accum is known
    guard.__enter__()  # re-enter the main()-installed guard (no-op install)

    try:
        for epoch in range(args.num_train_epochs):
            LOGGER.info("*" * 70)
            train_dataset.new_epoch(hard_neg_img, hard_neg_txt)
            # per-epoch seed: a fixed seed would replay the same shuffle
            # order every epoch (the loader's rng is fresh per build)
            train_dataloader = build_dataloader(
                train_dataset, collate, True, args,
                seed=(args.seed or 0) + epoch)
            t0 = time.time()
            n_ex = 0
            # host pulls are expensive on remote-attached TPUs: log the metrics
            # of the PREVIOUS log interval (already materialized) rather than
            # synchronizing on the step just dispatched
            pending = None

            def prepare(b):
                """Teacher grid built one batch ahead of the train step."""
                if teacher is not None:
                    b["teacher"] = make_teacher_batch(b, n_teacher=n_teacher)
                return b

            from lightningdot_tpu.data.loader import DevicePrefetcher
            from lightningdot_tpu.data.padding import Recycler

            recycler = Recycler()
            for step, batch in enumerate(
                    DevicePrefetcher(train_dataloader, put=prepare)):
                state, metrics = train_step(state, batch,
                                            jax.random.fold_in(rng, global_step))
                global_step += 1
                n_ex += batch["n_valid"]
                recycler.push(batch, ready=metrics["loss"])
                if (step + 1) % args.log_result_step == 0:
                    if pending is not None:
                        loss = float(pending["loss"])
                        loss_meter(loss)
                        # optimizer updates advance once per accum window
                        n_updates = global_step // args.gradient_accumulation_steps
                        lr = float(lr_schedule(n_updates))
                        LOGGER.info(
                            "Epoch %d: step %d/%d, loss=%.4f (smoothed "
                            "%.4f) acc=%.4f lr=%.2e (%.1f ex/s)", epoch,
                            step + 1, len(train_dataloader), loss,
                            loss_meter.val, float(pending["acc"]), lr,
                            n_ex / max(time.time() - t0, 1e-6))
                        TB_LOGGER.set_step(global_step)
                        TB_LOGGER.log_metric("loss_train", loss)
                        TB_LOGGER.log_metric("lr", lr)
                    pending = metrics
                if guard.check(global_step):
                    break
            recycler.flush()
            # epoch boundary: all hosts reach this line together, so force
            # the OR-reduce — a signal latched after the loop's last gather
            # boundary must not split hosts across the epoch transition
            if guard.sync():
                # preemption: snapshot (model + step + epoch) and exit cleanly;
                # continue later via --biencoder_checkpoint biencoder.preempt
                # weights-only warm start: relaunch with
                # --biencoder_checkpoint .../biencoder.preempt (epochs and
                # the LR schedule restart — the reference fine-tune has no
                # mid-run resume either)
                LOGGER.warning("preempted at step %d (epoch %d): saving "
                               "biencoder.preempt and exiting", global_step,
                               epoch)
                if is_main_process():
                    save_checkpoint(
                        os.path.join(args.output_dir, "biencoder.preempt"),
                        model=state.params, step=global_step, epoch=epoch)
                break

            # eval and save (train_itm.py:313-349)
            result = eval_model_on_dataloader(
                model, state.params, val_dataloader, img2txt=val_img2txt,
                vector_size=args.vector_size,
                caption_score_weight=args.caption_score_weight,
                hnsw=args.hnsw_index)
            recall_txt, recall_img = result.recall
            recall_val = {t: (recall_txt[t] + recall_img[t]) / 2
                          for t in recall_txt}
            current = float(np.mean(list(recall_val.values())))
            LOGGER.info("epoch %d: val loss=%.4f recall=%s (mean %.4f)",
                        epoch, result.loss, recall_val, current)
            TB_LOGGER.log_scalar_dict(
                {f"R@{k}": v for k, v in recall_val.items()}, prefix="val")

            # rank-0-only saves (reference train_itm.py:343-349): on
            # multi-host, concurrent writers to a shared output_dir would
            # collide on the atomic-save temp names
            ckpt = lambda name: is_main_process() and save_checkpoint(
                os.path.join(args.output_dir, f"biencoder.{name}"),
                model=state.params, step=global_step, epoch=epoch)
            if current > best_eval_metric:
                best_eval_metric = current
                ckpt("best")
            ckpt("last")
            if args.save_all_epochs:
                ckpt(str(epoch))

            # re-mine hard negatives for the NEXT epoch (train_itm.py:
            # 351-358; skipped after the last one — a full train-corpus
            # re-encode whose result nothing would consume)
            if (args.num_hard_negatives > 0
                    and epoch < args.num_train_epochs - 1):
                hard_neg_txt, hard_neg_img = hn_mod.sampled_hard_negatives(
                    model, state.params, train_dataset.datasets, eval_collate,
                    args, train_img2txt, train_txt2img, rng=rng_py)
            elif args.num_hard_negatives > 0:
                pass
            else:
                assert args.hard_negatives_sampling in ("none", "random")

    finally:
        guard.__exit__()  # restore SIGTERM even if an epoch raises
    results = {"best_val_recall_mean": best_eval_metric}
    if guard.sync():  # skip the final test sweep in the grace window
        return results, state
    if args.test_txt_db:
        test_dataset = load_dataset(all_img_dbs, args.test_txt_db,
                                    args.test_img_db, args, is_train=False)
        test_dataset.new_epoch()
        test_loader = build_dataloader(test_dataset, eval_collate, False,
                                       args)
        res = eval_model_on_dataloader(
            model, state.params, test_loader,
            img2txt=test_dataset.txt_db.img2txts,
            vector_size=args.vector_size,
            caption_score_weight=args.caption_score_weight)
        LOGGER.info("test: loss=%.4f recall_txt=%s recall_img=%s",
                    res.loss, res.recall[0], res.recall[1])
        results["test"] = {"recall_txt": res.recall[0],
                           "recall_img": res.recall[1]}
    print(json.dumps(results, default=float))
    return results, state


if __name__ == "__main__":
    main()
