"""VQA fine-tuning driver (minimal train/eval path).

Parity: uniter_model/train_vqa.py:100-265 adapted to the bi-encoder VQA
head (dvl/models/bi_encoder.py:683-734) and this repo's data stack —
epoch loop over VqaDataset batches, instance-level BCE, per-epoch
``evaluate_vqa`` validation with best/last checkpointing. The reference's
vqa_output-specific higher learning rate (train_vqa.py:52-76) is carried
by ``--vqa_lr_mul`` via an optax mask.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from lightningdot_tpu.config import (add_itm_params, add_logging_params,
                                     default_params, parse_with_config,
                                     print_args)
from lightningdot_tpu.data.feat_db import ImageDbGroup
from lightningdot_tpu.data.loader import DevicePrefetcher
from lightningdot_tpu.data.txt_db import TxtTokDb
from lightningdot_tpu.data.vqa import (VqaCollateConfig, VqaDataset,
                                       VqaEvalDataset, vqa_collate)
from lightningdot_tpu.models.factory import build_biencoder
from lightningdot_tpu.parallel.mesh import process_count, process_index
from lightningdot_tpu.models.vqa import BiEncoderForVQA
from lightningdot_tpu.training.checkpoints import save_checkpoint
from lightningdot_tpu.training.itm_step import (create_train_state,
                                                jit_train_step)
from lightningdot_tpu.training.optim import make_optimizer, schedule_linear
from lightningdot_tpu.training.trainer_utils import build_dataloader
from lightningdot_tpu.training.vqa_step import (evaluate_vqa,
                                                make_vqa_train_step)
from lightningdot_tpu.utils.logging import LOGGER, RunningMeter, TB_LOGGER
from lightningdot_tpu.utils.runtime import dropout_key, setup_runtime


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("train_vqa", allow_abbrev=False)
    default_params(parser)
    add_itm_params(parser)  # db paths + region-feature knobs
    add_logging_params(parser)
    parser.add_argument("--num_answers", default=3129, type=int,
                        help="answer vocabulary size (VQA v2: 3129)")
    parser.add_argument("--vqa_intersection", action="store_true",
                        help="[q,ctx,q*ctx,q+ctx] head input "
                             "(bi_encoder.py:694-710)")
    parser.add_argument("--vqa_lr_mul", default=1.0, type=float,
                        help="learning-rate multiplier for the vqa_output "
                             "head (train_vqa.py:52-76)")
    return parser


def main(cmds=None):
    args = parse_with_config(build_parser(), cmds)
    from lightningdot_tpu.utils.preemption import PreemptionGuard

    # installed before setup so a preemption signal during model/data
    # construction or the first compile latches instead of killing the
    # process; the epoch loop checkpoints and exits at the next boundary
    guard = PreemptionGuard(
        sim_after_step=getattr(args, "sim_preempt_step", None),
        check_every=getattr(args, "preempt_check_steps", 25))
    with guard:
        return _main(args, guard)


def _main(args, guard):
    os.makedirs(args.output_dir, exist_ok=True)
    print_args(args, LOGGER.info)
    TB_LOGGER.create(os.path.join(args.output_dir, "metrics.jsonl"))
    setup_runtime(args)
    np.random.seed(args.seed)

    if isinstance(args.train_txt_dbs, str):
        args.train_txt_dbs = [args.train_txt_dbs]
    if isinstance(args.train_img_dbs, str):
        args.train_img_dbs = [args.train_img_dbs]

    bi_encoder, bi_params = build_biencoder(args, seed=args.seed)
    model = BiEncoderForVQA(
        bi_encoder=bi_encoder,
        hidden_size=bi_encoder.txt_cfg.out_size,
        num_answer=args.num_answers,
        intersection=args.vqa_intersection)
    params = model.init(jax.random.PRNGKey(args.seed))
    params["biencoder"] = bi_params

    all_img_dbs = ImageDbGroup(args.conf_th, args.max_bb, args.min_bb,
                               args.num_bb)
    train_sets = [
        VqaDataset(args.num_answers,
                   TxtTokDb(t, args.max_txt_len, rank=process_index(),
                            world_size=process_count()),
                   all_img_dbs[im])
        for t, im in zip(args.train_txt_dbs, args.train_img_dbs)]
    from lightningdot_tpu.training.trainer_utils import ConcatDataset
    train_dataset = (train_sets[0] if len(train_sets) == 1
                     else ConcatDataset(train_sets))
    val_dataset = VqaEvalDataset(args.num_answers,
                                 TxtTokDb(args.val_txt_db, -1),
                                 all_img_dbs[args.val_img_db])

    collate = lambda items: vqa_collate(
        items, VqaCollateConfig(fixed_batch=args.train_batch_size))
    eval_collate = lambda items: vqa_collate(
        items, VqaCollateConfig(fixed_batch=args.valid_batch_size))
    train_loader = build_dataloader(train_dataset, collate, True, args)
    val_loader = build_dataloader(val_dataset, eval_collate, False, args)

    updates_per_epoch = max(
        len(train_loader) // args.gradient_accumulation_steps, 1)
    total_updates = updates_per_epoch * max(args.num_train_epochs, 1)
    lr_schedule = schedule_linear(args.learning_rate,
                                  int(0.1 * total_updates), total_updates)
    import optax

    from lightningdot_tpu.training.optim import clip_by_global_norm_with_norm

    # UNITER optimizer convention (uniter_model/train_vqa.py:51-85,204-215):
    # betas (0.9, 0.98), vendored-AdamW eps 1e-6, weight decay on the
    # non-bias/LN group, post-increment schedule read (first_lr_step=1)
    opt_kw = dict(betas=tuple(getattr(args, "betas", (0.9, 0.98))),
                  adam_eps=getattr(args, "adam_eps", 1e-6),
                  weight_decay=getattr(args, "weight_decay", 0.01),
                  first_lr_step=1)
    if args.vqa_lr_mul != 1.0:
        head_schedule = schedule_linear(args.learning_rate * args.vqa_lr_mul,
                                        int(0.1 * total_updates),
                                        total_updates)
        tx = optax.multi_transform(
            {"body": make_optimizer(lr_schedule, **opt_kw),
             "head": make_optimizer(head_schedule, **opt_kw)},
            lambda p: {k: ("head" if k == "vqa_output" else "body")
                       for k in p})
    else:
        tx = make_optimizer(lr_schedule, **opt_kw)
    if args.max_grad_norm and args.max_grad_norm > 0:
        # ONE model-wide global-norm clip ahead of the (possibly grouped)
        # optimizer — the reference clips over all params at once
        # (train_vqa.py:243 clip_grad_norm_(model.parameters())), not per
        # LR group
        tx = optax.chain(clip_by_global_norm_with_norm(args.max_grad_norm),
                         tx)
    if args.gradient_accumulation_steps > 1:
        # apply every k micro-batches (train_vqa.py:236-245), keeping the
        # schedule's per-update step count consistent with total_updates
        tx = optax.MultiSteps(
            tx, every_k_schedule=args.gradient_accumulation_steps)

    train_step = jit_train_step(make_vqa_train_step(model, tx), mesh=None,
                                donate=True)
    state = create_train_state(params, tx)

    rng = dropout_key(args.seed)
    best_acc = -1.0
    loss_meter = RunningMeter("loss")
    global_step = 0
    results = {}
    preempted = False
    for epoch in range(args.num_train_epochs):
        t0 = time.time()
        n_ex = 0
        pending = None
        from lightningdot_tpu.data.padding import Recycler

        recycler = Recycler()
        for step, batch in enumerate(
                DevicePrefetcher(train_loader, put=lambda b: b)):
            state, metrics = train_step(state, batch,
                                        jax.random.fold_in(rng, global_step))
            global_step += 1
            n_ex += batch["n_valid"]
            recycler.push(batch, ready=metrics["loss"])
            if guard.check(global_step):
                preempted = True
                break
            if (step + 1) % args.log_result_step == 0:
                if pending is not None:
                    loss = float(pending["loss"])
                    loss_meter(loss)
                    LOGGER.info(
                        "Epoch %d: step %d/%d, loss=%.4f score=%.4f "
                        "(%.1f ex/s)", epoch, step + 1, len(train_loader),
                        loss, float(pending["score"]),
                        n_ex / max(time.time() - t0, 1e-6))
                    TB_LOGGER.set_step(global_step)
                    TB_LOGGER.log_metric("loss_train", loss)
                pending = metrics
        recycler.flush()
        if preempted:
            # MultiSteps keeps params fixed between update boundaries, so
            # the snapshot is exact regardless of where the window stood
            save_checkpoint(os.path.join(args.output_dir, "vqa.last"),
                            model=state.params, step=global_step, epoch=epoch)
            LOGGER.warning("exiting after preemption checkpoint at step %d",
                           global_step)
            break

        val = evaluate_vqa(model, state.params, val_loader)
        LOGGER.info("epoch %d: val loss=%.4f acc=%.4f", epoch, val["loss"],
                    val["acc"])
        TB_LOGGER.log_scalar_dict({"loss": val["loss"], "acc": val["acc"]},
                                  prefix="val")
        ckpt = lambda name: save_checkpoint(
            os.path.join(args.output_dir, f"vqa.{name}"),
            model=state.params, step=global_step, epoch=epoch)
        if val["acc"] > best_acc:
            best_acc = val["acc"]
            ckpt("best")
        ckpt("last")
        results = {"best_val_acc": best_acc, "last_val": {
            "loss": val["loss"], "acc": val["acc"]}}

    print(json.dumps(results, default=float))
    return results, state


if __name__ == "__main__":
    main()
