"""Multi-task pre-training driver.

Parity: pretrain.py (reference root) — per-dataset task lists with
``mix_ratio`` (config/pretrain-alldata-base.json schema), MetaLoader task
sampling per accumulation window, per-task losses (MLM / MRFR / MRC-kl /
ITM), AdamW with ``get_lr_sched`` decay, validation every ``valid_steps``,
step-numbered checkpoints with auto-resume (pretrain.py:246-536,906-917).

TPU-native: one jitted step per (task, shape bucket); the dp mesh shards the
batch; task order comes from a seeded RNG (host-synchronized by seed, no
``any_broadcast`` collective needed).
"""
from __future__ import annotations

import argparse
import json
import os
import time
from collections import defaultdict
from typing import Any, Dict

import jax

from lightningdot_tpu.config import parse_with_config, print_args
from lightningdot_tpu.const import BUCKET_SIZE, IMG_LABEL_DIM
from lightningdot_tpu.data.feat_db import ImageDbGroup
from lightningdot_tpu.data.loader import (DataLoader, MetaLoader,
                                          TokenBucketSampler)
from lightningdot_tpu.data.pretrain import (ItmPreDataset, MlmDataset,
                                            MrcDataset, MrfrDataset,
                                            PretrainCollateConfig,
                                            itm_pre_collate, mlm_collate,
                                            mrc_collate, mrfr_collate)
from lightningdot_tpu.data.txt_db import TxtTokDb
from lightningdot_tpu.models.bi_encoder import (BiEncoder,
                                                BiEncoderForPretraining)
from lightningdot_tpu.models.factory import resolve_encoder_config
from lightningdot_tpu.training.checkpoints import (ModelSaver,
                                                   latest_step_checkpoint,
                                                   load_checkpoint)
from lightningdot_tpu.training.optim import get_lr_sched, make_optimizer
from lightningdot_tpu.training.pretrain_step import (make_pretrain_step,
                                                     make_validate_fn)
from lightningdot_tpu.utils.logging import LOGGER, RunningMeter, TB_LOGGER
from lightningdot_tpu.utils.runtime import setup_runtime


def build_parser():
    p = argparse.ArgumentParser("pretrain", allow_abbrev=False)
    p.add_argument("--config", required=True)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--num_train_steps", type=int, default=None)
    p.add_argument("--valid_steps", type=int, default=None)
    p.add_argument("--async_checkpoint", type=int, default=1,
                   help="save step checkpoints on a background thread "
                        "(device->host pull + npz write off the hot loop)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--sim_preempt_step", type=int, default=None,
                   help="fault injection: act as if SIGTERM arrived at "
                        "this global step (tests the preemption path "
                        "deterministically)")
    p.add_argument("--preempt_check_steps", type=int, default=25,
                   help="multi-host preemption OR-reduce cadence in "
                        "optimizer updates (1 = every update; coarser "
                        "keeps the host-RTT collective off the hot loop)")
    p.add_argument("--compute_dtype", default="bf16",
                   choices=["bf16", "f32"])
    p.add_argument("--kernel_backend", default="auto",
                   choices=["auto", "xla", "pallas"])
    return p


def _build_task(task: str, txt_dbs, img_dbs, args, collate_cfg, is_train,
                fixed_rows: int = 0):
    """pretrain.py:79-221 build_*_dataset equivalents.

    ``fixed_rows`` > 0 (multi-host training) replaces the token-budget
    sampler with fixed example-count batches: the jitted step is one SPMD
    program spanning hosts, so every host must enter it with the same
    global shapes every step — variable-size token-bucket batches would
    desynchronize the compiled programs across hosts.
    """
    datasets = []
    for txt_db, img_db in zip(txt_dbs, img_dbs):
        if task.startswith("mlm"):
            datasets.append(MlmDataset(txt_db, img_db, seed=args.seed))
            collate = lambda items: mlm_collate(items, collate_cfg)
        elif task.startswith("mrfr"):
            datasets.append(MrfrDataset(args.mrm_prob, txt_db, img_db,
                                        seed=args.seed))
            collate = lambda items: mrfr_collate(items, collate_cfg)
        elif task.startswith("mrc"):
            datasets.append(MrcDataset(args.mrm_prob, txt_db, img_db,
                                       seed=args.seed))
            collate = lambda items: mrc_collate(items, collate_cfg)
        elif task.startswith("itm"):
            datasets.append(ItmPreDataset(txt_db, img_db, args.itm_neg_prob,
                                          seed=args.seed))
            collate = lambda items: itm_pre_collate(items, collate_cfg)
        else:
            raise ValueError(f"Undefined task {task}")

    from lightningdot_tpu.training.trainer_utils import ConcatDataset

    dataset = datasets[0] if len(datasets) == 1 else ConcatDataset(datasets)

    def on_epoch():
        # resample ITM pairings every epoch (itm_pre.py:20-29) and advance
        # the per-item mask-rng salt so MLM/MRFR/MRC draw fresh masks
        for d in datasets:
            if hasattr(d, "new_epoch"):
                d.new_epoch()
            if hasattr(d, "advance_epoch"):
                d.advance_epoch()
        if hasattr(sampler, "set_epoch"):
            sampler.set_epoch(sampler.epoch + 1)
        else:
            sampler._lens = [l for d in datasets for l in d.lens]

    if fixed_rows and is_train:
        from lightningdot_tpu.data.loader import DistributedSampler

        if len(dataset) < fixed_rows:
            raise ValueError(
                f"task {task}: {len(dataset)} examples on this host < "
                f"fixed batch rows {fixed_rows} — lower train_batch_size "
                "or use fewer hosts")
        # rank sharding already happened at the DB level (ids[rank::world]);
        # here the sampler only fixes the per-step example count
        sampler = DistributedSampler(len(dataset), num_replicas=1, rank=0,
                                     batch_size=fixed_rows, shuffle=True,
                                     drop_last=True, seed=args.seed or 0)
    else:
        sampler = TokenBucketSampler(
            [l for d in datasets for l in d.lens], bucket_size=BUCKET_SIZE,
            batch_size=(args.train_batch_size if is_train
                        else args.val_batch_size),
            droplast=is_train, seed=args.seed)
    # per-item mask rngs (seed, epoch, index) make the mask datasets safe
    # under the order-preserving multi-worker collate pipeline
    return DataLoader(dataset, sampler=sampler, collate_fn=collate,
                      on_epoch=on_epoch,
                      num_workers=(getattr(args, "loader_workers", 1)
                                   if is_train else 1))


def create_dataloaders(dataset_specs, is_train, args, all_img_dbs,
                       collate_cfg):
    """pretrain.py:165-221."""
    loaders = {}
    from lightningdot_tpu.parallel.mesh import process_count, process_index
    fixed_rows = 0
    if is_train and process_count() > 1:
        # multi-host SPMD: host-agreed static shapes (see _build_task) —
        # one top bucket per axis and a fixed example count derived from
        # the token budget at worst-case sequence length
        import dataclasses as _dc

        from lightningdot_tpu.data.padding import bucket_len
        txt_top = bucket_len(args.max_txt_len + 2, collate_cfg.txt_buckets)
        img_top = bucket_len(args.max_bb + 1, collate_cfg.img_buckets)
        per_ex = txt_top + img_top
        fixed_rows = max(8, args.train_batch_size // per_ex // 8 * 8)
        # batch_pad=8 divides fixed_rows: exactly-full batches stay unpadded
        collate_cfg = _dc.replace(collate_cfg, txt_buckets=(txt_top,),
                                  img_buckets=(img_top,), batch_pad=8)
        LOGGER.info("multi-host static shapes: txt=%d img=%d rows=%d/host",
                    txt_top, img_top, fixed_rows)
    for dset in dataset_specs:
        img_dbs = [all_img_dbs[p] for p in dset["img"]]
        for i, t in enumerate(dset["tasks"]):
            task = f"{t}_{dset['name']}"
            max_len = args.max_txt_len if is_train else -1
            # train DBs shard rank-strided across hosts (data.py:185-187);
            # validation stays complete per host
            rank = process_index() if is_train else 0
            world = process_count() if is_train else 1
            txt_dbs = [TxtTokDb(p, max_len, rank=rank, world_size=world)
                       for p in dset["db"]]
            LOGGER.info("Loading %s %s dataset %s", task,
                        "train" if is_train else "val", dset["db"])
            loader = _build_task(t, txt_dbs, img_dbs, args, collate_cfg,
                                 is_train, fixed_rows=fixed_rows)
            if is_train:
                loaders[task] = (loader, dset["mix_ratio"][i])
            else:
                loaders[task] = loader
    return loaders


def validate(model_def, params, val_loaders, validate_fn, global_step):
    """pretrain.py:527-536 + validate_* fns."""
    out = {}
    for task_name, loader in val_loaders.items():
        task = task_name.split("_")[0]
        t0 = time.time()
        agg = defaultdict(float)
        n = 0
        for batch in loader:
            metrics = validate_fn(params, batch, task)
            for k, v in metrics.items():
                agg[k] += float(v)
            n += 1
        res = {k: v / max(n, 1) for k, v in agg.items()}
        LOGGER.info("validate %s: %s (%.1fs)", task_name, res,
                    time.time() - t0)
        TB_LOGGER.log_scalar_dict(res, prefix=f"val_{task_name}")
        out[task_name] = res
    return out


def main(cmds=None):
    args = parse_with_config(build_parser(), cmds)
    # config safe guard (pretrain.py:919-923)
    if args.conf_th == -1:
        assert args.max_bb + args.max_txt_len + 2 <= 512
    else:
        assert args.num_bb + args.max_txt_len + 2 <= 512
    from lightningdot_tpu.utils.preemption import PreemptionGuard

    # the latch installs BEFORE setup: a preemption signal during data/model
    # construction or the (possibly minutes-long) first compile must not
    # kill the process — it is held until the loop's first update boundary,
    # which checkpoints and exits cleanly
    # guard.check(global_step) runs at optimizer-update boundaries (already
    # once per accumulation window), so the cadence is in UPDATES — one
    # host gather per `preempt_check_steps` windows, like train_itm
    # (the reference pays one all_gather_list per window, pretrain.py:392)
    guard = PreemptionGuard(
        sim_after_step=getattr(args, "sim_preempt_step", None),
        check_every=max(getattr(args, "preempt_check_steps", 25), 1))
    with guard:  # restores the SIGTERM handler even if setup/loop raises
        return _main(args, guard)


def _main(args, guard):
    print_args(args, LOGGER.info)
    os.makedirs(args.output_dir, exist_ok=True)

    setup_runtime(args)
    from lightningdot_tpu.parallel.mesh import is_main_process
    if is_main_process():  # rank-0 only (save.py:15-18 + NoOp semantics)
        TB_LOGGER.create(os.path.join(args.output_dir, "metrics.jsonl"))
        from lightningdot_tpu.training.checkpoints import save_training_meta
        save_training_meta(args.output_dir, args)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32

    # model (BiEncoderForPretraining, pretrain.py:313-314)
    project_dim = getattr(args, "project_dim", 0)
    txt_cfg = resolve_encoder_config(args.txt_model_config,
                                     project_dim=project_dim,
                                     dropout=getattr(args, "dropout", 0.1))
    img_cfg = resolve_encoder_config(args.img_model_config,
                                     project_dim=project_dim,
                                     dropout=getattr(args, "dropout", 0.1))
    bi = BiEncoder(txt_cfg, img_cfg, compute_dtype=dtype)
    model = BiEncoderForPretraining(
        bi, cls_concat=getattr(args, "cls_concat", ""),
        img_label_dim=getattr(args, "img_label_dim", IMG_LABEL_DIM))
    params = model.init(jax.random.PRNGKey(args.seed))

    # tower init from checkpoints (uniter-base.pt etc.)
    from lightningdot_tpu.models import checkpoint_torch as ckpt_torch

    def _maybe(p):
        return p if p and str(p).lower() != "none" and os.path.exists(p) \
            else None

    if _maybe(getattr(args, "img_checkpoint", None)):
        sd = ckpt_torch.load_torch_state_dict(args.img_checkpoint)
        params["bert"]["img_model"] = {
            **params["bert"]["img_model"],
            **ckpt_torch.map_tower(sd, with_img=True,
                                   num_layers=img_cfg.num_hidden_layers)}
    if _maybe(getattr(args, "txt_checkpoint", None)):
        sd = ckpt_torch.load_torch_state_dict(args.txt_checkpoint)
        params["bert"]["txt_model"] = {
            **params["bert"]["txt_model"],
            **ckpt_torch.map_tower(sd, with_img=False,
                                   num_layers=txt_cfg.num_hidden_layers)}
    params = jax.tree.map(jnp.asarray, params)

    # optimizer (build_optimizer + get_lr_sched)
    # optional one-tower UNITER teacher for KD (pretrain.py:330-343,409-428)
    teacher = teacher_params = None
    if getattr(args, "teacher_checkpoint", None):
        from lightningdot_tpu.models.uniter_pretrain import UniterForPretraining

        t_cfg_path = os.path.join(args.teacher_checkpoint, "config.json")
        t_cfg = resolve_encoder_config(
            t_cfg_path if os.path.exists(t_cfg_path) else args.model_config)
        teacher = UniterForPretraining(
            t_cfg, img_label_dim=getattr(args, "img_label_dim",
                                         IMG_LABEL_DIM),
            compute_dtype=dtype)
        t_model_pt = os.path.join(args.teacher_checkpoint, "model.pt")
        if os.path.exists(t_model_pt):
            sd = ckpt_torch.load_torch_state_dict(t_model_pt)
            teacher_params = {
                "uniter": ckpt_torch.map_tower(
                    sd, with_img=True, num_layers=t_cfg.num_hidden_layers),
                "heads": ckpt_torch.map_pretrain_model(sd)["heads"],
            }
        else:
            teacher_params, _, _ = load_checkpoint(
                os.path.join(args.teacher_checkpoint, "model"),
                model_template=teacher.init(jax.random.PRNGKey(0)))
        teacher_params = jax.tree.map(jnp.asarray, teacher_params)
        LOGGER.info("pretrain KD enabled (teacher %s)",
                    args.teacher_checkpoint)

    lr_fn = get_lr_sched(getattr(args, "decay", "linear"),
                         args.learning_rate, args.warmup_steps,
                         args.num_train_steps)
    # adam_eps 1e-6 = the vendored AdamW default (uniter_model/optim/
    # adamw.py:23, build_optimizer never overrides it); first_lr_step=1 =
    # the post-increment schedule read (pretrain.py:458-463)
    tx = make_optimizer(lr_fn, betas=tuple(getattr(args, "betas", (0.9, 0.98))),
                        adam_eps=getattr(args, "adam_eps", 1e-6),
                        weight_decay=getattr(args, "weight_decay", 0.01),
                        max_grad_norm=getattr(args, "grad_norm", 5.0),
                        first_lr_step=1)
    init_state, step_for_task = make_pretrain_step(
        model, tx, accum_steps=args.gradient_accumulation_steps,
        teacher=teacher, teacher_params=teacher_params,
        kd_loss_weight=getattr(args, "kd_loss_weight", 1.0),
        kd_T=getattr(args, "T", 1.0))
    state = init_state(params)

    # dp mesh: params replicated, batches sharded on the leading axis; XLA
    # inserts the gradient psum (replaces the manual flat-buffer allreduce,
    # pretrain.py:449-451). Multi-host: each host feeds its local shard and
    # shard_batch assembles the global batch.
    from lightningdot_tpu.parallel.mesh import data_parallel_mesh
    mesh = data_parallel_mesh() if jax.device_count() > 1 else None

    # auto-resume (pretrain.py:320-328,906-917)
    resume = latest_step_checkpoint(os.path.join(args.output_dir, "ckpt"))
    from lightningdot_tpu.parallel.mesh import process_count
    if process_count() > 1:
        # checkpoints are written by rank 0 only, so rank 0's discovery is
        # authoritative: per-host discovery can disagree (a shared-FS write
        # still propagating, or hosts restarting at different times) and a
        # host resuming from a different step would silently diverge
        import numpy as _np
        from jax.experimental import multihost_utils

        step0 = int(multihost_utils.broadcast_one_to_all(
            _np.int32(resume[1] if resume else -1)))
        if step0 < 0:
            resume = None
        else:
            path0 = os.path.join(args.output_dir, "ckpt",
                                 f"model_step_{step0}")
            deadline = time.time() + 120
            while not (os.path.exists(path0 + ".json")
                       and os.path.exists(path0 + ".npz")):
                if time.time() > deadline:
                    raise RuntimeError(
                        f"rank 0 resumes from {path0} but this host cannot "
                        "see it (shared output_dir required)")
                time.sleep(0.2)
            resume = (path0, step0)
    global_step = 0
    if resume is not None:
        path, step = resume
        LOGGER.info("auto-resume from %s (step %d)", path, step)
        loaded_params, loaded_opt, meta = load_checkpoint(
            path, model_template=state.params,
            optimizer_template=state.opt_state)
        state = type(state)(jax.tree.map(jnp.asarray, loaded_params),
                            jax.tree.map(jnp.asarray, loaded_opt)
                            if loaded_opt is not None else state.opt_state,
                            jnp.asarray(step * args.gradient_accumulation_steps,
                                        jnp.int32))
        global_step = step
    if mesh is not None:
        from lightningdot_tpu.parallel.mesh import replicate
        state = replicate(mesh, state)

    # data
    all_img_dbs = ImageDbGroup(args.conf_th, args.max_bb, args.min_bb,
                               args.num_bb)
    collate_cfg = PretrainCollateConfig(with_teacher=teacher is not None)
    train_loaders = create_dataloaders(args.train_datasets, True, args,
                                       all_img_dbs, collate_cfg)
    # validation never runs the teacher — don't build its sub-batches
    val_loaders = create_dataloaders(args.val_datasets, False, args,
                                     all_img_dbs,
                                     PretrainCollateConfig())
    meta_loader = MetaLoader(train_loaders,
                             accum_steps=args.gradient_accumulation_steps,
                             seed=args.seed)
    if global_step:
        # continue the deterministic task stream where the interrupted run
        # stopped, instead of replaying the early task mix under late-run
        # learning rates (data iterators restart, like the reference)
        meta_loader.fast_forward(
            global_step * args.gradient_accumulation_steps)
    validate_fn = make_validate_fn(model, mesh=mesh)
    # rank-0-only saver (reference NoOp for non-zero ranks, pretrain.py:285-293
    # + save.py:15-18); other hosts resume from the shared output_dir
    if is_main_process():
        saver = ModelSaver(os.path.join(args.output_dir, "ckpt"),
                           async_save=bool(getattr(args, "async_checkpoint",
                                                   0)))
    else:
        from lightningdot_tpu.training.checkpoints import NoOpSaver
        saver = NoOpSaver()

    task2loss: Dict[str, RunningMeter] = {
        t: RunningMeter(f"loss/{t}") for t in train_loaders}
    pending_loss: Dict[str, Any] = {}
    log_every = min(100, max(args.valid_steps, 1))
    n_examples = defaultdict(int)
    from lightningdot_tpu.utils.runtime import dropout_key
    rng = dropout_key(args.seed)  # rbg: free dropout masks
    if mesh is not None:
        # multi-process jit needs every input global; the key is identical
        # on all hosts (same seed), so replication is exact
        from lightningdot_tpu.parallel.mesh import replicate as _replicate
        rng = _replicate(mesh, rng)
    start = time.time()

    LOGGER.info("start pre-training: %d steps, tasks=%s",
                args.num_train_steps, list(train_loaders))
    from lightningdot_tpu.data.padding import Recycler

    # recycle spent host batches into the padding buffer pool once the step
    # that consumed them reports ready (see Recycler docstring)
    recycler = Recycler()
    preempted = False
    with guard:  # re-enter the main()-installed guard around the hot loop
        results, state, last_validated, global_step, preempted = _train_loop(
            args, meta_loader, step_for_task, state, rng, guard, recycler,
            task2loss, pending_loss, log_every, n_examples, start, lr_fn,
            model, val_loaders, validate_fn, saver, global_step, mesh=mesh)

    if last_validated != global_step:  # avoid a duplicate final sweep
        saver.save(state.params, global_step, optimizer=state.opt_state)
        results = validate(model, state.params, val_loaders, validate_fn,
                           global_step)
    saver.wait()  # drain the async writer before returning
    if preempted:
        LOGGER.warning("exiting after preemption checkpoint at step %d "
                       "(resume by re-running the same command)",
                       global_step)
    return results, state


def _train_loop(args, meta_loader, step_for_task, state, rng, guard,
                recycler, task2loss, pending_loss, log_every, n_examples,
                start, lr_fn, model, val_loaders, validate_fn, saver,
                global_step, mesh=None):
    """The hot loop (factored so the PreemptionGuard wraps it in a with)."""
    from lightningdot_tpu.parallel.mesh import assert_same_across_hosts

    micro_step = 0
    last_validated = -1
    results = {}
    preempted = False

    for name, batch in meta_loader:
        task = name.split("_")[0]
        if micro_step % args.gradient_accumulation_steps == 0:
            # all hosts must agree on the sampled task before entering the
            # jitted step's collectives (reference asserts every step via
            # all_gather_list, pretrain.py:392; no-op single-host)
            assert_same_across_hosts((name, micro_step), "pretrain task")
        n_examples[name] += batch["n_valid"]
        model_batch = {k: v for k, v in batch.items()
                       if k not in ("n_valid", "sample_size")}
        if mesh is not None:
            from lightningdot_tpu.parallel.mesh import shard_batch
            model_batch = shard_batch(mesh, model_batch)
        state, metrics = step_for_task(task)(
            state, model_batch, jax.random.fold_in(rng, micro_step))
        recycler.push(batch, ready=metrics["loss"])
        micro_step += 1
        # keep the loss on device — host pulls are expensive; drained at the
        # logging interval only
        pending_loss[name] = metrics["loss"]

        if micro_step % args.gradient_accumulation_steps == 0:
            global_step += 1
            if global_step % log_every == 0:
                for t, dev_loss in pending_loss.items():
                    task2loss[t](float(dev_loss))
                pending_loss.clear()
                elapsed = time.time() - start
                LOGGER.info("========= Step %d =========", global_step)
                for t, meter in task2loss.items():
                    LOGGER.info("%s: %d ex at %d ex/s, %s", t,
                                n_examples[t],
                                int(n_examples[t] / elapsed), meter)
                TB_LOGGER.set_step(global_step)
                TB_LOGGER.log_metric("lr", float(lr_fn(global_step)))
                for t, meter in task2loss.items():
                    TB_LOGGER.log_metric(meter.name, meter.val)
            # preemption check BEFORE the periodic validation: a SIGTERM
            # landing on a valid_steps boundary must not spend the grace
            # window on a full validation sweep
            if guard.check(global_step):
                # checkpoint NOW and exit cleanly; auto-resume picks the
                # run up from this exact step
                LOGGER.warning("preempted at step %d: saving and exiting",
                               global_step)
                saver.save(state.params, global_step,
                           optimizer=state.opt_state)
                last_validated = global_step  # suppress the final sweep
                preempted = True
                break
            if global_step % args.valid_steps == 0:
                results = validate(model, state.params, val_loaders,
                                   validate_fn, global_step)
                last_validated = global_step
                saver.save(state.params, global_step,
                           optimizer=state.opt_state)
        if global_step >= args.num_train_steps:
            break
    recycler.flush()
    return results, state, last_validated, global_step, preempted


if __name__ == "__main__":
    main()
