"""Worker process for the multi-process test suite (tests/test_multiprocess.py).

Each worker is one 'host': it owns 1 local CPU device and joins the global
mesh via ``jax.distributed.initialize``. Results are emitted to stdout as
``MPRES {json}`` lines the parent test parses.

Scenarios:
  * ``journey`` — the retired scripts/multihost_smoke.py assertions
    (collectives, cross-host divergence detection, MetaLoader task-stream
    agreement, preemption OR-reduce cadence), then a real ITM training
    phase on the global dp mesh (per-step global losses emitted for the
    single-process equality check), a rank-0 ModelSaver save, an all-rank
    resume from the shared checkpoint, and a final parameter digest.
  * ``driver`` — the shipped cli/pretrain.py main() end-to-end under
    ``jax.distributed`` (rank-strided data sharding, static multi-host
    shapes, rank-0-only checkpointing, auto-resume continuation).
"""
from __future__ import annotations

import json
import os
import sys


def emit(event: str, **payload) -> None:
    print("MPRES " + json.dumps({"event": event, **payload}), flush=True)


def _init(cfg) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # sitecustomize preloads a TPU PJRT plugin; env alone is not enough
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{cfg['port']}",
                               num_processes=cfg["world"],
                               process_id=cfg["rank"])
    assert jax.process_count() == cfg["world"]


def run_smoke(cfg) -> None:
    import jax

    from lightningdot_tpu.data.loader import MetaLoader
    from lightningdot_tpu.parallel.mesh import assert_same_across_hosts
    from lightningdot_tpu.utils.misc import host_all_gather
    from lightningdot_tpu.utils.preemption import PreemptionGuard

    rank, world = cfg["rank"], cfg["world"]
    # agreement passes on identical values
    assert_same_across_hosts("mlm_task", "task")
    # pickle-free pytree gather, rank-distinct payloads
    gathered = host_all_gather({"rank": rank, "sq": rank * rank})
    assert [int(g["rank"]) for g in gathered] == list(range(world)), gathered
    assert [int(g["sq"]) for g in gathered] == [r * r for r in range(world)]
    # divergence must raise on EVERY host
    try:
        assert_same_across_hosts(f"divergent-{rank}", "task")
        raise SystemExit("assert_same_across_hosts missed divergence")
    except RuntimeError:
        pass

    # MetaLoader task sampling agrees across hosts by seed alone
    def fake_loader(tag):
        def gen():
            i = 0
            while True:
                yield f"{tag}-{i}"
                i += 1
        return gen()

    ml = MetaLoader({"mlm_coco": (fake_loader("a"), 2),
                     "itm_vg": (fake_loader("b"), 1)},
                    accum_steps=2, seed=7)
    it = iter(ml)
    tasks = [next(it)[0] for _ in range(12)]
    assert_same_across_hosts(tasks, "MetaLoader task sequence")

    # preemption OR-reduce under skewed signal delivery: only rank 0
    # latches; between gather boundaries nobody acts on the local flag;
    # at the boundary EVERY host must see requested=True
    guard = PreemptionGuard(check_every=4)
    if rank == 0:
        guard.requested = True
    assert guard.check(global_step=3) is False, "acted off-boundary"
    assert guard.check(global_step=4), f"rank {rank}: flag not OR-reduced"
    # all hosts still agree after the gather
    assert all(host_all_gather(guard.requested))
    emit("smoke", ok=True, rank=rank)


def run_journey(cfg) -> None:
    import jax
    import numpy as np
    from jax.sharding import Mesh

    import mp_common as mpc
    from lightningdot_tpu.parallel.mesh import replicate
    from lightningdot_tpu.training.checkpoints import (ModelSaver, NoOpSaver,
                                                       load_checkpoint)
    from lightningdot_tpu.training.itm_step import TrainState

    run_smoke(cfg)
    rank, world = cfg["rank"], cfg["world"]
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    params = mpc.init_params()
    tx, state, step_fn, rng = mpc.make_train_setup(mesh, params)

    losses = []
    for s in range(mpc.N_STEPS):
        batch = mpc.local_itm_batch(s, rank)
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, s))
        losses.append(float(metrics["loss"]))
    emit("losses", phase="train", rank=rank, values=losses)

    # rank-0 save -> everyone resumes from the shared checkpoint
    from jax.experimental import multihost_utils

    ckpt_dir = cfg["workdir"]
    saver = ModelSaver(ckpt_dir) if rank == 0 else NoOpSaver()
    saver.save(state.params, mpc.N_STEPS, optimizer=state.opt_state)
    saver.wait()
    multihost_utils.sync_global_devices("ckpt written")
    path = os.path.join(ckpt_dir, f"model_step_{mpc.N_STEPS}")
    loaded_params, loaded_opt, meta = load_checkpoint(
        path, model_template=state.params,
        optimizer_template=state.opt_state)
    assert meta["step"] == mpc.N_STEPS
    # the loaded tree must equal the live replicated state on EVERY rank
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(loaded_params)[0],
            jax.tree_util.tree_flatten_with_path(state.params)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
    state = replicate(mesh, TrainState(loaded_params, loaded_opt,
                                       state.step))

    losses2 = []
    for s in range(mpc.N_STEPS, mpc.N_STEPS + mpc.N_RESUME_STEPS):
        batch = mpc.local_itm_batch(s, rank)
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, s))
        losses2.append(float(metrics["loss"]))
    emit("losses", phase="resume", rank=rank, values=losses2)
    emit("digest", rank=rank, value=mpc.params_digest(state.params))

    # itm PRETRAIN task: the global contrastive labels must be correct
    # after shard_batch concatenates the hosts' local batches (the collate's
    # local pos_ctx_indices arange must NOT be trusted — ADVICE r4 high)
    from lightningdot_tpu.parallel.mesh import shard_batch

    pre_model, pre_params = mpc.tiny_pretrain_model()
    pstate, pstep, prng = mpc.make_itm_pre_setup(mesh, pre_model, pre_params)
    plosses = []
    for s in range(mpc.N_ITM_PRE_STEPS):
        batch = mpc.local_itm_pre_batch(s, rank)
        pstate, metrics = pstep(pstate, shard_batch(mesh, batch),
                                jax.random.fold_in(prng, s))
        plosses.append(float(metrics["loss"]))
    emit("losses", phase="itm_pre", rank=rank, values=plosses)


def run_driver(cfg) -> None:
    import mp_common as mpc
    from lightningdot_tpu.cli.pretrain import main

    rank = cfg["rank"]
    cfg_path = cfg["pretrain_config"]
    results, state = main(["--config", cfg_path, "--compute_dtype", "f32"])
    emit("driver", rank=rank, phase="initial", step=int(state.step),
         results={t: {k: float(v) for k, v in m.items()}
                  for t, m in results.items()})
    # auto-resume continuation from the rank-0 checkpoint (all ranks read
    # the shared output_dir)
    results2, state2 = main(["--config", cfg_path, "--compute_dtype", "f32",
                             "--num_train_steps", str(cfg["resume_steps"])])
    emit("driver", rank=rank, phase="resume", step=int(state2.step),
         results={t: {k: float(v) for k, v in m.items()}
                  for t, m in results2.items()})
    emit("digest", rank=rank, value=mpc.params_digest(state2.params))


def main() -> None:
    cfg = json.loads(sys.argv[1])
    _init(cfg)
    scenario = cfg["scenario"]
    if scenario == "journey":
        run_journey(cfg)
    elif scenario == "smoke":
        run_smoke(cfg)
    elif scenario == "driver":
        run_driver(cfg)
    else:
        raise SystemExit(f"unknown scenario {scenario}")
    emit("done", rank=cfg["rank"])


if __name__ == "__main__":
    main()
