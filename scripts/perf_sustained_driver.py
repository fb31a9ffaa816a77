"""Sustained integrated training loop on the chip (VERDICT r3 item 4).

Runs the SHIPPED driver pipeline — DataLoader (threaded fetch+collate) ->
DevicePrefetcher -> jitted train step, i.e. exactly cli/train_itm.py's hot
loop — for a few hundred steps on synthetic COCO-scale data and reports
steady-state ex/s against the device-loop ceiling, decomposing the gap:

  (a) full closed loop     : collate + relay upload + dispatch + compute
  (b) fixed host batch     : relay upload + dispatch + compute (no collate)
  (c) device-resident batch: dispatch + compute (no upload)
  (d) device-loop ceiling  : compute only (perf_train_device_loop.py, r2/r3)

(b)-(c) and (c)-(d) quantify axon-relay harness artifacts (per-step HTTP
batch upload and dispatch) that a production TPU host does not pay (PCIe
DMA ~10 GB/s, local runtime dispatch ~10s of us); (a)-(b) is the real
host-pipeline cost the driver must hide.

Timing: every step's state feeds the next (serial dependency), so one
float() pull of the last step's loss closes the whole window — the relay's
async dispatch cannot overlap-report (see bench.py docstring).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python
       scripts/perf_sustained_driver.py [itm|pretrain|both] [steps]
"""
from __future__ import annotations

import sys
import tempfile
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from lightningdot_tpu.config import EncoderConfig  # noqa: E402
from lightningdot_tpu.data.feat_db import ImageDbGroup  # noqa: E402
from lightningdot_tpu.data.loader import DevicePrefetcher  # noqa: E402
from lightningdot_tpu.data.padding import Recycler  # noqa: E402
from lightningdot_tpu.data.synth import make_synth_dataset  # noqa: E402
from lightningdot_tpu.models.bi_encoder import BiEncoder  # noqa: E402
from lightningdot_tpu.training.itm_step import (  # noqa: E402
    create_train_state, jit_train_step, make_itm_train_step)
from lightningdot_tpu.training.optim import (make_optimizer,  # noqa: E402
                                             schedule_linear)
from lightningdot_tpu.utils.runtime import dropout_key, setup_runtime  # noqa: E402

B = 96
DEVICE_LOOP_MS = {"itm": 62.1}  # measured ceiling (PERF.md r3 ladder)


class _Opts:
    train_batch_size = B
    valid_batch_size = B
    seed = 0
    loader_workers = 1
    max_txt_len = 28
    num_hard_negatives = 0
    conf_th = 0.2
    max_bb = 60
    min_bb = 30
    num_bb = 36
    compute_dtype = "bf16"
    kernel_backend = "auto"


def build_itm_pipeline(root: str, n_imgs: int):
    from lightningdot_tpu.data.itm import CollateConfig, itm_fast_collate
    from lightningdot_tpu.training.trainer_utils import (build_dataloader,
                                                         load_dataset)

    opts = _Opts()
    txt_dir, img_dir = make_synth_dataset(
        root, n_imgs=n_imgs, txts_per_img=2, img_dim=2048,
        min_bb=opts.min_bb, max_bb=opts.max_bb, conf_th=opts.conf_th,
        max_txt_len=opts.max_txt_len, seed=11)
    all_img_dbs = ImageDbGroup(opts.conf_th, opts.max_bb, opts.min_bb,
                               opts.num_bb)
    dataset = load_dataset(all_img_dbs, [txt_dir], [img_dir], opts,
                           is_train=True)
    ccfg = CollateConfig(fixed_batch=B)
    collate = lambda items: itm_fast_collate(items, ccfg)

    def loader_fn(epoch_seed):
        dataset.new_epoch()
        return build_dataloader(dataset, collate, True, opts,
                                seed=epoch_seed)

    return loader_fn, opts


def make_step(opts):
    txt_cfg = EncoderConfig(vocab_size=28996)
    img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048)
    import jax.numpy as jnp

    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(schedule_linear(5e-5, 100, 5000), max_grad_norm=2.0)
    state = create_train_state(params, tx)
    step = jit_train_step(make_itm_train_step(model, tx), mesh=None)
    return state, step


def run_window(step, state, batches, rng, label: str, n_ex: int):
    """Run len(batches) steps; serial state dependency; one closing pull.

    Returns (ms/step, new_state) — the step donates its input state, so
    callers must thread the returned state, never reuse the one passed in.
    """
    t0 = time.perf_counter()
    metrics = None
    for i, batch in enumerate(batches):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    closing = float(metrics["loss"])
    dt = time.perf_counter() - t0
    n = len(batches)
    print(f"  {label:26s}: {1000 * dt / n:7.1f} ms/step  "
          f"{n_ex * n / dt:7.0f} ex/s   (loss {closing:.3f}, {n} steps)")
    return 1000 * dt / n, state


def sustained_itm(n_steps: int):
    print(f"== ITM fine-tune, B={B}, full parity model, bf16 ==")
    root = tempfile.mkdtemp(prefix="sustain_")
    # 1500 imgs x 2 captions = 3000 examples (~280 MB of 2048-d f16
    # features): the window spans several epochs, which is exactly what
    # the shipped driver does (new_epoch + fresh shuffled loader each)
    loader_fn, opts = build_itm_pipeline(root, n_imgs=1500)
    state, step = make_step(opts)
    rng = dropout_key(0)

    # -- (a) full closed loop through the shipped pipeline ------------------
    def epochs():
        e = 0
        while True:
            yield from DevicePrefetcher(loader_fn(e), put=lambda b: b)
            e += 1

    it = epochs()
    recycler = Recycler()
    # warmup: compiles + buffer pool + prefetch steady state
    for _ in range(8):
        b = next(it)
        state, m = step(state, b, jax.random.fold_in(rng, 999))
        recycler.push(b, ready=m["loss"])
    float(m["loss"])

    t0 = time.perf_counter()
    for i in range(n_steps):
        b = next(it)
        state, m = step(state, b, jax.random.fold_in(rng, i))
        recycler.push(b, ready=m["loss"])
    closing = float(m["loss"])
    dt = time.perf_counter() - t0
    a_ms = 1000 * dt / n_steps
    print(f"  (a) full closed loop      : {a_ms:7.1f} ms/step  "
          f"{B * n_steps / dt:7.0f} ex/s   (loss {closing:.3f}, "
          f"{n_steps} steps)")
    recycler.flush()

    # -- (b) fixed host batch (no collate) -----------------------------------
    # deep-copy: the loader's prefetch thread keeps collating into the
    # recycler's buffer pool, which may alias this batch's arrays
    fixed = jax.tree.map(
        lambda x: np.copy(x) if isinstance(x, np.ndarray) else x, next(it))
    n_b = min(n_steps, 100)
    b_ms, state = run_window(step, state, [fixed] * n_b, rng,
                             "(b) fixed host batch", B)

    # -- (c) device-resident batch (no upload) -------------------------------
    import jax.numpy as jnp

    dev_batch = jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, fixed)
    c_ms, state = run_window(step, state, [dev_batch] * n_b, rng,
                             "(c) device-resident batch", B)

    d_ms = DEVICE_LOOP_MS["itm"]
    print(f"  (d) device-loop ceiling   : {d_ms:7.1f} ms/step  "
          f"{B / d_ms * 1000:7.0f} ex/s   (PERF.md r3)")
    print(f"  gap decomposition: collate+loader {a_ms - b_ms:+.1f} ms, "
          f"relay upload {b_ms - c_ms:+.1f} ms, relay dispatch "
          f"{c_ms - d_ms:+.1f} ms (harness artifacts: upload+dispatch)")


def sustained_pretrain(n_steps: int):
    print(f"== mixed pre-train (mlm/mrfr/mrc/itm via MetaLoader) ==")
    root = tempfile.mkdtemp(prefix="sustain_pre_")
    txt_dir, img_dir = make_synth_dataset(
        root, n_imgs=3000, txts_per_img=2, img_dim=2048, min_bb=30,
        max_bb=60, conf_th=0.2, max_txt_len=28, with_soft_labels=True,
        seed=12)
    from lightningdot_tpu.cli.pretrain import create_dataloaders
    from lightningdot_tpu.const import IMG_LABEL_DIM
    from lightningdot_tpu.data.loader import MetaLoader
    from lightningdot_tpu.data.pretrain import PretrainCollateConfig
    from lightningdot_tpu.models.bi_encoder import BiEncoderForPretraining
    from lightningdot_tpu.training.pretrain_step import make_pretrain_step

    class Opts(_Opts):
        train_batch_size = B * 92     # token budget ~ B rows at these lens
        mrm_prob = 0.15
        itm_neg_prob = 0.5
        gradient_accumulation_steps = 1

    args = Opts()
    loaders = create_dataloaders(
        [{"name": "synth", "db": [txt_dir], "img": [img_dir],
          "tasks": ["mlm", "mrfr", "mrc", "itm"], "mix_ratio": [2, 1, 1, 1]}],
        True, args, ImageDbGroup(0.2, 60, 30, 36), PretrainCollateConfig())
    meta = MetaLoader(loaders, accum_steps=1, seed=0)

    import jax.numpy as jnp

    txt_cfg = EncoderConfig(vocab_size=28996)
    img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048)
    bi = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16)
    model = BiEncoderForPretraining(bi, cls_concat="",
                                    img_label_dim=IMG_LABEL_DIM)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(schedule_linear(5e-5, 100, 5000), max_grad_norm=2.0)
    init_state, step_for_task = make_pretrain_step(model, tx)
    state = init_state(params)
    rng = dropout_key(0)

    it = iter(meta)
    recycler = Recycler()
    # warmup one epoch-ish: touch every (task, shape) program
    warm = 60
    m = None
    for i in range(warm):
        name, batch = next(it)
        mb = {k: v for k, v in batch.items()
              if k not in ("n_valid", "sample_size")}
        state, m = step_for_task(name.split("_")[0])(
            state, mb, jax.random.fold_in(rng, 7000 + i))
        recycler.push(batch, ready=m["loss"])
    float(m["loss"])

    n_ex = 0
    t0 = time.perf_counter()
    for i in range(n_steps):
        name, batch = next(it)
        n_ex += batch["n_valid"]
        mb = {k: v for k, v in batch.items()
              if k not in ("n_valid", "sample_size")}
        state, m = step_for_task(name.split("_")[0])(
            state, mb, jax.random.fold_in(rng, i))
        recycler.push(batch, ready=m["loss"])
    closing = float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"  mixed closed loop: {1000 * dt / n_steps:7.1f} ms/step  "
          f"{n_ex / dt:7.0f} ex/s  (loss {closing:.3f}, {n_steps} steps, "
          f"{n_ex} examples)")
    recycler.flush()


def main():
    setup_runtime()
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    print(f"devices: {jax.devices()}")
    if what in ("itm", "both"):
        sustained_itm(n_steps)
    if what in ("pretrain", "both"):
        sustained_pretrain(n_steps)


if __name__ == "__main__":
    main()
