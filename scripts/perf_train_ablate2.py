"""Round 2 of train-step ablations: component decomposition + unroll.

All variants use rbg dropout keys (the round-1 winner). Usage:
  python scripts/perf_train_ablate2.py [components|unroll|xla]
LDOT_SCAN_UNROLL / LDOT_KERNEL_BACKEND env vars toggle code paths.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import optax

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.training import itm_step as its
from lightningdot_tpu.training.itm_step import (create_train_state,
                                                jit_train_step,
                                                make_itm_train_step)
from lightningdot_tpu.training.optim import make_optimizer
from lightningdot_tpu.utils.runtime import setup_runtime
from __graft_entry__ import _synthetic_batch

B, TXT_LEN, N_REGIONS = 96, 32, 64


def pipeline_time(fn, batches, reps=4):
    acc = jnp.float32(0)
    acc = acc + fn(batches[0])
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    n = 0
    for _ in range(reps):
        for b in batches:
            acc = acc + fn(b)
            n += 1
    float(acc)
    return (time.perf_counter() - t0) / n


def batches():
    return [_synthetic_batch(B, txt_len=TXT_LEN, n_regions=N_REGIONS, seed=i)
            for i in range(4)]


def model_batch(b):
    return {"txts": b["txts"], "imgs": b["imgs"], "caps": b["caps"]}


def main():
    setup_runtime()
    which = sys.argv[1] if len(sys.argv) > 1 else "components"
    txt_cfg = EncoderConfig(vocab_size=28996)
    img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048)
    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.key(0, impl="rbg")
    bs = batches()
    tag = (f"unroll={os.environ.get('LDOT_SCAN_UNROLL', '1')},"
           f"backend={os.environ.get('LDOT_KERNEL_BACKEND', 'auto')}")

    if which == "components":
        # 1. txt-tower fwd only (train mode: dropout active)
        f_txt = jax.jit(lambda p, b, r: jnp.sum(model.encode_txt(
            p, b["txts"], deterministic=False, rng=r).astype(jnp.float32)))
        dt = pipeline_time(lambda b: f_txt(params, b, rng), bs)
        print(f"[{tag}] txt fwd (train mode): {dt*1e3:.1f} ms", flush=True)

        # 2. img-tower fwd only
        f_img = jax.jit(lambda p, b, r: jnp.sum(model.encode_img(
            p, b["imgs"], deterministic=False, rng=r).astype(jnp.float32)))
        dt = pipeline_time(lambda b: f_img(params, b, rng), bs)
        print(f"[{tag}] img fwd (train mode): {dt*1e3:.1f} ms", flush=True)

        # 3. full loss fwd
        f_loss = jax.jit(lambda p, b, r: its.itm_loss_fn(model, p, b, r)[0])
        dt = pipeline_time(lambda b: f_loss(params, model_batch(b), rng), bs)
        print(f"[{tag}] loss fwd: {dt*1e3:.1f} ms", flush=True)

        # 4. fwd + bwd (no optimizer)
        f_grad = jax.jit(lambda p, b, r: optax.global_norm(
            jax.grad(lambda q: its.itm_loss_fn(model, q, b, r)[0])(p)))
        dt = pipeline_time(lambda b: f_grad(params, model_batch(b), rng), bs)
        print(f"[{tag}] fwd+bwd: {dt*1e3:.1f} ms", flush=True)

    # full step at current env settings
    tx = make_optimizer(1e-5, max_grad_norm=2.0)
    step = jit_train_step(make_itm_train_step(model, tx), donate=False)
    state = create_train_state(params, tx)
    dt = pipeline_time(
        lambda b: step(state, b, rng)[1]["loss"].astype(jnp.float32), bs)
    print(f"[{tag}] full step: {dt*1e3:.1f} ms -> {B/dt:.0f} pairs/s",
          flush=True)


if __name__ == "__main__":
    main()
