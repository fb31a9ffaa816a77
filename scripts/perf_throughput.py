"""Throughput measurements: corpus encoding + training step (one chip)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.training.itm_step import (create_train_state,
                                                jit_train_step,
                                                make_itm_train_step)
from lightningdot_tpu.training.optim import make_optimizer
from __graft_entry__ import _synthetic_batch


def pipeline_time(fn, batches, reps=3):
    """Time via a host-side accumulator pulled once at the end; every
    iteration's output feeds the accumulator so nothing can be elided or
    overlap-reported by the async relay."""
    acc = jnp.float32(0)
    acc = acc + fn(batches[0])
    acc.block_until_ready()
    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        for b in batches:
            acc = acc + fn(b)
            n += 1
    float(acc)  # one real device->host sync
    return (time.perf_counter() - t0) / n


def main():
    txt_cfg = EncoderConfig(vocab_size=28996)
    img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048)
    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    params_bf16 = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)

    # corpus encoding throughput (image tower, eval): B x 64 regions
    for B in (64, 256):
        batches = [_synthetic_batch(B, txt_len=32, n_regions=64, seed=i)
                   for i in range(6)]
        enc_fn = jax.jit(
            lambda p, b: jnp.sum(model.encode_img(p, b["imgs"])
                                 .astype(jnp.float32)))
        for name, p in (("f32 params", params), ("bf16 params", params_bf16)):
            fn = lambda b, p=p: enc_fn(p, b)
            dt = pipeline_time(fn, batches)
            print(f"img encode B={B} ({name}): {dt*1e3:.1f} ms "
                  f"-> {B/dt:.0f} imgs/s", flush=True)

    # ITM train step throughput (dual tower + backward)
    tx = make_optimizer(1e-5, max_grad_norm=2.0)
    for B in (64, 128):
        batches = [_synthetic_batch(B, txt_len=32, n_regions=64, seed=i)
                   for i in range(6)]
        step = jit_train_step(make_itm_train_step(model, tx), donate=False)
        state = create_train_state(params, tx)
        rng = jax.random.PRNGKey(0)

        def run(b):
            s, m = step(state, b, rng)
            return m["loss"].astype(jnp.float32)

        dt = pipeline_time(run, batches)
        print(f"train step B={B}: {dt*1e3:.1f} ms -> {B/dt:.0f} pairs/s",
              flush=True)


if __name__ == "__main__":
    main()
