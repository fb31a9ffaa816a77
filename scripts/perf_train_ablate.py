"""Ablate the ITM train step + offline encode on the real chip.

Each variant is one compile (30s-2min through the relay); timings use the
chained-accumulator method (host pull once at the end) from
scripts/perf_throughput.py — `block_until_ready` does not wait through the
axon relay.

Variants:
  train/base          current code (threefry dropout RNG, pallas kernels)
  train/partitionable jax_threefry_partitionable=True
  train/rbg           rbg typed keys for dropout RNG
  train/nodrop        deterministic=True (bounds total dropout+RNG cost)
  train/xla           LDOT_KERNEL_BACKEND=xla (run separately, env var)
  encode/base         image-tower eval fwd B=256
"""
import sys
import time

import jax
import jax.numpy as jnp

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import BiEncoder
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


def run_train(model, params, tag, rng, deterministic=False):
    tx = make_optimizer(1e-5, max_grad_norm=2.0)
    batches = [_synthetic_batch(B, txt_len=TXT_LEN, n_regions=N_REGIONS,
                                seed=i) for i in range(4)]
    if deterministic:
        from lightningdot_tpu.training import itm_step as its

        def loss_step(state, batch, rng):
            def loss_fn(p):
                loss, (m, _) = its.itm_loss_fn(model, p, batch, rng,
                                               deterministic=True)
                return loss, m
            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
            import optax
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params2 = optax.apply_updates(state.params, updates)
            return its.TrainState(params2, opt_state, state.step + 1), metrics

        step = jit_train_step(loss_step, donate=False)
    else:
        step = jit_train_step(make_itm_train_step(model, tx), donate=False)
    state = create_train_state(params, tx)

    def run(b):
        s, m = step(state, b, rng)
        return m["loss"].astype(jnp.float32)

    dt = pipeline_time(run, batches)
    print(f"train/{tag}: {dt*1e3:.1f} ms/step -> {B/dt:.0f} pairs/s",
          flush=True)
    return dt


def run_train_production(model, params, rng, fused=False):
    """The PRODUCTION configuration: donate=True with threaded state
    (what the drivers actually run — donation removes a state copy)."""
    import time

    if fused:
        from lightningdot_tpu.training.optim import make_fused_adamw
        tx = make_fused_adamw(1e-5, max_grad_norm=2.0)
    else:
        tx = make_optimizer(1e-5, max_grad_norm=2.0)
    batches = [_synthetic_batch(B, txt_len=TXT_LEN, n_regions=N_REGIONS,
                                seed=i) for i in range(4)]
    step = jit_train_step(make_itm_train_step(model, tx), donate=True)
    state = create_train_state(params, tx)

    state, m = step(state, batches[0], rng)
    float(m["loss"])  # compile + real sync
    t0 = time.perf_counter()
    n = 0
    acc = jnp.float32(0)
    for _ in range(4):
        for b in batches:
            state, m = step(state, b, rng)
            acc = acc + m["loss"].astype(jnp.float32)
            n += 1
    float(acc)
    dt = (time.perf_counter() - t0) / n
    tag = "fused-adamw" if fused else "optax"
    print(f"train/production({tag}): {dt*1e3:.1f} ms/step -> "
          f"{B/dt:.0f} pairs/s", flush=True)
    return dt


def run_encode(model, params_bf16, tag):
    batches = [_synthetic_batch(256, txt_len=32, n_regions=64, seed=i)
               for i in range(4)]
    enc_fn = jax.jit(lambda p, b: jnp.sum(
        model.encode_img(p, b["imgs"]).astype(jnp.float32)))
    dt = pipeline_time(lambda b: enc_fn(params_bf16, b), batches)
    print(f"encode/{tag}: {dt*1e3:.1f} ms -> {256/dt:.0f} imgs/s", flush=True)
    return dt


def main():
    setup_runtime()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    txt_cfg = EncoderConfig(vocab_size=28996)
    img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048)
    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(0)
    if which in ("all", "base"):
        run_train(model, params, "base", key)
    if which in ("all", "partitionable"):
        jax.config.update("jax_threefry_partitionable", True)
        run_train(model, params, "partitionable", key)
        jax.config.update("jax_threefry_partitionable", False)
    if which in ("all", "rbg"):
        rbg = jax.random.key(0, impl="rbg")
        run_train(model, params, "rbg", rbg)
    if which in ("all", "production"):
        rbg = jax.random.key(0, impl="rbg")
        run_train_production(model, params, rbg)
    if which in ("all", "fused"):
        rbg = jax.random.key(0, impl="rbg")
        run_train_production(model, params, rbg, fused=True)
    if which == "remat":
        import dataclasses as dc

        rbg = jax.random.key(0, impl="rbg")
        model_r = dc.replace(model, remat=True)
        run_train(model_r, params, "remat", rbg)
    if which == "noattndrop":
        import dataclasses as dc

        rbg = jax.random.key(0, impl="rbg")
        model_n = BiEncoder(
            dc.replace(txt_cfg, attention_probs_dropout_prob=0.0),
            dc.replace(img_cfg, attention_probs_dropout_prob=0.0),
            compute_dtype=jnp.bfloat16)
        run_train(model_n, params, "no-attn-drop", rbg)
    if which in ("all", "nodrop"):
        run_train(model, params, "nodrop", key, deterministic=True)
    if which in ("all", "encode"):
        params_bf16 = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                                   params)
        run_encode(model, params_bf16, "base")


if __name__ == "__main__":
    main()
