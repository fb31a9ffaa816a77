"""TRUE on-device ITM train-step time via a device-side step chain.

The host-loop numbers in perf_train_ablate.py pay per-call dispatch through
the axon relay on every step; production training on a real TPU host does
not. This script runs K steps inside ONE jitted program (lax.scan over the
step, state threaded through the carry — a strict serial dependency) and
reports the slope between a short and a long chain, which cancels dispatch,
transfer, and warmup constants (the bench.py method applied to training).

Also measures a depth slope (6- vs 12-layer towers at fixed chain length)
to split per-layer cost from fixed per-step cost (embeddings, loss,
optimizer, RNG).

Usage: python scripts/perf_train_device_loop.py [base|depth|all]
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.training.itm_step import (create_train_state,
                                                make_itm_train_step)
from lightningdot_tpu.training.optim import make_optimizer
from lightningdot_tpu.utils.runtime import dropout_key, setup_runtime
from __graft_entry__ import _synthetic_batch

B, TXT_LEN, N_REGIONS = 96, 32, 64


def make_tx():
    """LDOT_OPT_STATE=bfloat16 measures the FusedAdamW bf16-state option;
    LDOT_ADAMW_KERNEL=1 measures the Pallas AdamW sweep (f32 state)."""
    import os

    if os.environ.get("LDOT_OPT_STATE") == "bfloat16":
        from lightningdot_tpu.training.optim import make_fused_adamw

        return make_fused_adamw(1e-5, max_grad_norm=2.0,
                                state_dtype=jnp.bfloat16)
    if os.environ.get("LDOT_ADAMW_KERNEL") == "1":
        from lightningdot_tpu.training.optim import make_fused_adamw

        return make_fused_adamw(1e-5, max_grad_norm=2.0)
    return make_optimizer(1e-5, max_grad_norm=2.0)


def dyn_chain(step_one):
    """Dynamic-trip-count chain of ``step_one(state, batch, rng, i) ->
    (state, loss)``: one compiled program serves all lengths.

    A ``while_loop`` with a DYNAMIC trip count, so the short and long
    slope runs share ONE compile — remote compiles of the full-unroll
    12-layer step can run 20-30 min through the relay; per-length ``scan``
    forms paid that twice per configuration.

    No donation: timed() invokes the program twice with the same state
    (donated buffers cannot be reused). Donation only affects the program
    boundary (one state copy, cancelled by the short-vs-long slope); the
    loop carry is aliased in place by XLA either way, so the slope equals
    the donated production step time.
    """

    def run(state, batch, rng, n):
        def cond(c):
            return c[0] < n

        def body(c):
            i, s, _ = c
            s2, loss = step_one(s, batch, rng, i)
            return i + 1, s2, loss

        _, _, loss = lax.while_loop(
            cond, body, (jnp.int32(0), state, jnp.float32(0)))
        return loss.astype(jnp.float32)

    return jax.jit(run)


def chained_steps(model, params, batch):
    """One jitted program running n ITM train steps back to back."""
    tx = make_tx()
    step = make_itm_train_step(model, tx)
    state = create_train_state(params, tx)
    mb = {"txts": batch["txts"], "imgs": batch["imgs"], "caps": batch["caps"]}
    if "valid_mask" in batch:
        mb["valid_mask"] = batch["valid_mask"]

    def one(s, b, rng, i):
        s2, m = step(s, b, jax.random.fold_in(rng, i))
        return s2, m["loss"].astype(jnp.float32)

    return dyn_chain(one), state, mb


def timed(fn, state, mb, rng, n):
    t0 = time.perf_counter()
    out = fn(state, mb, rng, jnp.int32(n))
    f = float(out)  # real sync (block_until_ready lies through the relay)
    return time.perf_counter() - t0, f


def measure(model, params, batch, tag, n_short=4, n_long=16):
    rng = dropout_key(0)
    fn, st, mb = chained_steps(model, params, batch)
    print(f"{tag}: compiling...", flush=True)
    timed(fn, st, mb, rng, 1)  # compile + warm
    t_s, _ = timed(fn, st, mb, rng, n_short)
    t_l, loss = timed(fn, st, mb, rng, n_long)
    per_step = (t_l - t_s) / (n_long - n_short)
    print(f"{tag}: short({n_short})={t_s*1e3:.1f} ms, "
          f"long({n_long})={t_l*1e3:.1f} ms -> {per_step*1e3:.2f} ms/step "
          f"({B/per_step:.0f} pairs/s)  [loss={loss:.4f}]", flush=True)
    return per_step


def build(n_layers=12):
    txt_cfg = EncoderConfig(vocab_size=28996, num_hidden_layers=n_layers)
    img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048,
                            num_hidden_layers=n_layers)
    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def measure_encode(model, params, tag, bs=256, n_short=4, n_long=16):
    """Offline image-tower encode (the hard-neg re-mine hot spot), device
    chain: each iteration feeds the previous output's sum back into the
    features so the chain is serially dependent."""
    batch = _synthetic_batch(bs, txt_len=32, n_regions=N_REGIONS, seed=0)
    params_bf16 = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    imgs = batch["imgs"]

    def make(n):
        def run(p, imgs):
            def body(carry, _):
                feats = dict(imgs, img_feat=imgs["img_feat"] + carry)
                emb = model.encode_img(p, feats)
                return jnp.sum(emb.astype(jnp.float32)) * 1e-9, None
            carry, _ = lax.scan(body, jnp.float32(0), None, length=n)
            return carry
        return jax.jit(run)

    fn_s, fn_l = make(n_short), make(n_long)
    float(fn_s(params_bf16, imgs))
    t0 = time.perf_counter(); float(fn_s(params_bf16, imgs))
    t_s = time.perf_counter() - t0
    float(fn_l(params_bf16, imgs))
    t0 = time.perf_counter(); float(fn_l(params_bf16, imgs))
    t_l = time.perf_counter() - t0
    per = (t_l - t_s) / (n_long - n_short)
    print(f"{tag}: {per*1e3:.2f} ms/batch -> {bs/per:.0f} imgs/s", flush=True)
    return per


def main():
    global B
    setup_runtime()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if len(sys.argv) > 2:
        B = int(sys.argv[2])
    batch = _synthetic_batch(B, txt_len=TXT_LEN, n_regions=N_REGIONS, seed=0)

    if which == "encode":
        model, params = build(12)
        measure_encode(model, params, "device-loop/encode-B256")
        return

    if which == "pretrain":
        # all four pre-train task steps + the mixed round-robin loop at
        # BERT-base scale on synthetic data (VERDICT r2 item 2: only MLM
        # had a device number)
        import tempfile

        from lightningdot_tpu.data.feat_db import DetectFeatDb
        from lightningdot_tpu.data.pretrain import (ItmPreDataset,
                                                    MlmDataset, MrcDataset,
                                                    MrfrDataset,
                                                    PretrainCollateConfig,
                                                    itm_pre_collate,
                                                    mlm_collate, mrc_collate,
                                                    mrfr_collate)
        from lightningdot_tpu.data.synth import make_synth_dataset
        from lightningdot_tpu.data.txt_db import TxtTokDb
        from lightningdot_tpu.models.bi_encoder import (
            BiEncoderForPretraining)
        from lightningdot_tpu.training.pretrain_step import (
            make_pretrain_step)

        root = tempfile.mkdtemp(prefix="pretrain_perf_")
        txt_dir, img_dir = make_synth_dataset(
            str(root), n_imgs=max(B, 128), txts_per_img=2, img_dim=2048,
            min_bb=40, max_bb=64, max_txt_len=TXT_LEN, seed=0,
            with_soft_labels=True)
        txt_db = TxtTokDb(txt_dir, max_txt_len=-1)
        img_db = DetectFeatDb(img_dir, conf_th=0.2, max_bb=64, min_bb=40)
        # img bucket covers CLS + regions (const.IMG_LEN_BUCKETS semantics),
        # so N_REGIONS+1 keeps all 64 regions unmasked for MRFR/MRC
        ccfg = PretrainCollateConfig(txt_buckets=(TXT_LEN,),
                                     img_buckets=(N_REGIONS + 1,),
                                     batch_pad=B, img_label_dim=1601)

        def clean(b):
            b = {k: v for k, v in b.items()
                 if k not in ("n_valid", "sample_size", "teacher")}
            return jax.tree.map(jnp.asarray, b)

        TASKS = ("mlm", "mrfr", "mrckl", "itm")
        dsets = {
            "mlm": (MlmDataset(txt_db, img_db, seed=0), mlm_collate),
            "mrfr": (MrfrDataset(0.15, txt_db, img_db, seed=0),
                     mrfr_collate),
            "mrckl": (MrcDataset(0.15, txt_db, img_db, seed=0), mrc_collate),
            "itm": (ItmPreDataset(txt_db, img_db, 0.5, seed=0),
                    itm_pre_collate),
        }
        batches = {t: clean(c([d[i % len(d)] for i in range(B)], ccfg))
                   for t, (d, c) in dsets.items()}

        txt_cfg = EncoderConfig(vocab_size=28996)
        img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048)
        model = BiEncoderForPretraining(
            BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16))
        params = model.init(jax.random.PRNGKey(0))
        tx = make_tx()
        init_state, step_for_task = make_pretrain_step(model, tx)
        state = init_state(params)
        rng = dropout_key(0)

        for task in TASKS:
            step = step_for_task(task)

            def one(s, b, rng, i, step=step):
                s2, m = step(s, b, jax.random.fold_in(rng, i))
                return s2, m["loss"].astype(jnp.float32)

            fn = dyn_chain(one)
            timed(fn, state, batches[task], rng, 1)  # compile
            t4, _ = timed(fn, state, batches[task], rng, 4)
            t16, loss = timed(fn, state, batches[task], rng, 16)
            per = (t16 - t4) / 12
            print(f"device-loop/pretrain-{task} B={B}: {per*1e3:.2f} "
                  f"ms/step ({B/per:.0f} ex/s) [loss={loss:.3f}]",
                  flush=True)

        # mixed MetaLoader-style loop: each cycle runs all four task steps
        # round-robin on the shared state (pretrain.py:390 hot loop; the
        # reference redraws the task per accumulation window — round-robin
        # covers every program transition)
        steps = {t: step_for_task(t) for t in TASKS}

        def one_cycle(s, bs, rng, i):
            loss = jnp.float32(0)
            for j, t in enumerate(TASKS):
                s, m = steps[t](s, bs[t], jax.random.fold_in(rng, i * 4 + j))
                loss = m["loss"].astype(jnp.float32)
            return s, loss

        fn = dyn_chain(one_cycle)
        timed(fn, state, batches, rng, 1)
        t1, _ = timed(fn, state, batches, rng, 1)
        t4c, loss = timed(fn, state, batches, rng, 4)
        per = (t4c - t1) / (3 * len(TASKS))
        print(f"device-loop/pretrain-mixed B={B}: {per*1e3:.2f} ms/step "
              f"({B/per:.0f} ex/s) [loss={loss:.3f}]", flush=True)
        return

    if which == "vqa":
        # VQA fine-tune step at BERT-base scale (the one driver without a
        # device number): question tower + image tower + intersection head
        # over 3,129 answers, instance-level BCE (train_vqa.py:188).
        import numpy as np

        from lightningdot_tpu.models.vqa import BiEncoderForVQA
        from lightningdot_tpu.training.itm_step import create_train_state
        from lightningdot_tpu.training.vqa_step import make_vqa_train_step

        txt_cfg = EncoderConfig(vocab_size=28996)
        img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048)
        model = BiEncoderForVQA(
            BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16),
            hidden_size=txt_cfg.out_size, num_answer=3129)
        params = model.init(jax.random.PRNGKey(0))
        np_rng = np.random.default_rng(0)
        t = np_rng.random((B, 3129)).astype(np.float32)
        vbatch = dict(batch, targets=jnp.asarray(t * (t > 0.999)),
                      valid_mask=jnp.ones((B,), jnp.float32))
        tx = make_tx()
        step = make_vqa_train_step(model, tx)
        state = create_train_state(params, tx)
        rng = dropout_key(0)

        def one(s, b, rng, i):
            s2, m = step(s, b, jax.random.fold_in(rng, i))
            return s2, m["loss"].astype(jnp.float32)

        fn = dyn_chain(one)
        timed(fn, state, vbatch, rng, 1)  # compile
        t4, _ = timed(fn, state, vbatch, rng, 4)
        t16, loss = timed(fn, state, vbatch, rng, 16)
        per = (t16 - t4) / 12
        print(f"device-loop/vqa B={B}: {per*1e3:.2f} ms/step "
              f"({B/per:.0f} ex/s) [loss={loss:.3f}]", flush=True)
        return

    if which == "sweep":
        # one process, several env configs (env is read at trace time)
        import os

        configs = [
            ("baseline", {}),
            ("bnsd", {"LDOT_ATTN_LAYOUT": "bnsd"}),
            ("adamw-kernel", {"LDOT_ADAMW_KERNEL": "1"}),
            ("bnsd+adamw", {"LDOT_ATTN_LAYOUT": "bnsd",
                            "LDOT_ADAMW_KERNEL": "1"}),
            # gated-off kernels, re-measured per round (verify skill step 6)
            ("attn-kernel", {"LDOT_ATTN_KERNEL": "1"}),
            ("ffn-dh1", {"LDOT_FFN_DH1": "1"}),
            ("bf16opt", {"LDOT_OPT_STATE": "bfloat16"}),
        ]
        if os.environ.get("LDOT_SWEEP"):
            names = os.environ["LDOT_SWEEP"].split(",")
            configs = [c for c in configs if c[0] in names]
        model, params = build(12)
        for tag, env in configs:
            for k, v in env.items():
                os.environ[k] = v
            measure(model, params, batch, f"device-loop/{tag}")
            for k in env:
                os.environ.pop(k, None)
        return

    if which in ("all", "base"):
        model, params = build(12)
        measure(model, params, batch, "device-loop/12L")
    if which in ("all", "depth"):
        model6, params6 = build(6)
        dt6 = measure(model6, params6, batch, "device-loop/6L")
        model, params = build(12)
        dt12 = measure(model, params, batch, "device-loop/12L")
        per_pair = (dt12 - dt6) / 6
        fixed = dt12 - 12 * per_pair
        print(f"depth slope: {per_pair*1e3:.2f} ms per (txt+img) layer pair; "
              f"fixed per-step cost {fixed*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
