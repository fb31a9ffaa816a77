"""Capture a device trace of the ITM train step and dump per-op stats.

Writes /tmp/trace/... xplane files via jax.profiler, then converts them with
tensorboard_plugin_profile/xprof to per-HLO-op time tables. If the axon
relay does not forward device TraceMe events the xplane will only contain
host events — detect and report that.

Usage: python scripts/perf_profile_step.py [outdir]
"""
import glob
import json
import sys

import jax
import jax.numpy as jnp

from lightningdot_tpu.config import EncoderConfig
from lightningdot_tpu.models.bi_encoder import BiEncoder
from lightningdot_tpu.training.itm_step import (create_train_state,
                                                jit_train_step,
                                                make_itm_train_step)
from lightningdot_tpu.training.optim import make_optimizer
from lightningdot_tpu.utils.runtime import dropout_key, setup_runtime
from __graft_entry__ import _synthetic_batch

B, TXT_LEN, N_REGIONS = 96, 32, 64


def main():
    setup_runtime()
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace"
    txt_cfg = EncoderConfig(vocab_size=28996)
    img_cfg = EncoderConfig(vocab_size=28996, img_dim=2048)
    model = BiEncoder(txt_cfg, img_cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(1e-5, max_grad_norm=2.0)
    step = jit_train_step(make_itm_train_step(model, tx), donate=False)
    state = create_train_state(params, tx)
    batch = _synthetic_batch(B, txt_len=TXT_LEN, n_regions=N_REGIONS, seed=0)
    rng = dropout_key(0)

    s2, m = step(state, batch, rng)
    print("compiled; loss =", float(m["loss"]), flush=True)

    jax.profiler.start_trace(outdir)
    for i in range(3):
        s2, m = step(state, batch, rng)
    print("traced; loss =", float(m["loss"]), flush=True)
    jax.profiler.stop_trace()

    xs = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))
    print("xplane files:", xs, flush=True)
    if not xs:
        print("NO XPLANE — tracing not supported here")
        return

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    for tool in ("hlo_stats", "op_profile", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([xs[-1]], tool, {})
            out = outdir + f"/{tool}.json"
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            with open(out, "w") as f:
                f.write(data if isinstance(data, str) else json.dumps(data))
            print(f"wrote {out} ({len(data)} bytes)", flush=True)
        except Exception as e:
            print(f"{tool}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
