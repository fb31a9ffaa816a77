"""Probe remote-compiler DebugOptions overrides on the ITM train chain.

XLA_FLAGS can't carry TPU-only flags here (the local CPU-side registry
rejects them before the program ever reaches the relay), but AOT
``.lower().compile(compiler_options=...)`` ships env_option_overrides to
the REMOTE compiler, which owns the full TPU flag registry.

Usage: python scripts/perf_flag_probe.py key=value [key=value ...]
"""
import sys
import time

import jax
import jax.numpy as jnp

from lightningdot_tpu.utils.runtime import dropout_key, setup_runtime
from perf_train_device_loop import B, N_REGIONS, TXT_LEN, build, chained_steps
from __graft_entry__ import _synthetic_batch


def main():
    opts = dict(kv.split("=", 1) for kv in sys.argv[1:])
    setup_runtime()
    model, params = build(12)
    batch = _synthetic_batch(B, txt_len=TXT_LEN, n_regions=N_REGIONS, seed=0)
    fn, st, mb = chained_steps(model, params, batch)
    rng = dropout_key(0)
    print("lowering...", flush=True)
    lowered = fn.lower(st, mb, rng, jnp.int32(1))
    print(f"compiling with overrides {opts}...", flush=True)
    compiled = lowered.compile(compiler_options=opts or None)

    def timed(n):
        t0 = time.perf_counter()
        out = compiled(st, mb, rng, jnp.int32(n))
        float(out)
        return time.perf_counter() - t0

    timed(1)  # warm
    t4, t16 = timed(4), timed(16)
    per = (t16 - t4) / 12
    print(f"flags={opts}: {per*1e3:.2f} ms/step ({B/per:.0f} pairs/s)",
          flush=True)


if __name__ == "__main__":
    main()
