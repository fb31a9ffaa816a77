"""Process-level runtime setup shared by all CLI drivers."""
from __future__ import annotations

import os


def setup_runtime(args=None) -> None:
    """Enable the persistent XLA compilation cache and apply backend flags.

    First compiles through the TPU tunnel cost tens of seconds; the
    persistent cache makes every driver restart (and auto-resume) start hot.
    """
    import jax

    cache_dir = os.environ.get(
        "LDOT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "lightningdot_tpu",
                     "xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass

    if args is not None:
        from lightningdot_tpu.ops.backend import set_backend

        set_backend(getattr(args, "kernel_backend", "auto"))


def dropout_key(seed: int):
    """Training RNG key using the hardware ``rbg`` generator.

    Dropout-mask generation with the default threefry keys costs ~12 ms per
    ITM train step on v5e (13% — scripts/perf_train_ablate.py); the
    counter-based rbg implementation makes it free. rbg splits/fold_ins are
    not cryptographic, which is irrelevant for dropout.
    """
    import jax

    return jax.random.key(seed, impl="rbg")
