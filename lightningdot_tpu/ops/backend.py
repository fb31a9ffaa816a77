"""Kernel backend selection: 'pallas' on TPU, 'xla' elsewhere."""
from __future__ import annotations

import os

import jax

_backend: str | None = None


def set_backend(name: str) -> None:
    """Force the kernel backend ('auto' | 'xla' | 'pallas')."""
    global _backend
    if name not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown kernel backend: {name}")
    _backend = None if name == "auto" else name


def backend() -> str:
    """Resolve the active kernel backend."""
    if _backend is not None:
        return _backend
    env = os.environ.get("LDOT_KERNEL_BACKEND", "auto")
    if env in ("xla", "pallas"):
        return env
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover - no devices at all
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"
