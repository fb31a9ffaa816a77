"""Shared loader for the native C++ libraries (built on demand via make)."""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Dict, Optional

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_cache: Dict[str, Optional[ctypes.CDLL]] = {}


def _build_locked() -> None:
    """Run make under an exclusive file lock.

    Multiple processes start concurrently (dataloader workers, multi-host
    ranks); without the lock one process can dlopen a half-linked .so while
    another is still writing it — and then cache the failure for its whole
    lifetime.
    """
    import fcntl

    NATIVE_DIR.mkdir(exist_ok=True)
    with open(NATIVE_DIR / ".build.lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                       capture_output=True, timeout=180)


def load_native(name: str) -> Optional[ctypes.CDLL]:
    """Load native/build/lib<name>.so, building the native tree once if
    missing; None when unavailable (callers fall back to pure python)."""
    if name in _cache:
        return _cache[name]
    so = NATIVE_DIR / "build" / f"lib{name}.so"
    # always run make (no-op when current): loading a stale .so after a
    # source update silently serves old behavior
    try:
        _build_locked()
    except Exception:
        if not so.exists():
            _cache[name] = None
            return None
    try:
        _cache[name] = ctypes.CDLL(str(so))
    except OSError:
        _cache[name] = None
    return _cache[name]
