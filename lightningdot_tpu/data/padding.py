"""Static-shape padding helpers.

XLA recompiles per input shape, so instead of the reference's exact
per-batch max-length padding (dvl/data/itm.py:231-252) batches are padded up
a fixed bucket ladder (lightningdot_tpu.const): identical semantics (padding
is fully masked) with a bounded number of compiled programs.
"""
from __future__ import annotations

import threading
from typing import List, Sequence

import numpy as np

# ---------------------------------------------------------------------------
# Large-batch buffer pool.
#
# Rotating multi-MB batch allocations through a threaded pipeline (loader
# worker allocates, training loop frees) degenerate into an mmap/page-fault
# storm: with >2 batches live the allocator serves every batch from fresh
# pages, and first-touch faults run the collate 7-30x slower than the pure
# copy (measured on the 1-core dev VM: 3 -> 21-110 ms for one [96,64,2048]
# f16 pad). Recycling the arrays through a small pool keeps the pages hot.
# The consumer loops recycle spent batches via ``Recycler``, which gates
# each return on the consuming step's output ``is_ready()`` — dispatch
# order alone is NOT a transfer-drain contract (TPU backend only — on CPU
# jax may alias numpy buffers zero-copy, so recycling would corrupt live
# data).
# ---------------------------------------------------------------------------

_POOL: dict = {}
_POOL_LOCK = threading.Lock()
_POOL_MIN_BYTES = 1 << 20   # pool only multi-MB feature batches
# live buffers per shape = loader workers (in flight) + queue (2) + consumer
# retention (2); 12 covers the 8-worker sweep (at [96,104,2048] f16 that is
# ~0.5 GB/shape — fine on training hosts; shrink if memory-bound)
_POOL_PER_KEY = 12


def _pool_get(shape, dtype) -> np.ndarray:
    key = (tuple(shape), np.dtype(dtype).str)
    with _POOL_LOCK:
        free = _POOL.get(key)
        if free:
            return free.pop()
    return np.empty(shape, dtype)


def recycle(tree) -> None:
    """Return a batch's large numpy arrays to the pool.

    Safe ONLY once nothing else reads the arrays (i.e. after the step that
    consumed the batch has dispatched its transfers). Shared references
    inside one batch (e.g. the teacher sub-batch aliasing txts arrays) are
    deduped by object identity.
    """
    seen: set = set()

    def walk(x):
        if isinstance(x, dict):
            for v in x.values():
                walk(v)
        elif isinstance(x, (list, tuple)):
            for v in x:
                walk(v)
        elif (isinstance(x, np.ndarray) and x.nbytes >= _POOL_MIN_BYTES
              and x.base is None and id(x) not in seen):
            seen.add(id(x))
            key = (x.shape, x.dtype.str)
            with _POOL_LOCK:
                free = _POOL.setdefault(key, [])
                if len(free) < _POOL_PER_KEY:
                    free.append(x)

    walk(tree)


class Recycler:
    """Recycle spent host batches once their consuming step provably ran.

    Dispatch order alone is NOT a safe-reuse contract: PJRT may hold a
    host buffer zero-copy (immutable-until-transfer-completes semantics)
    after the jitted call returns, so a pooled buffer overwritten by a
    collate worker could corrupt an in-flight transfer. ``push(batch,
    ready=step_output)`` therefore returns a batch to the pool only when
    (a) at least ``slack`` newer batches were pushed after it AND (b) its
    step output reports ``is_ready()`` — an output can only be ready once
    the device executed the step, which requires the inputs to have been
    transferred. (Measured: ``is_ready`` transitions meaningfully even
    through the axon relay, unlike ``block_until_ready``.)

    Batches whose readiness never materializes are dropped un-pooled once
    ``slack + max_pending`` newer batches sit behind them (plain GC free —
    never corrupts, merely loses the page-reuse win). No-op on the CPU
    backend, where jax may alias numpy buffers zero-copy into live arrays.
    """

    def __init__(self, slack: int = 1, max_pending: int = 8,
                 enabled: bool | None = None):
        if enabled is None:
            import jax

            enabled = jax.default_backend() != "cpu"
        self.enabled = enabled
        self.slack = slack
        self.max_pending = max_pending
        from collections import deque

        self._q: "deque" = deque()

    @staticmethod
    def _ready(ref) -> bool:
        return ref is None or bool(ref.is_ready())

    def push(self, host_batch, ready=None) -> None:
        """Queue a spent batch; ``ready`` is a device output of the step
        that consumed it (e.g. ``metrics['loss']``)."""
        if not self.enabled:
            return
        self._q.append((host_batch, ready))
        while len(self._q) > self.slack:
            batch, ref = self._q[0]
            if self._ready(ref):
                self._q.popleft()
                recycle(batch)
            elif len(self._q) > self.slack + self.max_pending:
                self._q.popleft()        # not provably drained: plain free
            else:
                break

    def flush(self) -> None:
        """End of loop: pool what is provably drained, free the rest."""
        while self._q:
            batch, ref = self._q.popleft()
            if self._ready(ref):
                recycle(batch)


_CLAMP_WARNED: set = set()


def bucket_len(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    # above the top bucket the padders TRUNCATE to buckets[-1] (serving
    # queries: intended; dataset records: silent data loss) — warn once
    # per ladder so corpus-side truncation is visible
    key = tuple(buckets)
    if key not in _CLAMP_WARNED:
        _CLAMP_WARNED.add(key)
        import logging

        logging.getLogger(__name__).warning(
            "sequence length %d exceeds the top bucket %d and will be "
            "truncated (ladder %s); raise the ladder or pre-truncate "
            "upstream if this is corpus data", n, buckets[-1], buckets)
    return buckets[-1]


def pad_ids(seqs: List[Sequence[int]], length: int, pad: int = 0
            ) -> np.ndarray:
    out = np.full((len(seqs), length), pad, np.int32)
    for i, s in enumerate(seqs):
        L = min(len(s), length)
        out[i, :L] = np.asarray(s[:L], np.int32)
    return out


def pad_mask(lens: Sequence[int], length: int) -> np.ndarray:
    out = np.zeros((len(lens), length), np.int32)
    for i, l in enumerate(lens):
        out[i, :min(l, length)] = 1
    return out


def pad_feats(feats: List[np.ndarray], length: int,
              dtype=None) -> np.ndarray:
    """B x [T_i, D] -> [B, length, D] zero-padded (data.py:270-283).

    Keeps the source dtype when uniform: f16 region features stay f16 (the
    model casts to its compute dtype on device anyway; f16->f32 is exact,
    and f16->bf16 rounds identically to the old f16->f32->bf16 path since
    the f32 intermediate is exact — numerically indistinguishable).
    The old always-f32 batch paid a ~45 ms/batch host conversion at the
    B=96 x 64 x 2048 pre-train shape — the entire MLM collate budget.
    Mixed input dtypes promote to f32; pass ``dtype`` to force one.
    """
    d = feats[0].shape[-1]
    if dtype is None:
        dtype = feats[0].dtype
        if any(f.dtype != dtype for f in feats):
            dtype = np.float32
    out = _pool_get((len(feats), length, d), dtype)
    for i, f in enumerate(feats):
        L = min(f.shape[0], length)
        out[i, :L] = f[:L]
        out[i, L:] = 0
    return out


def position_ids(batch: int, length: int) -> np.ndarray:
    return np.broadcast_to(np.arange(length, dtype=np.int32),
                           (batch, length)).copy()
