"""Static-shape padding helpers.

XLA recompiles per input shape, so instead of the reference's exact
per-batch max-length padding (dvl/data/itm.py:231-252) batches are padded up
a fixed bucket ladder (lightningdot_tpu.const): identical semantics (padding
is fully masked) with a bounded number of compiled programs.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def bucket_len(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
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


def pad_feats(feats: List[np.ndarray], length: int) -> np.ndarray:
    """B x [T_i, D] -> [B, length, D] zero-padded (data.py:270-283)."""
    d = feats[0].shape[-1]
    out = np.zeros((len(feats), length, d), np.float32)
    for i, f in enumerate(feats):
        L = min(f.shape[0], length)
        out[i, :L] = f[:L]
    return out


def position_ids(batch: int, length: int) -> np.ndarray:
    return np.broadcast_to(np.arange(length, dtype=np.int32),
                           (batch, length)).copy()
