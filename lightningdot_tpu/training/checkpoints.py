"""Checkpoint save/load.

Two formats, mirroring the reference (SURVEY.md §5):

  * fine-tune ``CheckpointState`` (dvl/trainer.py:18-63): model / optimizer /
    scheduler-step / offset / epoch — stored here as one .npz of flattened
    pytree leaves + a JSON manifest (``biencoder.{best,last,N}.ckpt``);
  * pre-train ``ModelSaver`` (uniter_model/utils/save.py:55-76):
    ``model_step_{N}`` + ``train_state_{N}`` with auto-resume discovery of
    the newest step (pretrain.py:906-917).

PyTorch ``.pt`` checkpoints are loaded through
lightningdot_tpu.models.checkpoint_torch.
"""
from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

SEP = "/"


def flatten_tree(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def unflatten_like(template, flat: Dict[str, np.ndarray],
                   strict: bool = True):
    """Rebuild ``template``'s tree from flattened leaves.

    ``strict=False`` keeps the template's value for leaves absent from the
    checkpoint (used for OPTIMIZER state only: adding a diagnostic leaf —
    e.g. ClipNormState.grad_norm — must not break resume of checkpoints
    written before the leaf existed; model parameters always load strict).
    """
    import logging

    paths_and_leaves = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    seen = set()
    for path, leaf in paths_and_leaves[0]:
        key = SEP.join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        if key not in flat:
            if strict:
                raise KeyError(f"checkpoint missing parameter {key}")
            logging.getLogger(__name__).warning(
                "optimizer checkpoint missing %s; keeping initial value",
                key)
            leaves.append(leaf)
            continue
        seen.add(key)
        loaded = flat[key]
        t_shape = getattr(leaf, "shape", None)
        if (strict and t_shape is not None
                and tuple(loaded.shape) != tuple(t_shape)):
            # a silently mis-shaped load (e.g. a larger-vocab embedding
            # table) would compute without error and corrupt everything
            raise ValueError(
                f"checkpoint leaf {key} has shape {tuple(loaded.shape)}, "
                f"model expects {tuple(t_shape)}")
        leaves.append(loaded)
    if strict:
        extra = sorted(set(flat) - seen)
        if extra:
            raise KeyError(
                f"checkpoint has {len(extra)} parameters the model does "
                f"not: {extra[:5]}{'...' if len(extra) > 5 else ''}")
    return jax.tree_util.tree_unflatten(paths_and_leaves[1], leaves)


def save_checkpoint(path: str, *, model, optimizer=None, step: int = 0,
                    offset: int = 0, epoch: int = 0,
                    extra: Optional[dict] = None) -> str:
    """Write <path>.npz + <path>.json (CheckpointState equivalent).

    Atomic: both files are written to temp names and renamed (.npz first,
    .json last). A crash or preemption SIGKILL mid-save therefore never
    truncates an existing checkpoint (re-saving biencoder.best/last, or
    the newest model_step_N that auto-resume would pick), and resume
    discovery keys off the .json, which only appears once the .npz it
    describes is complete.
    """
    arrays = {f"model{SEP}{k}": v for k, v in flatten_tree(model).items()}
    if optimizer is not None:
        arrays.update({f"opt{SEP}{k}": v
                       for k, v in flatten_tree(optimizer).items()})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".npz.tmp"
    with open(tmp, "wb") as f:  # file object: savez writes exactly here
        np.savez(f, **arrays)
    os.replace(tmp, path + ".npz")
    meta = {"step": step, "offset": offset, "epoch": epoch,
            "extra": extra or {}}
    tmp_json = path + ".json.tmp"
    with open(tmp_json, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_json, path + ".json")
    return path


def load_checkpoint(path: str, *, model_template, optimizer_template=None
                    ) -> Tuple[Any, Any, dict]:
    with np.load(path + ".npz") as data:  # close the zip handle on exit
        mp = f"model{SEP}"
        model_flat = {k[len(mp):]: data[k] for k in data.files
                      if k.startswith(mp)}
        op = f"opt{SEP}"
        opt_flat = {k[len(op):]: data[k] for k in data.files
                    if k.startswith(op)}
    with open(path + ".json") as f:
        meta = json.load(f)
    model = unflatten_like(model_template, model_flat)
    opt = None
    if optimizer_template is not None and opt_flat:
        opt = unflatten_like(optimizer_template, opt_flat, strict=False)
    return model, opt, meta


def save_training_meta(output_dir: str, args) -> None:
    """Dump hps.json + git info (uniter_model/utils/save.py:15-52)."""
    import subprocess

    os.makedirs(os.path.join(output_dir, "log"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "ckpt"), exist_ok=True)
    hps = {k: v for k, v in vars(args).items()
           if isinstance(v, (int, float, str, bool, list, dict, type(None)))}
    with open(os.path.join(output_dir, "log", "hps.json"), "w") as f:
        json.dump(hps, f, indent=4)
    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"],
                             capture_output=True, text=True,
                             timeout=10).stdout.strip()
        status = subprocess.run(["git", "status", "--short"],
                                capture_output=True, text=True,
                                timeout=10).stdout
        with open(os.path.join(output_dir, "log", "git_info.json"),
                  "w") as f:
            json.dump({"git_sha": sha, "git_status": status}, f, indent=4)
    except Exception:
        pass


class ModelSaver:
    """Step-numbered saver (save.py:55-76).

    ``async_save=True`` makes ``save`` non-blocking: leaves are snapshotted
    with an on-device copy (~1 ms; safe against donated/overwritten buffers)
    and the expensive part — the device->host pull (seconds through the TPU
    relay for BERT-base + optimizer state) and the .npz write — runs on a
    background thread. One save is in flight at a time; ``wait()`` (also
    called on the next save) surfaces any writer exception.
    """

    def __init__(self, output_dir: str, prefix: str = "model_step",
                 async_save: bool = False):
        self.output_dir = output_dir
        self.prefix = prefix
        os.makedirs(output_dir, exist_ok=True)
        self._executor = None
        self._pending = None
        if async_save:
            from concurrent.futures import ThreadPoolExecutor

            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-save")

    @staticmethod
    def _snapshot(tree):
        import jax.numpy as jnp

        return jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, tree)

    def save(self, model, step: int, optimizer=None) -> str:
        path = os.path.join(self.output_dir, f"{self.prefix}_{step}")
        if self._executor is None:
            return save_checkpoint(path, model=model, optimizer=optimizer,
                                   step=step)
        model = self._snapshot(model)
        optimizer = self._snapshot(optimizer) if optimizer is not None \
            else None
        self.wait()
        self._pending = self._executor.submit(
            save_checkpoint, path, model=model, optimizer=optimizer,
            step=step)
        return path

    def wait(self) -> None:
        """Block until the in-flight async save (if any) has finished."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()


class NoOpSaver:
    """Non-zero-rank saver (reference ``NoOp``, uniter misc.py:14-19):
    checkpoints are written by rank 0 only; other hosts discard saves and
    resume from the shared output_dir."""

    def save(self, model, step: int, optimizer=None) -> str:
        return ""

    def wait(self) -> None:
        pass


def latest_step_checkpoint(output_dir: str, prefix: str = "model_step"
                           ) -> Optional[Tuple[str, int]]:
    """Auto-resume discovery (pretrain.py:906-917).

    Keys off the .json, which save_checkpoint renames into place LAST —
    a checkpoint interrupted mid-write (no .json yet) is never selected.
    """
    pat = re.compile(rf"{re.escape(prefix)}_(\d+)\.json$")
    best = None
    for f in glob.glob(os.path.join(output_dir, f"{prefix}_*.json")):
        m = pat.search(f)
        if m and os.path.exists(f[:-len(".json")] + ".npz"):
            step = int(m.group(1))
            if best is None or step > best[1]:
                best = (f[:-len(".json")], step)
    return best
