"""Misc model/param utilities (dvl/utils.py:26-47,172-189)."""
from __future__ import annotations

from typing import Any

import jax
import numpy as np


def num_of_parameters(params: Any) -> int:
    """Total parameter count of a pytree (dvl/utils.py:34-38)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def compare_models(params_1: Any, params_2: Any, verbose: bool = True) -> int:
    """Count mismatching leaves between two parameter trees
    (dvl/utils.py:172-184)."""
    flat1 = jax.tree_util.tree_flatten_with_path(params_1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(params_2)[0]
    models_differ = 0
    for (p1, a), (p2, b) in zip(flat1, flat2):
        if p1 != p2:
            raise ValueError(f"parameter trees differ in structure: "
                             f"{p1} vs {p2}")
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            models_differ += 1
            if verbose:
                print("Mismatch found at", jax.tree_util.keystr(p1))
    if models_differ == 0 and verbose:
        print("Models match perfectly! :)")
    return models_differ


def host_all_gather(data: Any) -> Any:
    """Gather arbitrary pytrees across hosts (replaces the pickle-based
    ``all_gather_list``, dvl/utils.py:51-111 / distributed.py:175-204).
    On a single host this is the identity wrapped in a length-1 list."""
    import jax

    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(data)
    return [jax.tree.map(lambda x: x[i], gathered)
            for i in range(jax.process_count())]
