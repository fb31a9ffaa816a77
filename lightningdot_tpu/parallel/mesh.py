"""Device mesh construction and sharding helpers.

The reference's parallelism is data-parallel only (SURVEY.md §2c): Horovod
one-process-per-GPU with manual flat-buffer grad allreduce
(pretrain.py:449-451). TPU-native equivalent: a 1-D ``Mesh(('dp',))`` over
all devices; batches sharded on the leading axis; gradients reduced by XLA
automatically because parameters are replicated.

Multi-host: call :func:`initialize_distributed` once per process (maps to
``jax.distributed.initialize``), then the same mesh code spans hosts with
collectives riding ICI/DCN.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (replaces hvd.init(), e.g. pretrain.py:247)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def local_device_count() -> int:
    return jax.local_device_count()


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    """Rank of this host (replaces hvd.rank() at host granularity)."""
    return jax.process_index()


def is_main_process() -> bool:
    """dvl/utils.py:187-188."""
    return jax.process_index() == 0


@functools.lru_cache(maxsize=None)
def data_parallel_mesh(dp_size: int = 0) -> Mesh:
    """1-D dp mesh over the first ``dp_size`` devices (0 = all)."""
    devices = jax.devices()
    if dp_size and dp_size > 0:
        devices = devices[:dp_size]
    return Mesh(np.asarray(devices), (DP_AXIS,))


def get_mesh(dp_size: int = 0) -> Mesh:
    return data_parallel_mesh(dp_size)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across dp."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_mesh_device_count(mesh: Mesh) -> int:
    """Number of this process's devices participating in ``mesh``."""
    me = jax.process_index()
    return sum(1 for d in mesh.devices.flat if d.process_index == me)


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch with leading-axis dp sharding.

    Single-process: the batch IS the global batch; arrays whose leading dim
    is not divisible by the mesh size are replicated instead (scalar aux
    fields).

    Multi-process: each host passes its LOCAL batch (its rank-strided data
    shard, data.py:185-187 semantics) and the global array is assembled
    with ``jax.make_array_from_process_local_data`` — global batch =
    concatenation of the per-host batches in process order. This realises
    the reference's dead cross-rank gather (dvl/utils.py:114-169): the
    jitted step sees the global batch, so in-batch negatives span hosts and
    XLA inserts the gradient psum. Arrays whose leading dim is not
    divisible by the local device count are replicated (they must then be
    identical on every host).
    """
    n = mesh.devices.size
    n_local = local_mesh_device_count(mesh)
    multiproc = n_local != n

    def put(x):
        if not (hasattr(x, "shape") and x.ndim >= 1):
            if multiproc:
                x = np.asarray(x)  # host value: puttable non-addressably
            return jax.device_put(x, NamedSharding(mesh, P()))
        if multiproc:
            if n_local and x.shape[0] % n_local == 0:
                return jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P(DP_AXIS)), np.asarray(x))
            return jax.device_put(np.asarray(x), NamedSharding(mesh, P()))
        if x.shape[0] % n == 0:
            return jax.device_put(x, NamedSharding(mesh, P(DP_AXIS)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)


def assert_same_across_hosts(value, what: str = "value") -> None:
    """Guard against cross-host divergence (replaces the reference's
    same-task assertion via all_gather_list, pretrain.py:392).

    Works for any picklable value: hosts exchange a 64-bit digest (process
    collectives only move arrays), so strings like task names are fine.
    """
    if jax.process_count() == 1:
        return
    import hashlib
    import pickle

    from jax.experimental import multihost_utils

    # 32-bit digest: jax without x64 silently truncates wider ints
    digest = int.from_bytes(
        hashlib.sha256(pickle.dumps(value)).digest()[:4], "big")
    gathered = np.asarray(multihost_utils.process_allgather(
        np.uint32(digest)))
    if not (gathered == np.uint32(digest)).all():
        raise RuntimeError(
            f"hosts out of sync on {what} (digests {gathered.tolist()}) — "
            "workers must enter collectives together (check seeds / data "
            "sharding)")


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated over the mesh.

    Multi-process: ``device_put`` to a non-addressable sharding accepts
    host values and uncommitted arrays only, so committed local arrays
    (jit outputs, loaded checkpoints) are pulled to host first — every
    host holds the same value by construction (same seed / same file).
    Typed PRNG keys go through key_data/wrap_key_data (they have no host
    representation of their own).
    """
    sh = NamedSharding(mesh, P())
    multiproc = local_mesh_device_count(mesh) != mesh.devices.size

    def put(x):
        if multiproc and isinstance(x, jax.Array):
            if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
                data = jax.device_put(
                    np.asarray(jax.random.key_data(x)), sh)
                return jax.random.wrap_key_data(
                    data, impl=jax.random.key_impl(x))
            x = np.asarray(x)
        elif multiproc and not isinstance(x, np.ndarray):
            x = np.asarray(x)
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)
