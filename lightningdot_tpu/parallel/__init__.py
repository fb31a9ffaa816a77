"""Distributed runtime: device meshes + XLA collectives.

Replaces the reference's Horovod/NCCL layer (uniter_model/utils/distributed.py,
README.md:38-67). There is no explicit allreduce code here — gradients are
psum'd by XLA via sharded jit over the dp mesh; the helpers below create
meshes and host-level gathers.
"""

from lightningdot_tpu.parallel.mesh import (  # noqa: F401
    get_mesh, data_parallel_mesh, local_device_count, process_count,
    shard_batch, replicate,
)
