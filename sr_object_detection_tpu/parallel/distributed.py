"""Multi-host distributed data parallelism — the DCN story (SURVEY
§5.8).

The reference's one parallelism feature is single-host multi-GPU DP:
one pthread per GPU with a full replica, data sharded per device via
``get_data_part`` (src_yolo2/data.c:1128), weights periodically
averaged through host RAM (network_kernels.cu:279-376). The TPU-native
scale-out of the same idea is process-parallel SPMD: every host runs
this same program, ``jax.distributed.initialize`` wires the processes
into one cluster, the mesh spans ALL processes' devices, and each host
feeds only its own slice of the global batch
(``jax.make_array_from_process_local_data``). Gradient all-reduce rides
ICI within a slice and DCN across hosts — XLA places the collectives;
nothing here changes vs the single-process mesh trainer.

Per-process data sharding mirrors get_data_part's exact arithmetic
(``data_part``): process p of n owns rows [N*p/n, N*(p+1)/n).

Tested without a real cluster: a 2-process virtual cluster on the CPU
backend (each process forcing 4 host devices) trains the same model as
a 1-process 8-device mesh and must match its loss/params exactly —
tests/test_distributed.py, plus a driver leg in __graft_entry__.py.
"""

from __future__ import annotations

import os

import numpy as np

import jax

from .mesh import batch_sharding, make_mesh, replicated


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, *, local_device_count: int | None = None,
               platform: str | None = None) -> None:
    """Join (or form) the training cluster. Must run before any jax
    operation initializes the backends.

    Real deployment: one call per host with its pod-slice coordinates
    (on Cloud TPU ``jax.distributed.initialize()`` auto-discovers all
    three arguments from the metadata server; pass them explicitly
    elsewhere). Virtual cluster (tests / this machine): pass
    ``platform="cpu"`` and ``local_device_count=K`` to stand up K fake
    host devices per process — the multi-node-without-a-cluster testing
    strategy (SURVEY §4).
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count"
                f"={local_device_count}").strip()
    if platform is not None:
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def data_part(n: int, part: int, total: int) -> slice:
    """The reference's get_data_part row arithmetic (data.c:1128):
    part `part` of `total` owns rows [n*part/total, n*(part+1)/total).
    Exact (sums to n, no overlap) for any n, total."""
    return slice(n * part // total, n * (part + 1) // total)


def process_part(n: int, *, process_index: int | None = None,
                 process_count: int | None = None) -> slice:
    """This process's slice of an n-row dataset/batch."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return data_part(n, pi, pc)


def global_mesh(*, model_parallel: int = 1):
    """Mesh over every device in the CLUSTER (all processes)."""
    return make_mesh(devices=jax.devices(), model_parallel=model_parallel)


def global_batch(mesh, *arrays, global_batch_size: int | None = None):
    """Assemble per-process local host batches into global jax Arrays
    sharded over the mesh 'data' axis — the inverse of get_data_part:
    each process contributes the rows its loader produced.

    The local row counts must tile the global batch in process order
    (make_array_from_process_local_data checks). Returns one Array per
    input (a tuple if several)."""
    sh = batch_sharding(mesh)
    if global_batch_size is None:
        global_batch_size = int(arrays[0].shape[0]) * jax.process_count()
    out = []
    for a in arrays:
        a = np.asarray(a)
        gshape = (global_batch_size,) + tuple(a.shape[1:])
        out.append(jax.make_array_from_process_local_data(
            sh, a, global_shape=gshape))
    return tuple(out) if len(out) > 1 else out[0]


def replicate(mesh, tree):
    """Replicate a host pytree onto every device of the (possibly
    multi-process) mesh. Values must be identical on all processes —
    true by construction for seeded init_params."""
    rep = replicated(mesh)

    def put(v):
        a = np.asarray(v)
        return jax.make_array_from_process_local_data(
            rep, a, global_shape=a.shape)

    return jax.tree.map(put, tree)


__all__ = ["initialize", "data_part", "process_part", "global_mesh",
           "global_batch", "replicate"]
