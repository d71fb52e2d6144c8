"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's multi-GPU trainer (src_yolo2/network_kernels.cu:127-376).

The reference runs one pthread per GPU with full model replicas and
periodically averages WEIGHTS through host RAM (sync_nets/sync_layer).
Here data parallelism is a sharding annotation: the batch is sharded
over the 'data' mesh axis, parameters are replicated (or sharded over
'model' for tensor parallelism on wide layers), and XLA inserts the
gradient all-reduce over ICI — per-step synchronous DP, strictly
stronger than the reference's interval-averaged scheme (which
``periodic_weight_average`` reproduces for A/B parity).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, *, model_parallel: int = 1,
              devices=None) -> Mesh:
    """2D mesh ('data', 'model'). model_parallel=1 -> pure DP."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by mp={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params, spec=None, *, tp_min_filters: int = 2048):
    """Place parameters on the mesh.

    Default: replicate everything. When the mesh has a nontrivial
    'model' axis, conv layers with >= tp_min_filters output channels
    get tensor parallelism:

      * out-channels divisible by mp -> column-parallel: weights/biases
        sharded over 'model' on the output-channel axis (no collective
        in the layer; the sharding propagates to the activation).
      * otherwise (e.g. yolo9000's 28269 = 3*(9418+5) head, which no
        even mp divides) -> row-parallel: weights sharded over 'model'
        on the INPUT-channel axis. XLA partitions the contraction and
        inserts one psum over ICI for the (small) head output — the
        standard fallback when the output dim doesn't tile.
    """
    mp = mesh.shape["model"]

    def place(i, p):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = {kk: jax.device_put(vv, replicated(mesh))
                          for kk, vv in v.items()}
                continue
            sh = replicated(mesh)
            if mp > 1 and hasattr(v, "ndim"):
                if v.ndim == 4 and v.shape[-1] >= tp_min_filters:
                    if v.shape[-1] % mp == 0:
                        sh = NamedSharding(mesh,
                                           P(None, None, None, "model"))
                    elif v.shape[-2] % mp == 0:
                        sh = NamedSharding(mesh,
                                           P(None, None, "model", None))
                elif v.ndim == 1 and v.shape[0] >= tp_min_filters \
                        and v.shape[0] % mp == 0:
                    sh = NamedSharding(mesh, P("model"))
            out[k] = jax.device_put(v, sh)
        return out

    return [place(i, p) if p else p for i, p in enumerate(params)]


def periodic_weight_average(params_per_replica):
    """The reference's sync_nets semantics (network_kernels.cu:279-344):
    average full weight replicas every `interval` batches. Provided for
    A/B parity experiments against per-step synchronous DP."""
    n = len(params_per_replica)
    return jax.tree.map(lambda *xs: sum(xs) / n, *params_per_replica)


__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_params",
           "periodic_weight_average", "Mesh", "NamedSharding", "P"]
