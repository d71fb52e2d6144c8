"""Spatial partitioning (SP): shard conv activations over image HEIGHT
across a 'space' mesh axis.

The reference has no analog (SURVEY §2.5: TP/PP/SP all absent — its only
parallelism is thread-per-GPU weight averaging, network_kernels.cu:279-376).
This is the TPU-native capability for frames whose activations exceed one
chip's HBM (e.g. the super-resolution app on 4K frames, or 608x608 trunks
at very large batch): the input is annotated H-sharded and XLA's SPMD
partitioner inserts the halo exchanges (collective-permutes over ICI) that
every k>1 conv/pool window needs at shard boundaries — the scaling-book
recipe (annotate shardings, let XLA insert collectives) applied to the
spatial dim instead of batch.

Composition: the mesh is ('data', 'space') — batch shards over 'data',
height over 'space', so SP composes with DP. Weights are replicated.
The region head's decode runs on gathered (tiny, 13x13-scale) tensors;
the partitioner localizes the trunk, which is where the bytes are.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import spec as S
from ..graph.compiler import CompiledNetwork
from ..infer.engine import (fold_params_for_inference,
                            checksum_benchmark, sync_checksum)


def spatial_mesh(n_space: int, *, n_data: int = 1, devices=None) -> Mesh:
    """2D ('data', 'space') mesh. n_space=1 degenerates to pure DP."""
    if devices is None:
        devices = jax.devices()[:n_data * n_space]
    if len(devices) != n_data * n_space:
        raise ValueError(
            f"need {n_data * n_space} devices, have {len(devices)}")
    grid = np.asarray(devices).reshape(n_data, n_space)
    return Mesh(grid, axis_names=("data", "space"))


def height_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC activation sharding: batch over 'data', H over 'space'."""
    return NamedSharding(mesh, P("data", "space", None, None))


class SpatialShardedEngine:
    """Batched inference with activations sharded over ('data','space').

    Exactness vs the single-device engine is pinned in
    tests/test_parallel.py; the halo exchange is XLA-inserted (the
    compiled module contains collective-permutes, not all-gathers, for
    the trunk — checked there too).
    """

    def __init__(self, spec: S.NetworkSpec, params, *, mesh: Mesh,
                 batch: int = 8, dtype=jnp.bfloat16):
        if batch % mesh.shape["data"]:
            raise ValueError(f"batch {batch} not divisible by data axis "
                             f"{mesh.shape['data']}")
        if spec.net.h % (2 * mesh.shape["space"]):
            # every shard must hold an even number of rows so the
            # stride-2 pools' (h//2, 2) reshape splits cleanly per shard
            raise ValueError(
                f"net height {spec.net.h} must be divisible by "
                f"2*space={2 * mesh.shape['space']}")
        self.mesh = mesh
        self.batch = batch
        self.dtype = dtype
        self.params, self.spec = fold_params_for_inference(
            spec, params, dtype)
        self.params = jax.device_put(
            self.params, NamedSharding(mesh, P()))
        compiled = CompiledNetwork(self.spec, compute_dtype=dtype)
        fwd = compiled.forward
        hs = height_sharding(mesh)
        out_sh = NamedSharding(mesh, P("data"))

        @partial(jax.jit, in_shardings=(None, hs), out_shardings=out_sh)
        def run(params, x):
            out, _ = fwd(params, x.astype(dtype))
            return out

        @partial(jax.jit, in_shardings=(None, hs))
        def run_sum(params, x):
            out, _ = fwd(params, x.astype(dtype))
            return sync_checksum(out)

        self._run = run
        self._run_sum = run_sum
        self.input_shape = (batch, spec.net.h, spec.net.w, spec.net.c)

    def compiled_trunk_is_halo_exchanged(self) -> bool:
        """True when the partitioned module moves shard boundaries with
        collective-permute (halo exchange) rather than re-gathering the
        input-scale tensors. Informational: used by tests."""
        txt = self._run.lower(
            self.params,
            jax.ShapeDtypeStruct(self.input_shape, self.dtype)
        ).compile().as_text()
        return "collective-permute" in txt

    def warmup(self):
        with self.mesh:
            float(self._run_sum(self.params,
                                jnp.zeros(self.input_shape, self.dtype)))

    def __call__(self, x):
        with self.mesh:
            return self._run(self.params, x)

    def benchmark(self, iters: int = 50, warmup: int = 5) -> dict:
        return checksum_benchmark(
            lambda x: self._run_sum(self.params, x), self.input_shape,
            self.batch, iters=iters, warmup=warmup, dtype=self.dtype,
            mesh=self.mesh)


__all__ = ["spatial_mesh", "height_sharding", "SpatialShardedEngine"]
