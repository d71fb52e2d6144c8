"""Pipeline parallelism (PP): contiguous layer stages on separate
devices, microbatches streamed through the stage chain.

The reference has no PP (SURVEY 2.5 — its only parallelism is
thread-per-GPU weight averaging). This is the GPipe-shaped inference
capability for models whose PARAMETERS don't fit one chip: each stage's
parameters live on exactly one device; activations hop stage-to-stage
over ICI. JAX's async dispatch does the pipelining — dispatching
microbatch t's stage-s computation returns immediately, so stage s runs
microbatch t while stage s-1 runs microbatch t+1; no scheduler thread
is needed (the runtime queue per device IS the pipeline).

Stage cuts are only taken where no later layer routes/shortcuts back
across the cut (the same legality rule as kernels.b1_stem.truncate_spec),
and are balanced by analytic per-layer FLOPs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph import spec as S
from ..graph.compiler import CompiledNetwork
from ..infer.engine import fold_params_for_inference
from ..kernels.b1_stem import truncate_spec


def _layer_flops(l) -> float:
    if isinstance(l, S.ConvSpec):
        return 2.0 * l.filters * l.size * l.size * l.c * l.out_h * l.out_w
    if isinstance(l, S.ConnectedSpec):
        return 2.0 * l.inputs * l.output
    return 0.0


def valid_cuts(spec: S.NetworkSpec) -> list[int]:
    """Positions k where layers[:k] / layers[k:] is a legal split (no
    later layer references an earlier-than-k layer)."""
    n = len(spec.layers)
    # earliest index referenced by any layer at or after position j
    earliest_from = [n] * (n + 1)
    for j in range(n - 1, -1, -1):
        l = spec.layers[j]
        refs = []
        if isinstance(l, S.RouteSpec):
            refs = list(l.layers)
        elif isinstance(l, S.ShortcutSpec):
            refs = [l.from_index]
        here = min(refs) if refs else n
        # the chain dependency on the immediate predecessor (`cur`) is
        # preserved by any cut, so only explicit refs constrain cuts
        earliest_from[j] = min(earliest_from[j + 1], here)
    return [k for k in range(1, n)
            if earliest_from[k] >= k]


def plan_stages(spec: S.NetworkSpec, n_stages: int) -> list[int]:
    """Cut positions (len n_stages-1) balancing per-stage FLOPs over the
    legal cut points."""
    cuts = valid_cuts(spec)
    if not cuts or n_stages < 2:
        return []
    fl = [_layer_flops(l) for l in spec.layers]
    total = sum(fl) or 1.0
    acc, cum = 0.0, []
    for f in fl:
        acc += f
        cum.append(acc)
    chosen: list[int] = []
    for s in range(1, n_stages):
        target = total * s / n_stages
        avail = [k for k in cuts if k not in chosen]
        if not avail:
            return []
        chosen.append(min(avail, key=lambda k: abs(cum[k - 1] - target)))
    return sorted(chosen)


class PipelinedEngine:
    """Inference with the layer graph split over `len(devices)` stages.

    Exactness vs single-device is pinned in tests/test_parallel.py.
    `microbatch` slices the input batch; with several microbatches in
    flight the per-device async dispatch queues overlap stage s of
    microbatch t with stage s-1 of microbatch t+1. Feed batches that
    divide evenly by `microbatch` — a ragged tail microbatch is correct
    but triggers a one-time recompile at the tail shape.
    """

    def __init__(self, spec: S.NetworkSpec, params, *, devices,
                 microbatch: int = 1, dtype=jnp.float32):
        devices = list(devices)
        n_stages = len(devices)
        params, spec = fold_params_for_inference(spec, params, dtype)
        cuts = plan_stages(spec, n_stages)
        if len(cuts) != n_stages - 1:
            raise ValueError(
                f"cannot cut {spec.cfg_path or 'network'} into "
                f"{n_stages} stages (legal cuts: {valid_cuts(spec)})")
        bounds = [0, *cuts, len(spec.layers)]
        self.devices = devices
        self.microbatch = microbatch
        self.stage_ranges = list(zip(bounds[:-1], bounds[1:]))
        self._stages = []
        for s, (a, b) in enumerate(self.stage_ranges):
            sub = truncate_spec(spec, a)
            sub = S.NetworkSpec(net=sub.net, layers=sub.layers[:b - a],
                                cfg_path=sub.cfg_path)
            sp = jax.device_put(params[a:b], devices[s])
            fwd = CompiledNetwork(sub, compute_dtype=dtype).forward

            def run(p, x, _fwd=fwd):
                out, _ = _fwd(p, x)
                return out
            self._stages.append((jax.jit(run), sp))

    def __call__(self, x):
        x = jnp.asarray(x)
        mbs = [x[i:i + self.microbatch]
               for i in range(0, x.shape[0], self.microbatch)]
        outs = []
        for mb in mbs:
            a = jax.device_put(mb, self.devices[0])
            for s, (fn, sp) in enumerate(self._stages):
                if s:
                    a = jax.device_put(a, self.devices[s])
                # async dispatch: stage s of this microbatch overlaps
                # stage s-1 of the next one on the other device's queue
                a = fn(sp, a)
            outs.append(a)
        return jnp.concatenate([jnp.asarray(o) for o in outs], axis=0)

    def stage_devices(self):
        """Device of each stage's parameters (tests assert distinct)."""
        def dev_of(p):
            for v in jax.tree.leaves(p):
                return next(iter(v.devices()))
        return [dev_of(sp) for _, sp in self._stages]


__all__ = ["PipelinedEngine", "plan_stages", "valid_cuts"]
