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


class PipelinedTrainer:
    """Microbatched GPipe TRAINING over FLOPs-balanced stages.

    The reference has no PP at all (SURVEY 2.5); this is the training
    counterpart of PipelinedEngine for models whose parameters/
    activations exceed one chip. Schedule: GPipe with FULL-REMAT
    backward — the forward stashes only each stage's INPUT per
    microbatch (the GPipe activation stash), and the per-stage
    backward recomputes its forward inside one jitted vjp (bounded
    memory, the standard PP training memory profile). Gradients
    accumulate per stage on that stage's device; one SGD update per
    outer batch (network.c:241 cadence via train.sgd.sgd_update).

    Semantics vs the single-device trainer at the SAME microbatch
    count (make_train_step with subdivisions=n_micro):
      * identical gradient accumulation order and rng split cadence,
      * identical sequential BN rolling-stat updates (each microbatch
        normalizes with ITS OWN batch stats — microbatching changes BN
        exactly as subdivisions do, and PP adds nothing on top),
    so the update is exact vs that baseline (tests/test_parallel.py).
    Caveat: a network with 2+ dropout layers split ACROSS stages draws
    per-stage rng streams (the single-device forward draws one stream
    per microbatch); darknet detection nets train without dropout.
    """

    def __init__(self, spec: S.NetworkSpec, params, *, devices,
                 n_micro: int = 2, compute_dtype=None):
        from ..train.sgd import init_velocity
        from ..train.trainer import _find_head
        from ..graph.compiler import build_forward, resolve_trees

        devices = list(devices)
        n_stages = len(devices)
        cuts = plan_stages(spec, n_stages)
        if len(cuts) != n_stages - 1:
            raise ValueError(f"cannot cut into {n_stages} stages")
        bounds = [0, *cuts, len(spec.layers)]
        self.spec = spec
        self.devices = devices
        self.n_micro = n_micro
        self.stage_ranges = list(zip(bounds[:-1], bounds[1:]))
        head_kind, head_idx = _find_head(spec)
        assert head_kind == "region", "PP training: region-head nets"
        trees = resolve_trees(spec)
        from ..train.region_loss import make_region_loss
        _, self._region_loss = make_region_loss(
            spec.layers[head_idx], tree=trees.get(head_idx))
        self._head_local = head_idx - bounds[-2]

        self.stage_params = []
        self._fwd_jit, self._bwd_jit = [], []
        for s, (a, b) in enumerate(self.stage_ranges):
            sub = truncate_spec(spec, a)
            sub = S.NetworkSpec(net=sub.net, layers=sub.layers[:b - a],
                                cfg_path=sub.cfg_path)
            self.stage_params.append(
                jax.device_put(params[a:b], devices[s]))
            fwd = build_forward(sub, trees={}, compute_dtype=compute_dtype)
            last = s == n_stages - 1

            def run(p, x, rng, truth, seen, _fwd=fwd, _last=last):
                out, aux = _fwd(p, x, train=True, rng=rng, truth=truth,
                                keep_all=True)
                bn = aux.get("bn", {})
                if not _last:
                    return out, bn
                raw = aux["outputs"][self._head_local - 1]
                raw = raw.reshape(raw.shape[0], -1).astype(jnp.float32)
                cost, stats = self._region_loss(raw, truth, seen)
                return cost, (bn, stats)

            def fwd_only(p, x, rng, truth, seen, _run=run):
                return _run(p, x, rng, truth, seen)

            def bwd(p, x, rng, truth, seen, dout, _run=run, _last=last):
                # full-remat stage backward: recompute the forward
                # inside the vjp; rolling-stat outputs take zero
                # cotangent (they never feed the loss)
                def f(p, x):
                    out, aux = _run(p, x, rng, truth, seen)
                    return out, aux
                (out, aux), pull = jax.vjp(f, p, x)
                daux = jax.tree.map(jnp.zeros_like, aux)
                dp, dx = pull((dout, daux))
                return dp, dx

            self._fwd_jit.append(jax.jit(fwd_only))
            self._bwd_jit.append(jax.jit(bwd))

        self.velocity = [jax.device_put(init_velocity(params[a:b]),
                                        devices[s])
                         for s, (a, b) in enumerate(self.stage_ranges)]
        self.seen = 0

    def step(self, x, truth, rng=None):
        """One outer batch (B = micro * n_micro): GPipe fwd over
        microbatches (stage s of micro t overlaps stage s+1 of micro
        t-1 through per-device async dispatch), full-remat backward,
        one SGD update. Returns metrics."""
        from ..train.sgd import learning_rate, sgd_update
        if rng is None:
            rng = jax.random.PRNGKey(0)
        x = jnp.asarray(x)
        truth = jnp.asarray(truth)
        B = x.shape[0]
        micro = B // self.n_micro
        net = self.spec.net
        n_st = len(self.stage_ranges)
        dummy_t = jnp.zeros((micro,) + truth.shape[1:], truth.dtype)

        stash = []          # per micro: list of per-stage inputs
        costs, statss, rngs, seens = [], [], [], []
        seen = self.seen
        for t in range(self.n_micro):
            rng, sub = jax.random.split(rng)
            rngs.append(sub)
            seens.append(seen)
            xm = jax.device_put(x[t * micro:(t + 1) * micro],
                                self.devices[0])
            tm = jax.device_put(truth[t * micro:(t + 1) * micro],
                                self.devices[-1])
            ins = []
            a = xm
            for s in range(n_st):
                last = s == n_st - 1
                ins.append(a)
                tr = tm if last else jax.device_put(dummy_t,
                                                    self.devices[s])
                out, bnaux = self._fwd_jit[s](
                    self.stage_params[s], a, sub, tr,
                    jnp.asarray(seen))
                # sequential BN rolling-stat cadence: write this
                # micro's stats before the next micro enters the stage
                bn = bnaux[0] if last else bnaux
                sp = list(self.stage_params[s])
                for i, upd in bn.items():
                    sp[i] = {**sp[i], **upd}
                self.stage_params[s] = sp
                if last:
                    costs.append(out)
                    statss.append(bnaux[1])
                else:
                    a = jax.device_put(out, self.devices[s + 1])
            stash.append(ins)
            seen += micro

        grads = [None] * n_st
        for t in range(self.n_micro):
            dout = jnp.asarray(1.0, jnp.float32)
            for s in reversed(range(n_st)):
                last = s == n_st - 1
                tm = (jax.device_put(
                    truth[t * micro:(t + 1) * micro], self.devices[s])
                    if last else jax.device_put(dummy_t,
                                                self.devices[s]))
                dp, dx = self._bwd_jit[s](
                    self.stage_params[s], stash[t][s], rngs[t], tm,
                    jnp.asarray(seens[t]), dout)
                grads[s] = dp if grads[s] is None else jax.tree.map(
                    jnp.add, grads[s], dp)
                dout = (jax.device_put(dx, self.devices[s - 1])
                        if s else None)

        self.seen = seen
        batch_num = self.seen // B
        lr = learning_rate(net, batch_num)
        for s in range(n_st):
            self.stage_params[s], self.velocity[s] = sgd_update(
                self.stage_params[s], grads[s], self.velocity[s],
                lr=lr, batch_size=B, momentum=net.momentum,
                decay=net.decay)
        total = sum(float(c) for c in costs)
        return {"loss": total, "lr": float(lr), "batch_num": batch_num}

    @property
    def params(self):
        """Flat single-device-layout parameter list (for comparisons/
        checkpoint export)."""
        out = []
        for sp in self.stage_params:
            out.extend(jax.device_get(sp))
        return out


__all__ = ["PipelinedEngine", "PipelinedTrainer", "plan_stages",
           "valid_cuts"]
