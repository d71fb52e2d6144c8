"""Training driver: one jitted train step, subdivision accumulation,
LR schedules, DP/TP mesh sharding.

The TPU-native replacement for train_network / train_network_datum /
update_network (src_yolo2/network.c:225-306) and the multi-GPU
train_networks (src_yolo2/network_kernels.cu:346): forward+backward+
update is ONE compiled program; ``subdivisions`` micro-batches are a
lax.scan accumulating gradients before the single SGD update (the
analog of network.c:241's update cadence); the batch is sharded over
the mesh 'data' axis so the gradient all-reduce rides ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import spec as S
from ..graph.compiler import build_forward, resolve_trees
from ..io.weights import init_params
from ..parallel.mesh import (batch_sharding, make_mesh, replicated,
                             shard_params)
from .detection_loss import detection_loss
from .region_loss import make_region_loss
from .sgd import init_velocity, learning_rate, sgd_update


@partial(jax.tree_util.register_dataclass,
         data_fields=["params", "velocity", "seen"], meta_fields=[])
@dataclasses.dataclass
class TrainState:
    params: Any
    velocity: Any
    seen: jnp.ndarray        # images seen (uint64 in the checkpoint)

    def batch_num(self, net: S.NetSpec):
        return self.seen // (net.batch * net.subdivisions)


def _find_head(spec: S.NetworkSpec):
    """Locate the training head: region layer index or cost layers."""
    for i, l in enumerate(spec.layers):
        if isinstance(l, S.RegionSpec):
            return ("region", i)
        if isinstance(l, S.DetectionSpec):
            return ("detection", i)
    cost_idx = [i for i, l in enumerate(spec.layers)
                if isinstance(l, S.CostSpec)]
    if cost_idx:
        return ("cost", cost_idx[-1])
    raise ValueError("no trainable head (region/detection/cost) in network")


def make_train_step(spec: S.NetworkSpec, *, mesh=None,
                    compute_dtype=None, remat: bool = False,
                    fused_stem: bool = False,
                    phase_train=False, train_pool: str = "rw"):
    """Returns train_step(state, x, truth, rng) -> (state, metrics).

    phase_train: False | True (leading fused pair) | "chain" (leading
    TWO pairs — opt-in, measured slower on v5e; see graph/compiler.py).

    train_pool: "rw" (reduce_window / select_and_scatter backward) |
    "amax" (first-max-rank residual; pool routing fuses into the BN
    backward so dY never materializes — see ops/pooling.py).

    x: (B, H, W, C) float32 where B = net.batch * net.subdivisions
       (the full outer batch, like load_args.n in the reference).
    truth: (B, 30, 5) for detection; (B, outputs) for cost-head nets.
    """
    net = spec.net
    head_kind, head_idx = _find_head(spec)
    trees = resolve_trees(spec)
    # the Pallas fused stem engages only single-device (a pallas_call has
    # no partitioning rule) and only on the bf16 path; per-pair batch==128
    # gating happens at trace time inside build_forward. Default OFF: the
    # measured full-step A/B on v5e is a wash (tiny-yolo-416 B=128:
    # 45.2 ms unfused vs 45.8 ms fused) — see kernels/fused_stem.py.
    fwd = build_forward(
        spec, trees=trees, compute_dtype=compute_dtype,
        fused_stem=fused_stem and (mesh is None or mesh.size == 1),
        phase_train=(phase_train if (mesh is None or mesh.size == 1)
                     else False),
        train_pool=train_pool)
    head = spec.layers[head_idx]
    region_loss_ws = None
    if head_kind == "region":
        class_map = None
        if head.map_file:
            import os
            from ..config import read_map
            candidates = [head.map_file]
            if spec.cfg_path:
                candidates.append(os.path.join(
                    os.path.dirname(os.path.abspath(spec.cfg_path)),
                    os.path.basename(head.map_file)))
            for cand in candidates:
                if os.path.exists(cand):
                    class_map = read_map(cand)
                    break
        _, region_loss_ws = make_region_loss(
            head, tree=trees.get(head_idx), class_map=class_map)
    micro = net.batch
    subdivs = net.subdivisions

    def _fwd_for_loss(params, x, truth, rng):
        return fwd(params, x, train=True, rng=rng, truth=truth,
                   keep_all=True)

    if remat:
        # rematerialize activations in the backward pass (the analog of
        # the reference's nothing: it simply OOMs) — trades step time
        # for training resolutions/batches that exceed HBM.
        # remat="selective": save the deep small-spatial activations
        # (out area <= (net.w/8)*(net.h/8), named in graph/compiler.py)
        # and recompute only the huge C<128 early ones — the deep convs
        # are the FLOP-dominant segment, so skipping their recompute
        # keeps the memory win while shedding most of the remat tax.
        if isinstance(remat, str) and remat.startswith("selective"):
            # "selective" saves out areas <= (w/8)*(h/8);
            # "selective:4" widens the saved set to (w/4)*(h/4) etc.
            div = int(remat.split(":", 1)[1]) if ":" in remat else 8
            cut = max((net.w // div) * (net.h // div), 1)
            names = [f"layer{i}_out" for i, l in enumerate(spec.layers)
                     if getattr(l, "out_w", 0)
                     and l.out_w * l.out_h <= cut]
            policy = jax.checkpoint_policies.save_only_these_names(
                *names)
        else:
            policy = \
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        _fwd_for_loss = jax.checkpoint(_fwd_for_loss, policy=policy)

    def micro_loss(params, x, truth, seen, rng):
        out, aux = _fwd_for_loss(params, x, truth, rng)
        if head_kind == "region":
            raw = aux["outputs"][head_idx - 1]
            # the delta-field loss is f32-exact; under bf16 training the
            # head activations arrive bf16 — this cast's OWN backward
            # converts the f32 -delta cotangent back to bf16, keeping
            # the custom_vjp all-f32
            raw = raw.reshape(raw.shape[0], -1).astype(jnp.float32)
            cost, stats = region_loss_ws(raw, truth, seen)
        elif head_kind == "detection":
            # yolov1 loss on the post-softmax detection output
            out_flat = out if out.ndim == 2 else out.reshape(out.shape[0], -1)
            out_flat = out_flat.astype(jnp.float32)
            cost = detection_loss(out_flat, truth, seen, head)
            stats = {}
        elif head_kind == "cost":
            # SSE gradient contract (cost_layer.c + l2_cpu): delta =
            # scale*(truth-pred) wrt the head INPUT -> differentiate
            # 0.5*scale*||t-p||^2; displayed cost is sum((t-p)^2).
            cost = 0.5 * aux.get("cost", 0.0)
            stats = {}
        else:
            raise NotImplementedError(head_kind)
        return cost, (aux.get("bn", {}), stats)

    def train_step(state: TrainState, x, truth, rng):
        xs = x.reshape(subdivs, micro, *x.shape[1:])
        ts = truth.reshape(subdivs, micro, *truth.shape[1:])

        # Measured (v5e, round 3): the subdivisions=1 degenerate scan is
        # FREE — a scan-less value_and_grad variant benched 2490 vs
        # 2488 img/s on tiny-yolo-416 B=128. Don't special-case it.
        #
        # BN rolling stats are threaded through the scan carry so each
        # micro-batch applies its 0.9/0.1 update against the PREVIOUS
        # micro's result — the reference's sequential cadence
        # (batchnorm_layer.c:133-136), one update per micro-batch. The
        # update structure is discovered by abstract tracing (rolling
        # stats never affect the train-mode forward, so writing the
        # carried values into params changes no gradient).
        bn_tree = jax.eval_shape(micro_loss, state.params, xs[0], ts[0],
                                 state.seen, rng)[1][0]
        bn0 = {i: {k: state.params[i][k] for k in d}
               for i, d in bn_tree.items()}

        def _with_bn(params, bn_carry):
            new = list(params)
            for i, upd in bn_carry.items():
                new[i] = {**new[i], **upd}
            return new

        def one_micro(carry, inp):
            grads_acc, seen, rng, bn_carry = carry
            xm, tm = inp
            rng, sub = jax.random.split(rng)
            (cost, (bn, stats)), grads = jax.value_and_grad(
                micro_loss, has_aux=True)(
                    _with_bn(state.params, bn_carry), xm, tm, seen, sub)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            seen = seen + micro
            return (grads_acc, seen, rng, bn), (cost, stats)

        grads0 = jax.tree.map(jnp.zeros_like, state.params)
        (grads, seen, _, bns), (costs, stats) = jax.lax.scan(
            one_micro, (grads0, state.seen, rng, bn0), (xs, ts))

        batch_num = seen // (micro * subdivs)
        lr = learning_rate(net, batch_num)
        new_params, new_vel = sgd_update(
            state.params, grads, state.velocity,
            lr=lr, batch_size=micro * subdivs,
            momentum=net.momentum, decay=net.decay)

        # write the sequentially-accumulated rolling stats back in
        new_params = _merge_bn(new_params, bns)

        metrics = {"loss": jnp.sum(costs), "lr": lr,
                   "batch_num": batch_num}
        for k in ("avg_iou", "recall", "avg_obj", "avg_anyobj", "count"):
            if stats and k in stats:
                metrics[k] = jnp.mean(stats[k])
        return TrainState(new_params, new_vel, seen), metrics

    return train_step


def make_multi_step(spec: S.NetworkSpec, **kw):
    """K training steps in ONE dispatch: lax.scan of make_train_step
    over K stacked batches (xs: (K, B, H, W, C), ts: (K, B, ...)).

    Why: the round-5 xplane of the single-step dispatch shows ~3 ms of
    device idle per step (op total 38.2 ms vs 41.3 ms wall at
    tiny-yolo-416 B=128) — launch gaps a scanned multi-step amortizes.
    Semantics are EXACTLY K sequential train_step calls; the rng is
    split once per step (rng_k = split(rng)[k-th chain]), so callers
    that need bit-equality with the single-step loop must follow the
    same split discipline (tests/test_train_multi.py pins it).

    The loader side: any loader's next_batch called K times and
    stacked — `Trainer.multi_step` does exactly that.
    """
    step = make_train_step(spec, **kw)

    def multi_step(state: TrainState, xs, ts, rng):
        def body(carry, xt):
            st, r = carry
            r, sub = jax.random.split(r)
            st, m = step(st, xt[0], xt[1], sub)
            return (st, r), m

        (st, _), ms = jax.lax.scan(body, (state, rng), (xs, ts))
        return st, ms

    return multi_step


def _merge_bn(params, bns):
    """Write scan-final rolling stats into params[i]."""
    if not bns:
        return params
    new = list(params)
    for i, upd in bns.items():
        p = dict(new[i])
        for k, v in upd.items():
            p[k] = v[-1] if v.ndim > p[k].ndim else v
        new[i] = p
    return new


class Trainer:
    """High-level loop: the analog of train_detector/train_classifier
    (src_yolo2/detector.c:25-168, classifier.c:38-150)."""

    def __init__(self, spec: S.NetworkSpec, params=None, *, mesh=None,
                 seed: int = 0, compute_dtype=None, remat: bool = False,
                 tp_min_filters: int = 2048, fused_stem: bool = False,
                 phase_train: bool = False):
        self.spec = spec
        self.mesh = mesh
        self._multiprocess = jax.process_count() > 1
        if params is None:
            params = init_params(spec, seed=seed)
        seen0 = np.asarray(0, np.int64 if jax.config.jax_enable_x64
                           else np.int32)
        if self._multiprocess:
            # multi-host: every process holds the same seeded init;
            # replicate onto the global mesh (parallel/distributed.py).
            # TP placement is single-process-only for now — the
            # reference has no TP at all (SURVEY §2.5).
            from ..parallel.distributed import replicate
            params = replicate(mesh, params)
            self.state = TrainState(
                params=params,
                velocity=init_velocity(params),
                seen=replicate(mesh, seen0),
            )
        else:
            params = jax.tree.map(jnp.asarray, params)
            if mesh is not None:
                params = shard_params(mesh, params, spec,
                                      tp_min_filters=tp_min_filters)
            self.state = TrainState(
                params=params,
                velocity=init_velocity(params),
                seen=jnp.asarray(seen0),
            )
        self._compute_dtype = compute_dtype
        self._remat = remat
        self._fused_stem = fused_stem
        self._phase_train = phase_train
        self._steps: dict[tuple[int, int], Any] = {}
        self._steps[(spec.net.h, spec.net.w)] = self._jit(
            make_train_step(spec, mesh=mesh, compute_dtype=compute_dtype,
                            remat=remat, fused_stem=fused_stem,
                            phase_train=phase_train))
        self._rng = jax.random.PRNGKey(seed)

    def _jit(self, step):
        if self.mesh is not None:
            bs = batch_sharding(self.mesh)
            return jax.jit(step, in_shardings=(None, bs, bs, None),
                           donate_argnums=(0,))
        return jax.jit(step, donate_argnums=(0,))

    def _step_for(self, h: int, w: int):
        """Multi-scale training (detector.c:91-109 resize_network): a
        new static-shape train step per resolution bucket, sharing the
        same state. Compiled once per bucket, cached."""
        key = (h, w)
        if key not in self._steps:
            rspec = self.spec.resize(w, h)
            self._steps[key] = self._jit(make_train_step(
                rspec, mesh=self.mesh, compute_dtype=self._compute_dtype,
                remat=self._remat, fused_stem=self._fused_stem,
                phase_train=self._phase_train))
        return self._steps[key]

    def step(self, x, truth):
        self._rng, sub = jax.random.split(self._rng)
        if self._multiprocess:
            # committed single-device arrays can't enter a global
            # computation; numpy inputs are treated as replicated
            # (identical on every process by the shared-seed contract)
            sub = np.asarray(sub)
        if x.ndim == 4:
            step = self._step_for(x.shape[1], x.shape[2])
        else:
            step = self._steps[(self.spec.net.h, self.spec.net.w)]
        self.state, metrics = step(self.state, x, truth, sub)
        return metrics

    @property
    def outer_batch(self) -> int:
        return self.spec.net.batch * self.spec.net.subdivisions


__all__ = ["Trainer", "TrainState", "make_train_step"]


def nan_guarded(step_fn):
    """Wrap a train step: skip the update when the loss is non-finite
    (keeps long runs alive through rare numeric blowups — a recovery
    behavior the reference lacks entirely, SURVEY §5.3: error() exits).
    """
    def guarded(state, x, truth, rng):
        new_state, metrics = step_fn(state, x, truth, rng)
        ok = jnp.isfinite(metrics["loss"])
        kept = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old),
            new_state, state)
        metrics["skipped_nonfinite"] = ~ok
        return kept, metrics
    return guarded
