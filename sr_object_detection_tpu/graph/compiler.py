"""cfg graph -> pure JAX program.

The TPU-native replacement for the reference's interpreter-style graph
runtime (src_yolo2/network.c:145-158: a loop over ``struct layer``
function pointers mutating shared buffers). Here the whole network is
*compiled*: :func:`build_forward` returns a pure function
``forward(params, x, ...)`` that unrolls the layer list into one traced
XLA program — every conv lands on the MXU, elementwise/BN/bias/act fuse
into conv epilogues, and the only retained intermediates are layers that
route/shortcut actually reference.

Tensor representations:
  * spatial layers flow as NHWC (B, H, W, C);
  * connected/softmax/cost/detection/rnn/gru flow as flat (B, N) in the
    reference's CHW raster order (so flat parity with the C
    implementation holds element-for-element at every boundary).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import spec as S
from ..io.tree import WordTree, read_tree
from ..ops import activations as A
from ..ops import conv as C
from ..ops import layout as L
from ..ops import pooling as P
from ..ops import boxes as B
from ..ops import rnn as R


def _resolve_tree(spec_layer, search_dirs) -> Optional[WordTree]:
    if getattr(spec_layer, "tree_file", None) is None:
        return None
    import os
    tf = spec_layer.tree_file
    candidates = [tf] + [os.path.join(d, os.path.basename(tf))
                         for d in search_dirs]
    pad_to = getattr(spec_layer, "classes", None)
    for c in candidates:
        if os.path.exists(c):
            return read_tree(c, pad_to=pad_to)
    raise FileNotFoundError(f"tree file not found: {tf}")


def resolve_trees(spec: S.NetworkSpec,
                  tree_search_dirs: tuple[str, ...] = ()
                  ) -> dict[int, WordTree]:
    """Find and load the WordTree for every tree= layer. Search order:
    path as given, then relative to the cfg's directory."""
    dirs = list(tree_search_dirs)
    if spec.cfg_path:
        import os
        dirs.append(os.path.dirname(os.path.abspath(spec.cfg_path)))
    trees: dict[int, WordTree] = {}
    for i, l in enumerate(spec.layers):
        if isinstance(l, (S.RegionSpec, S.SoftmaxSpec)):
            t = _resolve_tree(l, dirs)
            if t is not None:
                trees[i] = t
    return trees


class CompiledNetwork:
    """A NetworkSpec bound to resolved side data (trees) and a forward fn."""

    def __init__(self, spec: S.NetworkSpec, *, compute_dtype=None,
                 tree_search_dirs: tuple[str, ...] = (),
                 b1_matmul: bool = False):
        self.spec = spec
        self.compute_dtype = compute_dtype
        self.trees = resolve_trees(spec, tree_search_dirs)

        self._keep = _live_set(spec)
        self.forward = build_forward(
            spec, trees=self.trees, compute_dtype=compute_dtype,
            b1_matmul=b1_matmul)

    @property
    def net(self) -> S.NetSpec:
        return self.spec.net


def _live_set(spec: S.NetworkSpec) -> set[int]:
    """Indices whose outputs are consumed by a later non-adjacent layer."""
    live: set[int] = set()
    for l in spec.layers:
        if isinstance(l, S.RouteSpec):
            live.update(l.layers)
        elif isinstance(l, S.ShortcutSpec):
            live.add(l.from_index)
    return live


def _as_nhwc(x, l: S.LayerSpec):
    """Ensure a layer's *input* tensor is NHWC (from producer geometry)."""
    if x.ndim == 4:
        return x
    return L.flat_to_nhwc(x, l.h, l.w, l.c)


def _as_flat(x):
    if x.ndim == 2:
        return x
    return L.nhwc_to_flat(x)


def build_forward(spec: S.NetworkSpec, *, trees=None, compute_dtype=None,
                  fused_stem: bool = False, b1_matmul: bool = False,
                  phase_train: bool = False, train_pool: str = "rw"):
    """Build forward(params, x, *, train=False, rng=None, truth=None).

    Returns (output, aux) where output is the network output (flat (B,N)
    or NHWC, matching the final non-cost layer) and aux is a dict with:
      'outputs': {i: tensor} for requested layers,
      'bn': {i: rolling-stat updates} (train mode),
      'cost': scalar loss from cost layers (train mode, if any).

    fused_stem (bf16 training only): [conv+BN+leaky, maxpool 2x2/2] pairs
    run as one XLA conv in CHWN layout + the Pallas fused chain
    (kernels/fused_stem.py) — the between-convs elementwise/pool/backward
    passes stop costing a full HBM round trip each. Engaged per pair when
    the trace-time batch is 128 (the lane-filling batch); the zone enters
    and exits via explicit transposes whose cost is measured in PARITY.md.

    phase_train (bf16 training only): the LEADING [conv3x3+BN+leaky,
    maxpool2x2/2] pair runs with the conv INSIDE phase-split Pallas
    kernels (kernels/phase_train.py) — the full-resolution conv
    activation never reaches HBM in forward or backward. Leading pair
    only: its input is the network input, whose gradient is never
    needed (the fused backward returns a DCE'd zero input cotangent).
    phase_train="chain" additionally fuses the SECOND pair (input
    gradient via the dy+dgrad kernels) — measured slower on v5e (see
    the inline note), opt-in for memory-bound callers.
    """
    trees = trees or {}
    layers = spec.layers
    keep = _live_set(spec)
    out_idx = spec.output_layer_index()

    # statically fusable (conv, pool) training-stem pairs
    fusable: set[int] = set()
    phase_pair = False
    phase_chain = False
    if phase_train and compute_dtype == jnp.bfloat16:
        from ..kernels import phase_train as PT
        if jax.default_backend() != "tpu" and not PT._INTERPRET:
            phase_train = False

    def _phase_pair_ok(ci: int) -> bool:
        if ci + 1 >= len(layers):
            return False
        l, nxt = layers[ci], layers[ci + 1]
        return (isinstance(l, S.ConvSpec) and l.batch_normalize
                and l.size == 3 and l.stride == 1 and l.pad == 1
                and l.activation == "leaky" and not l.xnor
                and not l.binary
                and isinstance(nxt, S.MaxPoolSpec)
                and nxt.size == 2 and nxt.stride == 2 and nxt.pad == 0)

    if phase_train and compute_dtype == jnp.bfloat16 and len(layers) > 1:
        from ..kernels import phase_train as PT
        l0 = layers[0]
        if (_phase_pair_ok(0) and 0 not in keep
                and PT.plan_pair(l0.h, l0.w, l0.c, l0.filters)
                is not None):
            phase_pair = True
        # the two-pair chain (pair 0 at P=4 -> pair 1 at P=2, dx via
        # the dy+dgrad kernels). OPT-IN (phase_train="chain"), not the
        # default: measured a 4.6% REGRESSION vs pair-1-only on v5e
        # (2940 vs 3081 img/s, tiny-yolo-416 B=128) — pair 1 needs an
        # input gradient, so the chain materializes full-res dy to HBM
        # (the same bytes the fusion saves on the activation) and adds
        # a 4th conv recompute; pair 0's factored-wgrad trick (no dy
        # at all) is what made pair 1 a win. Kept parity-tested for
        # callers whose memory (not step time) binds.
        if (phase_pair and phase_train == "chain" and _phase_pair_ok(2)
                and not (keep & {1, 2})
                and PT.supported_chain(l0, layers[2], 128)):
            phase_chain = True
    if fused_stem and compute_dtype == jnp.bfloat16:
        from ..kernels import fused_stem as FS
        # Mosaic kernels only run on TPU (interpret mode is the CPU
        # test path); silently fall back to the unfused chain elsewhere
        if jax.default_backend() != "tpu" and not FS._INTERPRET:
            fused_stem = False
    if fused_stem and compute_dtype == jnp.bfloat16:
        for i, l in enumerate(layers[:-1]):
            nxt = layers[i + 1]
            if (isinstance(l, S.ConvSpec) and l.batch_normalize
                    and l.activation == "leaky" and not l.xnor
                    and not l.binary
                    and isinstance(nxt, S.MaxPoolSpec)
                    and nxt.size == 2 and nxt.stride == 2 and nxt.pad == 0
                    and nxt.h % 2 == 0 and nxt.w % 2 == 0
                    and i not in keep):
                fusable.add(i)

    def forward(params, x, *, train: bool = False, rng=None, truth=None,
                keep_all: bool = False):
        saved: dict[int, Any] = {}
        bn_updates: dict[int, Any] = {}
        costs = []
        cur = x
        if rng is None:
            rng = jax.random.PRNGKey(0)
        chwn = None            # CHWN tensor while inside the fused zone
        consumed: set[int] = set()

        for i, l in enumerate(layers):
            if i in consumed:
                continue
            if (i == 0 and phase_chain and train and cur.ndim == 4
                    and cur.shape[0] == 128):
                # leading TWO pairs chained in the phase layout: both
                # full-res conv activations stay out of HBM; pair 1's
                # input gradient runs through the dy+dgrad kernels
                # (kernels/phase_train.py phase_train_chain2)
                from ..kernels.phase_train import phase_train_chain2
                cur, bn0, bn2 = phase_train_chain2(
                    _as_nhwc(cur, l), params[0], l, params[2],
                    layers[2])
                bn_updates[0] = bn0
                bn_updates[2] = bn2
                from jax.ad_checkpoint import checkpoint_name
                cur = checkpoint_name(cur, "layer3_out")
                consumed.update((1, 2, 3))
                if 3 in keep or keep_all or 3 == out_idx:
                    saved[3] = cur
                continue
            if (i == 0 and phase_pair and train and cur.ndim == 4
                    and cur.shape[0] == 128):
                # leading pair: conv+BN+bias+leaky+pool with the conv
                # inside phase-split Pallas kernels — the full-res conv
                # activation never reaches HBM (kernels/phase_train.py)
                from ..kernels.phase_train import phase_train_block
                cur, bn = phase_train_block(_as_nhwc(cur, l), params[0],
                                            l)
                bn_updates[0] = bn
                # stable remat name (= the pool output this replaces):
                # without it selective remat would recompute the whole
                # fused forward in backward
                from jax.ad_checkpoint import checkpoint_name
                cur = checkpoint_name(cur, "layer1_out")
                consumed.add(1)
                if 1 in keep or keep_all or 1 == out_idx:
                    saved[1] = cur
                continue
            fuse_here = (
                i in fusable and train
                and (chwn.shape[3] if chwn is not None
                     else cur.shape[0]) == 128)
            if chwn is not None and not fuse_here:
                # leave the fused zone: back to NHWC for the next layer
                cur = jnp.transpose(chwn, (3, 0, 1, 2))
                chwn = None
            if fuse_here:
                from ..kernels.fused_stem import fused_bn_leaky_pool
                p = params[i]
                if chwn is None:
                    xin = _as_nhwc(cur, l).astype(compute_dtype)
                    chwn = jnp.transpose(xin, (1, 2, 3, 0))
                y = jax.lax.conv_general_dilated(
                    chwn, p["weights"].astype(compute_dtype),
                    (l.stride, l.stride),
                    ((l.pad, l.pad), (l.pad, l.pad)),
                    dimension_numbers=("HWCN", "HWIO", "HWCN"))
                pooled, mean, var = fused_bn_leaky_pool(
                    y.astype(compute_dtype), p["scales"], p["biases"],
                    jax.lax.stop_gradient(p["rolling_mean"]))
                bn_updates[i] = {
                    "rolling_mean": 0.9 * p["rolling_mean"] + 0.1 * mean,
                    "rolling_variance":
                        0.9 * p["rolling_variance"] + 0.1 * var}
                chwn = pooled
                consumed.add(i + 1)
                if (i + 1) in keep or keep_all or (i + 1) == out_idx:
                    saved[i + 1] = jnp.transpose(pooled, (3, 0, 1, 2))
                continue

            if isinstance(l, S.ConvSpec):
                cur = _as_nhwc(cur, l)
                act = A.get_activation(l.activation)
                if train:
                    cur, bn = C.conv_block(cur, params[i], l, act,
                                           train=True,
                                           compute_dtype=compute_dtype)
                    if bn is not None:
                        bn_updates[i] = bn
                else:
                    cur = C.conv_block(cur, params[i], l, act,
                                       compute_dtype=compute_dtype,
                                       b1_matmul=b1_matmul)

            elif isinstance(l, S.ConnectedSpec):
                cur = _as_flat(cur)
                act = A.get_activation(l.activation)
                if train:
                    cur, bn = C.connected(cur, params[i], act,
                                          batch_normalize=l.batch_normalize,
                                          train=True)
                    if bn is not None:
                        bn_updates[i] = bn
                else:
                    cur = C.connected(cur, params[i], act,
                                      batch_normalize=l.batch_normalize)

            elif isinstance(l, S.FusedConvPoolSpec):
                cur = _as_nhwc(cur, l)
                cur = _fused_conv_pool(cur, params[i], l,
                                       compute_dtype=compute_dtype)

            elif isinstance(l, S.MaxPoolSpec):
                cur = _as_nhwc(cur, l)
                cur = P.maxpool(cur, size=l.size, stride=l.stride,
                                pad=l.pad, for_training=train,
                                train_mode=train_pool)

            elif isinstance(l, S.AvgPoolSpec):
                cur = _as_nhwc(cur, l)
                # avgpool output is (B,1,1,C): flat == NHWC order; keep
                # NHWC so later convs (none in practice) still work.
                cur = P.avgpool_global(cur)

            elif isinstance(l, S.RouteSpec):
                srcs = [saved[j] for j in l.layers]
                if l.out_c > 0:
                    srcs = [_as_nhwc(s, layers[j])
                            for s, j in zip(srcs, l.layers)]
                    cur = L.route(srcs)
                else:
                    cur = jnp.concatenate([_as_flat(s) for s in srcs],
                                          axis=-1)

            elif isinstance(l, S.ShortcutSpec):
                cur = _as_nhwc(cur, l)
                frm = _as_nhwc(saved[l.from_index], layers[l.from_index])
                cur = L.shortcut(cur, frm, A.get_activation(l.activation))

            elif isinstance(l, S.ReorgSpec):
                cur = _as_nhwc(cur, l)
                if l.reverse:
                    cur = L.reorg_reverse_darknet(cur, stride=l.stride)
                else:
                    cur = L.reorg_darknet(cur, stride=l.stride)

            elif isinstance(l, S.DropoutSpec):
                rng, sub = jax.random.split(rng)
                cur = L.dropout(cur, l.probability, sub, train=train)

            elif isinstance(l, S.CropSpec):
                cur = _as_nhwc(cur, l)
                cur = _crop_forward(cur, l, train=train, rng=rng)
                rng, _ = jax.random.split(rng)

            elif isinstance(l, S.BatchNormSpec):
                cur = _as_nhwc(cur, l)
                p = params[i]
                if train:
                    y, nrm, nrv, _, _, _ = C.batchnorm_train(
                        cur, p["scales"], p["rolling_mean"],
                        p["rolling_variance"])
                    bn_updates[i] = {"rolling_mean": nrm,
                                     "rolling_variance": nrv}
                    cur = y
                else:
                    cur = C.batchnorm_inference(
                        cur, p["scales"], p["rolling_mean"],
                        p["rolling_variance"])

            elif isinstance(l, S.LRNSpec):
                cur = _as_nhwc(cur, l)
                cur = P.lrn(cur, size=l.size, alpha=l.alpha, beta=l.beta,
                            kappa=l.kappa)

            elif isinstance(l, S.ActivationSpec):
                cur = A.get_activation(l.activation)(cur)

            elif isinstance(l, S.SoftmaxSpec):
                cur = _as_flat(cur)
                cur = _softmax_forward(cur, l, trees.get(i), train=train)

            elif isinstance(l, S.CostSpec):
                if train and truth is not None:
                    costs.append(_cost_forward(_as_flat(cur), truth, l))
                # output passes through unchanged (cost layer copies input)

            elif isinstance(l, S.RegionSpec):
                cur = _as_nhwc(cur, l)
                nf = l.coords + l.classes + 1
                tree = trees.get(i)
                if l.presplit and l.head_block:
                    # pre-split contract: (fields, cls) tuple — no
                    # darknet-flat reassembly (see region_activate_split;
                    # the _flat variant additionally never forms the 5-D
                    # class view — no T(8,128)->T(4,128) retiles)
                    split = (B.region_activate_split_flat
                             if l.presplit_flat
                             else B.region_activate_split)
                    cur = split(
                        cur, l.n, l.coords, l.classes, l.head_block,
                        softmax=l.softmax,
                        tree_groups=tree.group if tree is not None
                        else None)
                elif l.head_block:
                    acts = B.region_activate_aligned(
                        cur, l.n, l.coords, l.classes, l.head_block,
                        softmax=l.softmax,
                        tree_groups=tree.group if tree is not None
                        else None)
                    # flat darknet region output: [row][col][anchor][field]
                    cur = acts.reshape(acts.shape[0], -1)
                else:
                    acts = B.region_activate(
                        cur, l.n, nf, softmax=l.softmax,
                        tree_groups=tree.group if tree is not None
                        else None)
                    cur = acts.reshape(acts.shape[0], -1)

            elif isinstance(l, S.DetectionSpec):
                cur = _as_flat(cur)
                if l.softmax:
                    b_, n_ = cur.shape
                    loc = l.side * l.side
                    cls = cur[:, :loc * l.classes].reshape(b_, loc, l.classes)
                    # train mode keeps darknet's softmax-as-identity
                    # backward (forward_detection_layer softmaxes into
                    # l.output; backward axpys delta straight through)
                    if train:
                        cls = _softmax_straight_through(cls)
                    else:
                        cls = jax.nn.softmax(cls, axis=-1)
                    cls = cls.reshape(b_, -1)
                    cur = jnp.concatenate([cls, cur[:, loc * l.classes:]],
                                          axis=1)

            elif isinstance(l, S.RNNSpec):
                cur = _as_flat(cur)
                cur, bn = R.rnn_forward(cur, params[i], l,
                                        time_steps=spec.net.time_steps,
                                        train=train)
                if bn:
                    bn_updates[i] = bn

            elif isinstance(l, S.GRUSpec):
                cur = _as_flat(cur)
                cur, bn = R.gru_forward(cur, params[i], l,
                                        time_steps=spec.net.time_steps,
                                        train=train)
                if bn:
                    bn_updates[i] = bn

            elif isinstance(l, S.CRNNSpec):
                cur = _as_nhwc(cur, l)
                cur, bn = R.crnn_forward(cur, params[i], l,
                                         time_steps=spec.net.time_steps,
                                         train=train)
                if bn:
                    bn_updates[i] = bn

            elif isinstance(l, S.LocalSpec):
                cur = _as_nhwc(cur, l)
                cur = _local_forward(cur, params[i], l)

            elif isinstance(l, S.DeconvSpec):
                cur = _as_nhwc(cur, l)
                cur = _deconv_forward(cur, params[i], l)

            else:
                raise NotImplementedError(f"layer {type(l).__name__}")

            if train and isinstance(cur, jax.Array):
                # stable names for selective rematerialization: the
                # trainer's remat="selective" policy saves the deep
                # (small-spatial) activations by these names and
                # recomputes only the huge early ones
                # (train/trainer.py make_train_step)
                from jax.ad_checkpoint import checkpoint_name
                cur = checkpoint_name(cur, f"layer{i}_out")

            if i in keep or keep_all or i == out_idx:
                saved[i] = cur

        aux = {"outputs": saved, "bn": bn_updates}
        if costs:
            aux["cost"] = sum(costs)
        return saved[out_idx], aux

    return forward


def _fused_conv_pool(x, params, l: S.FusedConvPoolSpec, *,
                     compute_dtype=None):
    """Polyphase conv+pool: one stride-2 4x4 conv with 4F phase
    channels, max over phases, then bias+activation.

    Why: a 3-in-channel 3x3 conv runs the MXU at K=27/N=16 of 128x128
    (~2.6% utilization) and the separate maxpool costs a full HBM round
    trip. The rewrite packs the four 2x2-pool phases into output
    channels: K=4*4*C, N=4*F, stride 2 — 1.78x the MACs at ~7x the MXU
    utilization, pool fused as a channel-group max in the epilogue.
    Exactness: identical arithmetic regrouped; max commutes with the
    (monotonic) activation and the per-filter bias.
    """
    w4 = params["weights"]      # (4, 4, C, 4F) prebuilt by the optimizer
    f = l.filters
    xin = x
    if compute_dtype is not None:
        xin = x.astype(compute_dtype)
        w4 = w4.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        xin, w4, window_strides=(2, 2), padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    b, ho, wo, _ = y.shape
    y = jnp.max(y.reshape(b, ho, wo, 4, f), axis=3)
    y = y + params["biases"]
    y = A.get_activation(l.activation)(y)
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


def _crop_forward(x, l: S.CropSpec, *, train: bool, rng):
    """crop_layer.c:67-110 CPU path: crop + optional flip + (2x-1)."""
    b, h, w, c = x.shape
    scale, trans = (1.0, 0.0) if l.noadjust else (2.0, -1.0)
    if train:
        rng1, rng2, rng3 = jax.random.split(rng, 3)
        dh = jax.random.randint(rng1, (), 0, h - l.crop_h + 1)
        dw = jax.random.randint(rng2, (), 0, w - l.crop_w + 1)
        out = jax.lax.dynamic_slice(
            x, (0, dh, dw, 0), (b, l.crop_h, l.crop_w, c))
        if l.flip:
            do_flip = jax.random.bernoulli(rng3, 0.5)
            out = jnp.where(do_flip, out[:, :, ::-1, :], out)
    else:
        dh = (h - l.crop_h) // 2
        dw = (w - l.crop_w) // 2
        out = x[:, dh:dh + l.crop_h, dw:dw + l.crop_w, :]
    return out * scale + trans


@jax.custom_vjp
def _softmax_straight_through(v):
    return jax.nn.softmax(v, axis=-1)


def _sst_fwd(v):
    return jax.nn.softmax(v, axis=-1), None


def _sst_bwd(_, g):
    # backward_softmax_layer (softmax_layer.c:62-68) adds the output
    # delta straight into the input delta — NO softmax jacobian. Darknet
    # training semantics depend on this; preserved for train mode.
    return (g,)


_softmax_straight_through.defvjp(_sst_fwd, _sst_bwd)


def _softmax_forward(x, l: S.SoftmaxSpec, tree: Optional[WordTree],
                     train: bool = False):
    """softmax_layer.c:49-61: groups fold into batch; optional tree."""
    b = x.shape[0]
    inputs = l.inputs // l.groups
    v = x.reshape(b * l.groups, inputs)
    if tree is not None:
        out = B.grouped_softmax(v / l.temperature, tree.group)
    elif train:
        out = _softmax_straight_through(v / l.temperature)
    else:
        out = jax.nn.softmax(v / l.temperature, axis=-1)
    return out.reshape(b, l.inputs)


def _cost_forward(pred, truth, l: S.CostSpec):
    """cost_layer.c:73-110: SSE (sum of squared diffs) / masked / smooth."""
    SECRET_NUM = -1234.0
    diff = truth - pred
    if l.cost_type == "masked":
        diff = jnp.where(truth == SECRET_NUM, 0.0, diff)
    if l.cost_type == "smooth":
        a = jnp.abs(diff)
        err = jnp.where(a < 1, diff * diff, 2 * a - 1)
        return jnp.sum(err) * l.scale
    return jnp.sum(diff * diff) * l.scale


def _local_forward(x, params, l: S.LocalSpec):
    """Locally-connected layer (local_layer.c): per-location weights.

    weights flat layout: [locations][n][c*size*size] matching the
    reference's im2col column dot products; implemented as an einsum
    over extracted patches (maps to batched matmul on the MXU).
    """
    b = x.shape[0]
    eff_pad = l.size // 2 if l.pad else 0
    patches = jax.lax.conv_general_dilated_patches(
        x, (l.size, l.size), (l.stride, l.stride),
        padding=((eff_pad, eff_pad), (eff_pad, eff_pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, out_h, out_w, c*size*size) with channel-major patch order
    locations = l.out_h * l.out_w
    k = l.size * l.size * l.c
    w = params["weights"].reshape(locations, l.filters, k)
    p = patches.reshape(b, locations, k)
    y = jnp.einsum("blk,lnk->bln", p, w,
                   preferred_element_type=jnp.float32)
    # darknet local biases are laid out [n][locations] (the forward
    # copies them straight into the CHW output, local_layer.c:98-100)
    y = y + params["biases"].reshape(l.filters, locations).T[None]
    # darknet local output raster is (n, out_h, out_w) CHW
    y = y.reshape(b, l.out_h, l.out_w, l.filters)
    act = A.get_activation(l.activation)
    return act(y)


def _deconv_forward(x, params, l: S.DeconvSpec):
    """Transpose conv (deconvolutional_layer.c): out = s*(in-1)+size.

    The reference's col2im scatter indexes the kernel UNFLIPPED
    (out[y*s+ki, x*s+kj] += x[y,x]·W[:, :, ki, kj]), which equals
    lax.conv_transpose with spatially flipped weights (pinned by the
    mini_deconv golden from the layer-level oracle driver)."""
    y = jax.lax.conv_transpose(
        x, params["weights"][::-1, ::-1], (l.stride, l.stride),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + params["biases"]
    return A.get_activation(l.activation)(y)


__all__ = ["CompiledNetwork", "build_forward"]
