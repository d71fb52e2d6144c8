"""int8 quantized serving path (post-training quantization).

TPU-native speed lever the reference does not have (its low-precision
story is XNOR binarization, src_yolo2/convolutional_layer.c:443-448,
which destroys accuracy): v5e's MXU runs int8 at 2x the bf16 rate and
every activation round-trip through HBM halves. The stem conv+pool —
measured bandwidth-bound at ~320 GB/s effective on this chip (see
PARITY.md "Stem fusion: measured negative result") — is exactly halved
by int8 activations, which no fusion strategy achieved in bf16.

Scheme (standard symmetric PTQ):
  * weights: per-output-channel symmetric int8, scale = amax/127 —
    quantized once at load from the BN-folded f32 weights;
  * activations: per-layer symmetric int8 with scales calibrated by one
    f32 forward over sample images (amax observer);
  * convs run int8 x int8 -> int32 on the MXU; the dequant + bias +
    activation + requant epilogue is elementwise and fuses into the
    conv output, so inter-layer traffic is pure int8;
  * maxpool/reorg operate directly on int8 (max and layout commute with
    a per-tensor scale); route concat rescales each source to the max
    source scale (one fused elementwise pass);
  * the head conv (the one feeding [region]/[detection]) stays bf16 on
    dequantized input — head logits go through logistic decode and are
    too precision-sensitive for an int8 step size.

Covers the detection serving topologies (conv/maxpool/route/reorg +
region): tiny-yolo-voc, yolov2, yolo9000 — plus classifier-style specs
via an int8 trunk + float tail split. Outputs are always f32-domain
(a trunk ending on a non-head int8 layer is dequantized on the way
out); unsupported topologies raise NotImplementedError — the bf16
ThroughputEngine is the general path.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import spec as S
from ..graph.compiler import CompiledNetwork, resolve_trees
from ..ops import activations as A
from ..ops import boxes as B
from ..ops import layout as L
from .engine import fold_params_for_inference, sync_checksum

I8MIN, I8MAX = -127, 127     # symmetric: keep -128 out so |q| <= 127


def load_calib(path: str) -> np.ndarray:
    """Load a saved calibration batch (.npy, or .npz under key 'calib'
    / the sole array): preprocessed NHWC f32 frames. Pair with
    ``save_calib`` — calibrate once on representative traffic, reuse
    across restarts instead of the first-frame / noise fallbacks."""
    if path.endswith(".npz"):
        z = np.load(path)
        key = "calib" if "calib" in z.files else z.files[0]
        arr = z[key]
    else:
        arr = np.load(path)
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4:
        raise ValueError(f"calibration file {path}: expected NHWC or "
                         f"HWC array, got shape {arr.shape}")
    return arr


def save_calib(path: str, calib_x) -> None:
    """Persist a calibration batch for :func:`load_calib`."""
    np.savez_compressed(path, calib=np.asarray(calib_x, np.float32)) \
        if path.endswith(".npz") else np.save(path, np.asarray(
            calib_x, np.float32))


def _resolve_calib(calib_x):
    return load_calib(calib_x) if isinstance(calib_x, str) else calib_x


def _requant(v_f32, inv_scale):
    """f32 -> int8 with round-to-nearest and saturation."""
    return jnp.clip(jnp.round(v_f32 * inv_scale), I8MIN, I8MAX).astype(
        jnp.int8)


def _maxpool_q(x, *, size: int, stride: int, pad: int):
    """Darknet maxpool on int8: same geometry as ops.pooling.maxpool
    with an int-encodable pad identity (-inf has no int8 encoding)."""
    from ..ops.pooling import maxpool
    return maxpool(x, size=size, stride=stride, pad=pad,
                   pad_value=jnp.array(jnp.iinfo(x.dtype).min, x.dtype))


def _conv_i8(x_q, w_q, *, stride: int, pad: int):
    from jax import lax
    return lax.conv_general_dilated(
        x_q, w_q, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _head_conv_indices(spec: S.NetworkSpec) -> set[int]:
    """Convs feeding a [region]/[detection] head directly (the darknet
    head pattern) — kept in bf16."""
    heads = set()
    for i, l in enumerate(spec.layers):
        if isinstance(l, (S.RegionSpec, S.DetectionSpec)) and i > 0:
            if isinstance(spec.layers[i - 1], S.ConvSpec):
                heads.add(i - 1)
    return heads


_SUPPORTED = (S.ConvSpec, S.MaxPoolSpec, S.RouteSpec, S.ReorgSpec,
              S.RegionSpec)


def calibrate_amax(spec: S.NetworkSpec, params_f32, calib_x,
                   *, tree_search_dirs=()) -> tuple[float, dict[int, float]]:
    """One f32 forward over calibration images; returns (input_amax,
    {layer_index: output_amax}). The amax observer is the standard PTQ
    calibrator; symmetric scales follow as amax/127.

    The whole observer runs as ONE jitted program returning only the
    per-layer amax scalars — an eager forward would pay a per-op
    remote compile AND ship every intermediate tensor over the device
    tunnel (measured: minutes instead of seconds on tunneled TPU)."""
    net = CompiledNetwork(spec, compute_dtype=None,
                          tree_search_dirs=tree_search_dirs)

    @jax.jit
    def observe(params, x):
        _, aux = net.forward(params, x, keep_all=True)
        def amax_of(t):
            if isinstance(t, tuple):   # presplit region (fields, cls)
                return jnp.maximum(*[amax_of(p) for p in t])
            return jnp.max(jnp.abs(t.astype(jnp.float32)))
        return {i: amax_of(t) for i, t in aux["outputs"].items()}

    amax_dev = observe(jax.tree.map(jnp.asarray, params_f32),
                       jnp.asarray(calib_x, jnp.float32))
    amax = {i: float(v) for i, v in amax_dev.items()}
    return float(np.max(np.abs(np.asarray(calib_x)))), amax


class QuantizedNetwork:
    """BN-folded, int8-quantized inference program for a detection spec.

    build with :func:`quantize_for_inference`; call ``forward(x_f32)``
    for the flat region output (f32), identical layout to the bf16
    engine's.
    """

    def __init__(self, spec: S.NetworkSpec, qparams, forward,
                 act_scales: dict[int, float]):
        self.spec = spec
        self.qparams = qparams
        self.forward = forward
        self.act_scales = act_scales


def _supported_prefix(layers) -> int:
    """Longest prefix of the layer list the int8 dataflow covers; the
    remainder (e.g. a classifier's avgpool+softmax tail, darknet19) runs
    as a float tail on the dequantized trunk output."""
    t = 0
    for l in layers:
        if not isinstance(l, _SUPPORTED):
            break
        if isinstance(l, S.ConvSpec) and getattr(l, "xnor", False):
            break
        if isinstance(l, S.RouteSpec) and l.out_c <= 0:
            break
        t += 1
    return t


def quantize_for_inference(spec: S.NetworkSpec, params, calib_x,
                           *, head_dtype=jnp.bfloat16,
                           tree_search_dirs=(),
                           presplit: bool = False,
                           quantize_head: bool = False,
                           region_dtype=None,
                           phase_stem: bool = False) -> QuantizedNetwork:
    """Fold BN, calibrate activation scales on ``calib_x`` (f32 NHWC
    sample batch), quantize weights per-channel, and build the int8
    forward.

    Detection topologies (conv/maxpool/route/reorg + region) run int8
    end-to-end with the head conv in ``head_dtype``. Other topologies
    run an int8 trunk up to the first unsupported layer and a float
    tail from there (classifier avgpool/softmax tails, cost layers);
    specs with no quantizable prefix, or with route/shortcut edges
    crossing the trunk/tail boundary, raise NotImplementedError.

    ``calib_x`` may be a path (str) to a batch saved with
    :func:`save_calib`.

    ``presplit=True`` lane-aligns the region head and emits the
    pre-split (fields, cls) contract (ops.boxes.region_activate_split)
    instead of the darknet-flat output — the int8-trunk and
    decode-boundary optimizations stack (yolo9000 serving).

    ``quantize_head=True`` runs the head conv itself in int8 (int8 x
    int8 -> int32 on the MXU, f32 dequant epilogue — no requant step on
    the logits, so the only extra error is the input/weight
    quantization). Off by default: the head logits feed logistic/softmax
    decode. For yolo9000 the 1024->28269 1x1 head conv is ~2/3 of all
    FLOPs, so this is the dominant serving lever there; gated by the
    WordTree mAP A/B (tests/test_map_parity.py).

    ``phase_stem=True`` owns the leading conv3x3+pool2x2 pairs with the
    Pallas phase-split fused kernel (kernels/phase_stem.py): the 2x2
    max runs on the raw s32 conv accumulators inside the kernel (the
    monotone int8 epilogue commutes with max — bit-exact to this
    function's XLA chain, pinned in tests/test_phase_stem.py), so the
    full-resolution conv activations never touch HBM. Requires batch
    128 (the batch dim IS the lane tile); other batch sizes fall back
    to the XLA chain inside the same program. Raises NotImplementedError
    if the spec has no eligible stem.

    ``region_dtype`` sets the dtype the [region] decode (logistic +
    softmax / tree softmax) runs in. Default None = f32 (exactness
    paths). bf16 halves the class-tensor HBM traffic — the measured
    wall for the 28269-ch yolo9000 head, where every decode pass moves
    ~0.6 GB/batch at f32 — and matches what the bf16 ThroughputEngine
    already does; mAP-gated like the other serving levers."""
    calib_x = _resolve_calib(calib_x)
    params_f, fspec = fold_params_for_inference(spec, params,
                                                dtype=jnp.float32)
    if presplit:
        import dataclasses
        from .engine import align_region_head
        fspec, params_f = align_region_head(fspec, params_f,
                                            min_classes=1)
        last = fspec.layers[-1]
        if isinstance(last, S.RegionSpec) and last.head_block:
            fspec = S.NetworkSpec(
                net=fspec.net,
                layers=(*fspec.layers[:-1],
                        dataclasses.replace(
                            last, presplit=True,
                            presplit_flat=(presplit == "flat"))),
                cfg_path=fspec.cfg_path)
    split = _supported_prefix(fspec.layers)
    if split < 2:
        raise NotImplementedError(
            "no int8-quantizable prefix (first layers unsupported); "
            "use the bf16 ThroughputEngine")
    for l in fspec.layers[split:]:
        if isinstance(l, S.RouteSpec):
            raise NotImplementedError("route in the float tail")
        if isinstance(l, S.ShortcutSpec) and l.from_index < split:
            raise NotImplementedError("shortcut crossing the int8 trunk")
    if split == len(fspec.layers) \
            and isinstance(fspec.layers[-1], S.RegionSpec) \
            and not isinstance(fspec.layers[-2], S.ConvSpec):
        # the int8 trunk dequantizes the head input by keeping the conv
        # before [region] in float; any other producer would hand the
        # decode raw int8 codes (a region inside the float tail is fine
        # — the tail runs fully in float)
        raise NotImplementedError(
            "int8 path: [region] must be fed by a conv layer")

    in_amax, amax = calibrate_amax(fspec, params_f, calib_x,
                                   tree_search_dirs=tree_search_dirs)
    # darknet inputs are [0,1] images; floor the input amax at 1.0 so a
    # full-brightness uint8 frame (code 255 -> 1.0) never saturates the
    # input requant clamp when the calibration batch happened not to
    # contain a full-range pixel
    in_amax = max(in_amax, 1.0)
    heads = _head_conv_indices(fspec)
    if split < len(fspec.layers) and isinstance(
            fspec.layers[split - 1], S.ConvSpec):
        # last trunk conv feeds the float tail (e.g. the 1000-class
        # 1x1 conv before avgpool+softmax): keep it in head_dtype so
        # logits don't take an int8 step
        heads.add(split - 1)
    trees = resolve_trees(fspec, tree_search_dirs)

    tail_fwd = None
    tail_params = None
    if split < len(fspec.layers):
        from ..graph.compiler import build_forward as _build_forward
        import dataclasses
        tail_layers = tuple(
            dataclasses.replace(l, from_index=l.from_index - split)
            if isinstance(l, S.ShortcutSpec) else l
            for l in fspec.layers[split:])
        tail_spec = S.NetworkSpec(
            net=fspec.net, layers=tail_layers, cfg_path=fspec.cfg_path)
        tail_trees = {i - split: t for i, t in trees.items() if i >= split}
        tail_fwd = _build_forward(tail_spec, trees=tail_trees,
                                  compute_dtype=head_dtype)
        tail_params = [jax.tree.map(
            lambda a: jnp.asarray(a, head_dtype)
            if getattr(a, "ndim", 0) >= 1 else a, params_f[i])
            for i in range(split, len(fspec.layers))]

    # ---- static per-layer scale propagation (python floats -> baked
    # constants) and parameter quantization -------------------------
    def scale_of(amax_v: float) -> float:
        return max(amax_v, 1e-8) / I8MAX

    layers = fspec.layers[:split]
    s_out: dict[int, float] = {}       # int8 scale of each layer output
    qparams: list[dict[str, Any]] = []
    in_scale = scale_of(in_amax)

    def in_scale_of(i: int) -> float:
        return in_scale if i == 0 else s_out[i - 1]

    for i, l in enumerate(layers):
        p: dict[str, Any] = {}
        if isinstance(l, S.ConvSpec):
            w = np.asarray(params_f[i]["weights"], np.float32)  # HWIO
            b = np.asarray(params_f[i]["biases"], np.float32)
            if i in heads and quantize_head:
                # int8 head: per-channel int8 weights, f32 dequant
                # epilogue, f32-domain output (no requant on logits)
                w_s = np.maximum(np.abs(w).reshape(-1, w.shape[3]).max(0),
                                 1e-8) / I8MAX
                w_q = np.clip(np.round(w / w_s), I8MIN, I8MAX).astype(
                    np.int8)
                s_x = in_scale_of(i)
                p = {"weights": jnp.asarray(w_q),
                     "dequant": jnp.asarray(s_x * w_s, jnp.float32),
                     "biases": jnp.asarray(b, jnp.float32)}
                s_out[i] = -1.0        # f32-domain output
            elif i in heads:
                p = {"weights": jnp.asarray(w, head_dtype),
                     "biases": jnp.asarray(b, jnp.float32)}
                s_out[i] = -1.0        # f32-domain output
            else:
                w_s = np.maximum(np.abs(w).reshape(-1, w.shape[3]).max(0),
                                 1e-8) / I8MAX           # per-out-channel
                w_q = np.clip(np.round(w / w_s), I8MIN, I8MAX).astype(
                    np.int8)
                s_x = in_scale_of(i)
                p = {"weights": jnp.asarray(w_q),
                     # int32 -> f32 dequant constant, folds s_x * s_w
                     "dequant": jnp.asarray(s_x * w_s, jnp.float32),
                     "biases": jnp.asarray(b, jnp.float32)}
                s_out[i] = scale_of(amax[i])
        elif isinstance(l, (S.MaxPoolSpec, S.ReorgSpec)):
            s_out[i] = in_scale_of(i)   # scale-preserving
        elif isinstance(l, S.RouteSpec):
            srcs = [s_out[j] for j in l.layers]
            if any(s < 0 for s in srcs):
                raise NotImplementedError("route from a head conv")
            s_out[i] = max(srcs)
        elif isinstance(l, S.RegionSpec):
            s_out[i] = -1.0
        qparams.append(p)

    act_scales = dict(s_out)

    stem_fn, n_stem = None, 0
    if phase_stem:
        from ..kernels.phase_stem import build_phase_stem
        stem_fn, n_stem = build_phase_stem(fspec, qparams, s_out,
                                           in_scale)
        if stem_fn is None:
            raise NotImplementedError(
                "phase_stem: no eligible conv3x3+pool2x2 stem pairs "
                "in this spec")

    # ---- forward builder -------------------------------------------
    rdt = region_dtype if region_dtype is not None else jnp.float32

    def forward(qp, x):
        saved: dict[int, Any] = {}
        start = 0
        if stem_fn is not None and x.shape[0] == 128:
            # Pallas phase-split stem: requant + pairs [0, n_stem) in
            # fused kernels, bit-exact to the chain below
            cur = stem_fn(x)
            for j in range(n_stem):
                saved[j] = None        # plan_pairs guarantees unused
            saved[n_stem - 1] = cur
            start = n_stem
        elif x.dtype == jnp.uint8:
            # raw camera frames: fold the /255 into the input quant so
            # the engine reads 1 byte/px instead of 4 (the conversion
            # fuses into the requant clamp)
            cur = _requant(x.astype(jnp.float32),
                           np.float32(1.0 / (255.0 * in_scale)))
        else:
            cur = _requant(x.astype(jnp.float32),
                           np.float32(1.0 / in_scale))
        for i, l in enumerate(layers):
            if i < start:
                continue
            if isinstance(l, S.ConvSpec):
                if i in heads and "dequant" in qp[i]:
                    # quantized head: int8 MXU matmul straight off the
                    # int8 trunk output, f32 logits out
                    y = _conv_i8(cur, qp[i]["weights"],
                                 stride=l.stride, pad=l.pad)
                    y = y.astype(jnp.float32) * qp[i]["dequant"]
                    y = y + qp[i]["biases"]
                    cur = A.get_activation(l.activation)(y)
                elif i in heads:
                    s_x = in_scale_of(i)
                    xf = (cur.astype(head_dtype)
                          * jnp.asarray(s_x, head_dtype))
                    from ..ops.conv import conv2d
                    y = conv2d(xf, qp[i]["weights"], stride=l.stride,
                               pad=l.pad, compute_dtype=head_dtype)
                    y = y + qp[i]["biases"]
                    cur = A.get_activation(l.activation)(y)
                else:
                    y = _conv_i8(cur, qp[i]["weights"],
                                 stride=l.stride, pad=l.pad)
                    y = y.astype(jnp.float32) * qp[i]["dequant"]
                    y = y + qp[i]["biases"]
                    y = A.get_activation(l.activation)(y)
                    cur = _requant(y, np.float32(1.0 / s_out[i]))
            elif isinstance(l, S.MaxPoolSpec):
                cur = _maxpool_q(cur, size=l.size, stride=l.stride,
                                 pad=l.pad)
            elif isinstance(l, S.ReorgSpec):
                cur = (L.reorg_reverse_darknet(cur, stride=l.stride)
                       if l.reverse else
                       L.reorg_darknet(cur, stride=l.stride))
            elif isinstance(l, S.RouteSpec):
                parts = []
                for j in l.layers:
                    t = saved[j]
                    if s_out[j] != s_out[i]:
                        # rescale in the int8 domain to the common
                        # (max) scale: one fused elementwise pass
                        r = np.float32(s_out[j] / s_out[i])
                        t = _requant(t.astype(jnp.float32) * r,
                                     np.float32(1.0))
                    parts.append(t)
                cur = jnp.concatenate(parts, axis=-1)
            elif isinstance(l, S.RegionSpec):
                nf = l.coords + l.classes + 1
                tree = trees.get(i)
                # the astype fuses into the producing conv epilogue, so
                # rdt=bf16 means the head logits are WRITTEN bf16 (half
                # the class-tensor traffic), not converted after the fact
                if l.presplit and l.head_block:
                    split_fn = (B.region_activate_split_flat
                                if l.presplit_flat
                                else B.region_activate_split)
                    cur = split_fn(
                        cur.astype(rdt), l.n, l.coords,
                        l.classes, l.head_block, softmax=l.softmax,
                        tree_groups=tree.group if tree is not None
                        else None)
                else:
                    acts = B.region_activate(
                        cur.astype(rdt), l.n, nf,
                        softmax=l.softmax,
                        tree_groups=tree.group if tree is not None
                        else None)
                    cur = acts.reshape(acts.shape[0], -1)
            saved[i] = cur
        if tail_fwd is not None:
            if cur.dtype == jnp.int8:      # trunk ended on an int8 layer
                cur = (cur.astype(head_dtype)
                       * jnp.asarray(s_out[split - 1], head_dtype))
            out, _ = tail_fwd(tail_params, cur)
            return out
        if not isinstance(cur, tuple) and cur.dtype == jnp.int8:
            # fully-supported spec ending on a non-head int8 layer (e.g.
            # a conv/maxpool-terminated trunk with no float tail):
            # dequantize so the contract — f32-domain outputs — holds
            cur = cur.astype(jnp.float32) * np.float32(s_out[split - 1])
        return cur

    return QuantizedNetwork(fspec, qparams, forward, act_scales)


class QuantizedForwardShim:
    """Drop-in replacement for the ``compiled`` attribute of Detector /
    Classifier: same ``forward(params, x) -> (out, aux)`` surface, but
    running the int8 program (the passed-in params are ignored — the
    quantized constants are baked in)."""

    def __init__(self, spec: S.NetworkSpec, params, calib_x, trees,
                 *, tree_search_dirs=(), quantize_head: bool = False,
                 region_dtype=None):
        qnet = quantize_for_inference(spec, params,
                                      _resolve_calib(calib_x),
                                      tree_search_dirs=tree_search_dirs,
                                      quantize_head=quantize_head,
                                      region_dtype=region_dtype)
        self.qnet = qnet
        self.trees = trees

    def forward(self, params, x, **kw):
        return self.qnet.forward(self.qnet.qparams, x), None


class QuantizedThroughputEngine:
    """Batched int8 serving engine; same interface/benchmark protocol
    as :class:`ThroughputEngine` (checksum readback — see there for why
    block_until_ready is not trusted on tunneled deployments)."""

    def __init__(self, spec: S.NetworkSpec, params, *, batch: int = 128,
                 calib_x=None, tree_search_dirs=(),
                 presplit: bool = False, quantize_head: bool = False,
                 region_dtype=None, mesh=None,
                 phase_stem: bool = False):
        self.batch = batch
        self.mesh = mesh
        if mesh is not None and batch % mesh.shape["data"]:
            raise ValueError(f"batch {batch} not divisible by data "
                             f"axis {mesh.shape['data']}")
        calib_x = _resolve_calib(calib_x)   # str -> saved batch
        if calib_x is None:
            # benchmark convenience only: noise calibration bears no
            # relation to real-image activation ranges — serving MUST
            # pass representative preprocessed frames
            import warnings
            warnings.warn(
                "QuantizedThroughputEngine: no calib_x given; "
                "calibrating on random noise (fine for benchmarks, "
                "wrong for serving accuracy)", stacklevel=2)
            rng = np.random.RandomState(0)
            calib_x = rng.uniform(
                0, 1, (min(batch, 8), spec.net.h, spec.net.w,
                       spec.net.c)).astype(np.float32)
        if phase_stem and (mesh is not None or batch != 128):
            # the phase-split stem's lane dim IS the batch: 128 only,
            # and a sharded batch never sees 128 per chip here
            raise ValueError("phase_stem requires batch=128, no mesh")
        qnet = quantize_for_inference(spec, params, calib_x,
                                      tree_search_dirs=tree_search_dirs,
                                      presplit=presplit,
                                      quantize_head=quantize_head,
                                      region_dtype=region_dtype,
                                      phase_stem=phase_stem)
        self.qnet = qnet
        self.presplit = isinstance(qnet.spec.layers[-1], S.RegionSpec) \
            and qnet.spec.layers[-1].presplit
        fwd = qnet.forward
        qp = qnet.qparams

        if mesh is None:
            @jax.jit
            def run(x):
                return fwd(qp, x)

            @jax.jit
            def run_sum(x):
                out = fwd(qp, x)
                return sync_checksum(out)
        else:
            # multi-chip DP serving for the int8 path: batch sharded
            # over the mesh 'data' axis, int8 weights + scales
            # replicated (closed-over constants), zero collectives in
            # the forward — the quantized twin of
            # engine.ShardedThroughputEngine (which see for the design
            # note; the reference has no multi-GPU inference at all)
            from functools import partial
            from ..parallel.mesh import batch_sharding
            bs = batch_sharding(mesh)
            out_sh = (bs, bs) if self.presplit else bs

            @partial(jax.jit, in_shardings=(bs,), out_shardings=out_sh)
            def run(x):
                return fwd(qp, x)

            @partial(jax.jit, in_shardings=(bs,))
            def run_sum(x):
                out = fwd(qp, x)
                return sync_checksum(out)

        self._run = run
        self._run_sum = run_sum
        self.input_shape = (batch, spec.net.h, spec.net.w, spec.net.c)

    def _ctx(self):
        import contextlib
        return self.mesh if self.mesh is not None \
            else contextlib.nullcontext()

    def warmup(self):
        with self._ctx():
            float(self._run_sum(jnp.zeros(self.input_shape,
                                          jnp.float32)))

    def __call__(self, x):
        with self._ctx():
            return self._run(x)

    def benchmark(self, iters: int = 50, warmup: int = 5,
                  input_dtype=jnp.float32, chunk: int = 1) -> dict:
        """``input_dtype=jnp.uint8`` measures the raw-camera-frame feed
        (the /255 is folded into the input quant — 1 byte/px device
        reads instead of 4; the serving path for u8 traffic).
        ``chunk`` chains that many distinct batches per dispatch (see
        engine.checksum_benchmark)."""
        from .engine import checksum_benchmark
        return checksum_benchmark(self._run_sum, self.input_shape,
                                  self.batch, iters=iters, warmup=warmup,
                                  dtype=input_dtype, chunk=chunk,
                                  mesh=self.mesh)


__all__ = ["quantize_for_inference", "QuantizedNetwork",
           "QuantizedThroughputEngine", "calibrate_amax",
           "load_calib", "save_calib"]
