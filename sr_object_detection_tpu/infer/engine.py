"""Production inference engines: throughput (batched) and latency (batch-1).

The perf-path counterpart of the reference's ``darknet speed`` harness
(src_yolo2/darknet.c:98-113) and ``network_predict_gpu``
(src_yolo2/network_kernels.cu:392). TPU-first design:

  * BN folded into conv weights at load (the reference does this only as
    offline 'denormalize' surgery, darknet.c:309-344) — inference is
    pure conv+bias+act;
  * weights and activations in bfloat16, fp32 accumulation on the MXU;
  * the whole network is ONE jitted program — XLA fuses bias+leaky into
    conv epilogues; no per-layer dispatch;
  * batch-1 latency path donates the input buffer and keeps the device
    program warm.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import spec as S
from ..graph.compiler import CompiledNetwork
from ..ops import conv as C


def fold_params_for_inference(spec: S.NetworkSpec, params, dtype=jnp.bfloat16):
    """Fold BN into conv weights/biases and cast to the compute dtype.

    Returns (folded_params, folded_spec) where folded_spec has
    batch_normalize=False on folded conv layers.
    """
    import dataclasses
    new_params = []
    new_layers = []
    for l, p in zip(spec.layers, params):
        if isinstance(l, S.ConvSpec) and l.batch_normalize and p:
            p = C.fold_batchnorm(jax.tree.map(jnp.asarray, p))
            l = dataclasses.replace(l, batch_normalize=False)
        if p:
            p = jax.tree.map(
                lambda a: jnp.asarray(a, dtype)
                if getattr(a, "ndim", 0) >= 1 else a, p)
        new_params.append(p)
        new_layers.append(l)
    folded = S.NetworkSpec(net=spec.net, layers=tuple(new_layers),
                           cfg_path=spec.cfg_path)
    return new_params, folded


_MONOTONIC_ACTS = {"leaky", "relu", "linear", "logistic", "relie",
                   "ramp", "tanh", "elu", "hardtan", "lhtan", "loggy"}


def sync_checksum(out):
    """Scalar that data-depends on every output element, for the
    benchmark/warmup host sync ONLY (its value is never checked).

    Low-precision outputs reduce minor-axis-first in their NATIVE dtype:
    ``jnp.sum(bf16, dtype=f32)`` lowers to convert-then-reduce, and at
    yolo9000 scale (the (B,13,13,3*28269) bf16 presplit class tensor)
    the converted f32 intermediate materializes — measurement-protocol
    overhead the engine itself never pays. The per-row native reduce
    keeps the traffic at bf16 width; the tiny (batch,)-row remainder
    accumulates in f32. Accuracy is irrelevant — only the structural
    data dependence (which no reduce order changes) matters."""
    outs = out if isinstance(out, tuple) else (out,)
    tot = jnp.float32(0.0)
    for o in outs:
        if o.dtype in (jnp.bfloat16, jnp.float16) and o.ndim >= 2:
            rows = jnp.sum(o.reshape(o.shape[0], -1), axis=-1)
            tot = tot + jnp.sum(rows, dtype=jnp.float32)
        else:
            tot = tot + jnp.sum(o, dtype=jnp.float32)
    return tot


def checksum_benchmark(run_sum, input_shape, batch, *, iters: int,
                       warmup: int, dtype=jnp.float32, mesh=None,
                       chunk: int = 1) -> dict:
    """Shared steady-state throughput protocol (the darknet 'speed'
    analog): device-resident input, `iters` queued dispatches of a
    checksum program, ONE hard host sync at the end. `run_sum` must
    reduce the full forward to a scalar — on tunneled deployments
    block_until_ready returns early, so the 4-byte host read of a value
    that data-depends on every output element is the only honest sync.

    ``chunk > 1`` chains that many DISTINCT device-resident batches
    inside one dispatch via ``lax.scan`` (total images = iters*batch
    unchanged). MEASURED NEGATIVE on the v5e axon tunnel (kept as an
    opt-in probe): tiny-yolo int8-u8 18652 img/s at chunk=1 vs 17979
    at chunk=8 — the queued-dispatch protocol already pipelines
    (async dispatch keeps the device fed), and the scan body's
    dynamic-slice copy of each 66 MB input batch costs more than the
    dispatch it amortizes. Useful only where per-dispatch cost truly
    dominates (much smaller models / slower control links).
    """
    import contextlib
    rng = np.random.RandomState(0)
    shape = (chunk, *input_shape) if chunk > 1 else input_shape
    if dtype == jnp.uint8:
        # raw camera-frame feed (1 byte/px device reads)
        x = jnp.asarray(rng.randint(0, 256, shape, np.uint8))
    else:
        x = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32),
                        dtype)
    if chunk > 1:
        # run_sum is a jitted program: calling it under trace inlines
        # the forward into the scan body
        @jax.jit
        def run_chunk(xs):
            def body(acc, xi):
                return acc + run_sum(xi).astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0.0), xs)[0]
        step, n_disp = run_chunk, max(1, iters // chunk)
    else:
        step, n_disp = run_sum, iters
    ctx = mesh if mesh is not None else contextlib.nullcontext()
    with ctx:
        for _ in range(warmup):
            float(step(x))
        start = time.perf_counter()
        s = None
        for _ in range(n_disp):
            s = step(x)
        float(s)
    dt = time.perf_counter() - start
    n_img = n_disp * chunk * batch if chunk > 1 else iters * batch
    return {"images_per_sec": n_img / dt,
            "sec_per_batch": dt * batch / n_img, "batch": batch}


def fuse_conv_pool(spec: S.NetworkSpec, params):
    """Graph rewrite: [conv 3x3/s1/p1 (monotonic act) -> maxpool 2x2/s2]
    becomes one FusedConvPoolSpec (polyphase stride-2 4x4 conv + phase
    max). Requires BN already folded. Exact; inference-only.

    NOTE: measured SLOWER than XLA's native conv+reduce on v5e for the
    darknet topologies (see ThroughputEngine.fuse_pool) — retained as an
    opt-in because the trade (1.78x MACs for ~7x naive MXU utilization)
    may pay off on other generations or wider first layers."""
    import dataclasses
    import numpy as np
    new_layers: list = []
    new_params: list = []
    live = set()
    for l in spec.layers:
        if isinstance(l, S.RouteSpec):
            live.update(l.layers)
        elif isinstance(l, S.ShortcutSpec):
            live.add(l.from_index)

    i = 0
    layers = spec.layers
    while i < len(layers):
        l = layers[i]
        nxt = layers[i + 1] if i + 1 < len(layers) else None
        fusable = (
            isinstance(l, S.ConvSpec) and not l.batch_normalize
            and l.size == 3 and l.stride == 1 and l.pad == 1
            and l.activation in _MONOTONIC_ACTS
            and isinstance(nxt, S.MaxPoolSpec)
            and nxt.size == 2 and nxt.stride == 2 and nxt.pad == 0
            and l.out_h % 2 == 0 and l.out_w % 2 == 0
            and l.index not in live      # conv output must be private
        )
        if fusable:
            p = params[i]
            w = np.asarray(p["weights"])          # (3,3,C,F)
            c, f = w.shape[2], w.shape[3]
            w4 = np.zeros((4, 4, c, 4 * f), w.dtype)
            for py in range(2):
                for px in range(2):
                    ph = py * 2 + px
                    # W4[a,b,c,ph*F+f] = W[a-py, b-px, c, f]
                    w4[py:py + 3, px:px + 3, :, ph * f:(ph + 1) * f] = w
            fused = S.FusedConvPoolSpec(
                index=l.index, h=l.h, w=l.w, c=l.c, inputs=l.inputs,
                out_h=nxt.out_h, out_w=nxt.out_w, out_c=f,
                outputs=nxt.outputs, filters=f, activation=l.activation)
            new_layers.append(fused)
            new_params.append({"weights": w4,
                               "biases": np.asarray(p["biases"])})
            # keep a placeholder so route/shortcut indices stay aligned
            new_layers.append(dataclasses.replace(
                nxt, size=1, stride=1, pad=0,
                out_h=nxt.out_h, out_w=nxt.out_w))
            new_params.append({})
            i += 2
            continue
        new_layers.append(l)
        new_params.append(params[i])
        i += 1

    return S.NetworkSpec(net=spec.net, layers=tuple(new_layers),
                         cfg_path=spec.cfg_path), new_params


def align_region_head(spec: S.NetworkSpec, params, *,
                      min_classes: int = 1024):
    """Graph rewrite: re-lay the region head conv's output channels so
    each anchor's block is 128-lane aligned — [coords+1 fields |
    zero-pad to 128 | classes | zero-pad to a 128 multiple].

    Why: the darknet-contiguous head (A*(coords+1+classes) channels,
    e.g. yolo9000's 3*9423 = 28269) puts every anchor's class run at a
    misaligned lane offset, and the (B,H,W,A,F) reshape + class slices
    around the tree softmax each lower to full-tensor relayout copies
    (~20% of a yolo9000-416 batch). Padding the conv (~+1.9% head
    FLOPs) makes those reshapes free. Output order is unchanged
    (region_activate_aligned reassembles darknet field order).

    Only worthwhile for big heads — small ones (125ch tiny-yolo) fit a
    couple of tiles outright; gated by ``min_classes``.

    MEASURED WASH on v5e after the banded-matmul tree softmax landed:
    1279 vs 1280 img/s on yolo9000-416 — the remaining relayouts sit at
    the darknet-order output boundary, which this rewrite cannot remove
    without changing the output contract, and the +1.9% head FLOPs eat
    the rest. Kept as an exactness-tested opt-in (align_head=True);
    off by default.
    """
    import dataclasses
    region = spec.layers[-1]
    head = spec.layers[-2] if len(spec.layers) >= 2 else None
    nf = region.coords + region.classes + 1 if isinstance(
        region, S.RegionSpec) else 0
    if (not isinstance(region, S.RegionSpec)
            or region.classes < min_classes
            or not isinstance(head, S.ConvSpec)
            or head.batch_normalize          # fold BN first
            or head.filters != region.n * nf):
        return spec, params
    fields = region.coords + 1
    cls_pad = -(-region.classes // 128) * 128
    block = 128 + cls_pad
    w = np.asarray(params[-2]["weights"])        # HWIO
    bias = np.asarray(params[-2]["biases"])
    w2 = np.zeros((*w.shape[:3], region.n * block), w.dtype)
    b2 = np.zeros((region.n * block,), bias.dtype)
    for a in range(region.n):
        src = a * nf
        dst = a * block
        w2[..., dst:dst + fields] = w[..., src:src + fields]
        b2[dst:dst + fields] = bias[src:src + fields]
        w2[..., dst + 128:dst + 128 + region.classes] = \
            w[..., src + fields:src + nf]
        b2[dst + 128:dst + 128 + region.classes] = bias[src + fields:src + nf]
    new_head = dataclasses.replace(
        head, filters=region.n * block, out_c=region.n * block,
        outputs=head.out_h * head.out_w * region.n * block)
    new_region = dataclasses.replace(
        region, c=region.n * block, head_block=block,
        inputs=region.h * region.w * region.n * block)
    new_layers = (*spec.layers[:-2], new_head, new_region)
    new_params = list(params)
    new_params[-2] = {"weights": w2, "biases": b2}
    return S.NetworkSpec(net=spec.net, layers=new_layers,
                         cfg_path=spec.cfg_path), new_params


class ThroughputEngine:
    """Batched jitted forward for maximum images/sec."""

    def __init__(self, spec: S.NetworkSpec, params, *, batch: int = 64,
                 dtype=jnp.bfloat16, fold_bn: bool = True,
                 fuse_pool: bool = False, align_head: bool = False,
                 presplit: bool = False, phase_stem: bool = False):
        # fuse_pool: polyphase conv+pool rewrite (fuse_conv_pool). Exact
        # and correctness-tested, but MEASURED SLOWER on v5e (XLA's
        # native small-channel conv path beats the 1.78x-MACs polyphase
        # form: 8.0k vs 13.0k img/s on tiny-yolo-416) — off by default,
        # kept for other topologies/generations.
        self.batch = batch
        self.dtype = dtype
        if fold_bn:
            self.params, self.spec = fold_params_for_inference(
                spec, params, dtype)
        else:
            self.params = jax.tree.map(jnp.asarray, params)
            self.spec = spec
        if fuse_pool:
            self.spec, self.params = fuse_conv_pool(self.spec, self.params)
            self.params = jax.tree.map(
                lambda a: jnp.asarray(a, dtype)
                if getattr(a, "ndim", 0) >= 1 else a, self.params)
        if (align_head or presplit) and fold_bn:
            self.spec, self.params = align_region_head(
                self.spec, self.params,
                min_classes=1 if presplit else 1024)
            self.params = jax.tree.map(
                lambda a: jnp.asarray(a, dtype)
                if getattr(a, "ndim", 0) >= 1 else a, self.params)
        self.presplit = False
        if presplit:
            # pre-split output contract: (fields (B,H,W,A,coords+1),
            # cls (B,H,W,A,classes)) — no darknet-flat reassembly.
            # presplit="flat" keeps cls as (B,H,W,A*block) in the head
            # conv's own layout (no 5-D retile copies; consumer slices
            # classes at [a*block+128 : +classes] per anchor — see
            # ops.boxes.region_activate_split_flat).
            # Requires the aligned head; non-region specs keep flat.
            last = self.spec.layers[-1]
            if isinstance(last, S.RegionSpec) and last.head_block:
                import dataclasses
                self.spec = S.NetworkSpec(
                    net=self.spec.net,
                    layers=(*self.spec.layers[:-1],
                            dataclasses.replace(
                                last, presplit=True,
                                presplit_flat=(presplit == "flat"))),
                    cfg_path=self.spec.cfg_path)
                self.presplit = True
        fwd = None
        self.phase_stem = False
        if (phase_stem and dtype == jnp.bfloat16 and batch == 128
                and fold_bn):
            # bf16 phase-split fused stem (kernels/phase_train.py
            # build_bf16_stem): the leading conv+pool pairs never
            # materialize the full-res conv activation — the bf16
            # sibling of the int8 serving headline kernel
            from ..kernels import phase_train as PTK
            if jax.default_backend() == "tpu" or PTK._INTERPRET:
                stem_fn, n = PTK.build_bf16_stem(self.spec, self.params)
                if stem_fn is not None:
                    from ..kernels.b1_stem import truncate_spec
                    tail = CompiledNetwork(truncate_spec(self.spec, n),
                                           compute_dtype=dtype)
                    tail_params = self.params[n:]

                    def fwd(params, x, _s=stem_fn, _t=tail,
                            _tp=tail_params):
                        return _t.forward(_tp, _s(x))

                    self.phase_stem = True
        if fwd is None:
            compiled = CompiledNetwork(self.spec, compute_dtype=dtype)
            fwd = compiled.forward

        @jax.jit
        def run(params, x):
            out, _ = fwd(params, x.astype(dtype))
            return out

        # checksum variant for benchmarking: forces the full forward but
        # reads back 4 bytes — on tunneled deployments block_until_ready
        # is unreliable and full-output readback would dominate, so the
        # honest sync is a tiny host copy of a value that data-depends on
        # every output element.
        @jax.jit
        def run_sum(params, x):
            out, _ = fwd(params, x.astype(dtype))
            return sync_checksum(out)

        self._run = run
        self._run_sum = run_sum
        self.input_shape = (batch, spec.net.h, spec.net.w, spec.net.c)

    def warmup(self):
        x = jnp.zeros(self.input_shape, self.dtype)
        float(self._run_sum(self.params, x))  # hard sync through host read

    def __call__(self, x):
        return self._run(self.params, x)

    def benchmark(self, iters: int = 50, warmup: int = 5,
                  chunk: int = 1) -> dict:
        return checksum_benchmark(
            lambda x: self._run_sum(self.params, x), self.input_shape,
            self.batch, iters=iters, warmup=warmup, dtype=self.dtype,
            chunk=chunk)


class ShardedThroughputEngine:
    """Multi-chip batched inference: the batch is sharded over the mesh
    'data' axis (pure DP — zero collectives in the forward) and wide
    conv filters can shard over 'model' (TP; XLA inserts the psum over
    ICI where the row-parallel fallback needs it — see
    parallel.mesh.shard_params).

    The serving-side counterpart of the trainer's mesh path; the
    reference has no multi-GPU inference at all (its -gpus flag only
    affects training, src_yolo2/detector.c:611-632).
    """

    def __init__(self, spec: S.NetworkSpec, params, *, mesh,
                 batch: int = 128, dtype=jnp.bfloat16,
                 tp_min_filters: int = 2048, presplit: bool = False):
        from ..parallel.mesh import batch_sharding, shard_params
        if batch % mesh.shape["data"]:
            raise ValueError(
                f"batch {batch} not divisible by data axis "
                f"{mesh.shape['data']}")
        self.mesh = mesh
        self.batch = batch
        self.dtype = dtype
        self.params, self.spec = fold_params_for_inference(
            spec, params, dtype)
        self.presplit = False
        if presplit:
            import dataclasses
            self.spec, self.params = align_region_head(
                self.spec, self.params, min_classes=1)
            last = self.spec.layers[-1]
            if isinstance(last, S.RegionSpec) and last.head_block:
                self.spec = S.NetworkSpec(
                    net=self.spec.net,
                    layers=(*self.spec.layers[:-1],
                            dataclasses.replace(
                                last, presplit=True,
                                presplit_flat=(presplit == "flat"))),
                    cfg_path=self.spec.cfg_path)
                self.presplit = True
        self.params = shard_params(mesh, self.params, self.spec,
                                   tp_min_filters=tp_min_filters)
        compiled = CompiledNetwork(self.spec, compute_dtype=dtype)
        fwd = compiled.forward
        bs = batch_sharding(mesh)

        # presplit returns a (fields, cls) tuple: batch-shard each leaf
        out_sh = (bs, bs) if self.presplit else bs

        @partial(jax.jit, in_shardings=(None, bs), out_shardings=out_sh)
        def run(params, x):
            out, _ = fwd(params, x.astype(dtype))
            return out

        @partial(jax.jit, in_shardings=(None, bs))
        def run_sum(params, x):
            out, _ = fwd(params, x.astype(dtype))
            return sync_checksum(out)

        self._run = run
        self._run_sum = run_sum
        self.input_shape = (batch, spec.net.h, spec.net.w, spec.net.c)

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


class LatencyEngine:
    """Batch-1 low-latency path with on-device preprocessing.

    The robot loop's engine (KinectUtil::detection -> test_detector_img,
    src_yolo2/KinectUtil.cpp:379-487): one jitted program does resize +
    normalize + forward + region decode; host<->device traffic is one
    input frame down, thresholded candidates up.
    """

    def __init__(self, spec: S.NetworkSpec, params, *,
                 dtype=jnp.bfloat16, fold_bn: bool = True,
                 frame_hw: Optional[tuple[int, int]] = None,
                 int8_calib=None, fused_stem: bool = False):
        if int8_calib is not None:
            # int8 serving mode: the batch-1 path is HBM-bandwidth
            # bound, so halving activation bytes cuts frame latency
            # nearly 2x (see infer/quant.py for the PTQ scheme and the
            # mAP accuracy gate)
            from .quant import quantize_for_inference
            qnet = quantize_for_inference(spec, params,
                                          np.asarray(int8_calib))
            self.spec = qnet.spec
            self.params = qnet.qparams
            qfwd = qnet.forward
            fwd = lambda params, x: (qfwd(params, x), None)
            dtype = jnp.float32     # pre-quant input dtype (the int8
                                    # requant of the frame happens in
                                    # the quantized program itself)
        elif fold_bn:
            self.params, self.spec = fold_params_for_inference(
                spec, params, dtype)
        else:
            self.params = jax.tree.map(jnp.asarray, params)
            self.spec = spec
        self.dtype = dtype
        self.fused_stem = False
        if int8_calib is None:
            fwd = None
            if fused_stem and dtype == jnp.bfloat16:
                # batch-1 stem ownership: XLA's B=1 layouts lane-pad
                # every C<128 activation (~650us/frame of copies +
                # retiled pool reduces on tiny-yolo-416); the Pallas
                # flat channels-first stem removes that wholesale.
                # Mosaic needs a real TPU (tests flip _INTERPRET).
                from ..kernels import b1_stem as BS
                if jax.default_backend() == "tpu" or BS._INTERPRET:
                    stem_fn, n = BS.build_stem(self.spec, self.params)
                    if stem_fn is not None:
                        sub = BS.truncate_spec(self.spec, n)
                        # tail 3x3 convs at B=1 run as 9-tap matmuls
                        # (spatial fills the sublanes; XLA's B=1 conv
                        # layout wastes half of every tile — measured
                        # 1.4-1.55x on the 13x13 convs)
                        tail = CompiledNetwork(sub, compute_dtype=dtype,
                                               b1_matmul=True)
                        tail_params = self.params[n:]

                        def fwd(params, x, _stem=stem_fn, _tail=tail,
                                _tp=tail_params):
                            return _tail.forward(_tp, _stem(x))

                        self.fused_stem = True
            if fwd is None:
                compiled = CompiledNetwork(self.spec, compute_dtype=dtype)
                fwd = compiled.forward
        net = spec.net
        self.frame_hw = frame_hw

        from ..ops import image as I
        from ..ops import boxes as B
        region = spec.layers[-1]
        self.region = region if isinstance(region, S.RegionSpec) else None

        topk = 64

        @jax.jit
        def run(params, frame_u8):
            x = frame_u8.astype(jnp.float32) / 255.0
            if frame_hw is not None and frame_hw != (net.h, net.w):
                x = I.resize_image(x, net.w, net.h)
            x = x[None].astype(dtype)
            out, _ = fwd(params, x)
            if self.region is not None:
                r = self.region
                nf = r.coords + r.classes + 1
                acts = out.reshape(1, r.h, r.w, r.n, nf).astype(jnp.float32)
                boxes = B.decode_region_boxes(
                    acts, np.asarray(r.anchors).reshape(r.n, 2),
                    img_w=1.0, img_h=1.0).reshape(-1, 4)
                probs = (acts[..., 4:5] * acts[..., 5:]).reshape(
                    -1, r.classes)
                # compact on device: top-k candidates by best class prob,
                # so the host reads KBs, not the full grid
                best = jnp.max(probs, axis=-1)
                _, idx = jax.lax.top_k(best, min(topk, best.shape[0]))
                return boxes[idx], probs[idx]
            return out, None

        self._run = run
        self._fwd = fwd
        self._net = net
        h, w = frame_hw if frame_hw else (net.h, net.w)
        self.frame_shape = (h, w, net.c)

    def warmup(self):
        out = self._run(self.params, jnp.zeros(self.frame_shape, jnp.uint8))
        jax.tree.map(np.asarray, out)  # hard sync

    def __call__(self, frame_u8):
        frame_u8 = jnp.asarray(frame_u8)
        if frame_u8.ndim != 3:
            # the batch dim is added inside the jitted program; a
            # pre-batched frame would silently become rank 5 deep in the
            # net (the int8 path's conv would then raise an opaque
            # ndim-mismatch from inside jit)
            raise ValueError(
                f"LatencyEngine expects one unbatched HWC frame "
                f"{self.frame_shape}, got shape {frame_u8.shape}")
        return self._run(self.params, frame_u8)

    def benchmark(self, iters: int = 100, warmup: int = 10) -> dict:
        frame = np.random.randint(0, 255, self.frame_shape, np.uint8)
        for _ in range(warmup):
            out = self._run(self.params, jnp.asarray(frame))
            jax.tree.map(np.asarray, out)
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = self._run(self.params, jnp.asarray(frame))
            # end-to-end frame latency = upload + compute + compact
            # readback; np.asarray is the only reliable sync on tunneled
            # deployments
            jax.tree.map(np.asarray, out)
            lat.append(time.perf_counter() - t0)
        lat = np.array(lat)
        return {
            "p50_ms": float(np.percentile(lat, 50) * 1e3),
            "p90_ms": float(np.percentile(lat, 90) * 1e3),
            "p99_ms": float(np.percentile(lat, 99) * 1e3),
            "mean_ms": float(lat.mean() * 1e3),
        }

    def device_benchmark(self, reps: int = 200) -> dict:
        """On-device batch-1 forward time, tunnel-free: `reps`
        iterations chained INSIDE one compiled program (lax.scan with a
        data dependency between iterations so nothing is hoisted), one
        4-byte readback. wall/reps ≈ device time per frame — the number
        the tunnel-RTT-dominated benchmark() cannot see."""
        fwd, net, dtype = self._fwd, self._net, self.dtype
        params = self.params

        @jax.jit
        def rep(params, x):
            def body(carry, _):
                out, _ = fwd(params, carry)
                # tiny data-dependent feedback: serializes iterations
                # without changing the math measurably
                eps = (jnp.min(jnp.abs(out.astype(jnp.float32)))
                       * jnp.float32(1e-30)).astype(carry.dtype)
                return carry + eps, ()
            y, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(y.astype(jnp.float32))

        x = jnp.asarray(np.random.uniform(
            0, 1, (1, net.h, net.w, net.c)).astype(np.float32), dtype)
        float(rep(params, x))          # compile + warm
        t0 = time.perf_counter()
        float(rep(params, x))          # one dispatch, reps forwards
        dt = time.perf_counter() - t0
        return {"device_ms_per_frame": dt / reps * 1e3, "reps": reps}


def best_latency_engine(spec: S.NetworkSpec, params, *, int8_calib,
                        dtype=jnp.bfloat16, reps: int = 100,
                        frame_hw=None):
    """Serving-default batch-1 engine: measure the candidates ON DEVICE
    and return the fastest —

      * bf16 + Pallas fused stem (kernels/b1_stem.py): measured 0.398 vs
        1.079 ms on v5e tiny-yolo-416 (2.7x — B=1 XLA spends ~650us in
        stem relayout copies the kernel removes);
      * plain bf16;
      * int8 (its requant chain is latency-bound at batch 1 and measured
        SLOWER than bf16 on v5e — 1.78 vs 1.06 ms — so it must never be
        the blind default; BENCH_r02 batch-1 rows).

    The returned engine carries a ``selection`` dict:
    {"bf16_ms", "fused_ms", "int8_ms", "chosen"}."""
    cands = {}
    e_bf = LatencyEngine(spec, params, dtype=dtype, frame_hw=frame_hw)
    cands["bf16"] = (
        e_bf, e_bf.device_benchmark(reps=reps)["device_ms_per_frame"])
    try:
        e_fs = LatencyEngine(spec, params, dtype=dtype, frame_hw=frame_hw,
                             fused_stem=True)
        if e_fs.fused_stem:
            cands["fused"] = (
                e_fs,
                e_fs.device_benchmark(reps=reps)["device_ms_per_frame"])
    except Exception:
        pass   # Mosaic/unsupported topology: plain bf16 stays available
    try:
        e_i8 = LatencyEngine(spec, params, int8_calib=int8_calib,
                             frame_hw=frame_hw)
        cands["int8"] = (
            e_i8, e_i8.device_benchmark(reps=reps)["device_ms_per_frame"])
    except NotImplementedError:
        pass
    chosen = min(cands, key=lambda k: cands[k][1])
    win = cands[chosen][0]
    win.selection = {f"{k}_ms": v for k, (_, v) in cands.items()}
    win.selection["chosen"] = chosen
    return win


def analytic_flops(spec: S.NetworkSpec) -> float:
    """Per-image forward FLOPs, same formula as the reference 'ops'
    command (darknet.c:115-131): 2*n*k^2*c*out_h*out_w per conv plus
    2*in*out per connected."""
    total = 0.0
    for l in spec.layers:
        if isinstance(l, S.ConvSpec):
            total += 2.0 * l.filters * l.size * l.size * l.c * l.out_h * l.out_w
        elif isinstance(l, S.ConnectedSpec):
            total += 2.0 * l.inputs * l.output
        elif isinstance(l, S.LocalSpec):
            total += 2.0 * l.filters * l.size * l.size * l.c * l.out_h * l.out_w
    return total


__all__ = ["ThroughputEngine", "LatencyEngine", "ShardedThroughputEngine",
           "best_latency_engine", "fold_params_for_inference",
           "analytic_flops"]
